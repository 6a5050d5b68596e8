"""Matched-window A/B for the dedup_canonical_docs survivorship rewrite
(r12): OLD shape = max_by aggregate + cluster_id join-back (consumes the
corpus-sized all_docs frame twice), NEW shape = one cluster-partitioned
window (the registry implementation). Both variants run back-to-back in
ONE session with interleaved reps, so they share the host window and the
per-invocation closure cost — the measured delta is exactly the
post-closure shape change. The closure (dedup_cluster_components) is
recomputed inside every rep for BOTH variants (released_after brackets),
as in bench.py/mini_bench.py.

Usage:
    python tools/ab_canonical.py [out.json]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_BENCH_REPS (default 5).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_DIR not in sys.path:
    sys.path.insert(0, REPO_DIR)

from bench import warm_median


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO_DIR, "tools", "ab_canonical.json"
    )
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "5"))

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from csv_parquet_s3_spark.operators.components import (
        dedup_canonical_docs,
        dedup_cluster_components,
    )
    from csv_parquet_s3_spark.plans.materialize import released_after
    from csv_parquet_s3_spark.session import get_spark
    from csv_parquet_s3_spark.sources.tables import load_table

    def old_shape(spark, sf):
        # the pre-r12 implementation, verbatim shape
        docs = load_table(spark, sf, "documents").select("doc_id", "n_chars")
        comp = dedup_cluster_components(spark, sf).select("doc_id", "cluster_id")
        all_docs = docs.join(comp, "doc_id", "left").select(
            "doc_id",
            "n_chars",
            F.coalesce("cluster_id", "doc_id").alias("cluster_id"),
        )
        canon = all_docs.groupBy("cluster_id").agg(
            F.max_by(
                "doc_id",
                F.struct(F.col("n_chars"), (-F.col("doc_id")).alias("neg")),
            ).alias("canonical_id")
        )
        return all_docs.join(canon, "cluster_id").select(
            "doc_id",
            "cluster_id",
            "canonical_id",
            (F.col("doc_id") == F.col("canonical_id")).alias("is_canonical"),
        )

    spark = get_spark(
        app_name="ab_canonical",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    load_table(spark, sf_dir, "documents").count()  # warm listing

    def anchor(tag, runs):
        per = []
        for _ in range(reps):
            t0 = time.perf_counter()
            load_table(spark, sf_dir, "documents").write.format("noop").mode(
                "overwrite"
            ).save()
            per.append(round(time.perf_counter() - t0, 4))
        runs[f"calib_{tag}"] = per
        return warm_median(per)

    runs: dict[str, list[float]] = {}
    pre = anchor("pre", runs)
    # interleaved reps: old,new,old,new,... so a mid-run host shift hits both
    per = {"old": [], "new": []}
    for _ in range(reps):
        for tag, fn in (("old", old_shape), ("new", dedup_canonical_docs)):
            t0 = time.perf_counter()
            with released_after(spark):
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            per[tag].append(round(time.perf_counter() - t0, 4))
    post = anchor("post", runs)
    runs["old"], runs["new"] = per["old"], per["new"]

    a = round((pre + post) / 2, 4)
    med = {k: warm_median(v) for k, v in per.items()}
    out = {
        "sf_dir": sf_dir,
        "reps": reps,
        "anchor_pre": pre,
        "anchor_post": post,
        "anchor": a,
        "anchor_spread": round(abs(pre - post) / max(pre, post), 4)
        if max(pre, post)
        else 0.0,
        "median": med,
        "normalized": {k: round(v / a, 4) for k, v in med.items()} if a else {},
        "delta_pct": round(100 * (med["new"] - med["old"]) / med["old"], 2)
        if med["old"]
        else None,
        "runs": runs,
    }
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(json.dumps({k: out[k] for k in ("median", "normalized", "delta_pct", "anchor", "anchor_spread")}))


if __name__ == "__main__":
    main()
