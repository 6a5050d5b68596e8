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
    python tools/ab_canonical.py [out.json] [--stage]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_BENCH_REPS (default 5).

``--stage`` isolates the CONSUMPTION stage instead: the closure output is
localCheckpointed once OUTSIDE the timed region and only the
all_docs-consuming tail (old aggregate+join-back vs new window) is timed —
the controlled comparison when the closure's rep noise swamps the
end-to-end delta (it is ~85% of wall at every measured scale). Pinning the
closure is a harness choice only; the product query recomputes per
invocation as always.
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


def _old_tail(all_docs, F):
    # the pre-r12 consumption shape: max_by aggregate + cluster_id join-back
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


def _new_tail(all_docs, F, Window):
    # the r12 consumption shape: one cluster-partitioned window pass
    w = (
        Window.partitionBy("cluster_id")
        .orderBy(F.col("n_chars").desc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return all_docs.select(
        "doc_id", "cluster_id", F.first("doc_id").over(w).alias("canonical_id")
    ).select(
        "doc_id",
        "cluster_id",
        "canonical_id",
        (F.col("doc_id") == F.col("canonical_id")).alias("is_canonical"),
    )


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--stage"]
    stage_mode = "--stage" in sys.argv[1:]
    out_path = args[0] if args else os.path.join(
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

    def _all_docs(spark, sf, comp=None):
        docs = load_table(spark, sf, "documents").select("doc_id", "n_chars")
        if comp is None:
            comp = dedup_cluster_components(spark, sf).select(
                "doc_id", "cluster_id"
            )
        return docs.join(comp, "doc_id", "left").select(
            "doc_id",
            "n_chars",
            F.coalesce("cluster_id", "doc_id").alias("cluster_id"),
        )

    def old_shape(spark, sf):
        # the pre-r12 implementation, verbatim shape (closure recomputed)
        return _old_tail(_all_docs(spark, sf), F)

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

    if stage_mode:
        # pin the closure ONCE outside the timed region; time only the tail.
        # r12-advisor low: stage mode carries the SAME pre/post anchor
        # calibration as end-to-end mode, so the calmness of a committed
        # stage window is machine-checkable (anchor_spread).
        comp = (
            dedup_cluster_components(spark, sf_dir)
            .select("doc_id", "cluster_id")
            .localCheckpoint()
        )
        all_docs = _all_docs(spark, sf_dir, comp=comp)
        runs: dict[str, list[float]] = {}
        pre = anchor("pre", runs)
        per = {"old": [], "new": []}
        for _ in range(reps):
            for tag, df in (
                ("old", _old_tail(all_docs, F)),
                ("new", _new_tail(all_docs, F, Window)),
            ):
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                per[tag].append(round(time.perf_counter() - t0, 4))
        post = anchor("post", runs)
        runs.update(per)
        a = round((pre + post) / 2, 4)
        med = {k: warm_median(v) for k, v in per.items()}
        out = {
            "mode": "stage",
            "sf_dir": sf_dir,
            "reps": reps,
            "anchor_pre": pre,
            "anchor_post": post,
            "anchor": a,
            "anchor_spread": round(abs(pre - post) / max(pre, post), 4)
            if max(pre, post)
            else 0.0,
            "runs": runs,
            "median": med,
            "normalized": {k: round(v / a, 4) for k, v in med.items()} if a else {},
            "delta_pct": round(100 * (med["new"] - med["old"]) / med["old"], 2)
            if med["old"]
            else None,
        }
        with open(out_path, "w") as fh:
            json.dump(out, fh, indent=1, sort_keys=True)
            fh.write("\n")
        print(json.dumps({k: out[k] for k in ("median", "delta_pct", "anchor", "anchor_spread")}))
        return

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
