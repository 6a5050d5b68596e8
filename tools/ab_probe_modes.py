"""A/B the IVF probe modes (dpp vs collect) with interleaved reps.

The two serving modes (`similarity_index._probe_mode`) differ only in HOW
the probed-list set restricts the per-list artifact scans: a broadcast
join that triggers dynamic partition pruning (collect-free), or a bounded
driver collect -> static In(list_id, ...) partition filter. Host
throughput wobbles ±15-45% on minute timescales (NOTES r06), so a fair
comparison must INTERLEAVE the modes rep-by-rep in one session — each
mode samples the same host windows and the drift cancels; comparing two
separate runs would mostly measure the host.

Usage: python tools/ab_probe_modes.py [reps_per_mode]   (default 8)
Prints one JSON line: {"anchor_pre":…, "anchor_post":…, "ab": {query:
{"dpp": warm_median, "collect": warm_median, "runs": {...}}}}. Committed
round outputs live beside this script (ab_probe_r{N}.json) so NOTES
ratios stay recomputable from the tree.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_DIR not in sys.path:
    sys.path.insert(0, REPO_DIR)

from bench import warm_median  # the pinned statistic

NAMES = [
    "sim_cosine_topk_ivf_pq_from_index",
    "sim_cosine_topk_ivf_sq8_from_index",
    "sim_cosine_topk_ivf_pq_refine",
]


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from csv_parquet_s3_spark.operators import QUERIES
    from csv_parquet_s3_spark.session import get_spark
    from csv_parquet_s3_spark.sources.tables import TABLES, load_table

    spark = get_spark(
        app_name="csv_parquet_s3_spark_ab_probe",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    for t in TABLES:
        load_table(spark, sf_dir, t).count()

    def anchor() -> float:
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            load_table(spark, sf_dir, "lineitem").write.format("noop").mode(
                "overwrite"
            ).save()
            ts.append(round(time.perf_counter() - t0, 4))
        return warm_median(ts)

    pre = anchor()
    out: dict[str, dict] = {}
    for name in NAMES:
        fn = QUERIES[name]
        per: dict[str, list[float]] = {"dpp": [], "collect": []}
        for i in range(2 * reps):
            mode = "dpp" if i % 2 == 0 else "collect"
            os.environ["SPARK_GRAFT_IVF_PROBE"] = mode
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            per[mode].append(round(time.perf_counter() - t0, 4))
        out[name] = {m: warm_median(v) for m, v in per.items()}
        out[name]["runs"] = per
    post = anchor()
    print(
        json.dumps(
            {"sf_dir": sf_dir, "anchor_pre": pre, "anchor_post": post, "ab": out}
        )
    )


if __name__ == "__main__":
    main()
