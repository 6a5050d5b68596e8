"""Targeted stable-anchor micro-bench: time a NAMED SUBSET of registry
queries under the exact bench.py discipline (noop-sink full-plan
materialization, warm-median statistic, pre/post scan anchors) without
paying for the whole headline set.

Purpose (r08 verdict #3): regressions on overhead-dominated serving
queries must be (re-)measured on a STABLE anchor window — pre/post scan
anchors within ~15% — before they count as real. The full bench takes
long enough that the host often shifts speed mid-run (r08's straddled
0.454/0.256); a 3-query subset finishes inside one host window far more
often. Usage:

    python tools/mini_bench.py sim_cosine_topk_ivf_pq_from_index [more...]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_BENCH_REPS (default 5). Prints one JSON line:
{"anchor_scan": ..., "anchor_spread": ..., "stable": bool,
 "queries": {name: median}, "normalized": {name: median/anchor},
 "queries_soak": {...}, "normalized_soak": {...}, "runs": {...}}.

r11: a SOAK second pass (same session, own adjacent anchor) mirrors
bench.py — ``normalized_soak`` is the statistic the standing
refine/bm25 matched-anchor watch (r10 verdict #4) compares across
rounds, for the same reason bench.py promoted it: pass-1 medians span
the host's ×2-5 throughput windows; the warm pass converges. Each rep
runs under ``released_after`` so checkpoint pins never accumulate.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_DIR not in sys.path:
    sys.path.insert(0, REPO_DIR)

from bench import warm_median  # the pinned statistic — never reimplement


def main() -> None:
    names = sys.argv[1:]
    if not names:
        sys.exit("usage: mini_bench.py <query_name> [query_name ...]")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "5"))

    from csv_parquet_s3_spark.operators import QUERIES
    from csv_parquet_s3_spark.session import get_spark
    from csv_parquet_s3_spark.sources.tables import TABLES, load_table

    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    spark = get_spark(
        app_name="csv_parquet_s3_spark_mini_bench",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    for t in TABLES:
        load_table(spark, sf_dir, t).count()

    runs: dict[str, list[float]] = {}

    def scan_anchor(tag: str) -> float:
        per_run = []
        for _ in range(reps):
            t0 = time.perf_counter()
            load_table(spark, sf_dir, "lineitem").write.format("noop").mode(
                "overwrite"
            ).save()
            per_run.append(round(time.perf_counter() - t0, 4))
        runs[f"calib_scan_{tag}"] = per_run
        return warm_median(per_run)

    from csv_parquet_s3_spark.plans.materialize import released_after

    def run_set(tag: str) -> dict[str, float]:
        meds: dict[str, float] = {}
        for name in names:
            fn = QUERIES[name]
            per_run = []
            for _ in range(reps):
                t0 = time.perf_counter()
                with released_after(spark):
                    fn(spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                per_run.append(round(time.perf_counter() - t0, 4))
            runs[f"{tag}{name}"] = per_run
            meds[name] = warm_median(per_run)
        return meds

    pre = scan_anchor("pre")
    medians = run_set("")
    post = scan_anchor("post")
    soak_medians = run_set("soak_")
    soak_post = scan_anchor("soak")

    anchor = round((pre + post) / 2, 4)
    anchor_soak = round((post + soak_post) / 2, 4)
    spread = round(abs(pre - post) / max(pre, post), 4) if max(pre, post) else 0.0
    # r11 advisory: the soak pass is the round-comparison statistic, so it
    # needs its own drift gate — a host throughput shift between post and
    # soak_post would skew normalized_soak while the pass-1 spread still
    # read stable.
    spread_soak = (
        round(abs(post - soak_post) / max(post, soak_post), 4)
        if max(post, soak_post)
        else 0.0
    )
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "reps": reps,
                "anchor_scan": anchor,
                "anchor_pre": pre,
                "anchor_post": post,
                "anchor_spread": spread,
                "anchor_spread_soak": spread_soak,
                "stable": spread <= 0.15 and spread_soak <= 0.15,
                "queries": medians,
                "normalized": {
                    n: round(m / anchor, 4) for n, m in medians.items()
                }
                if anchor > 0
                else {},
                "anchor_soak": anchor_soak,
                "queries_soak": soak_medians,
                "normalized_soak": {
                    n: round(m / anchor_soak, 4)
                    for n, m in soak_medians.items()
                }
                if anchor_soak > 0
                else {},
                "runs": runs,
            }
        )
    )


if __name__ == "__main__":
    main()
