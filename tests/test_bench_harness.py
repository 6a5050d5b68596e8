"""Pins on the bench harness's driver contract.

The round driver captures only the TAIL of bench.py's stdout and parses the
last line as JSON — r05's line carried per-rep runs plus the bucketed
section, overflowed the capture, and the round lost its official perf
number (``BENCH_r05.json`` landed ``parsed: null``). These tests pin the
two contract properties without running Spark: every headline/bucketed
entry must exist in the registry, and the worst-case headline JSON payload
must stay far under the capture window even as queries are added.
"""

import json

import bench


def _worst_case_payload() -> str:
    # Mirror bench.main()'s stdout dict with worst-plausible-width values:
    # four-digit seconds for every query, all calibration keys present.
    medians = {name: 9999.9999 for name in bench.HEADLINE}
    calib = {
        f"{c}_{tag}": 9999.9999
        for c in ("jvm", "scan")
        for tag in ("pre", "post")
    }
    return json.dumps(
        {
            "metric": "headline_queries_total_wall",
            "value": 99999.9999,
            "unit": "sec",
            "queries": medians,
            "reps": 5,
            "bucketed_total": 9999.9999,
            "calib": calib,
            "sf": 0.1,
        }
    )


def test_headline_json_fits_driver_tail_capture():
    payload = _worst_case_payload()
    # The r05 overflow was a multi-KB line; keep an ample safety margin.
    assert len(payload) < 2048, (
        f"bench headline JSON is {len(payload)} bytes — approaching the "
        "driver tail-capture limit; move detail to BENCH_DETAIL.json or "
        "trim the headline set"
    )


def test_headline_and_bucketed_queries_are_registered():
    from csv_parquet_s3_spark.operators import QUERIES

    missing = [n for n in bench.HEADLINE if n not in QUERIES]
    assert not missing, f"headline entries not in registry: {missing}"
    missing_b = [n for n in bench.BUCKETED_SUBSET if n not in QUERIES]
    assert not missing_b, f"bucketed entries not in registry: {missing_b}"
    assert set(bench.BUCKETED_SUBSET) <= set(bench.HEADLINE)


def test_warm_median_excludes_cold_first_rep():
    """VERDICT r07 #2: the committed statistic is the median of WARM reps
    only — a 10x cold first rep (index build) must not move it."""
    assert bench.warm_median([10.0, 1.0, 1.2, 1.1, 1.3]) == 1.15
    assert bench.warm_median([0.978, 0.3, 0.3, 0.3, 0.3]) == 0.3
    # degenerate single-rep runs fall back to the only rep
    assert bench.warm_median([2.5]) == 2.5


def test_detail_defaults_to_uncommitted_scratch_path(monkeypatch):
    """r11 verdict #7: a plain bench run (driver, judge, ad-hoc) must not
    overwrite the committed calm-window BENCH_DETAIL.json — the default
    detail target is the gitignored .latest name; promotion to the
    committed name is explicit via SPARK_GRAFT_BENCH_DETAIL."""
    import os

    monkeypatch.delenv("SPARK_GRAFT_BENCH_DETAIL", raising=False)
    assert os.path.basename(bench.detail_path()) == "BENCH_DETAIL.latest.json"
    monkeypatch.setenv("SPARK_GRAFT_BENCH_DETAIL", "BENCH_DETAIL.json")
    assert os.path.basename(bench.detail_path()) == "BENCH_DETAIL.json"
    # and the scratch name is actually gitignored
    with open(os.path.join(os.path.dirname(bench.__file__), ".gitignore")) as fh:
        assert "BENCH_DETAIL.latest.json" in fh.read()
