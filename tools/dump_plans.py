"""Dump `.explain("formatted")` for named registry queries to files.

Produces the committed plan evidence for optimization rounds
(`plans/r<N>/<query>_<suffix>.txt`): the judge cannot run Spark, so every
plan-shape claim in OPTIMIZATION_r<N>.md must be checkable against these
files.

Usage:
    python tools/dump_plans.py OUTDIR SUFFIX QUERY [QUERY ...]

Env:
    SPARK_GRAFT_SF_DIR      dataset root (default /root/testdata/sf0.1)
    SPARK_GRAFT_GATE_BYTES  override sources.tables.BROADCAST_GATE_BYTES —
                            set to 0 to capture the ABOVE-GATE plan shape
                            (what a 100 TB table would plan as: no forced
                            broadcast hint, join strategy left to CBO/AQE).
    SPARK_GRAFT_DUMP_CONF   extra session confs, "k=v,k=v" — e.g.
                            spark.sql.autoBroadcastJoinThreshold=-1 to
                            simulate big-table statistics at bench scale
                            (at sf0.1 every dimension is under the 10 MB
                            auto threshold, so removing a hint changes
                            nothing in the static plan; with the auto
                            threshold off, a forced hint still plans BHJ
                            while the gated path falls back to SMJ — the
                            exact 100 TB semantics the gate exists for).
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    outdir, suffix, *names = sys.argv[1:]
    os.makedirs(outdir, exist_ok=True)

    gate = os.environ.get("SPARK_GRAFT_GATE_BYTES")
    if gate is not None:
        from csv_parquet_s3_spark.sources import tables

        tables.BROADCAST_GATE_BYTES = int(gate)
        # broadcast_if_small reads the module constant through its default
        # arg at def time; patch the function default too so the override
        # actually bites.
        d = list(tables.broadcast_if_small.__defaults__ or ())
        if d:
            d[-1] = int(gate)
            tables.broadcast_if_small.__defaults__ = tuple(d)

    from csv_parquet_s3_spark.operators import QUERIES
    from csv_parquet_s3_spark.plans.explain import formatted_plan
    from csv_parquet_s3_spark.session import get_spark

    extra = {}
    for kv in filter(None, os.environ.get("SPARK_GRAFT_DUMP_CONF", "").split(",")):
        k, _, v = kv.partition("=")
        extra[k.strip()] = v.strip()
    spark = get_spark(app_name="dump_plans", extra_conf=extra)
    for k, v in extra.items():
        spark.conf.set(k, v)  # getOrCreate may have reused a live session
    for name in names:
        df = QUERIES[name](spark, SF_DIR)
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(formatted_plan(df))
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
