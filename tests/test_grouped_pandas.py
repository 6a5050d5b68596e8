"""Grouped-map EWMA vs a pure-pandas model of the same recurrence."""

from __future__ import annotations

import pandas as pd

from csv_parquet_s3_spark.operators.grouped_pandas import (
    EWMA_ALPHA,
    user_value_ewma,
)
from csv_parquet_s3_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_ewma_matches_pandas_model(spark):
    ev = load_table(spark, SF, "events")
    got = (
        user_value_ewma(ev)
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
        .reset_index(drop=True)
    )

    model = ev.select("user_id", "event_id", "ts", "value").toPandas()
    model = model.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
    model["ewma_value"] = model.groupby("user_id")["value"].transform(
        lambda s: s.ewm(alpha=EWMA_ALPHA, adjust=False).mean()
    )

    assert len(got) == len(model) > 0
    pd.testing.assert_frame_equal(got, model, check_like=False)
