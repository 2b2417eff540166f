"""Stream-stream time-range join (streaming/joins.py): batch parity and a
genuine StreamingSymmetricHashJoin run."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from breg_dcat_harvester_spark.streaming.joins import (
    click_attribution_join,
    run_attribution_stream,
)

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _events(spark):
    m = lambda minutes: T0 + dt.timedelta(minutes=minutes)  # noqa: E731
    rows = [
        # user 1: clicks at 0, 30, 70; purchase at 60 -> only click 30 in
        # the (p_ts - 1h, p_ts] window (click 0 sits exactly on the open
        # far edge, click 70 is after the purchase)
        (1, m(0), 1, "click", 1.0, None),
        (2, m(30), 1, "click", 1.0, None),
        (3, m(60), 1, "purchase", 9.0, None),
        (4, m(70), 1, "click", 1.0, None),
        # user 2: click exactly 60 min before -> EXCLUDED (strict >)
        (5, m(0), 2, "click", 1.0, None),
        (6, m(60), 2, "purchase", 9.0, None),
        # user 3: click and purchase same ts -> included (inclusive <=)
        (7, m(10), 3, "click", 1.0, None),
        (8, m(10), 3, "purchase", 9.0, None),
        # user 4: purchase with no clicks
        (9, m(5), 4, "purchase", 9.0, None),
    ]
    return spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    )


EXPECTED = {(1, 3, 2), (3, 8, 7)}


def test_batch_parity_and_boundaries(spark):
    ev = _events(spark)
    got = click_attribution_join(
        ev.filter(F.col("event_type") == "purchase"),
        ev.filter(F.col("event_type") == "click"),
        max_lag="1 hour",
    ).collect()
    assert {(r.user_id, r.purchase_id, r.click_id) for r in got} == EXPECTED
    lags = {r.click_id: r.lag_us for r in got}
    assert lags[2] == 30 * 60 * 1_000_000 and lags[7] == 0


@pytest.mark.slow
def test_stream_equals_batch(spark, tmp_path):
    ev = _events(spark)
    src = str(tmp_path / "events")
    ev.repartition(3).write.parquet(src)

    rows = run_attribution_stream(
        spark, src, str(tmp_path / "ckpt"), max_lag="1 hour", delay="30 days"
    )
    got = {(r.user_id, r.purchase_id, r.click_id, r.lag_us) for r in rows}
    want = {
        (r.user_id, r.purchase_id, r.click_id, r.lag_us)
        for r in click_attribution_join(
            ev.filter(F.col("event_type") == "purchase"),
            ev.filter(F.col("event_type") == "click"),
            max_lag="1 hour",
        ).collect()
    }
    assert got == want and len(got) == 2


@pytest.mark.slow
def test_stream_plan_is_symmetric_hash_join(spark, tmp_path):
    # the run must be a real stream-stream join with watermarks on both
    # sides — resumable from its checkpoint without re-emitting
    ev = _events(spark)
    src = str(tmp_path / "events")
    ev.write.parquet(src)
    ckpt = str(tmp_path / "ckpt2")
    first = run_attribution_stream(spark, src, ckpt, delay="30 days")
    assert len(first) == 2
    again = run_attribution_stream(spark, src, ckpt, delay="30 days")
    assert again == []  # checkpoint resume: nothing new to emit
