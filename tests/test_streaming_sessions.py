"""Session-window aggregation (streaming/sessions.py): boundary semantics,
batch parity, and the watermark-finalized streaming run."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from breg_dcat_harvester_spark.streaming.sessions import (
    run_session_stream,
    session_stats,
)

T0 = dt.datetime(2024, 1, 1, 8, 0, 0)


def _events(spark):
    m = lambda minutes: T0 + dt.timedelta(minutes=minutes)  # noqa: E731
    rows = [
        # user 1: events at 0, 10, 25 (one session: every diff < 30m gap),
        # then 70 (new session: 45m after 25)
        (1, m(0), 1, "click", 1.0, None),
        (2, m(10), 1, "click", 1.0, None),
        (3, m(25), 1, "purchase", 2.5, None),
        (4, m(70), 1, "click", 1.0, None),
        # user 2: exact-boundary pair — second event at first + gap
        # exactly -> MERGES (inclusive boundary, same rule as the batch
        # lag-based sessionizer)
        (5, m(0), 2, "click", 1.0, None),
        (6, m(30), 2, "click", 1.0, None),
        # user 3: far-future lone event keeps the watermark high in the
        # streaming test
        (7, m(600), 3, "click", 1.0, None),
    ]
    return spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    )


def test_session_boundaries_batch(spark):
    got = {
        (r.user_id, r.session_start, r.session_end): (r.n_events, r.value_cents)
        for r in session_stats(_events(spark), gap="30 minutes").collect()
    }
    m = lambda minutes: T0 + dt.timedelta(minutes=minutes)  # noqa: E731
    # user 1: [0, 25+30) and [70, 100)
    assert got[(1, m(0), m(55))] == (3, 450)
    assert got[(1, m(70), m(100))] == (1, 100)
    # user 2: the exactly-30-min-later event merges -> one [0, 60) session
    assert got[(2, m(0), m(60))] == (2, 200)
    assert len(got) == 4


@pytest.mark.slow
def test_session_stream_emits_finalized(spark, tmp_path):
    ev = _events(spark)
    src = str(tmp_path / "events")
    ev.repartition(2).write.parquet(src)

    rows = run_session_stream(
        spark, src, str(tmp_path / "ckpt"), gap="30 minutes", delay="1 minute"
    )
    emitted = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in rows
    }
    # final watermark = max ts (m600) - 1min; every session of users 1-2
    # ends long before it -> emitted; user 3's session is still open
    batch = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in session_stats(ev, gap="30 minutes").collect()
        if r.user_id != 3
    }
    assert emitted == batch and len(emitted) == 3
