"""as-of join + interval range join (operators/asof.py).

Semantics are checked against naive quadratic evaluations written
independently in Python over the collected rows — including the cases the
contract oracle's tie-free data can't exercise: timestamp ties (tiebreak
determinism), null timestamps on both sides, tolerance cut-offs, forward
direction, and overlapping intervals.
"""

from __future__ import annotations

import datetime as dt
import io
import re
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from breg_dcat_harvester_spark.operators.asof import (
    asof_join,
    range_join_intervals,
)

TS0 = dt.datetime(2024, 1, 1)


def _t(minutes: float) -> dt.datetime:
    return TS0 + dt.timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.createDataFrame(
        [
            ("u1", 100, _t(10)),
            ("u1", 101, _t(30)),
            ("u1", 102, _t(5)),   # before every right row -> no match
            ("u2", 200, _t(50)),
            ("u2", 201, None),    # null left ts -> never matches
            ("u3", 300, _t(10)),  # key with no right rows at all
        ],
        "k string, lid int, lts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", 1, _t(10), 1.0),   # equal ts to lid=100 (inclusive match)
            ("u1", 2, _t(10), 2.0),   # tie on ts: greater rid must win
            ("u1", 3, _t(20), 3.0),
            ("u2", 4, _t(40), 4.0),
            ("u2", 5, None, 5.0),     # null right ts: excluded entirely
        ],
        "k string, rid int, rts timestamp, rv double",
    )
    return left, right


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_backward_with_ties_and_nulls(spark, sides):
    left, right = sides
    out = asof_join(
        left, right, on=["k"], left_ts="lts", right_ts="rts",
        right_tiebreak="rid",
    ).select("k", "lid", "rid_r", "rv_r")
    assert _rows(out) == {
        ("u1", 100, 2, 2.0),   # ts tie: inclusive, max-rid right row wins
        ("u1", 101, 3, 3.0),
        ("u1", 102, None, None),
        ("u2", 200, 4, 4.0),
        ("u2", 201, None, None),
        ("u3", 300, None, None),
    }


def test_forward(spark, sides):
    left, right = sides
    out = asof_join(
        left, right, on=["k"], left_ts="lts", right_ts="rts",
        direction="forward", right_tiebreak="rid",
    ).select("k", "lid", "rid_r")
    assert _rows(out) == {
        ("u1", 100, 1),        # earliest rts >= lts; min-rid on the ts tie
        ("u1", 101, None),     # nothing at/after minute 30
        ("u1", 102, 1),
        ("u2", 200, None),
        ("u2", 201, None),
        ("u3", 300, None),
    }


def test_tolerance(spark, sides):
    left, right = sides
    out = asof_join(
        left, right, on=["k"], left_ts="lts", right_ts="rts",
        right_tiebreak="rid", tolerance_seconds=5 * 60,
    ).select("lid", "rid_r")
    got = dict(_rows(out))
    assert got[100] == 2          # 0 min gap
    assert got[101] is None       # 10 min gap > 5 min tolerance
    assert got[200] is None       # 10 min gap


def test_asof_matches_naive_quadratic(spark):
    """Randomized cross-check against an O(n*m) reference evaluation."""
    import random

    rnd = random.Random(7)
    lrows = [
        (f"k{rnd.randrange(4)}", i, _t(rnd.randrange(200)))
        for i in range(120)
    ]
    rrows = [
        (f"k{rnd.randrange(4)}", i, _t(rnd.randrange(200)), float(i))
        for i in range(80)
    ]
    left = spark.createDataFrame(lrows, "k string, lid int, lts timestamp")
    right = spark.createDataFrame(
        rrows, "k string, rid int, rts timestamp, rv double"
    )
    got = {
        (r["k"], r["lid"]): r["rid_r"]
        for r in asof_join(
            left, right, on=["k"], left_ts="lts", right_ts="rts",
            right_tiebreak="rid",
        ).collect()
    }
    for k, lid, lts in lrows:
        cand = [(rts, rid) for rk, rid, rts, _ in rrows if rk == k and rts <= lts]
        want = max(cand)[1] if cand else None
        assert got[(k, lid)] == want, (k, lid)


def test_asof_single_shuffle(spark, sides):
    left, right = sides
    df = asof_join(
        left, right, on=["k"], left_ts="lts", right_ts="rts",
        right_tiebreak="rid",
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    ops = re.findall(
        r"^\(\d+\) (\w[\w ]*?)\s*(?:\[codegen id : \d+\])?\s*$",
        buf.getvalue(), re.MULTILINE,
    )
    assert sum(1 for o in ops if o == "Exchange") == 1, ops
    assert not any("Join" in o for o in ops), ops  # no join at all: union+window


def test_rsuffix_collision_raises(spark, sides):
    left, right = sides
    left2 = left.withColumn("rv_r", F.lit(1))
    with pytest.raises(ValueError, match="collides"):
        asof_join(left2, right, on=["k"], left_ts="lts", right_ts="rts")


# ---------------------------------------------------------------------------
# range join


@pytest.fixture(scope="module")
def facts_intervals(spark):
    facts = spark.createDataFrame(
        [(i, _t(i * 7)) for i in range(60)], "fid int, fts timestamp"
    )
    intervals = spark.createDataFrame(
        [
            (0, _t(0), _t(60)),
            (1, _t(30), _t(90)),      # overlaps window 0
            (2, _t(300), _t(330)),
            (3, _t(400), _t(400)),    # empty: start == end, contains nothing
            (4, _t(500), _t(490)),    # negative: filtered out
        ],
        "wid int, ws timestamp, we timestamp",
    )
    return facts, intervals


def _naive_range(facts, intervals):
    want = set()
    for fid, fts in facts:
        for wid, ws, we in intervals:
            if ws <= fts < we:
                want.add((fid, wid))
    return want


def test_range_join_matches_naive(spark, facts_intervals):
    facts, intervals = facts_intervals
    frows = [(r["fid"], r["fts"]) for r in facts.collect()]
    irows = [(r["wid"], r["ws"], r["we"]) for r in intervals.collect()]
    for bin_seconds in (None, 60.0, 3600.0, 1.0):
        got = {
            (r["fid"], r["wid"])
            for r in range_join_intervals(
                facts, intervals, "fts", "ws", "we", bin_seconds=bin_seconds
            ).collect()
        }
        assert got == _naive_range(frows, irows), bin_seconds


def test_range_join_keyed(spark):
    facts = spark.createDataFrame(
        [("a", 1, _t(10)), ("b", 2, _t(10))], "k string, fid int, fts timestamp"
    )
    intervals = spark.createDataFrame(
        [("a", 7, _t(0), _t(60))], "k string, wid int, ws timestamp, we timestamp"
    )
    got = _rows(
        range_join_intervals(
            facts, intervals, "fts", "ws", "we", on=["k"], bin_seconds=600
        ).select("k", "fid", "wid")
    )
    assert got == {("a", 1, 7)}  # key match required, not just time overlap


def test_range_join_no_nested_loop(spark, facts_intervals):
    facts, intervals = facts_intervals
    plan = range_join_intervals(
        facts, intervals, "fts", "ws", "we", bin_seconds=600
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_range_join_column_collision_raises(spark, facts_intervals):
    facts, intervals = facts_intervals
    with pytest.raises(ValueError, match="collision"):
        range_join_intervals(
            facts, intervals.withColumnRenamed("wid", "fid"),
            "fts", "ws", "we",
        )
