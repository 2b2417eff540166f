"""As-of (temporal) join and interval range join — two operators Spark's
DataFrame API lacks natively, built as compositions of existing relational
ops so Catalyst/AQE still owns the physical plan.

``asof_join`` answers "for each left row, the latest right row at or before
its timestamp (per key)" — the canonical enrichment for event streams:
attach the last-seen click to a purchase, the last tool result to an
assistant turn, the prevailing config to a log line.  The naive formulation
is an inequality join (quadratic per key) or a join + per-left-row MAX
subquery (two shuffles + a re-join).  This implementation is the
union-window form:

    1. tag both sides and UNION them (map-only, no row explosion),
    2. ONE shuffle: hash-partition by key, sort by (ts, side, tiebreak),
    3. a running ``last(payload, ignorenulls=True)`` window carries the most
       recent right payload forward onto each left row,
    4. keep left rows only.

Cost is one exchange + one sort — identical to sessionization — regardless
of how many right rows precede each left row, and the window frame
(UNBOUNDED PRECEDING → CURRENT ROW) is computed incrementally by Spark's
running-frame WindowExec, so there is no per-row rescan.  At 100 TB the
shuffle key is the join key: a pathologically hot key serializes its sort
the same way any per-key window does — shard such keys upstream (e.g.
bucket by (key, coarse time) and stitch boundaries) before calling this.

``range_join_intervals`` answers "which interval(s) does each fact fall
into" (ts ∈ [start, end)).  Spark compiles a raw inequality join to
broadcast-nested-loop (fine for tiny dims, quadratic otherwise).  The scale
path here is bin-and-equijoin: intervals explode to the fixed-width time
bins they cover, facts compute their single bin, the join is a plain
equi-join on (bin [, key]) with the exact BETWEEN as a post-filter.  The
explosion factor is len(interval)/bin_width + 1 — with the default bin
width ≈ the mean interval length, ~2 rows per interval — and both sides
hash-partition on the bin, so a month of facts spreads over time-uniform
buckets instead of one nested loop.

No reference counterpart (the reference's store is a triple store queried
by SPARQL, which has no temporal join); these fill the "custom operators
the engine needs that Spark lacks" requirement with DuckDB-oracle-gated
semantics (DuckDB's native ASOF JOIN / inequality join replay both).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "range_join_intervals"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    tolerance_seconds: float | None = None,
    right_tiebreak: str | None = None,
    rsuffix: str = "_r",
) -> DataFrame:
    """Left as-of join: every left row, plus the matched right row's payload
    columns (renamed ``<col><rsuffix>``), or nulls when no right row
    qualifies.

    direction='backward' matches the latest right row with
    ``r[right_ts] <= l[left_ts]``; 'forward' the earliest with
    ``r[right_ts] >= l[left_ts]`` (both inclusive, mirroring DuckDB ASOF).
    Among right rows tied on the timestamp the one with the greatest
    (backward) / smallest (forward) ``right_tiebreak`` wins — pass a unique
    id column to make the result bit-deterministic under ties; without it,
    tied payloads are whichever the sort surfaced (same caveat as any ASOF
    engine).  ``tolerance_seconds`` nulls out matches further than that many
    seconds from the left timestamp.  Left rows with a null timestamp never
    match.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    payload_cols = [c for c in right.columns if c not in on]
    overlap = set(c + rsuffix for c in payload_cols) & set(left.columns)
    if overlap:
        raise ValueError(f"rsuffix {rsuffix!r} collides with left columns {sorted(overlap)}")

    tb = (
        F.col(right_tiebreak).cast("string")
        if right_tiebreak is not None
        else F.lit("")
    )
    # One struct column carries the whole right payload through the window:
    # a single running `last` instead of one window expression per column.
    # a null right timestamp would sort to the head of the ascending scan and
    # leak its payload into every left row — such rows can never match
    r_tagged = right.filter(F.col(right_ts).isNotNull()).select(
        *on,
        F.col(right_ts).alias("__asof_ts"),
        F.lit(0).alias("__asof_side"),
        tb.alias("__asof_tb"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("__asof_payload"),
    )
    l_tagged = left.select(
        *left.columns,
        F.col(left_ts).alias("__asof_ts"),
        F.lit(1).alias("__asof_side"),
        F.lit("").alias("__asof_tb"),
        F.lit(None).cast(r_tagged.schema["__asof_payload"].dataType).alias(
            "__asof_payload"
        ),
    )
    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    if direction == "backward":
        # right rows sort BEFORE left rows at an equal timestamp (side 0 < 1)
        # so the equality match is visible; max-(ts, tiebreak) right row wins.
        order = [
            F.col("__asof_ts").asc(),
            F.col("__asof_side").asc(),
            F.col("__asof_tb").asc(),
        ]
    else:
        # reversed scan: running `last` = the EARLIEST right row >= left ts.
        order = [
            F.col("__asof_ts").desc(),
            F.col("__asof_side").asc(),
            F.col("__asof_tb").desc(),
        ]
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last(
        F.when(F.col("__asof_side") == 0, F.col("__asof_payload")),
        ignorenulls=True,
    ).over(w)
    carried_ts = F.last(
        F.when(F.col("__asof_side") == 0, F.col("__asof_ts")), ignorenulls=True
    ).over(w)

    matched = unioned.withColumn("__asof_match", carried).withColumn(
        "__asof_match_ts", carried_ts
    )
    keep = F.col("__asof_ts").isNotNull()
    if tolerance_seconds is not None:
        gap = F.abs(
            _epoch_us(F.col("__asof_ts")) - _epoch_us(F.col("__asof_match_ts"))
        )
        keep = keep & (gap <= F.lit(int(tolerance_seconds * 1_000_000)))
    matched = matched.withColumn(
        "__asof_match", F.when(keep, F.col("__asof_match"))
    )
    out_cols = [F.col(c) for c in left.columns] + [
        F.col(f"__asof_match.{c}").alias(c + rsuffix) for c in payload_cols
    ]
    return matched.filter(F.col("__asof_side") == 1).select(*out_cols)


def _epoch_us(c: Column) -> Column:
    # unix_micros only accepts TIMESTAMP; parquet columns are often
    # TIMESTAMP_NTZ.  The cast is a wall-clock identity under the repo-wide
    # session timeZone=UTC (session.py), and is monotone non-decreasing under
    # any timezone, which is all binning/tolerance arithmetic needs.
    return F.unix_micros(c.cast("timestamp"))


def range_join_intervals(
    facts: DataFrame,
    intervals: DataFrame,
    fact_ts: str,
    start_col: str,
    end_col: str,
    on: list[str] | None = None,
    bin_seconds: float | None = None,
) -> DataFrame:
    """Inner join of facts to every interval containing them
    (``start <= ts < end`` [, equal keys]), via bin-and-equijoin.

    ``bin_seconds`` is the time-bin width; when None it is derived once from
    the interval table (mean interval length, a single tiny aggregate on the
    dim side — a plan constant, the same pattern as the IVF centroid
    sample).  Smaller bins = more interval replication but finer partition
    spread; the default keeps replication ≈ 2 rows/interval.  Output: all
    fact columns + all interval columns (names must not collide).
    """
    on = list(on or [])
    overlap = set(facts.columns) & set(intervals.columns) - set(on)
    if overlap:
        raise ValueError(f"fact/interval column collision: {sorted(overlap)}")
    if bin_seconds is None:
        row = intervals.agg(
            F.avg(
                _epoch_us(F.col(end_col)) - _epoch_us(F.col(start_col))
            ).alias("us")
        ).first()
        if row is None or row["us"] is None or row["us"] <= 0:
            raise ValueError("cannot derive bin_seconds from empty intervals")
        bin_us = max(1, int(row["us"]))
    else:
        bin_us = max(1, int(bin_seconds * 1_000_000))

    # [start, end) half-open: the last covered bin is the one holding end-1us;
    # empty/negative intervals contain no timestamp and would break sequence()
    intervals = intervals.filter(F.col(end_col) > F.col(start_col))
    iv = intervals.withColumn(
        "__rj_bin",
        F.explode(
            F.sequence(
                (_epoch_us(F.col(start_col)) / bin_us).cast("long"),
                ((_epoch_us(F.col(end_col)) - 1) / bin_us).cast("long"),
            )
        ),
    )
    fx = facts.withColumn(
        "__rj_bin", (_epoch_us(F.col(fact_ts)) / bin_us).cast("long")
    )
    cond = (
        (fx[fact_ts] >= iv[start_col])
        & (fx[fact_ts] < iv[end_col])
    )
    joined = fx.join(iv, on=["__rj_bin", *on], how="inner").filter(cond)
    return joined.drop("__rj_bin")
