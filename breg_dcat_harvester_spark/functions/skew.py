"""Explicit skew handling: salted joins and salted aggregations.

AQE's skew-join splitting handles *shuffle-partition*-level skew; these
helpers handle *key*-level skew the optimizer can't fix — a hot canonical
entity or predicate whose single key would serialize one task (north_rule:
"explicit skew handling (AQE + salting on hot predicates)").

* ``salted_join``: fact side gets a random-but-deterministic salt in
  [0, S); the dimension side is exploded xS so every (key, salt) pair
  matches.  Join key becomes (key, salt) — the hot key's rows spread over S
  tasks.  Cost: dimension replicated xS (fine: dimensions are broadcast-or-
  small by definition here).
* ``salted_count``: two-phase aggregation — partial count per (key, salt),
  then final sum per key.  (Spark's hash agg already does partial aggs;
  use this form when the aggregate is *not* algebraic, e.g. collect_set of
  huge hot-key groups.)
* ``hot_keys``: find keys above a frequency threshold — feed a *hybrid*
  plan: salt only the hot keys, plain path for the rest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, key: str, salt_mod: int, salt_col: str = "_salt") -> DataFrame:
    """Deterministic salt derived from the full row hash (not the key — the
    point is to split identical keys)."""
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_mod))
    )


def explode_salt(dim: DataFrame, salt_mod: int, salt_col: str = "_salt") -> DataFrame:
    return dim.withColumn(
        salt_col, F.explode(F.sequence(F.lit(0), F.lit(salt_mod - 1)))
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    salt_mod: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join resilient to hot keys on the fact side."""
    f = with_salt(fact, on, salt_mod)
    d = explode_salt(dim, salt_mod)
    return f.join(d, [on, "_salt"], how).drop("_salt")


def hot_keys(df: DataFrame, key: str, min_count: int) -> DataFrame:
    """Keys whose frequency exceeds min_count (the salting candidates)."""
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
        .select(key, "n")
    )


def salted_collect_set(
    df: DataFrame, key: str, value: str, salt_mod: int = 8
) -> DataFrame:
    """Two-phase collect_set for hot keys: per-(key,salt) partial sets, then
    final distinct-merge — keeps any single task's state bounded."""
    partial = (
        with_salt(df, key, salt_mod)
        .groupBy(key, "_salt")
        .agg(F.collect_set(value).alias("_part"))
    )
    return (
        partial.groupBy(key)
        .agg(F.array_distinct(F.flatten(F.collect_list("_part"))).alias(f"{value}_set"))
    )
