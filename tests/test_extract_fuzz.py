"""Seeded fuzz: adversarial random transcripts through all three extraction
implementations (Catalyst SQL, pandas/Arrow, pure-Python oracle).

The deterministic datagen corpus is well-formed by construction; this test
hammers the grammar's edge cases — malformed blocks, empty ids, unknown
tags, unicode, pipes/equals in values, blank-node ids, missing role/tool —
and asserts exact triple-set equality across implementations (the property
the driver's P/R gate measures on nice inputs must also hold on nasty ones).
"""

import datetime as dt
import random

from pyspark.sql import functions as F

from breg_dcat_harvester_spark.operators.extract import extract_edges
from breg_dcat_harvester_spark.schema import TRANSCRIPTS

from . import oracle

TAGS = ["Catalog", "Dataset", "Agent", "Distribution", "nonsense", ""]
KEYS = ["id", "title", "description", "name", "theme", "bogus", ""]
VALUES = [
    "plain",
    "",
    "#frag",
    "http://x.org/a",
    "urn:y:z",
    "with space",
    "unié中文",
    "tr]icky",
    "a=b",
    "_:b0",
]


def _rand_text(rng: random.Random) -> str:
    parts = []
    for _ in range(rng.randint(0, 4)):
        kind = rng.random()
        if kind < 0.15:
            parts.append("noise [[broken")  # unterminated
        elif kind < 0.25:
            parts.append("]] stray close")
        else:
            tag = rng.choice(TAGS)
            fields = [tag]
            if rng.random() < 0.9:
                fields.append(f"id={rng.choice(['e1', 'e2', '_:b0', ''])}")
            for _ in range(rng.randint(0, 3)):
                fields.append(f"{rng.choice(KEYS)}={rng.choice(VALUES)}")
            if rng.random() < 0.1:
                fields.append("keyonly")  # kv without '='
            parts.append("[[" + "|".join(fields) + "]]")
        parts.append(rng.choice(["text", "", "你好", "[ ] | = "]))
    return " ".join(parts)


def test_fuzz_three_way_equality(spark):
    rng = random.Random(20260816)
    t0 = dt.datetime(2026, 1, 1)
    rows = [
        (
            f"c{i % 17}",
            i,
            rng.choice(["user", "assistant", None]),
            _rand_text(rng),
            rng.choice(["search", None]),
            t0 + dt.timedelta(seconds=i),
        )
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, TRANSCRIPTS)

    def triple_set(edges_df):
        return {
            (r.subj, r.pred, r.obj, r.obj_kind, r.lang, r.dtype)
            for r in edges_df.select(
                "subj", "pred", "obj", "obj_kind", "lang", "dtype"
            ).collect()
        }

    got_sql = triple_set(extract_edges(df, impl="sql"))
    got_pandas = triple_set(extract_edges(df, impl="pandas"))
    assert got_sql == got_pandas, (
        f"sql-only: {list(got_sql - got_pandas)[:3]} "
        f"pandas-only: {list(got_pandas - got_sql)[:3]}"
    )

    expected = set()
    for conv_id, turn_idx, role, text, tool, _ts in rows:
        for t in oracle.extract_row(conv_id, turn_idx, role, text, tool):
            expected.add(t)
    got_spo = {(s, p, o) for s, p, o, *_ in got_sql}
    assert got_spo == expected, (
        f"spark-only: {list(got_spo - expected)[:3]} "
        f"oracle-only: {list(expected - got_spo)[:3]}"
    )
    assert len(expected) > 100, "fuzz corpus should produce a real triple set"
