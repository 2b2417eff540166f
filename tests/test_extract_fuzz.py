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
    got_arrow = triple_set(extract_edges(df, impl="arrow"))
    assert got_sql == got_arrow, (
        f"sql-only: {list(got_sql - got_arrow)[:3]} "
        f"arrow-only: {list(got_arrow - got_sql)[:3]}"
    )

    # fused coded-boundary harvest must be row-identical to the general
    # merge over the arrow extract (incl. the JVM-side re-derivation of
    # obj_kind/lang/dtype from (pred_code, obj))
    from breg_dcat_harvester_spark.operators.merge import (
        merge_triples,
        merge_triples_transcripts,
    )

    fused = merge_triples_transcripts(df)
    general = merge_triples(extract_edges(df, impl="arrow"))
    d = fused.exceptAll(general).count() + general.exceptAll(fused).count()
    assert d == 0, f"fused coded harvest diverges from general merge by {d} rows"

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


def test_fuzz_arrow_vs_pandas_batch():
    """Batch-level twin equality INCLUDING lineage columns (the spark-level
    fuzz compares triple identity only).  JVM-free, so this can afford many
    more rows; exercises the multi-block pandas fallback, null text, and
    trailing-newline value semantics the RE2 kernels must reproduce."""
    import pandas as pd

    from breg_dcat_harvester_spark.operators.extract import (
        extract_triples_arrow_batch,
        extract_triples_pandas_batch,
    )

    rng = random.Random(20260818)
    texts = []
    for i in range(3000):
        t = _rand_text(rng)
        if rng.random() < 0.05:
            t = None
        elif rng.random() < 0.1:
            t += "|title=v\n"  # trailing newline inside a non-block tail
        texts.append(t)
    # explicit adversarial rows for the RE2/python-re seams
    texts += [
        "[[Agent|id=a|name=v\n]]x",      # value with ONE trailing newline
        "[[Agent|id=a|name=v\n\n]]x",    # two newlines -> dropped value
        "[[Agent|id=a|name=v\nw]]",      # interior newline -> dropped value
        "[[[Agent|id=a|name=n]]",        # overlapping openers, one match
        "[[Agent|id=a]] [[Dataset|id=d|title=T]] [[Agent|id=_:b|name=N]]",
    ]
    pdf = pd.DataFrame(
        {
            "conv_id": [f"c{i % 13}" for i in range(len(texts))],
            "turn_idx": pd.array(range(len(texts)), dtype="int32"),
            "role": [random.Random(i).choice(["user", "asst", None]) for i in range(len(texts))],
            "tool": [random.Random(i + 1).choice(["search", None]) for i in range(len(texts))],
            "text": texts,
        }
    )
    for ep in (True, False):
        a = extract_triples_pandas_batch(pdf, emit_provenance=ep)
        b = extract_triples_arrow_batch(pdf, emit_provenance=ep)
        key = lambda df: sorted(  # noqa: E731
            map(tuple, df.fillna("«null»").itertuples(index=False))
        )
        assert key(a) == key(b), (
            f"emit_provenance={ep}: pandas {len(a)} rows vs arrow {len(b)}"
        )
        assert str(b["turn_idx"].dtype) == "int32"
    assert len(a) > 500
