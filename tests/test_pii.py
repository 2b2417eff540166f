"""PII redaction (operators/pii.py): pattern behavior + plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from breg_dcat_harvester_spark.operators.pii import pii_report, redact_pii

CASES = [
    # (text, expected_redacted, n_email, n_card, n_phone, n_ipv4)
    ("mail me at jo.doe+x@sub.example.co.uk now",
     "mail me at <EMAIL> now", 1, 0, 0, 0),
    ("server 192.168.001.1 and 8.8.8.8",
     "server <IP> and <IP>", 0, 0, 0, 2),
    ("call +15551234567 today", "call <PHONE> today", 0, 0, 1, 0),
    ("card 4111-1111-1111-1234 or 4111 1111 1111 1234",
     "card <CC> or <CC>", 0, 2, 0, 0),
    # an "@ip" login is NOT an email by the pattern (TLD must be alphabetic)
    # — the IP pass redacts the address part instead
    ("root@10.0.0.1 logged in", "root@<IP> logged in", 0, 0, 0, 1),
    # no PII: text passes through untouched
    ("plain 12.5 version string v1.2.3", "plain 12.5 version string v1.2.3",
     0, 0, 0, 0),
    # version-ish dotted quad IS matched (documented conservative behavior)
    ("build 1.2.3.4 shipped", "build <IP> shipped", 0, 0, 0, 1),
]


def test_redact_and_counts(spark):
    df = spark.createDataFrame(
        [(i, c[0]) for i, c in enumerate(CASES)], "id long, text string"
    )
    rows = {r.id: r for r in redact_pii(df).collect()}
    for i, (txt, want, ne, nc, np_, ni) in enumerate(CASES):
        r = rows[i]
        assert r.redacted == want, f"case {i}: {r.redacted!r} != {want!r}"
        assert (r.n_email, r.n_card, r.n_phone, r.n_ipv4) == (ne, nc, np_, ni), (
            f"case {i} counts"
        )


def test_pii_report_totals(spark):
    df = spark.createDataFrame(
        [(i, c[0]) for i, c in enumerate(CASES)], "id long, text string"
    )
    rep = {r.kind: (r.n_spans, r.n_docs) for r in pii_report(df).collect()}
    assert rep["email"] == (1, 1)
    assert rep["ipv4"] == (4, 3)
    assert rep["phone"] == (1, 1)
    assert rep["card"] == (2, 1)


def test_redact_is_map_only(spark):
    df = spark.createDataFrame([(1, "a@b.co")], "id long, text string")
    plan = redact_pii(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "BatchEvalPython" not in plan
