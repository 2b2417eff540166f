"""Conversation-level analytics (operators/conversation.py)."""

from __future__ import annotations

from datetime import datetime

from breg_dcat_harvester_spark.operators.conversation import (
    conversation_stats,
    tool_cooccurrence,
)

SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def _t(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_tool_cooccurrence_pairs_and_counts(spark):
    ts = datetime(2026, 1, 1)
    rows = [
        # c1 uses search twice (distinct-collapsed) + calc
        ("c1", 0, "user", "hi", None, ts),
        ("c1", 1, "assistant", "x", "search", ts),
        ("c1", 2, "assistant", "y", "search", ts),
        ("c1", 3, "assistant", "z", "calc", ts),
        # c2 uses calc + search + web -> 3 pairs
        ("c2", 0, "assistant", "a", "calc", ts),
        ("c2", 1, "assistant", "b", "web", ts),
        ("c2", 2, "assistant", "c", "search", ts),
        # c3 single tool -> no pair
        ("c3", 0, "assistant", "d", "web", ts),
    ]
    got = {
        (r.tool_a, r.tool_b): r.n_convs
        for r in tool_cooccurrence(_t(spark, rows)).collect()
    }
    assert got == {
        ("calc", "search"): 2,
        ("calc", "web"): 1,
        ("search", "web"): 1,
    }


def test_tool_cooccurrence_no_tools_is_empty(spark):
    ts = datetime(2026, 1, 1)
    rows = [("c1", 0, "user", "hi", None, ts)]
    assert tool_cooccurrence(_t(spark, rows)).count() == 0


def test_conversation_stats_role_changes_and_tools(spark):
    rows = [
        ("c1", 0, "user", "hi", None, datetime(2026, 1, 1, 0, 0, 0)),
        ("c1", 1, "assistant", "yo", "search", datetime(2026, 1, 1, 0, 0, 30)),
        ("c1", 2, "assistant", "ok", None, datetime(2026, 1, 1, 0, 1, 0)),
    ]
    r = conversation_stats(_t(spark, rows)).collect()[0]
    assert (r.n_turns, r.n_roles, r.n_role_changes, r.n_tool_turns) == (3, 2, 1, 1)
    assert r.span_seconds == 60


def test_sft_pairs_context_and_filtering(spark):
    import datetime as dt

    from breg_dcat_harvester_spark.operators.conversation import sft_pairs

    ts = dt.datetime(2024, 1, 1)
    rows = [
        # conv A: assistant at 0 (no context -> dropped), tool-tagged turn,
        # empty assistant completion (dropped), normal pair
        ("a", 0, "assistant", "cold open", None, ts),
        ("a", 1, "user", "hi there", None, ts),
        ("a", 2, "tool", "lookup result", "search", ts),
        ("a", 3, "assistant", "", None, ts),
        ("a", 4, "assistant", "answer", None, ts),
        # conv B: long history, context capped at 2
        *[("b", i, "user", f"u{i}", None, ts) for i in range(5)],
        ("b", 5, "assistant", "final", None, ts),
    ]
    t = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    got = {(r.conv_id, r.turn_idx): r for r in sft_pairs(t, context_turns=2).collect()}

    # turn a0: no preceding turns -> excluded; a3: empty completion -> excluded
    assert ("a", 0) not in got and ("a", 3) not in got
    pa = got[("a", 4)]
    # context = turns 2 and 3 (last 2 preceding), tool turn tagged
    assert pa.prompt == "tool[search]: lookup result\nassistant: "
    assert pa.completion == "answer" and pa.n_context_turns == 2
    pb = got[("b", 5)]
    assert pb.prompt == "user: u3\nuser: u4"
    assert len(got) == 2


def test_conversation_dedup_order_sensitive(spark):
    import datetime as dt

    from breg_dcat_harvester_spark.operators.conversation import (
        conversation_dup_groups,
        conversation_fingerprints,
    )

    ts = dt.datetime(2024, 1, 1)
    rows = [
        ("a", 0, "user", "hi", None, ts),
        ("a", 1, "assistant", "hello", None, ts),
        # b: byte-identical copy of a
        ("b", 0, "user", "hi", None, ts),
        ("b", 1, "assistant", "hello", None, ts),
        # c: same turns, REORDERED -> different fingerprint
        ("c", 0, "assistant", "hello", None, ts),
        ("c", 1, "user", "hi", None, ts),
        # d: same order, role flipped on one turn -> different
        ("d", 0, "user", "hi", None, ts),
        ("d", 1, "user", "hello", None, ts),
    ]
    t = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    fps = {r.conv_id: r.fp for r in conversation_fingerprints(t).collect()}
    assert fps["a"] == fps["b"]
    assert len({fps["a"], fps["c"], fps["d"]}) == 3

    groups = conversation_dup_groups(t).collect()
    assert len(groups) == 1
    g = groups[0]
    assert (g.n_convs, g.canonical_conv_id, g.sample_ids) == (2, "a", "a,b")
