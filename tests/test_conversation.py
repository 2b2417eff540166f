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
