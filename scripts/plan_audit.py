"""Physical-plan audit for the headline queries.

For every ``queries()`` entry, render ``explain('formatted')`` and summarize
the scale-relevant evidence: number of shuffles (Exchange), join strategies
(broadcast vs sort-merge), parquet scan pushdown (PushedFilters/ReadSchema),
and whole-stage-codegen coverage.  Output feeds PLANS.md.

Usage: python scripts/plan_audit.py [name ...]  (default: all)
"""

from __future__ import annotations

import io
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from breg_dcat_harvester_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"


def plan_text(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def summarize(name: str, text: str, simple: str) -> str:
    # count only the numbered detail nodes — the tree header repeats them
    ops = re.findall(r"^\(\d+\) (\w[\w ]*?)\s*(?:\[codegen id : \d+\])?\s*$",
                     text, re.MULTILINE)
    def n(op):
        return sum(1 for o in ops if o == op)

    n_py = (n("ArrowEvalPython") + n("MapInPandas") + n("MapInArrow")
            + n("FlatMapGroupsInPandas"))
    codegen_spans = len(set(re.findall(r"\*\((\d+)\)", simple)))
    partial_agg = "partial_" in text
    pushed = sorted(set(re.findall(r"PushedFilters: \[[^\]]*\]", text)))[:4]
    schemas = sorted(set(re.findall(r"ReadSchema: [^\n]*", text)))[:4]
    lines = [
        f"### {name}",
        f"- exchanges={n('Exchange')} broadcastHashJoin={n('BroadcastHashJoin')} "
        f"sortMergeJoin={n('SortMergeJoin')} shuffledHashJoin={n('ShuffledHashJoin')} "
        f"codegenSpans={codegen_spans} parquetScans={n('Scan parquet')} "
        f"arrowPythonOps={n_py} perRowPythonOps={n('BatchEvalPython')} "
        f"mapSidePartialAgg={str(partial_agg).lower()}",
    ]
    for p in pushed:
        lines.append(f"- {p}")
    for s in schemas:
        lines.append(f"- {s}")
    return "\n".join(lines) + "\n"


def main() -> None:
    names = sys.argv[1:]
    spark = get_spark(app_name="plan-audit")
    queries = entrymod.queries()
    if not names:
        names = list(queries)
    for name in names:
        df = queries[name](spark, SF_DIR)
        print(summarize(name, plan_text(df), plan_text(df, "simple")))
    spark.stop()


if __name__ == "__main__":
    main()
