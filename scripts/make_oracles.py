"""Build ENGINE-INDEPENDENT oracle fixtures for queries DuckDB cannot
express directly (scripts are rerunnable; fixtures live in data/oracles/).

* dedup_simhash_<sf>.parquet — expected SimHash near-dup pairs, computed by
  a pure-Python replay (functions/hashing_ref.py) of the public xxHash64 +
  SimHash definitions over the driver's documents table, brute-forcing ALL
  pairs (no blocking): the Spark operator's pigeonhole blocking is lossless
  by construction, so its output must equal this set exactly.  The only
  shared ingredient with the engine is the public xxHash64 spec; parity of
  the two implementations is itself pytest-gated.

Run:  python scripts/make_oracles.py [sf0.01 sf0.001 ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from breg_dcat_harvester_spark.functions.hashing_ref import simhash64_ref  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_DIR = os.path.join(REPO, "data", "oracles")
MAX_HAMMING = 3


def simhash_pairs_ref(sf: str) -> None:
    src = f"/root/testdata/{sf}/documents.parquet"
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{src}') ORDER BY doc_id"
    ).fetchall()
    sims = [(doc_id, simhash64_ref(text)) for doc_id, text in docs]
    pairs = []
    for i in range(len(sims)):
        a, ha = sims[i]
        for j in range(i + 1, len(sims)):
            b, hb = sims[j]
            d = bin((ha ^ hb) & ((1 << 64) - 1)).count("1")
            if d <= MAX_HAMMING:
                pairs.append((a, b, d))
    os.makedirs(OUT_DIR, exist_ok=True)
    out = os.path.join(OUT_DIR, f"dedup_simhash_{sf}.parquet")
    con.execute("CREATE TABLE p (a BIGINT, b BIGINT, hamming BIGINT)")
    con.executemany("INSERT INTO p VALUES (?, ?, ?)", pairs)
    con.execute(f"COPY p TO '{out}' (FORMAT PARQUET)")
    con.execute("DROP TABLE p")
    print(f"{sf}: {len(docs)} docs -> {len(pairs)} simhash pairs -> {out}")


if __name__ == "__main__":
    for sf in sys.argv[1:] or ["sf0.001", "sf0.01"]:
        simhash_pairs_ref(sf)
