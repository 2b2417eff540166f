"""Local replica of the driver's correctness gate: run every queries()
entry on Spark AND its oracle_sql() in DuckDB at sf0.01, compare row count,
column names, and sorted-value hash.  Usage:

    python scripts/check_contract.py [query ...]   # default: all
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _norm(v):
    if isinstance(v, float):
        return round(v, 6)
    if isinstance(v, bool):
        return bool(v)
    return v


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    mat = sorted(tuple(repr(_norm(r[i])) for i in order) for r in rows)
    h = hashlib.sha256()
    for row in mat:
        h.update("\x1f".join(row).encode())
        h.update(b"\x1e")
    return h.hexdigest()[:16]


def main() -> int:
    import __spark_entry__ as entry
    from breg_dcat_harvester_spark.session import get_spark

    spark = get_spark(master="local[8]", app_name="contract-check",
                      shuffle_partitions="8")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    queries = entry.queries()
    oracles = entry.oracle_sql()
    only = set(sys.argv[1:])
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            print(f"{name:32s} SPARK-ERROR {ex}")
            failures.append(name)
            continue
        osql = oracles.get(name)
        if osql is None:
            print(f"{name:32s} rows={len(srows):7d}  (no oracle)  "
                  f"{time.time()-t0:5.1f}s")
            continue
        try:
            cur = con.execute(osql)
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as ex:
            print(f"{name:32s} ORACLE-ERROR {ex}")
            failures.append(name)
            continue
        ok_rows = len(srows) == len(orows)
        ok_cols = sorted(scols) == sorted(ocols)
        ok_hash = ok_cols and value_hash(scols, srows) == value_hash(ocols, orows)
        status = "OK " if (ok_rows and ok_cols and ok_hash) else "FAIL"
        print(f"{name:32s} {status} rows={len(srows)}/{len(orows)} "
              f"cols={'=' if ok_cols else sorted(scols)!r:>{1}} "
              f"hash={'=' if ok_hash else '!'}  {time.time()-t0:5.1f}s")
        if status == "FAIL":
            failures.append(name)
            if not ok_cols:
                print(f"    spark cols:  {sorted(scols)}")
                print(f"    oracle cols: {sorted(ocols)}")
            elif not ok_hash and len(srows) < 4000:
                s_set = {tuple(map(_norm, r)) for r in
                         [tuple(r[i] for i in sorted(range(len(scols)), key=lambda i: scols[i])) for r in srows]}
                o_set = {tuple(map(_norm, r)) for r in
                         [tuple(r[i] for i in sorted(range(len(ocols)), key=lambda i: ocols[i])) for r in orows]}
                for d in list(s_set - o_set)[:3]:
                    print(f"    spark-only:  {d}")
                for d in list(o_set - s_set)[:3]:
                    print(f"    oracle-only: {d}")
    spark.stop()
    print("FAILURES:", failures or "none")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
