"""Reference (pure-Python) xxHash64 — ORACLE TOOLING ONLY.

The engine's SimHash (operators/dedup.py) keys on Spark's ``xxhash64``
expression, which no SQL oracle engine reproduces.  This module implements
the public xxHash64 algorithm (Yann Collet's spec, public domain) so the
correctness harness can compute the expected SimHash pairs INDEPENDENTLY of
Spark (scripts/make_oracles.py writes them to a parquet fixture the DuckDB
oracle reads).  Parity with Spark's expression is itself pytest-gated
(tests/test_training_ops.py::test_xxhash64_ref_matches_spark).

Never used on an execution path — the engine hashes JVM-side.
"""

from __future__ import annotations

_MASK = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _MASK
    return (_rotl(acc, 31) * _P1) & _MASK


def _merge(h: int, v: int) -> int:
    h ^= _round(0, v)
    return (h * _P1 + _P4) & _MASK


def xxhash64(data: bytes, seed: int = 42) -> int:
    """xxHash64 of ``data`` as a SIGNED 64-bit int.

    Defaults to seed 42 — the seed Spark's ``xxhash64`` expression uses —
    so ``xxhash64(s.encode())`` equals ``F.xxhash64(F.lit(s))``.
    """
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _MASK
        v2 = (seed + _P2) & _MASK
        v3 = seed & _MASK
        v4 = (seed - _P1) & _MASK
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _MASK
        h = _merge(h, v1)
        h = _merge(h, v2)
        h = _merge(h, v3)
        h = _merge(h, v4)
    else:
        h = (seed + _P5) & _MASK
    h = (h + n) & _MASK
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _MASK
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _MASK
        h = (_rotl(h, 23) * _P2 + _P3) & _MASK
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _MASK
        h = (_rotl(h, 11) * _P1) & _MASK
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _MASK
    h ^= h >> 29
    h = (h * _P3) & _MASK
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


def simhash64_ref(text: str) -> int:
    """Pure-Python replay of operators/dedup.py::simhash64 for ONE document:
    whitespace-split lowercased tokens (every occurrence votes), per-bit
    majority over xxhash64(token), two's-complement sign bit."""
    import re

    votes = [0] * 64
    for tok in re.split(r"\s+", text.lower()):
        if tok == "":
            continue
        h = xxhash64(tok.encode("utf-8")) & _MASK
        for b in range(64):
            votes[b] += 1 if (h >> b) & 1 else -1
    sim = 0
    for b in range(64):
        if votes[b] > 0:
            sim += -(2**63) if b == 63 else 2**b
    return sim
