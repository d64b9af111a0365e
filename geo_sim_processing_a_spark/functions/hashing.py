"""Vectorized xxHash64 matching Spark's ``xxhash64()`` expression.

Spark's XxHash64 hashes a BIGINT column as its 8-byte little-endian
value with seed 42 (public Spark source:
sql/catalyst/expressions/hash.scala, XXH64.hashLong).  Reimplemented
here in wrap-around NumPy uint64 arithmetic so Python-side generators
and JVM-side SQL produce identical values — the basis of the
deterministic synthetic pages table (FIXTURES.md §T1) and of salting
(SURVEY.md X11).
"""

from __future__ import annotations

import numpy as np

_P1 = np.uint64(0x9E3779B185EBCA87)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P3 = np.uint64(0x165667B19E3779F9)
_P4 = np.uint64(0x85EBCA77C2B2AE63)
_P5 = np.uint64(0x27D4EB2F165667C5)

_SPARK_SEED = np.uint64(42)


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    r = np.uint64(r)
    return (x << r) | (x >> (np.uint64(64) - r))


def xxhash64_long(values, seed: int | np.uint64 = _SPARK_SEED) -> np.ndarray:
    """XXH64 of int64 values (8-byte little-endian), unsigned result.
    Matches Spark: ``SELECT xxhash64(CAST(v AS BIGINT))`` reinterpreted
    as uint64."""
    with np.errstate(over="ignore"):
        v = np.asarray(values, dtype=np.int64).astype(np.uint64)
        seed = np.uint64(seed)
        h = seed + _P5 + np.uint64(8)
        k1 = v * _P2
        k1 = _rotl(k1, 31)
        k1 = k1 * _P1
        h = h ^ k1
        h = _rotl(h, 27) * _P1 + _P4
        h ^= h >> np.uint64(33)
        h = h * _P2
        h ^= h >> np.uint64(29)
        h = h * _P3
        h ^= h >> np.uint64(32)
        return h


def xxhash64_long_signed(values, seed: int | np.uint64 = _SPARK_SEED) -> np.ndarray:
    """Same, reinterpreted as int64 (Spark's return type)."""
    return xxhash64_long(values, seed).astype(np.int64)


# ---------------------------------------------------------------------------
# splitmix64 — the deterministic PRNG step every synthetic generator
# uses (text word indices, trace deltas, MinHash permutation params,
# LSH hyperplanes).  ONE definition: scalar/batch bit-parity of the
# generators depends on there being no hand-copies to drift.
# ---------------------------------------------------------------------------

_SM_C = np.uint64(0x9E3779B97F4A7C15)
_SM_M1 = np.uint64(0xBF58476D1CE4E5B9)
_SM_M2 = np.uint64(0x94D049BB133111EB)


def splitmix64_next(x: np.ndarray):
    """One splitmix64 step over a uint64 state array: returns
    (advanced state, mixed output)."""
    with np.errstate(over="ignore"):
        x = x + _SM_C
        z = x.copy()
        z = (z ^ (z >> np.uint64(30))) * _SM_M1
        z = (z ^ (z >> np.uint64(27))) * _SM_M2
        z = z ^ (z >> np.uint64(31))
    return x, z


def splitmix64_next_scalar(x: int):
    """Scalar twin of :func:`splitmix64_next` (Python ints, masked to
    64 bits) — bit-identical outputs."""
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    z = x
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return x, z ^ (z >> 31)
