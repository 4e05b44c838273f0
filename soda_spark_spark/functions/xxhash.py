"""Vectorized xxHash64 matching Spark's `F.xxhash64`.

Pure-numpy implementation of the public XXH64 algorithm (Yann Collet,
https://github.com/Cyan4973/xxHash — BSD-2) producing bit-exact results
against Spark's JVM port (`catalyst/expressions/XXH64.java`), so an
Arrow-batched Python kernel can compute the SAME hash values as a Catalyst
`F.xxhash64(col, F.lit(seed))` expression. That parity is what lets the
winnowing sketch default to the fast `mapInPandas` path while remaining
interchangeable with (and testable against) the pure-Catalyst formulation.

Vectorization strategy: variable-length inputs are grouped by byte length;
each group becomes an (n, L) uint8 matrix processed with whole-array uint64
arithmetic (numpy wraps unsigned overflow silently for arrays). The only
per-item Python work is UTF-8 encoding and the single `b"".join`.

Semantics replicated exactly:
- `xxh64_utf8(strings, seed)` == XXH64.hashUnsafeBytes(utf8(s), seed)
- `spark_xxhash64_strings(strings, seed)` == F.xxhash64(s, F.lit(seed)):
  Spark chains multi-arg hashes with the function's fixed seed 42 — the
  string hashes first with seed 42, then the integer literal hashes with the
  string's hash as seed (`hashInt` for int32-range literals, `hashLong`
  above).
"""

from __future__ import annotations

import numpy as np

_M64 = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5

_uP1 = np.uint64(_P1)
_uP2 = np.uint64(_P2)
_uP3 = np.uint64(_P3)
_uP4 = np.uint64(_P4)
_uP5 = np.uint64(_P5)

SPARK_FUNCTION_SEED = 42  # XxHash64 expression's fixed seed


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    r = np.uint64(r)
    return (x << r) | (x >> (np.uint64(64) - r))


def _fmix(h: np.ndarray) -> np.ndarray:
    h = h ^ (h >> np.uint64(33))
    h = h * _uP2
    h = h ^ (h >> np.uint64(29))
    h = h * _uP3
    h = h ^ (h >> np.uint64(32))
    return h


def _words(mat: np.ndarray, off: int, nbytes: int) -> np.ndarray:
    """Little-endian unsigned words of width `nbytes` at column `off`."""
    dt = "<u8" if nbytes == 8 else "<u4"
    w = np.ascontiguousarray(mat[:, off : off + nbytes]).view(dt)[:, 0]
    return w if nbytes == 8 else w.astype(np.uint64)


def _xxh64_same_len(mat: np.ndarray, seed: int) -> np.ndarray:
    """XXH64 of n equal-length byte rows. mat: (n, L) uint8."""
    n, L = mat.shape
    off = 0
    if L >= 32:
        v1 = np.full(n, np.uint64((seed + _P1 + _P2) & _M64), np.uint64)
        v2 = np.full(n, np.uint64((seed + _P2) & _M64), np.uint64)
        v3 = np.full(n, np.uint64(seed & _M64), np.uint64)
        v4 = np.full(n, np.uint64((seed - _P1) & _M64), np.uint64)
        while off + 32 <= L:
            v1 = _rotl(v1 + _words(mat, off, 8) * _uP2, 31) * _uP1
            v2 = _rotl(v2 + _words(mat, off + 8, 8) * _uP2, 31) * _uP1
            v3 = _rotl(v3 + _words(mat, off + 16, 8) * _uP2, 31) * _uP1
            v4 = _rotl(v4 + _words(mat, off + 24, 8) * _uP2, 31) * _uP1
            off += 32
        h = _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        for v in (v1, v2, v3, v4):
            h = (h ^ (_rotl(v * _uP2, 31) * _uP1)) * _uP1 + _uP4
    else:
        h = np.full(n, np.uint64((seed + _P5) & _M64), np.uint64)
    h = h + np.uint64(L)
    while off + 8 <= L:
        h = h ^ (_rotl(_words(mat, off, 8) * _uP2, 31) * _uP1)
        h = _rotl(h, 27) * _uP1 + _uP4
        off += 8
    if off + 4 <= L:
        h = h ^ (_words(mat, off, 4) * _uP1)
        h = _rotl(h, 23) * _uP2 + _uP3
        off += 4
    while off < L:
        h = h ^ (mat[:, off].astype(np.uint64) * _uP5)
        h = _rotl(h, 11) * _uP1
        off += 1
    return _fmix(h)


def xxh64_bytes(items: list[bytes], seed: int) -> np.ndarray:
    """XXH64 of each byte string; returns uint64 array. Items are grouped by
    length so each group is hashed with whole-array ops."""
    n = len(items)
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out
    lens = np.fromiter((len(s) for s in items), np.int64, count=n)
    buf = np.frombuffer(b"".join(items), dtype=np.uint8)
    starts = np.zeros(n, np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    for length in np.unique(lens):
        idx = np.nonzero(lens == length)[0]
        gathered = (
            np.empty((len(idx), 0), np.uint8)
            if length == 0
            else buf[starts[idx][:, None] + np.arange(length)[None, :]]
        )
        out[idx] = _xxh64_same_len(gathered, seed)
    return out


def _hash_int_tail(values: np.ndarray, literal: int) -> np.ndarray:
    """XXH64.hashInt(literal, seed=values) — Spark's per-argument chain step
    for an int32-range literal."""
    h = values + np.uint64((_P5 + 4) & _M64)
    h = h ^ np.uint64(((literal & 0xFFFFFFFF) * _P1) & _M64)
    h = _rotl(h, 23) * _uP2 + _uP3
    return _fmix(h)


def _hash_long_tail(values: np.ndarray, literal: int) -> np.ndarray:
    """XXH64.hashLong(literal, seed=values) — for a 64-bit literal."""
    h = values + np.uint64((_P5 + 8) & _M64)
    k = ((literal & _M64) * _P2) & _M64
    k = ((k << 31) | (k >> 33)) & _M64
    h = h ^ np.uint64((k * _P1) & _M64)
    h = _rotl(h, 27) * _uP1 + _uP4
    return _fmix(h)


def spark_xxhash64_strings(strings: list[str], seed: int) -> np.ndarray:
    """Bit-exact replica of `F.xxhash64(text_col, F.lit(seed))` over UTF-8
    strings; returns SIGNED int64 values (Spark's LongType). `F.lit(seed)`
    is IntegerType for int32-range seeds, LongType above — Spark hashes the
    literal after the string with the matching primitive routine."""
    h = xxh64_bytes([s.encode("utf-8") for s in strings], SPARK_FUNCTION_SEED)
    if -(1 << 31) <= seed < (1 << 31):
        h = _hash_int_tail(h, seed)
    else:
        h = _hash_long_tail(h, seed)
    return h.view(np.int64)
