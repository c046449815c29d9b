"""Vectorized XXH64 (numpy, exact) — the hash behind Spark's
``xxhash64`` for STRING input (XXH64 of the UTF-8 bytes, seed 42,
result reinterpreted as a signed 64-bit long).

Public-spec implementation (Yann Collet's XXH64, released BSD; the
reference algorithm is also restated in the Spark source's
``XXH64.java``): 4-lane 32-byte stripes, merge, 8/4/1-byte tail,
avalanche. All arithmetic is wrapping uint64, which numpy integer
types provide natively.

The batch entry point hashes ``n`` equal-length byte rows at once —
callers group variable-length inputs by length (each group is one
straight-line vectorized pass; the stripe/tail structure depends only
on the length). Parity with Spark is pinned bit-for-bit by
tests/test_spans.py::test_xxh64_batch_matches_spark across lengths
0..100, all tail shapes, and non-ASCII bytes.
"""

from __future__ import annotations

import numpy as np

_P1 = np.uint64(11400714785074694791)
_P2 = np.uint64(14029467366897019727)
_P3 = np.uint64(1609587929392839161)
_P4 = np.uint64(9650029242287828579)
_P5 = np.uint64(2870177450012600261)


def _rotl(x, r: int):
    r = np.uint64(r)
    return (x << r) | (x >> (np.uint64(64) - r))


def _round(acc, lane):
    return _rotl(acc + lane * _P2, 31) * _P1


def _merge_round(h, acc):
    return (h ^ _round(np.uint64(0), acc)) * _P1 + _P4


def _le_u64(mat, off: int):
    """Little-endian uint64 lanes from byte columns [off, off+8)."""
    out = mat[:, off].astype(np.uint64)
    for b in range(1, 8):
        out |= mat[:, off + b].astype(np.uint64) << np.uint64(8 * b)
    return out


def _le_u32(mat, off: int):
    out = mat[:, off].astype(np.uint64)
    for b in range(1, 4):
        out |= mat[:, off + b].astype(np.uint64) << np.uint64(8 * b)
    return out


def xxh64_fixed(mat: np.ndarray, seed: int = 42) -> np.ndarray:
    """XXH64 of every row of an (n, L) uint8 matrix (one shared length
    L ≥ 0), returned as SIGNED int64 (Spark LongType semantics)."""
    with np.errstate(over="ignore"):
        n, length = mat.shape if mat.ndim == 2 else (mat.shape[0], 0)
        s = np.uint64(seed)
        pos = 0
        if length >= 32:
            acc1 = np.full(n, s + _P1 + _P2, dtype=np.uint64)
            acc2 = np.full(n, s + _P2, dtype=np.uint64)
            acc3 = np.full(n, s, dtype=np.uint64)
            acc4 = np.full(n, s - _P1, dtype=np.uint64)
            while pos + 32 <= length:
                acc1 = _round(acc1, _le_u64(mat, pos))
                acc2 = _round(acc2, _le_u64(mat, pos + 8))
                acc3 = _round(acc3, _le_u64(mat, pos + 16))
                acc4 = _round(acc4, _le_u64(mat, pos + 24))
                pos += 32
            h = _rotl(acc1, 1) + _rotl(acc2, 7) + _rotl(acc3, 12) + _rotl(acc4, 18)
            h = _merge_round(h, acc1)
            h = _merge_round(h, acc2)
            h = _merge_round(h, acc3)
            h = _merge_round(h, acc4)
        else:
            h = np.full(n, s + _P5, dtype=np.uint64)
        h = h + np.uint64(length)
        while pos + 8 <= length:
            h = _rotl(h ^ _round(np.uint64(0), _le_u64(mat, pos)), 27) * _P1 + _P4
            pos += 8
        if pos + 4 <= length:
            h = _rotl(h ^ (_le_u32(mat, pos) * _P1), 23) * _P2 + _P3
            pos += 4
        while pos < length:
            h = _rotl(h ^ (mat[:, pos].astype(np.uint64) * _P5), 11) * _P1
            pos += 1
        h ^= h >> np.uint64(33)
        h *= _P2
        h ^= h >> np.uint64(29)
        h *= _P3
        h ^= h >> np.uint64(32)
        return h.astype(np.int64)


def xxh64_ranges(
    buf: np.ndarray, starts: np.ndarray, lens: np.ndarray, seed: int = 42
) -> np.ndarray:
    """XXH64 of ``n`` byte ranges of a shared uint8 buffer — grouped by
    length so each distinct length is one vectorized ``xxh64_fixed``
    pass. Returns signed int64 aligned with ``starts``."""
    out = np.zeros(len(starts), dtype=np.int64)
    if not len(starts):
        return out
    for length in np.unique(lens):
        idx = np.nonzero(lens == length)[0]
        if length == 0:
            mat = np.zeros((len(idx), 0), dtype=np.uint8)
        else:
            mat = buf[starts[idx][:, None] + np.arange(length)]
        out[idx] = xxh64_fixed(mat, seed)
    return out
