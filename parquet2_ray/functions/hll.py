"""HyperLogLog distinct-count sketch (vectorized, mergeable).

The scale path behind ``stages/window.distinct_count``: the exact
operator ships every distinct (group, value) pair through the
exchange, which at 100 TB can itself be huge; an HLL register bank is
a fixed ``2^p`` bytes per group regardless of cardinality, and merges
by elementwise max — the classic mergeable-sketch contract (same
partial→final shape as the reference's statistics reduce,
/root/reference/src/write/statistics.rs:28-79, where non-mergeable
distinct_count is DROPPED — this sketch is what makes it mergeable).

Element hashing reuses the repo's spec XXH64 over parquet PLAIN bytes
(``functions/bloom.hash_arrow``) — 64-bit hashes, so the classic
32-bit large-range correction is unnecessary (Heule et al., HLL++);
linear counting covers the small range.

Standard error ≈ 1.04 / sqrt(2^p): p=12 → ~1.6%.
"""

from __future__ import annotations

import numpy as np

__all__ = ["hll_init", "hll_add", "hll_merge", "hll_estimate", "hll_of"]


def hll_init(p: int = 12) -> np.ndarray:
    return np.zeros(1 << p, dtype=np.uint8)


def _floor_log2(x: np.ndarray) -> np.ndarray:
    """floor(log2(x)) for uint64 x>0, exact (no float round-trip)."""
    n = np.zeros(x.shape, dtype=np.int64)
    y = x.copy()
    for s in (32, 16, 8, 4, 2, 1):
        big = y >= (np.uint64(1) << np.uint64(s))
        n[big] += s
        y[big] >>= np.uint64(s)
    return n


def hll_add(reg: np.ndarray, hashes: np.ndarray) -> np.ndarray:
    """Fold element hashes (uint64) into the register bank in place."""
    p = int(np.log2(len(reg)))
    idx = (hashes >> np.uint64(64 - p)).astype(np.int64)
    w = hashes << np.uint64(p)          # remaining 64-p bits, MSB-first
    rank = np.where(w == 0, 64 - p + 1,
                    (63 - _floor_log2(np.maximum(w, 1))) + 1)
    np.maximum.at(reg, idx, rank.astype(np.uint8))
    return reg


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def hll_estimate(reg: np.ndarray) -> float:
    m = len(reg)
    alpha = 0.7213 / (1 + 1.079 / m)    # published constant for m >= 128
    est = alpha * m * m / np.sum(np.ldexp(1.0, -reg.astype(np.int64)))
    zeros = int(np.count_nonzero(reg == 0))
    if est <= 2.5 * m and zeros:
        return m * np.log(m / zeros)    # linear counting, small range
    return float(est)


def hll_of(arr, p: int = 12) -> np.ndarray:
    """Register bank of one arrow array's elements (nulls dropped)."""
    from .bloom import hash_arrow

    return hll_add(hll_init(p), hash_arrow(arr))
