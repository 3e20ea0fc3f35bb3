"""Split-block bloom filter (parquet SBBF) — vectorized.

Structure follows the parquet-format spec and the reference
implementation exactly (/root/reference/src/bloom_filter/split_block.rs:4-24:
8 salt constants, 32-byte blocks of 8×u32 lanes, one bit per lane,
block index = ((hash >> 32) * num_blocks) >> 32).  The element hash is
pandas' vectorized 64-bit siphash (``functions.hashing.hash_strings``)
rather than the reference's xxh64
(/root/reference/src/bloom_filter/hash.rs:8-17) — xxh64 is not available
in this environment and the hash only matters for cross-engine file
interop, which our container does not target; the filter is
self-consistent (built and probed by this module).

Used as the per-partition membership sketch recorded in the lineage
manifest (SURVEY.md A6) and probed by the manifest-pruning reader
(SURVEY.md T1 "PageFilter" analog).
"""

from __future__ import annotations

import numpy as np

__all__ = ["build", "might_contain", "num_blocks_for", "hash_values"]

# magic numbers from the parquet-format BloomFilter spec
# (/root/reference/src/bloom_filter/split_block.rs:4-7)
_SALT = np.array(
    [
        1203114875, 1150766481, 2284105051, 2729912477,
        1884591559, 770785867, 2667333959, 1550580529,
    ],
    dtype=np.uint32,
)

_BLOCK_BYTES = 32  # 8 lanes × u32


def hash_values(values) -> np.ndarray:
    """uint64 element hashes (vectorized).

    Keys are canonicalized EXPLICITLY to their ``str()`` form before
    hashing — the persisted sketch format must not depend on pandas
    ``hash_array``'s undocumented object-dtype fallback for non-string
    keys (int sort keys, timestamps): if that fallback changed, probes
    against old manifests would silently false-prune partitions."""
    import pandas as pd

    from .hashing import hash_strings

    s = pd.Series(np.asarray(values, dtype=object), dtype=object)
    canon = s.astype(str)  # identity for str keys, explicit for the rest
    return hash_strings(canon.to_numpy(dtype=object))


def num_blocks_for(ndv: int, bits_per_value: int = 10) -> int:
    """Blocks needed for ~1% FPP at the default 10 bits/value."""
    return max(1, (ndv * bits_per_value + _BLOCK_BYTES * 8 - 1) // (_BLOCK_BYTES * 8))


def _block_index(hashes: np.ndarray, num_blocks: int) -> np.ndarray:
    # ((hash >> 32) * num_blocks) >> 32, in uint64 wraparound
    # (/root/reference/src/bloom_filter/split_block.rs:9-14)
    return (((hashes >> np.uint64(32)) * np.uint64(num_blocks)) >> np.uint64(32)).astype(
        np.int64
    )


def _masks(hashes: np.ndarray) -> np.ndarray:
    """(n, 8) uint32 lane masks: one bit per lane from the low 32 hash bits
    (/root/reference/src/bloom_filter/split_block.rs:16-24)."""
    key = hashes.astype(np.uint32)
    mul = key[:, None] * _SALT[None, :]  # uint32 wraparound
    return (np.uint32(1) << (mul >> np.uint32(27))).astype(np.uint32)


def build(hashes: np.ndarray, num_blocks: int) -> bytes:
    """Build an SBBF bitset (num_blocks × 32 bytes) from element hashes."""
    h = np.asarray(hashes, dtype=np.uint64)
    bitset = np.zeros((num_blocks, 8), dtype=np.uint32)
    if h.size:
        idx = _block_index(h, num_blocks)
        m = _masks(h)
        np.bitwise_or.at(bitset, idx, m)
    return bitset.astype("<u4").tobytes()


def might_contain(bitset: bytes, hashes: np.ndarray) -> np.ndarray:
    """Vectorized membership probe → bool array (False ⇒ definitely absent)."""
    h = np.asarray(hashes, dtype=np.uint64)
    if h.size == 0:
        return np.zeros(0, dtype=bool)
    blocks = np.frombuffer(bitset, dtype="<u4").reshape(-1, 8)
    idx = _block_index(h, blocks.shape[0])
    m = _masks(h)
    loaded = blocks[idx]
    return ((loaded & m) == m).all(axis=1)
