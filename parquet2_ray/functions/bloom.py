"""Split-block bloom filter (parquet SBBF) — vectorized.

Structure follows the parquet-format spec and the reference
implementation exactly (/root/reference/src/bloom_filter/split_block.rs:4-24:
8 salt constants, 32-byte blocks of 8×u32 lanes, one bit per lane,
block index = ((hash >> 32) * num_blocks) >> 32).  The element hash is
the spec-mandated XXH64(seed=0) over the value's PLAIN encoding,
matching the reference (/root/reference/src/bloom_filter/hash.rs:8-17)
bit-for-bit via the from-scratch vectorized implementation in
``functions.xxh`` — so the persisted sketches are interoperable with
any engine following the parquet bloom spec.  Canonical PLAIN bytes
per arrow type: 8/16/32-bit ints and date32 → 4-byte LE (parquet's
int32 physical), 64-bit ints and timestamps → 8-byte LE, float32 →
4-byte LE, float64 → 8-byte LE, string/binary → raw bytes,
fixed_size_binary → raw slot bytes.

Used as the per-partition membership sketch recorded in the lineage
manifest (SURVEY.md A6) and probed by the manifest-pruning reader
(SURVEY.md T1 "PageFilter" analog).
"""

from __future__ import annotations

import numpy as np

__all__ = ["build", "might_contain", "num_blocks_for", "hash_values", "hash_arrow"]

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


def hash_arrow(arr) -> np.ndarray:
    """Spec xxh64 element hashes of an arrow array (nulls dropped).

    The canonical byte form is the value's parquet PLAIN encoding (see
    module docstring) — EXPLICIT per type, so the persisted sketch
    format depends only on the spec, never on library internals
    (round-1 advisor note): a probe against an old manifest can never
    silently false-prune because a hash fallback changed."""
    import pyarrow as pa

    from .xxh import xxh64_bytes

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    arr = arr.drop_null()
    t = arr.type
    if pa.types.is_integer(t) or pa.types.is_date32(t):
        if t.bit_width <= 32:
            v = arr.cast(pa.int32(), safe=False).to_numpy(zero_copy_only=False)
            w = 4
        else:
            v = arr.cast(pa.int64(), safe=False).to_numpy(zero_copy_only=False)
            w = 8
        data = np.ascontiguousarray(v).view(np.uint8)
    elif pa.types.is_temporal(t):
        v = arr.cast(pa.int64(), safe=False).to_numpy(zero_copy_only=False)
        w = 8
        data = np.ascontiguousarray(v).view(np.uint8)
    elif pa.types.is_floating(t):
        v = arr.to_numpy(zero_copy_only=False)
        w = v.dtype.itemsize
        data = np.ascontiguousarray(v).view(np.uint8)
    elif pa.types.is_boolean(t):
        # canonical form: one byte per value, 0x00/0x01 (PLAIN-adjacent;
        # arrow's bitmap layout would make hashes offset-dependent)
        v = arr.cast(pa.uint8(), safe=False).to_numpy(zero_copy_only=False)
        w = 1
        data = np.ascontiguousarray(v)
    elif pa.types.is_decimal128(t):
        # canonical form: the 16-byte little-endian two's-complement
        # slots (the arrow buffer layout, stable across probe/writer
        # since both sides build the same decimal128 array type)
        w = 16
        bufs = arr.buffers()
        data = (np.frombuffer(bufs[1], dtype=np.uint8)
                [arr.offset * w : (arr.offset + len(arr)) * w]
                if bufs[1] is not None else np.empty(0, np.uint8))
    elif pa.types.is_fixed_size_binary(t):
        w = t.byte_width
        bufs = arr.buffers()
        data = (np.frombuffer(bufs[1], dtype=np.uint8)
                [arr.offset * w : (arr.offset + len(arr)) * w]
                if bufs[1] is not None else np.empty(0, np.uint8))
    else:  # string / binary
        ba = arr.cast(pa.large_binary())
        bufs = ba.buffers()
        offs = np.frombuffer(bufs[1], dtype=np.int64)[ba.offset : ba.offset + len(ba) + 1]
        data = (np.frombuffer(bufs[2], dtype=np.uint8)[offs[0] : offs[-1]]
                if bufs[2] is not None else np.empty(0, np.uint8))
        return xxh64_bytes(offs - offs[0], data)
    offsets = np.arange(len(arr) + 1, dtype=np.int64) * w
    return xxh64_bytes(offsets, data)


def hash_values(values, type_str: str | None = None) -> np.ndarray:
    """uint64 hashes of python values; ``type_str`` (the manifest's
    recorded ``bloom_type``) pins the arrow type so probe-side
    canonicalization matches the writer exactly."""
    import pyarrow as pa

    if type_str is not None:
        from ..codecs.column import str_to_type

        arr = pa.array(list(values), type=str_to_type(type_str))
    else:
        arr = pa.array(list(values))
    return hash_arrow(arr)


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
