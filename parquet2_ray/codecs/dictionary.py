"""Dictionary encoding (RLE_DICTIONARY-style).

Mirrors the parquet layout the reference decodes
(/root/reference/src/deserialize/utils.rs:13-27): the index stream is
``[bit_width u8][hybrid-RLE indices]`` with ``bit_width ≤ 32``; the
dictionary itself holds PLAIN values
(/root/reference/src/parquet_bridge.rs:301-305 — dict pages are
PLAIN-encoded).

Wire format (self-framing, one buffer):

    uleb(kind)            # 0 = int64 values, 1 = byte-array values
    uleb(dict_len_bytes)  # size of the dictionary payload
    dict payload          # kind 0: int64 LE back-to-back
                          # kind 1: DELTA_LENGTH-encoded unique values
    uleb(num_indices)
    [bit_width u8][hybrid-RLE indices]
"""

from __future__ import annotations

import numpy as np

from . import byte_array, hybrid_rle
from .bitpack import bits_needed
from .uleb import uleb_decode, uleb_encode

__all__ = [
    "encode_int",
    "decode_int",
    "encode_binary",
    "decode_binary",
]


def _encode_indices(codes: np.ndarray, num_dict: int) -> bytes:
    bit_width = max(bits_needed(max(num_dict - 1, 0)), 1)
    if bit_width > 32:
        raise ValueError("dictionary bit_width > 32")  # utils.rs:19-23
    out = bytearray()
    out += uleb_encode(len(codes))
    out.append(bit_width)
    out += hybrid_rle.encode(codes.astype(np.uint64, copy=False), bit_width)
    return bytes(out)


def _decode_indices(buf: bytes, pos: int) -> np.ndarray:
    n, pos = uleb_decode(buf, pos)
    bit_width = buf[pos]
    return hybrid_rle.decode(buf[pos + 1 :], bit_width, n)


def encode_int(values: np.ndarray) -> bytes:
    v = np.asarray(values).astype(np.int64, copy=False)
    uniques, codes = np.unique(v, return_inverse=True)
    payload = uniques.astype("<i8").tobytes()
    out = bytearray()
    out += uleb_encode(0)
    out += uleb_encode(len(payload))
    out += payload
    out += _encode_indices(codes, len(uniques))
    return bytes(out)


def decode_int(buf: bytes) -> np.ndarray:
    kind, pos = uleb_decode(buf, 0)
    if kind != 0:
        raise ValueError("not an int dictionary buffer")
    dict_len, pos = uleb_decode(buf, pos)
    uniques = np.frombuffer(buf, dtype="<i8", count=dict_len // 8, offset=pos)
    codes = _decode_indices(buf, pos + dict_len)
    return uniques[codes.astype(np.int64)]


def encode_binary(offsets: np.ndarray, data: np.ndarray) -> bytes:
    """Dictionary-encode a byte-array column given (offsets, data).

    Factorization runs in Arrow C++ (``pc.dictionary_encode``); the
    dictionary is then re-sorted byte-lexicographically so the layout is
    deterministic and the dict page ``is_sorted``
    (/root/reference/src/page/mod.rs:304 — SURVEY.md O3)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    o = np.asarray(offsets).astype(np.int64, copy=False)
    d = np.asarray(data, dtype=np.uint8)
    n = len(o) - 1
    arr = pa.LargeBinaryArray.from_buffers(
        pa.large_binary(), n,
        [None, pa.py_buffer(o.tobytes()), pa.py_buffer(d.tobytes())],
    )
    dict_arr = pc.dictionary_encode(arr)
    codes = dict_arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    uniq = dict_arr.dictionary
    # remap first-occurrence codes → sorted-dictionary codes
    order = pc.sort_indices(uniq).to_numpy(zero_copy_only=False).astype(np.int64)
    rank = np.empty(len(uniq), dtype=np.int64)
    rank[order] = np.arange(len(uniq), dtype=np.int64)
    if n:
        codes = rank[codes]
    uniq_sorted = uniq.take(pa.array(order)) if len(uniq) else uniq
    ub = uniq_sorted.buffers()
    if len(uniq_sorted):
        u_offsets = np.frombuffer(ub[1], dtype=np.int64)[: len(uniq_sorted) + 1].astype(np.int64)
        u_data = (
            np.frombuffer(ub[2], dtype=np.uint8)[: u_offsets[-1]]
            if ub[2] is not None
            else np.empty(0, np.uint8)
        )
    else:
        u_offsets = np.zeros(1, dtype=np.int64)
        u_data = np.empty(0, np.uint8)
    payload = byte_array.delta_length_encode(u_offsets, u_data)
    out = bytearray()
    out += uleb_encode(1)
    out += uleb_encode(len(uniq_sorted))
    out += uleb_encode(len(payload))
    out += payload
    out += _encode_indices(codes, len(uniq_sorted))
    return bytes(out)


def decode_binary(buf: bytes) -> tuple[np.ndarray, np.ndarray]:
    kind, pos = uleb_decode(buf, 0)
    if kind != 1:
        raise ValueError("not a binary dictionary buffer")
    n_uniq, pos = uleb_decode(buf, pos)
    dict_len, pos = uleb_decode(buf, pos)
    u_offsets, u_data = byte_array.delta_length_decode(
        buf[pos : pos + dict_len], n_uniq
    )
    codes = _decode_indices(buf, pos + dict_len).astype(np.int64)
    lens = np.diff(u_offsets)
    out_lens = lens[codes]
    offsets = np.zeros(len(codes) + 1, dtype=np.int64)
    np.cumsum(out_lens, out=offsets[1:])
    # gather bytes of each selected unique value, vectorized
    total = int(offsets[-1])
    if total == 0:
        return offsets, np.empty(0, dtype=np.uint8)
    rec = np.repeat(np.arange(len(codes), dtype=np.int64), out_lens)
    col = np.arange(total, dtype=np.int64) - np.repeat(offsets[:-1], out_lens)
    src = u_offsets[codes][rec] + col
    return offsets, u_data[src]
