"""FixedLenByteArray codecs (PLAIN + RLE_DICTIONARY over fixed slots).

The analog of the reference's fixed-length deserialize paths
(/root/reference/src/deserialize/fixed_len.rs:56-110 — plain slot
iteration and dict-index gather over ``byte_width``-sized values) and
its FLBA statistics (/root/reference/src/statistics/fixed_len_binary.rs:12).

Wire formats (self-framing):

    plain_flba:  uleb(byte_width) uleb(n) raw bytes (n × byte_width)
    dict_flba:   uleb(byte_width) uleb(n_uniq)
                 dict payload (n_uniq × byte_width, byte-lex sorted)
                 uleb(num_indices) [bit_width u8][hybrid-RLE indices]

The dictionary is byte-lexicographically sorted so the layout is
deterministic and the dict page ``is_sorted`` (SURVEY.md O3).
"""

from __future__ import annotations

import numpy as np

from .bitpack import bits_needed
from . import hybrid_rle
from .uleb import uleb_decode, uleb_encode

__all__ = ["plain_encode", "plain_decode", "dict_encode", "dict_decode"]


def plain_encode(data: np.ndarray, byte_width: int) -> bytes:
    d = np.ascontiguousarray(data, dtype=np.uint8)
    n = len(d) // byte_width if byte_width else 0
    return bytes(uleb_encode(byte_width) + uleb_encode(n) + d.tobytes())


def plain_decode(buf: bytes) -> tuple[int, np.ndarray]:
    k, pos = uleb_decode(buf, 0)
    n, pos = uleb_decode(buf, pos)
    return k, np.frombuffer(buf, dtype=np.uint8, count=n * k, offset=pos)


def dict_encode(data: np.ndarray, byte_width: int) -> bytes:
    d = np.ascontiguousarray(data, dtype=np.uint8)
    k = byte_width
    n = len(d) // k if k else 0
    if n and k:
        # void view ⇒ memcmp ordering on the raw slots (numpy 'S' would
        # strip trailing NULs — wrong for binary); unique sorts byte-lex
        slots = d.reshape(n, k).view(f"V{k}").ravel()
        uniq, codes = np.unique(slots, return_inverse=True)
        uniq_bytes = uniq.view(np.uint8).tobytes()
    else:
        uniq, codes = np.empty(0, dtype="V1"), np.empty(0, dtype=np.int64)
        uniq_bytes = b""
    bit_width = max(bits_needed(max(len(uniq) - 1, 0)), 1)
    if bit_width > 32:  # utils.rs:19-23 dict bit_width guard
        raise ValueError("dictionary bit_width > 32")
    out = bytearray(uleb_encode(k))
    out += uleb_encode(len(uniq))
    out += uniq_bytes
    out += uleb_encode(n)
    out.append(bit_width)
    out += hybrid_rle.encode(codes.astype(np.uint64, copy=False), bit_width)
    return bytes(out)


def dict_decode(buf: bytes) -> tuple[int, np.ndarray]:
    k, pos = uleb_decode(buf, 0)
    n_uniq, pos = uleb_decode(buf, pos)
    uniq = np.frombuffer(buf, dtype=np.uint8, count=n_uniq * k, offset=pos)
    pos += n_uniq * k
    n, pos = uleb_decode(buf, pos)
    bit_width = buf[pos]
    codes = hybrid_rle.decode(buf[pos + 1 :], bit_width, n).astype(np.int64)
    if n == 0 or k == 0:
        return k, np.empty(0, dtype=np.uint8)
    return k, uniq.reshape(n_uniq, k)[codes].ravel()
