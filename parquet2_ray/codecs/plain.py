"""PLAIN codec for fixed-width native types.

Fixed-width little-endian values back-to-back — an Arrow numeric buffer
*is* this format, so encode/decode are (near) zero-copy buffer views
(/root/reference/src/deserialize/native.rs:15-26,
/root/reference/src/types.rs:135-141).
"""

from __future__ import annotations

import numpy as np

__all__ = ["encode", "decode"]

_DTYPES = {
    "int32": np.dtype("<i4"),
    "int64": np.dtype("<i8"),
    "uint32": np.dtype("<u4"),
    "uint64": np.dtype("<u8"),
    "float32": np.dtype("<f4"),
    "float64": np.dtype("<f8"),
}


def encode(values: np.ndarray) -> bytes:
    v = np.ascontiguousarray(values)
    if v.dtype.name not in _DTYPES:
        raise TypeError(f"plain codec: unsupported dtype {v.dtype}")
    return v.astype(_DTYPES[v.dtype.name], copy=False).tobytes()


def decode(buf: bytes, dtype: str, num_values: int) -> np.ndarray:
    if dtype not in _DTYPES:
        raise TypeError(f"plain codec: unsupported dtype {dtype}")
    out = np.frombuffer(buf, dtype=_DTYPES[dtype], count=num_values)
    return out
