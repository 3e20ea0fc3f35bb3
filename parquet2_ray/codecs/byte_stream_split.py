"""BYTE_STREAM_SPLIT — byte-plane transpose for fixed-width values.

The parquet encoding (format spec Encodings.md "BYTE_STREAM_SPLIT"):
for k-byte values, stream i holds the i-th byte of every value, streams
concatenated.  The transform is size-neutral on its own; its value is
that it groups bytes of similar entropy (exponents together, low
mantissa bytes together), which block compressors then shrink far
better than interleaved values — the classic float-column win.

The reference DECLARES this encoding but never implements it
(/root/reference/src/parquet_bridge.rs:329, README.md:33-36 "not
supported"), so this is a beyond-reference addition; the auto-selector
only ever picks it when block compression is enabled (see
functions/selector.py — uncompressed it ties with PLAIN and PLAIN wins
the priority tie-break).

Both directions are single NumPy transposes — no per-value work.
"""

from __future__ import annotations

import numpy as np

__all__ = ["encode", "decode"]


def encode(values: np.ndarray) -> bytes:
    """Transpose values into k concatenated byte streams."""
    v = np.ascontiguousarray(values)
    k = v.dtype.itemsize
    if k == 1:
        return v.tobytes()
    planes = v.view(np.uint8).reshape(-1, k)
    return planes.T.tobytes()  # C-order transpose == streams back-to-back


def decode(body: bytes, dtype: str, n: int) -> np.ndarray:
    """Reassemble n values of the given numpy dtype from byte streams."""
    dt = np.dtype(dtype)
    k = dt.itemsize
    raw = np.frombuffer(body, dtype=np.uint8)
    if raw.size != n * k:
        raise ValueError(
            f"byte_stream_split: {raw.size} bytes != {n} x {k}-byte values")
    if k == 1 or n == 0:
        return raw[: n * k].copy().view(dt)
    planes = raw.reshape(k, n)
    return np.ascontiguousarray(planes.T).view(dt).reshape(n)
