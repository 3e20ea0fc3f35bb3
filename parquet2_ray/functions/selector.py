"""Per-partition codec auto-selection.

The north rule requires a selector that "samples value distributions
(cardinality, run-length histograms, value ranges) before committing an
encoding". Rather than hand-tuned thresholds, the selector *encodes a
deterministic contiguous sample with every candidate codec* and commits
to the smallest output (ties broken by a fixed priority order). This is
exact on the sample, fully deterministic given the partition content
(so Ray task retries re-derive the same choice — SURVEY.md §4
"deterministic retries"), and cheap: candidates are vectorized kernels
over ≤ ``SAMPLE_VALUES`` values.

The sample is CONTIGUOUS (two windows: head + middle), not strided —
strided sampling would destroy exactly the run/delta structure the
RLE and DELTA_BINARY_PACKED candidates exploit.

The ``bit_width ≤ 32`` dictionary constraint mirrors
/root/reference/src/deserialize/utils.rs:19-23.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..codecs import column as col_mod

__all__ = ["select_codec", "select_and_encode", "candidate_sizes", "SAMPLE_VALUES"]

SAMPLE_VALUES = 8192

# fixed tie-break priority: cheaper/simpler decode first
_PRIORITY = [
    "plain",
    "byte_stream_split",
    "alp",
    "alp_rd",
    "bitmap",
    "for_bitpack",
    "rle",
    "pfor",
    "delta_binary_packed",
    "dict_rle",
    "plain_byte_array",
    "delta_length_byte_array",
    "delta_byte_array",
    "dict_binary",
    "fsst",
    "plain_flba",
    "dict_flba",
    "decimal",
    "list",
    "struct",
]
_PRIO = {c: i for i, c in enumerate(_PRIORITY)}


def _sample(arr: pa.Array) -> pa.Array:
    n = len(arr)
    if n <= SAMPLE_VALUES:
        return arr
    k = 8  # contiguous windows spread across the array
    w = SAMPLE_VALUES // k
    parts = [arr[(n - w) * i // (k - 1) : (n - w) * i // (k - 1) + w] for i in range(k)]
    return pa.concat_arrays(parts)


def candidate_sizes(arr: pa.Array | pa.ChunkedArray,
                    compression: str | None = None) -> dict[str, int]:
    """Encoded size of a deterministic sample under each candidate codec.

    With ``compression`` set, sizes are of the block-compressed payload
    (the same compressor the writer applies, state/manifest.py C1) —
    what actually lands on disk.  This is what lets size-neutral
    transforms like BYTE_STREAM_SPLIT win where they should: BSS ties
    with PLAIN uncompressed, but its byte-plane grouping compresses far
    better, so it's only ever selected when the pipeline compresses."""
    sizes, _ = _price_candidates(arr, compression, keep_encodes=False)
    return sizes


def _price_candidates(
    arr: pa.Array | pa.ChunkedArray,
    compression: str | None,
    keep_encodes: bool,
):
    """Shared pricing core: returns ``(sizes, encodes_or_None)``.

    ``encodes`` (codec → EncodedColumn of the sample, name ``"s"``) is
    kept only when requested AND the sample is the whole column — the
    only case a caller may reuse a priced encode as the final one."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    t = arr.type
    candidates = col_mod.codecs_for_type(t)
    for composite in ("list", "struct", "map", "decimal"):
        if candidates == {composite}:
            return {composite: 0}, None
    s = _sample(arr)
    keep = keep_encodes and len(s) == len(arr)
    sizes: dict[str, int] = {}
    encodes: dict[str, "col_mod.EncodedColumn"] = {}
    comp_codec = None
    if compression:
        from ..state.manifest import parse_compression

        # spec-aware ("zstd:19"): price with the SAME leveled codec the
        # writer will apply, so the selector sees what lands on disk
        comp_codec, _ = parse_compression(compression)
    for c in sorted(candidates):
        try:
            enc = col_mod.encode_array("s", s, c)
        except (ValueError, TypeError, OverflowError):
            continue
        payload = enc.payload
        if keep:
            encodes[c] = enc
        if comp_codec is not None:
            # writer keeps the compressed payload only when smaller
            comp = comp_codec.compress(payload, asbytes=True)
            sizes[c] = min(len(payload), len(comp))
        else:
            sizes[c] = len(payload)
    return sizes, (encodes if keep else None)


def select_codec(arr: pa.Array | pa.ChunkedArray,
                 compression: str | None = None) -> str:
    """Pick the codec with the smallest sampled encoded size."""
    t = arr.type if not isinstance(arr, pa.ChunkedArray) else arr.type
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return "list"
    if pa.types.is_struct(t):
        return "struct"
    if pa.types.is_map(t):
        return "map"
    if pa.types.is_decimal128(t):
        return "decimal"
    sizes = candidate_sizes(arr, compression=compression)
    if not sizes:
        raise TypeError(f"no viable codec for type {t}")
    return min(sizes.items(), key=lambda kv: (kv[1], _PRIO.get(kv[0], 99)))[0]


def select_and_encode(
    name: str, arr: pa.Array | pa.ChunkedArray,
    compression: str | None = None,
):
    """Pick the smallest-sample codec AND return the final encode when
    pricing already produced it.

    When the column fits inside the pricing sample (≤ SAMPLE_VALUES
    values — pricing encoded the ENTIRE column under every candidate),
    the winner's priced encode IS the final encode, so re-running
    train + encode (expensive for FSST: symbol-table training plus the
    lockstep parse) would be pure duplicate work.  Returns
    ``(codec, EncodedColumn | None)``; None means the caller must
    encode (sampled pricing, or a composite codec).

    This is explicit dataflow, NOT a cache: repeated calls redo the
    full work, so benchmark repeats stay honest."""
    import dataclasses

    t = arr.type
    if (pa.types.is_list(t) or pa.types.is_large_list(t)
            or pa.types.is_struct(t) or pa.types.is_map(t)
            or pa.types.is_decimal128(t)):
        return select_codec(arr, compression=compression), None
    sizes, encodes = _price_candidates(arr, compression, keep_encodes=True)
    if not sizes:
        raise TypeError(f"no viable codec for type {t}")
    codec = min(sizes.items(), key=lambda kv: (kv[1], _PRIO.get(kv[0], 99)))[0]
    if encodes is None or codec not in encodes:
        return codec, None
    return codec, dataclasses.replace(encodes[codec], name=name)
