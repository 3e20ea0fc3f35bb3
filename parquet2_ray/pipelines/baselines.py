"""pyarrow parquet size baselines — the comparison target.

The reference validates itself against pyarrow-written files
(/root/reference/tests/write_pyarrow.py, README.md:86-101) and the
north rule requires our total encoded bytes ≤ the reference's
PLAIN / RLE_DICTIONARY / DELTA_BINARY_PACKED baselines on the same
tables. parquet2 writes exactly the parquet format, and pyarrow writes
exactly the parquet format, so pyarrow's per-column chunk sizes under
each of those encodings ARE the reference baselines (uncompressed —
codec-level comparison, no block compression on either side).
"""

from __future__ import annotations

import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq

__all__ = ["pyarrow_size_baselines", "column_chunk_sizes"]


def column_chunk_sizes(path: str) -> dict[str, int]:
    """Total compressed byte size per leaf column across row groups."""
    md = pq.ParquetFile(path).metadata
    sizes: dict[str, int] = {}
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            c = g.column(ci)
            sizes[c.path_in_schema] = sizes.get(c.path_in_schema, 0) + c.total_compressed_size
    return sizes


def _write_variant(table: pa.Table, path: str, variant: str) -> dict[str, int]:
    kwargs: dict = {"compression": "NONE"}
    if variant == "plain":
        kwargs["use_dictionary"] = False
        kwargs["column_encoding"] = "PLAIN"
    elif variant == "rle_dictionary":
        kwargs["use_dictionary"] = True
    elif variant == "delta_binary_packed":
        kwargs["use_dictionary"] = False
        enc = {}
        for f in table.schema:
            t = f.type
            leaf = f.name
            if pa.types.is_list(t) or pa.types.is_large_list(t):
                leaf = f"{f.name}.list.element"
                t = t.value_type
            if pa.types.is_integer(t):
                enc[leaf] = "DELTA_BINARY_PACKED"
            elif pa.types.is_string(t) or pa.types.is_large_string(t):
                enc[leaf] = "DELTA_BYTE_ARRAY"
            else:
                enc[leaf] = "PLAIN"
        kwargs["column_encoding"] = enc
    else:
        raise ValueError(variant)
    pq.write_table(table, path, **kwargs)
    return column_chunk_sizes(path)


def pyarrow_size_baselines(table: pa.Table) -> dict[str, dict[str, int]]:
    """{variant: {leaf_column: bytes}} for the three reference encodings."""
    out: dict[str, dict[str, int]] = {}
    with tempfile.TemporaryDirectory() as d:
        for variant in ("plain", "rle_dictionary", "delta_binary_packed"):
            try:
                out[variant] = _write_variant(
                    table, os.path.join(d, f"{variant}.parquet"), variant
                )
            except (pa.ArrowException, OSError) as e:  # encoding unsupported for a type
                out[variant] = {"__error__": str(e)}
    return out
