"""container → standard .parquet interchange (VERDICT missing #6)."""

import json

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from parquet2_ray.sources.parquet_interop import (
    container_to_parquet,
    parquet_write_args_for,
)


def test_write_args_mapping():
    # dict columns present → dictionary wins (pyarrow can't mix
    # column_encoding with use_dictionary lists)
    args = parquet_write_args_for({"a": "dict_rle", "b": "delta_binary_packed"})
    assert args == {"use_dictionary": ["a"]}
    # no dict columns → explicit standard encodings
    args = parquet_write_args_for(
        {"a": "delta_binary_packed", "b": "fsst", "c": "delta_byte_array"})
    assert args["use_dictionary"] is False
    assert args["column_encoding"] == {
        "a": "DELTA_BINARY_PACKED", "b": "PLAIN", "c": "DELTA_BYTE_ARRAY"}
    # composite codecs (list/struct/decimal) have no mapping → defaults
    assert parquet_write_args_for({"a": "list"}) == {}


@pytest.mark.usefixtures("ray_session")
def test_container_roundtrip_through_real_parquet(tmp_path):
    from parquet2_ray.pipelines.encode_pipeline import EncodeOptions, encode_dataset
    from parquet2_ray.sources.tokens import make_tokens_table

    src = tmp_path / "in.parquet"
    tbl = make_tokens_table(3000, seed=9)
    pq.write_table(tbl, src)
    cont = str(tmp_path / "cont")
    s = encode_dataset(str(src), cont, EncodeOptions(target_weight=200_000))
    out = str(tmp_path / "pq")
    summary = container_to_parquet(cont, out)
    assert summary["n_partitions"] == s["n_partitions"]
    assert summary["rows"] == tbl.num_rows

    # a plain pyarrow reader sees value-identical rows
    got = pq.read_table(out)
    orig = tbl.sort_by("doc_id")
    got = got.sort_by("doc_id").select(orig.column_names).cast(orig.schema)
    assert got.equals(orig)

    # resumable: re-export skips every already-written partition
    summary2 = container_to_parquet(cont, out)
    assert summary2["skipped"] == s["n_partitions"]
    # resumed export still reports the dataset total (ledger counts)
    assert summary2["rows"] == tbl.num_rows
