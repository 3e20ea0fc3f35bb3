"""Sub-partition page index: row-blocked containers + block pruning.

The analog of the reference's page-index read path
(/root/reference/src/indexes/intervals.rs:62-138 interval selection,
/root/reference/src/read/page/indexed_reader.rs:25-209 byte-range reads):
a point/range read over a paged partition must decode only the
overlapping row-blocks, asserted here down to bytes read from disk.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pytest

from parquet2_ray.stages.encode import decode_partition_path, encode_partition_table
from parquet2_ray.state import manifest as mf


@pytest.fixture()
def paged_dir(tmp_path):
    rng = np.random.default_rng(3)
    n = 50_000
    tbl = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "val": pa.array(rng.integers(0, 1000, n, dtype=np.int64)),
        "tag": pa.array([f"t{int(i) % 7}" for i in range(n)]),
    })
    out = str(tmp_path / "paged")
    os.makedirs(out, exist_ok=True)
    encode_partition_table(tbl, out, sort_key="doc_id", rows_per_block=1024)
    return out, tbl


def test_paged_roundtrip_bit_identical(paged_dir):
    out, tbl = paged_dir
    dec = decode_partition_path(os.path.join(out, "part-p0.bin"))
    assert dec.equals(tbl)


def test_point_lookup_reads_under_5pct(paged_dir):
    out, tbl = paged_dir
    path = os.path.join(out, "part-p0.bin")
    total = os.path.getsize(path)
    _, all_blocks, full_bytes = mf.read_partition_blocks(path)
    footer, blocks, bytes_read = mf.read_partition_blocks(
        path, "doc_id", 12_345, 12_345)
    assert len(blocks) == 1  # exactly one 1024-row block overlaps
    # point lookup touches <5% of the partition's data bytes
    assert bytes_read < 0.05 * full_bytes, (bytes_read, full_bytes, total)
    dec = decode_partition_path(path, "doc_id", 12_345, 12_345)
    row = dec.filter(pa.compute.equal(dec["doc_id"], 12_345))
    assert row.num_rows == 1
    assert row["val"][0].as_py() == tbl["val"][12_345].as_py()


def test_range_decode_matches_filter(paged_dir):
    out, tbl = paged_dir
    path = os.path.join(out, "part-p0.bin")
    dec = decode_partition_path(path, "doc_id", 5_000, 9_000)
    dec = dec.filter(pa.compute.and_(
        pa.compute.greater_equal(dec["doc_id"], 5_000),
        pa.compute.less_equal(dec["doc_id"], 9_000)))
    expect = tbl.slice(5_000, 4_001)
    assert dec.sort_by("doc_id").equals(expect)


def test_all_blocks_pruned_yields_empty_with_schema(paged_dir):
    out, tbl = paged_dir
    path = os.path.join(out, "part-p0.bin")
    dec = decode_partition_path(path, "doc_id", 10_000_000, 20_000_000)
    assert dec.num_rows == 0
    assert dec.schema.names == tbl.schema.names


def test_unpaged_file_decodes_through_same_path(tmp_path):
    tbl = pa.table({"doc_id": pa.array([1, 2, 3], type=pa.int64()),
                    "s": ["a", "b", "c"]})
    out = str(tmp_path / "single")
    os.makedirs(out, exist_ok=True)
    encode_partition_table(tbl, out, sort_key="doc_id")  # no rows_per_block
    path = os.path.join(out, "part-p0.bin")
    assert decode_partition_path(path).equals(tbl)
    # predicate on a single-block container: decodes fully, caller filters
    assert decode_partition_path(path, "doc_id", 2, 2).num_rows == 3


def test_paged_with_compression(tmp_path):
    n = 20_000
    tbl = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "txt": pa.array([f"payload text {int(i)//100}" for i in range(n)]),
    })
    out = str(tmp_path / "pagedz")
    os.makedirs(out, exist_ok=True)
    encode_partition_table(tbl, out, sort_key="doc_id",
                           rows_per_block=2048, compression="zstd")
    path = os.path.join(out, "part-p0.bin")
    assert decode_partition_path(path).equals(tbl)
    _, blocks, bytes_read = mf.read_partition_blocks(path, "doc_id", 100, 200)
    assert len(blocks) == 1
    assert bytes_read < os.path.getsize(path) * 0.2


def test_decode_dataset_key_range(ray_session, tmp_path):
    from parquet2_ray.pipelines.encode_pipeline import (
        EncodeOptions, decode_dataset, encode_dataset)
    import ray.data as rd

    n = 30_000
    tbl = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "n_tok": pa.array(np.full(n, 10, dtype=np.int64)),
        "source": pa.array([f"s{int(i) % 3}" for i in range(n)]),
    })
    out = str(tmp_path / "ds")
    encode_dataset(rd.from_arrow(tbl), out,
                   EncodeOptions(group_col="source", weight_col="n_tok",
                                 sort_key="doc_id", target_weight=50_000,
                                 rows_per_block=512))
    got = decode_dataset(out, key_range=("doc_id", 777, 799)).to_pandas()
    got = got.sort_values("doc_id").reset_index(drop=True)
    assert list(got["doc_id"]) == list(range(777, 800))
    assert set(got.columns) == {"doc_id", "n_tok", "source"}


# ---- column projection at decode (reference S7 / ColumnIterator,
# /root/reference/src/read/column/mod.rs:22-205) ----

def test_projection_reads_only_selected_bytes(paged_dir):
    out, tbl = paged_dir
    path = os.path.join(out, "part-p0.bin")
    _, _, full_bytes = mf.read_partition_blocks(path)
    _, blocks, proj_bytes = mf.read_partition_blocks(path, columns=["doc_id"])
    assert proj_bytes < 0.5 * full_bytes  # tag strings dominate the file
    dec = decode_partition_path(path, columns=["doc_id"])
    assert dec.equals(tbl.select(["doc_id"]))


def test_projection_composes_with_range(paged_dir):
    out, tbl = paged_dir
    path = os.path.join(out, "part-p0.bin")
    dec = decode_partition_path(path, "doc_id", 5_000, 9_000,
                                columns=["val"])
    assert dec.column_names == ["val"]
    # block-granular: at least the 4001 in-range rows, none beyond blocks
    assert 4_001 <= dec.num_rows <= 4_001 + 2 * 1024


def test_projection_unknown_column_raises(paged_dir):
    out, _ = paged_dir
    path = os.path.join(out, "part-p0.bin")
    with pytest.raises(KeyError, match="nope"):
        decode_partition_path(path, columns=["nope"])


def test_projection_all_pruned_keeps_projected_schema(paged_dir):
    out, _ = paged_dir
    path = os.path.join(out, "part-p0.bin")
    dec = decode_partition_path(path, "doc_id", 10_000_000, 20_000_000,
                                columns=["val"])
    assert dec.num_rows == 0
    assert dec.column_names == ["val"]


def test_decode_dataset_projection(ray_session, tmp_path):
    from parquet2_ray.pipelines.encode_pipeline import (
        EncodeOptions, decode_dataset, encode_dataset)
    import ray.data as rd

    n = 10_000
    tbl = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "n_tok": pa.array(np.full(n, 10, dtype=np.int64)),
        "source": pa.array([f"s{int(i) % 3}" for i in range(n)]),
    })
    out = str(tmp_path / "dsproj")
    encode_dataset(rd.from_arrow(tbl), out,
                   EncodeOptions(group_col="source", weight_col="n_tok",
                                 sort_key="doc_id", target_weight=30_000,
                                 rows_per_block=512))
    got = decode_dataset(out, columns=["doc_id", "source"]).to_pandas()
    assert set(got.columns) == {"doc_id", "source"}
    assert len(got) == n
    # key_range whose key column is NOT in the projection: decoded for
    # the exact filter, dropped from the result
    got = decode_dataset(out, key_range=("doc_id", 100, 149),
                         columns=["source"]).to_pandas()
    assert list(got.columns) == ["source"]
    assert len(got) == 50


def test_lookup_rows_point_lookup(ray_session, tokens_table, tmp_path):
    """Point lookup composes bloom partition pruning + page-index block
    pruning + projection + exact is_in filter."""
    import pyarrow.parquet as pq

    from parquet2_ray.pipelines.encode_pipeline import (
        EncodeOptions,
        encode_dataset,
        lookup_rows,
        prune_partitions,
    )

    src = tmp_path / "src.parquet"
    pq.write_table(tokens_table, src)
    out = str(tmp_path / "out")
    s = encode_dataset(str(src), out,
                       EncodeOptions(target_weight=30_000, sort_key="doc_id",
                                     rows_per_block=100))
    assert s["n_partitions"] > 3
    ids = sorted(tokens_table["doc_id"].to_pylist())
    want = [ids[3], ids[len(ids) // 2], ids[-2]]
    # bloom pruning engages: fewer partitions survive than exist
    assert len(prune_partitions(out, want)) < s["n_partitions"]
    got = (lookup_rows(out, "doc_id", want, columns=["doc_id", "n_tok"])
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert got["doc_id"].tolist() == sorted(want)
    assert list(got.columns) == ["doc_id", "n_tok"]
    src_df = tokens_table.to_pandas().set_index("doc_id")
    assert got["n_tok"].tolist() == [int(src_df.loc[i, "n_tok"]) for i in sorted(want)]
    # projection that excludes the key still filters on it
    got2 = lookup_rows(out, "doc_id", want, columns=["n_tok"]).to_pandas()
    assert sorted(got2["n_tok"].tolist()) == sorted(got["n_tok"].tolist())
