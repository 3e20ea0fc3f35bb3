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
    assert args == {"use_dictionary": ["a"], "write_page_index": True}
    # no dict columns → explicit standard encodings
    args = parquet_write_args_for(
        {"a": "delta_binary_packed", "b": "fsst", "c": "delta_byte_array"})
    assert args["use_dictionary"] is False
    assert args["column_encoding"] == {
        "a": "DELTA_BINARY_PACKED", "b": "PLAIN", "c": "DELTA_BYTE_ARRAY"}
    # composite codecs (list/struct/decimal) have no mapping → defaults
    # (page index always on, so interchange files are page-prunable)
    assert parquet_write_args_for({"a": "list"}) == {
        "write_page_index": True}


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


@pytest.mark.usefixtures("ray_session")
def test_bloom_sidecars_prune_interchange_files(tmp_path):
    """SBBF bloom sketches travel with the interchange output as
    sidecars (reference bloom_filter/read.rs:14 — the consume side):
    present keys never prune their owning file (no false negatives),
    absent keys prune aggressively, and a sidecar-less file survives."""
    import os

    from parquet2_ray.pipelines.encode_pipeline import (
        EncodeOptions,
        encode_dataset,
    )
    from parquet2_ray.sources.parquet_interop import (
        load_bloom_sidecar,
        prune_files_by_bloom,
    )
    from parquet2_ray.sources.tokens import make_tokens_table

    src = tmp_path / "in.parquet"
    tbl = make_tokens_table(4000, seed=3)
    pq.write_table(tbl, src)
    cont = str(tmp_path / "cont")
    encode_dataset(str(src), cont,
                   EncodeOptions(target_weight=150_000, sort_key="doc_id"))
    out = str(tmp_path / "pq")
    container_to_parquet(cont, out)

    import glob
    files = sorted(glob.glob(f"{out}/part-*.parquet"))
    assert len(files) > 2
    for f in files:
        sc = load_bloom_sidecar(f)
        assert sc is not None and sc["column"] == "doc_id"

    # no false negatives: every file's own keys keep it
    for f in files:
        keys = pq.read_table(f, columns=["doc_id"])["doc_id"].to_pylist()
        assert f in prune_files_by_bloom(out, keys[:5])
    # one present key prunes most other files
    one = pq.read_table(files[0], columns=["doc_id"])["doc_id"][0].as_py()
    kept = prune_files_by_bloom(out, [one])
    assert files[0] in kept and len(kept) < len(files)
    # absent keys prune everything (fp rate permitting ≥1 survivor max)
    kept = prune_files_by_bloom(out, ["no-such-doc-xyzzy"])
    assert len(kept) <= 1
    # a file without a sidecar is never pruned (no sketch, no claim)
    from parquet2_ray.sources.parquet_interop import _bloom_sidecar_path
    os.remove(_bloom_sidecar_path(files[0]))
    assert files[0] in prune_files_by_bloom(out, ["no-such-doc-xyzzy"])


@pytest.mark.usefixtures("ray_session")
def test_container_to_parquet_embedded_blooms(tmp_path):
    """embed_blooms=True exports interchange files whose SBBF blooms
    live IN the parquet footer (no sidecars): pyarrow/duckdb still read
    the data, the embedded blooms prune, and the export stays resumable."""
    import glob
    import os

    import duckdb

    from parquet2_ray.pipelines.encode_pipeline import (
        EncodeOptions,
        encode_dataset,
    )
    from parquet2_ray.sources.parquet_bloom import read_embedded_blooms
    from parquet2_ray.sources.parquet_interop import prune_files_by_bloom
    from parquet2_ray.sources.tokens import make_tokens_table

    src = tmp_path / "in.parquet"
    tbl = make_tokens_table(4000, seed=11)
    pq.write_table(tbl, src)
    cont = str(tmp_path / "cont")
    s = encode_dataset(str(src), cont,
                       EncodeOptions(target_weight=150_000, sort_key="doc_id"))
    out = str(tmp_path / "pq")
    summary = container_to_parquet(cont, out, embed_blooms=True)
    assert summary["n_partitions"] == s["n_partitions"]

    files = sorted(glob.glob(f"{out}/part-*.parquet"))
    assert len(files) > 2
    # no sidecars anywhere; every file carries embedded blooms instead
    assert glob.glob(f"{out}/_bloom.*") == []
    for f in files:
        embedded = read_embedded_blooms(f)
        assert embedded and all(b["column"] == "doc_id" for b in embedded)

    # cross-engine: both foreign readers see value-identical rows
    got = pq.read_table(out).sort_by("doc_id")
    orig = tbl.sort_by("doc_id")
    assert got.select(orig.column_names).cast(orig.schema).equals(orig)
    n = duckdb.connect().execute(
        f"SELECT count(*) FROM read_parquet('{out}/part-*.parquet')"
    ).fetchone()[0]
    assert n == tbl.num_rows

    # pruning consumes the embedded blooms (no sidecar path at all)
    one = pq.read_table(files[0], columns=["doc_id"])["doc_id"][0].as_py()
    kept = prune_files_by_bloom(out, [one])
    assert files[0] in kept and len(kept) < len(files)
    assert len(prune_files_by_bloom(out, ["no-such-doc-xyzzy"])) <= 1

    # resumable: second export skips every file and writes no sidecars
    summary2 = container_to_parquet(cont, out, embed_blooms=True)
    assert summary2["skipped"] == s["n_partitions"]
    assert glob.glob(f"{out}/_bloom.*") == []


@pytest.mark.usefixtures("ray_session")
def test_container_to_parquet_uri_out_dir(tmp_path):
    """Interchange export through a pyarrow.fs URI out_dir: files land
    via the fs layer (atomic PUT path for object stores), pruning and
    resume work through the same URI space."""
    from parquet2_ray.pipelines.encode_pipeline import EncodeOptions, encode_dataset
    from parquet2_ray.sources.parquet_interop import prune_files_by_bloom
    from parquet2_ray.sources.tokens import make_tokens_table

    src = tmp_path / "in.parquet"
    tbl = make_tokens_table(2500, seed=17)
    pq.write_table(tbl, src)
    cont = str(tmp_path / "cont")
    s = encode_dataset(str(src), cont,
                       EncodeOptions(target_weight=200_000, sort_key="doc_id"))
    out_uri = f"file://{tmp_path}/pq_uri"
    summary = container_to_parquet(cont, out_uri, embed_blooms=True)
    assert summary["n_partitions"] == s["n_partitions"]
    got = pq.read_table(f"{tmp_path}/pq_uri").sort_by("doc_id")
    orig = tbl.sort_by("doc_id")
    assert got.select(orig.column_names).cast(orig.schema).equals(orig)
    # prune through the URI
    one = orig["doc_id"][0].as_py()
    kept = prune_files_by_bloom(out_uri, [one])
    assert 1 <= len(kept) < summary["n_partitions"]
    assert all(k.startswith("file://") for k in kept)
    # resume through the URI
    assert container_to_parquet(cont, out_uri, embed_blooms=True)[
        "skipped"] == s["n_partitions"]
