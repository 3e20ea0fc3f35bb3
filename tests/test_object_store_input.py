"""Object-store input routes (VERDICT r2 "what's wrong" #1).

The planner and the fused read+split exchange must consume input
through ``pyarrow.fs`` — URIs, globs, directories and an injected
filesystem — never through ``os.walk`` / bare local opens.  A
``SubTreeFileSystem`` stands in for a remote store: its paths are
meaningless to the local OS (no leading ``/tmp...``), so any code path
that bypasses the filesystem object fails loudly.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyarrow import fs as pafs

from parquet2_ray.pipelines.encode_pipeline import (
    EncodeOptions,
    decode_dataset,
    encode_dataset,
)
from parquet2_ray.sources.readers import resolve_input_files


@pytest.fixture(scope="module")
def store(tokens_table, tmp_path_factory):
    """A 'remote' store: SubTreeFileSystem rooted at a temp dir holding
    the tokens table split over two parquet files in a subdirectory."""
    root = tmp_path_factory.mktemp("objstore")
    (root / "corpus").mkdir()
    n = tokens_table.num_rows
    pq.write_table(tokens_table.slice(0, n // 2), root / "corpus" / "part-0.parquet")
    pq.write_table(tokens_table.slice(n // 2), root / "corpus" / "part-1.parquet")
    return pafs.SubTreeFileSystem(str(root), pafs.LocalFileSystem()), root


# ------------------------------------------------------------- resolver


def test_resolver_directory_recurses(store):
    fs, root = store
    got_fs, files = resolve_input_files("corpus", filesystem=fs)
    assert got_fs is fs
    assert [f.rsplit("/", 1)[-1] for f in files] == [
        "part-0.parquet", "part-1.parquet"]


def test_resolver_glob(store):
    fs, root = store
    _, files = resolve_input_files("corpus/part-*.parquet", filesystem=fs)
    assert len(files) == 2
    _, files = resolve_input_files("corpus/part-0.*", filesystem=fs)
    assert len(files) == 1


def test_resolver_file_uri(store):
    _, root = store
    fs, files = resolve_input_files(f"file://{root}/corpus/part-0.parquet")
    assert isinstance(fs, pafs.LocalFileSystem)
    assert files == [f"{root}/corpus/part-0.parquet"]


def test_resolver_glob_uri(store):
    _, root = store
    fs, files = resolve_input_files(f"file://{root}/corpus/*.parquet")
    assert len(files) == 2


def test_resolver_errors(store):
    fs, root = store
    with pytest.raises(ValueError, match="matched no files"):
        resolve_input_files("corpus/nope-*.parquet", filesystem=fs)
    with pytest.raises(FileNotFoundError):
        resolve_input_files("missing-dir", filesystem=fs)
    with pytest.raises(ValueError, match="no input paths"):
        resolve_input_files([])


# ------------------------------------------------- end-to-end pipelines


def _check_roundtrip(tokens_table, out):
    got = (decode_dataset(out).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    want = (tokens_table.to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert [list(x) for x in got["tokens"]] == [list(x) for x in want["tokens"]]


def test_encode_fused_route_over_filesystem(
        ray_session, store, tokens_table, tmp_path):
    """The fused planner + read-split exchange (the 100 TB path) driven
    entirely through an injected filesystem with non-OS paths."""
    fs, _ = store
    out = str(tmp_path / "out_fused")
    summary = encode_dataset("corpus", out,
                             EncodeOptions(target_weight=50_000),
                             filesystem=fs)
    assert summary["n_rows"] == tokens_table.num_rows
    _check_roundtrip(tokens_table, out)


def test_encode_dataset_route_over_filesystem(
        ray_session, store, tokens_table, tmp_path):
    """The non-fused (Dataset read) route with the same filesystem."""
    fs, _ = store
    out = str(tmp_path / "out_ds")
    summary = encode_dataset(
        "corpus/part-*.parquet", out,
        EncodeOptions(target_weight=50_000, fuse_read_split=False),
        filesystem=fs)
    assert summary["n_rows"] == tokens_table.num_rows
    _check_roundtrip(tokens_table, out)


def test_encode_glob_uri_route(ray_session, store, tokens_table, tmp_path):
    """The job CLI's documented ``--input <scheme>://.../*.parquet``
    shape, end-to-end (file:// stands in for s3:// — same from_uri +
    FileSelector code path)."""
    _, root = store
    out = str(tmp_path / "out_uri")
    summary = encode_dataset(f"file://{root}/corpus/*.parquet", out,
                             EncodeOptions(target_weight=50_000))
    assert summary["n_rows"] == tokens_table.num_rows
    _check_roundtrip(tokens_table, out)
