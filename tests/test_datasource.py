"""P2RDatasource: the container through ray.data.read_datasource."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data as rd

from parquet2_ray.sources.datasource import P2RDatasource


@pytest.fixture(scope="module")
def container(tmp_path_factory, ray_session):
    from parquet2_ray.pipelines.encode_pipeline import EncodeOptions, encode_dataset
    from parquet2_ray.sources.tokens import make_tokens_table

    d = tmp_path_factory.mktemp("dsrc")
    tbl = make_tokens_table(3000, seed=41)
    pq.write_table(tbl, d / "in.parquet")
    out = str(d / "cont")
    encode_dataset(str(d / "in.parquet"), out,
                   EncodeOptions(target_weight=150_000, sort_key="doc_id"))
    return out, tbl


def test_full_read_matches_decode_dataset(container, ray_session):
    from parquet2_ray.pipelines.encode_pipeline import decode_dataset

    out, tbl = container
    via_dsrc = rd.read_datasource(P2RDatasource(out)).to_pandas()
    via_decode = decode_dataset(out).to_pandas()
    a = via_dsrc.sort_values("doc_id").reset_index(drop=True)
    b = via_decode.sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b) and len(a) == tbl.num_rows
    # exact manifest row counts flow into block metadata (no range)
    ds = rd.read_datasource(P2RDatasource(out))
    assert ds.count() == tbl.num_rows


def test_projection_pushdown(container, ray_session):
    out, tbl = container
    ds = rd.read_datasource(P2RDatasource(out, columns=["doc_id", "n_tok"]))
    df = ds.to_pandas()
    assert list(df.columns) == ["doc_id", "n_tok"]
    assert df["n_tok"].sum() == tbl.to_pandas()["n_tok"].sum()


def test_key_range_pushdown(container, ray_session):
    out, tbl = container
    ids = sorted(tbl["doc_id"].to_pylist())
    lo, hi = ids[len(ids) // 4], ids[len(ids) // 2]
    ds = rd.read_datasource(P2RDatasource(
        out, columns=["n_tok"], key_range=("doc_id", lo, hi)))
    got = ds.to_pandas()
    ref = tbl.to_pandas()
    ref = ref[(ref["doc_id"] >= lo) & (ref["doc_id"] <= hi)]
    assert list(got.columns) == ["n_tok"]
    assert sorted(got["n_tok"]) == sorted(ref["n_tok"])


@pytest.fixture(scope="module")
def paged_container(tmp_path_factory, ray_session):
    from parquet2_ray.pipelines.encode_pipeline import EncodeOptions, encode_dataset
    from parquet2_ray.sources.tokens import make_tokens_table

    d = tmp_path_factory.mktemp("dsrc_paged")
    tbl = make_tokens_table(3000, seed=43)
    pq.write_table(tbl, d / "in.parquet")
    out = str(d / "cont")
    # few partitions, many row-blocks per partition
    encode_dataset(str(d / "in.parquet"), out,
                   EncodeOptions(target_weight=2_000_000, sort_key="doc_id",
                                 rows_per_block=128))
    return out, tbl


def test_paged_partition_fans_out_read_tasks(paged_container, ray_session):
    from parquet2_ray.pipelines.encode_pipeline import decode_dataset

    out, tbl = paged_container
    src = P2RDatasource(out)
    nparts = len(src._parts)
    tasks = src.get_read_tasks(4 * nparts)
    assert len(tasks) > nparts          # block-range fan-out happened
    # metadata stays exact: task row counts sum to the corpus
    assert sum(t.metadata.num_rows for t in tasks) == tbl.num_rows
    # and the fanned-out read returns the same rows
    via_dsrc = (rd.read_datasource(P2RDatasource(out),
                                   override_num_blocks=4 * nparts)
                .to_pandas().sort_values("doc_id").reset_index(drop=True))
    via_decode = (decode_dataset(out).to_pandas()
                  .sort_values("doc_id").reset_index(drop=True))
    assert via_dsrc.equals(via_decode) and len(via_dsrc) == tbl.num_rows


def test_paged_fanout_with_key_range(paged_container, ray_session):
    out, tbl = paged_container
    ids = sorted(tbl["doc_id"].to_pylist())
    lo, hi = ids[len(ids) // 4], ids[len(ids) // 2]
    src = P2RDatasource(out, columns=["n_tok"],
                        key_range=("doc_id", lo, hi))
    got = (rd.read_datasource(src,
                              override_num_blocks=8 * len(src._parts))
           .to_pandas())
    ref = tbl.to_pandas()
    ref = ref[(ref["doc_id"] >= lo) & (ref["doc_id"] <= hi)]
    assert sorted(got["n_tok"]) == sorted(ref["n_tok"])


def test_key_values_bloom_prune(container, ray_session):
    out, tbl = container
    probe = tbl["doc_id"][0].as_py()
    src = P2RDatasource(out, key_values=[probe])
    total = P2RDatasource(out)
    assert len(src._parts) < len(total._parts)  # pruning really happened
    df = rd.read_datasource(src).to_pandas()
    assert set(df["doc_id"]) == {probe}  # exact row semantics
    with pytest.raises(ValueError):
        P2RDatasource(out, key_values=[1], key_range=("doc_id", None, None))


def test_key_values_prune_everything(container, ray_session):
    # a probe absent from every partition prunes ALL of them; the read
    # must return zero rows, not divide by zero in the fan-out math
    out, tbl = container
    src = P2RDatasource(out, key_values=["zzz/nonexistent/doc"])
    assert src._parts == []
    assert src.get_read_tasks(32) == []
    assert rd.read_datasource(src).count() == 0


def test_as_of_time_travel_read(tmp_path, ray_session):
    from parquet2_ray.pipelines.append_pipeline import append_dataset
    from parquet2_ray.pipelines.encode_pipeline import (
        EncodeOptions,
        encode_dataset,
    )
    from parquet2_ray.sources.tokens import make_tokens_table

    out = str(tmp_path / "cont")
    base = make_tokens_table(500, seed=41)
    inc = make_tokens_table(200, seed=43)
    pq.write_table(base, tmp_path / "b.parquet")
    pq.write_table(inc, tmp_path / "i.parquet")
    opts = EncodeOptions(target_weight=150_000, fsync=False)
    encode_dataset(str(tmp_path / "b.parquet"), out, opts)
    append_dataset(str(tmp_path / "i.parquet"), out, opts,
                   append_id="inc")
    assert rd.read_datasource(P2RDatasource(out)).count() == 700
    snap = rd.read_datasource(P2RDatasource(out, as_of=0))
    assert snap.count() == 500
    # snapshot pruning composes: range over the snapshot's partitions
    snap_rng = rd.read_datasource(
        P2RDatasource(out, as_of=0, key_range=("n_tok", 100, 500)))
    import pyarrow.compute as pc

    want = base.filter(pc.and_(pc.greater_equal(base["n_tok"], 100),
                               pc.less_equal(base["n_tok"], 500)))
    assert snap_rng.count() == want.num_rows


def test_datasource_plans_through_checkpoint(container, ray_session,
                                             monkeypatch):
    """VERDICT r4 #8: P2RDatasource's planning goes through the
    checkpoint-aware manifest loader — with a checkpoint present,
    constructing the datasource (which loads + prunes the manifest)
    reads ZERO per-partition record files, so a 50k-partition
    container plans in O(1) GETs from Ray too."""
    import os

    from parquet2_ray.state import fsio
    from parquet2_ray.state import manifest as mf

    out, tbl = container
    mf.write_manifest_checkpoint(out)
    real = fsio.read_bytes
    part_reads: list[str] = []

    def counting(path):
        if "_manifest" in path and \
                os.path.basename(path).startswith("part-"):
            part_reads.append(path)
        return real(path)

    ids = sorted(tbl["doc_id"].to_pylist())
    lo, hi = ids[len(ids) // 4], ids[len(ids) // 2]
    monkeypatch.setattr(fsio, "read_bytes", counting)
    src = P2RDatasource(out, key_range=("doc_id", lo, hi))
    assert part_reads == []
    # and the pruned plan still reads correctly
    monkeypatch.setattr(fsio, "read_bytes", real)
    got = rd.read_datasource(src).to_pandas()
    assert sorted(got["doc_id"]) == sorted(
        i for i in ids if lo <= i <= hi)
