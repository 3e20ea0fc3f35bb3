"""Row deletes over a container (delete_rows): pruning-proven
untouched partitions, atomic replaces flips, tombstones, bloom refine."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from parquet2_ray.pipelines.compact_pipeline import compact_container
from parquet2_ray.pipelines.delete_pipeline import delete_rows
from parquet2_ray.pipelines.encode_pipeline import (
    EncodeOptions,
    decode_dataset,
    encode_dataset,
)
from parquet2_ray.sources.tokens import make_tokens_table
from parquet2_ray.state import manifest as mf


def _decode_all(out: str) -> pa.Table:
    tabs = [pa.Table.from_pandas(b) for b in
            decode_dataset(out).iter_batches(batch_format="pandas")]
    if not tabs:  # fully-tombstoned container: zero batches
        return make_tokens_table(1, seed=0).slice(0, 0)
    return pa.concat_tables(tabs, promote_options="permissive")


def _sorted_pd(t: pa.Table):
    df = t.to_pandas().sort_values("doc_id").reset_index(drop=True)
    df["tokens"] = df["tokens"].map(tuple)
    return df


@pytest.fixture()
def container(ray_session, tmp_path):
    t = make_tokens_table(900, seed=31)
    src = str(tmp_path / "s.parquet")
    pq.write_table(t, src)
    out = str(tmp_path / "cont")
    encode_dataset(src, out, EncodeOptions(target_weight=40_000,
                                           fsync=False))
    return out, t


def test_range_delete_matches_filter(container, ray_session):
    out, t = container
    # high range: the (source, n_tok-quantile) partitioning leaves the
    # low-mass partitions provably outside it, so pruning spares them
    lo, hi = 6000, None
    before = mf.load_manifest(out)
    fps = {pid: r["fingerprint"] for pid, r in before.items()}
    s = delete_rows(out, "n_tok", lo=lo, hi=hi, fsync=False)
    mask = pc.less(t["n_tok"], lo)
    want = t.filter(mask)
    assert s["n_deleted"] == t.num_rows - want.num_rows
    got = _sorted_pd(_decode_all(out))
    assert got.equals(_sorted_pd(want)[got.columns])
    # untouched partitions kept their exact records (not rewritten)
    after = mf.load_manifest(out)
    untouched = [pid for pid in after if pid in fps]
    assert untouched  # pruning really spared some partitions
    for pid in untouched:
        assert after[pid]["fingerprint"] == fps[pid]


def test_value_delete_with_bloom_refine(container, ray_session):
    out, t = container
    victims = [t["doc_id"][0].as_py(), t["doc_id"][500].as_py()]
    s = delete_rows(out, "doc_id", values=victims, fsync=False)
    assert s["n_deleted"] == 2
    got = _decode_all(out)
    assert got.num_rows == t.num_rows - 2
    col = got["doc_id"].to_pylist()
    assert all(v not in col for v in victims)
    # the bloom refine kept the touch set tight: at most the partitions
    # that could contain the two ids were rewritten
    assert s["n_touched"] <= 2


def test_full_partition_delete_leaves_tombstone(container, ray_session):
    out, t = container
    # delete EVERYTHING → every partition becomes a tombstone
    s = delete_rows(out, "n_tok", lo=0, hi=None, fsync=False)
    assert s["n_rows"] == 0
    assert len(s["tombstones"]) == s["n_touched"] > 0
    assert _decode_all(out).num_rows == 0
    # verify passes; compaction GC folds the tombstones away
    from parquet2_ray.pipelines.verify_pipeline import verify_manifest
    assert verify_manifest(out)["n_bad"] == 0
    compact_container(out, target_weight=40_000)
    from parquet2_ray.pipelines.compact_pipeline import _raw_record_ids
    # replaced originals are swept; only tombstone records remain
    assert len(_raw_record_ids(out)) == len(mf.load_manifest(out))


def test_delete_predicate_validation(container, ray_session):
    out, _ = container
    with pytest.raises(ValueError, match="lo/hi OR values"):
        delete_rows(out, "n_tok")
    with pytest.raises(ValueError, match="lo/hi OR values"):
        delete_rows(out, "n_tok", lo=1, values=[1])


def test_delete_then_append_then_delete(ray_session, tmp_path):
    """Interop with the other maintenance ops."""
    from parquet2_ray.pipelines.append_pipeline import append_dataset

    out = str(tmp_path / "cont")
    opts = EncodeOptions(target_weight=30_000, fsync=False)
    t0 = make_tokens_table(300, seed=41)
    t1 = make_tokens_table(200, seed=42)
    t1 = t1.set_column(
        t1.column_names.index("doc_id"), "doc_id",
        pc.binary_join_element_wise(
            pa.array(["zzz/"] * t1.num_rows), t1["doc_id"], ""))
    p0, p1 = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
    pq.write_table(t0, p0)
    pq.write_table(t1, p1)
    append_dataset(p0, out, opts)
    delete_rows(out, "n_tok", lo=0, hi=50, fsync=False)
    append_dataset(p1, out, opts)
    delete_rows(out, "n_tok", lo=0, hi=50, fsync=False)
    want = pa.concat_tables([t0, t1]).filter(
        pc.greater(pa.concat_tables([t0, t1])["n_tok"], 50))
    got = _sorted_pd(_decode_all(out))
    assert got.equals(_sorted_pd(want)[got.columns])


def test_delete_column_validation(container, ray_session):
    out, _ = container
    with pytest.raises(ValueError, match="not in container schema"):
        delete_rows(out, "nope", lo=1)
    with pytest.raises(ValueError, match="comparable scalar"):
        delete_rows(out, "tokens", lo=1)
