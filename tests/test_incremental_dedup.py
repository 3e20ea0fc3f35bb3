"""P38 incremental dedup: an increment against a persisted hash index."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from parquet2_ray.pipelines.incremental_dedup import (
    append_hash_index,
    incremental_dedup,
    incremental_removal_ids,
    write_hash_index,
)


def _corpus(ids, texts):
    return rd.from_pandas(pd.DataFrame({"doc_id": ids, "text": texts}))


@pytest.fixture()
def index(tmp_path, ray_session):
    d = str(tmp_path / "hidx")
    hist = _corpus([1, 2, 3, 4],
                   ["alpha", "beta", "gamma", "beta"])  # 3 distinct
    total = write_hash_index(hist, d, nshards=8)
    assert total == 3
    return d


def test_removals_against_index_and_within_increment(index, ray_session):
    new = _corpus([10, 11, 12, 13, 14],
                  ["alpha",      # already in history → drop
                   "delta",      # fresh, first copy → keep
                   "delta",      # in-increment dup of 11 → drop
                   "beta",       # in history → drop
                   "epsilon"])   # fresh → keep
    rm = sorted(r["doc_id"] for r in
                incremental_removal_ids(new, index).take_all())
    assert rm == [10, 12, 13]


def test_incremental_dedup_filters_and_updates_index(index, ray_session):
    new = _corpus([10, 11, 12], ["alpha", "delta", "delta"])
    kept = incremental_dedup(new, index, update_index=True)
    assert sorted(r["doc_id"] for r in kept.take_all()) == [11]
    # tomorrow's increment: "delta" is now history; a new "zeta" is not
    nxt = _corpus([20, 21], ["delta", "zeta"])
    rm = [r["doc_id"] for r in incremental_removal_ids(nxt, index).take_all()]
    assert rm == [20]


def test_append_is_idempotent_and_counts_distinct(index, ray_session):
    inc = _corpus([30, 31], ["omega", "omega"])  # one distinct hash
    t1 = append_hash_index(inc, index)
    t2 = append_hash_index(inc, index)
    assert t1 == t2 == 3 + 1  # history's 3 + omega, stable on re-run


def test_rebuild_in_reused_dir_clears_stale_shards(tmp_path, ray_session):
    # rebuilding an index over a reused directory must not leak the old
    # corpus's hashes — every shard slot is overwritten
    d = str(tmp_path / "hidx3")
    write_hash_index(_corpus([1], ["ghost"]), d, nshards=8)
    write_hash_index(_corpus([2], ["real"]), d, nshards=8)
    new = _corpus([10, 11], ["ghost", "real"])
    rm = sorted(r["doc_id"] for r in
                incremental_removal_ids(new, d).take_all())
    assert rm == [11]  # "ghost" is NOT in the rebuilt index


def test_matches_batch_dedup_semantics(index, ray_session, tmp_path):
    # incremental(old, new) must equal batch-dedup(old ∪ new) restricted
    # to the increment: same min-id keeper, same hash equivalence
    rng = np.random.default_rng(7)
    texts = [f"t{int(v)}" for v in rng.integers(0, 40, 120)]
    old_ids = list(range(60))
    new_ids = list(range(1000, 1060))
    old = _corpus(old_ids, texts[:60])
    new = _corpus(new_ids, texts[60:])
    d = str(tmp_path / "hidx2")
    write_hash_index(old, d, nshards=8)
    got = sorted(r["doc_id"] for r in
                 incremental_removal_ids(new, d).take_all())
    # reference: pandas on the union — a NEW doc is dropped iff its text
    # appeared in old, or earlier (smaller id) within new
    df = pd.DataFrame({"doc_id": old_ids + new_ids, "text": texts})
    keepers = df.sort_values("doc_id").drop_duplicates("text")
    want = sorted(set(new_ids) - set(
        keepers[keepers.doc_id >= 1000].doc_id))
    assert got == want
