"""P39 incremental near-dup: an increment against a persisted MinHash
band + signature index (no historical text ever re-read)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from parquet2_ray.pipelines.incremental_neardup import (
    append_minhash_index,
    incremental_neardup_ids,
    write_minhash_index,
)

BASE = ("the quick brown fox jumps over the lazy dog while the rain "
        "in spain stays mainly in the plain and every good boy does "
        "fine across the wide river delta under a copper sky")
OTHER = ("completely unrelated content about columnar storage engines "
         "streaming execution backpressure object stores and the "
         "economics of shuffle bandwidth on commodity networks")


def _corpus(ids, texts):
    return rd.from_pandas(pd.DataFrame({"doc_id": ids, "text": texts}))


@pytest.fixture()
def index(tmp_path, ray_session):
    d = str(tmp_path / "mhidx")
    hist = _corpus([1, 2], [BASE, OTHER])
    total = write_minhash_index(hist, d, nshards=8, sig_shards=8)
    assert total == 2
    return d


def test_exact_and_near_copies_flagged_distinct_kept(index, ray_session):
    near = BASE.replace("copper", "silver")   # tiny edit, high Jaccard
    fresh = ("fresh never seen before prose mentioning glaciers and "
             "tectonic drift in long enough form to carry shingles "
             "well past the window size of the hasher in use here")
    new = _corpus([10, 11, 12], [BASE, near, fresh])
    rm = sorted(r["doc_id"] for r in
                incremental_neardup_ids(new, index,
                                        threshold=0.7).take_all())
    assert rm == [10, 11]


def test_threshold_gates_acceptance(index, ray_session):
    # a moderate rewrite passes a low threshold but not a high one
    mid = BASE.replace("quick brown fox", "slow green turtle").replace(
        "copper sky", "granite ridge")
    new = _corpus([20], [mid])
    low = [r["doc_id"] for r in
           incremental_neardup_ids(new, index, threshold=0.35).take_all()]
    high = [r["doc_id"] for r in
            incremental_neardup_ids(new, index, threshold=0.999).take_all()]
    assert low == [20] and high == []


def test_append_makes_tomorrow_see_today(index, ray_session):
    today = _corpus([30], ["a genuinely novel paragraph about tidal "
                           "marsh ecology and sediment transport over "
                           "seasonal cycles in braided estuaries"])
    assert incremental_neardup_ids(today, index,
                                   threshold=0.7).take_all() == []
    append_minhash_index(today, index)
    tomorrow = _corpus([40], [today.take_all()[0]["text"]])
    rm = [r["doc_id"] for r in
          incremental_neardup_ids(tomorrow, index,
                                  threshold=0.7).take_all()]
    assert rm == [40]


def test_append_is_idempotent(index, ray_session):
    inc = _corpus([50], ["yet another long distinct passage regarding "
                         "the calibration of instrument baselines in "
                         "radio astronomy over decade long campaigns"])
    t1 = append_minhash_index(inc, index)
    t2 = append_minhash_index(inc, index)
    assert t1 == t2 == 3


def test_empty_blocks_in_increment(index, ray_session):
    # an increment containing empty blocks must flow through the
    # signature, band-probe, and verify-join stages without error
    empty = rd.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string())}))
    new = _corpus([60], [BASE]).union(empty)
    rm = [r["doc_id"] for r in
          incremental_neardup_ids(new, index, threshold=0.7).take_all()]
    assert rm == [60]


def test_rebuild_over_reused_dir_drops_stale_shards(tmp_path, ray_session):
    # rebuilding an index in a reused directory must not keep sig
    # shards from the previous corpus (every slot is overwritten)
    d = str(tmp_path / "mhidx2")
    total1 = write_minhash_index(_corpus([1, 2], [BASE, OTHER]), d,
                                 nshards=8, sig_shards=8)
    assert total1 == 2
    # second corpus routes to different sig shards (ids 3,4 vs 1,2)
    total2 = write_minhash_index(_corpus([3], [OTHER]), d,
                                 nshards=8, sig_shards=8)
    assert total2 == 1
    # the stale id-1 BASE signature must be gone: a BASE near-copy in
    # the increment is NOT flagged against the rebuilt index
    rm = incremental_neardup_ids(_corpus([70], [BASE]), d,
                                 threshold=0.7).take_all()
    assert rm == []
    # and append's meta-count bookkeeping agrees with the store
    assert append_minhash_index(_corpus([80], [BASE]), d) == 2
