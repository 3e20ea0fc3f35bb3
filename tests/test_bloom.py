"""Split-block bloom filter (SURVEY.md A6) + manifest pruning (T1 analog)."""

import numpy as np
import pytest

from parquet2_ray.functions import bloom


def test_no_false_negatives():
    rng = np.random.default_rng(0)
    keys = [f"doc-{i:06d}" for i in range(5000)]
    h = bloom.hash_values(keys)
    bits = bloom.build(h, bloom.num_blocks_for(len(keys)))
    assert bloom.might_contain(bits, h).all()


def test_false_positive_rate_reasonable():
    keys = [f"doc-{i:06d}" for i in range(10_000)]
    other = [f"other-{i:06d}" for i in range(10_000)]
    bits = bloom.build(bloom.hash_values(keys), bloom.num_blocks_for(len(keys)))
    fp = bloom.might_contain(bits, bloom.hash_values(other)).mean()
    assert fp < 0.05, fp  # spec target ~1% at 10 bits/value


def test_empty_filter_and_probe():
    bits = bloom.build(np.empty(0, dtype=np.uint64), 1)
    assert len(bits) == 32
    assert bloom.might_contain(bits, bloom.hash_values(["x"])).tolist() == [False]
    assert bloom.might_contain(bits, np.empty(0, dtype=np.uint64)).size == 0


def test_block_index_spread():
    # multiplication method must hit every block for enough hashes
    h = bloom.hash_values([f"k{i}" for i in range(100_000)])
    idx = bloom._block_index(h, 64)
    assert set(idx.tolist()) == set(range(64))


@pytest.mark.usefixtures("ray_session")
def test_manifest_bloom_pruning(tmp_path):
    import pyarrow.parquet as pq

    from parquet2_ray.pipelines.encode_pipeline import (
        EncodeOptions,
        decode_dataset,
        encode_dataset,
        prune_partitions,
    )
    from parquet2_ray.sources.tokens import make_tokens_table

    src = tmp_path / "in.parquet"
    pq.write_table(make_tokens_table(2000, seed=1), src)
    out = str(tmp_path / "enc")
    s = encode_dataset(str(src), out, EncodeOptions(target_weight=100_000))
    assert s["n_partitions"] > 3

    tbl = pq.read_table(src)
    some_key = tbl["doc_id"][0].as_py()
    pruned = prune_partitions(out, [some_key])
    assert 1 <= len(pruned) < s["n_partitions"]

    ds = decode_dataset(out, key_values=[some_key])
    got = ds.to_pandas()
    assert some_key in set(got["doc_id"])  # no false negative

    # absent key: bloom may false-positive a few partitions but must
    # prune most of them
    pruned_absent = prune_partitions(out, ["definitely/not/a/doc"])
    assert len(pruned_absent) <= s["n_partitions"] // 2


@pytest.mark.usefixtures("ray_session")
def test_range_pruning(tmp_path):
    import pyarrow.parquet as pq

    from parquet2_ray.pipelines.encode_pipeline import (
        EncodeOptions,
        encode_dataset,
        prune_partitions_by_range,
    )
    from parquet2_ray.sources.tokens import make_tokens_table

    src = tmp_path / "in.parquet"
    pq.write_table(make_tokens_table(2000, seed=5), src)
    out = str(tmp_path / "enc")
    s = encode_dataset(str(src), out, EncodeOptions(target_weight=100_000))

    # n_tok is the weight-range partition key, so ranges are disjoint per
    # source and a narrow predicate must prune aggressively
    narrow = prune_partitions_by_range(out, "n_tok", lo=8, hi=9)
    assert len(narrow) < s["n_partitions"]
    everything = prune_partitions_by_range(out, "n_tok")
    assert len(everything) == s["n_partitions"]
    # column with no recorded stats (list column) keeps everything
    assert len(prune_partitions_by_range(out, "tokens", lo=0, hi=1)) == s["n_partitions"]
