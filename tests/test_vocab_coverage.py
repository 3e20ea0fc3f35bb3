"""OOV / vocab coverage (stages/text.py vocab_coverage)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from parquet2_ray.stages.text import vocab_coverage


@pytest.mark.usefixtures("ray_session")
def test_vocab_coverage_counts():
    rows = [
        {"seq_id": 0, "tokens": [1, 2, 3, 99, 100]},   # 2 oov
        {"seq_id": 1, "tokens": [1, 1, 1]},            # 0 oov
        {"seq_id": 2, "tokens": []},                   # empty
        {"seq_id": 3, "tokens": [500]},                # all oov
    ]
    ds = rd.from_items(rows).map_batches(
        lambda b: pa.table({
            "seq_id": b["seq_id"],
            "tokens": b["tokens"].combine_chunks().cast(pa.list_(pa.int32())),
        }), batch_format="pyarrow")
    out = vocab_coverage(ds, vocab_ids=range(50)).to_pandas().set_index("seq_id")
    assert out.loc[0, "n_oov"] == 2 and abs(out.loc[0, "oov_frac"] - 0.4) < 1e-12
    assert out.loc[1, "n_oov"] == 0
    assert out.loc[2, "n_oov"] == 0 and out.loc[2, "oov_frac"] == 0.0
    assert out.loc[3, "n_oov"] == 1 and out.loc[3, "oov_frac"] == 1.0


@pytest.mark.usefixtures("ray_session")
def test_vocab_coverage_tokens_table():
    """Full-vocab coverage on the real tokens shape → zero OOV; a
    truncated vocab flags exactly the ids above the cut (scalar
    reference)."""
    from parquet2_ray.sources.tokens import VOCAB, make_tokens_table

    tbl = make_tokens_table(400, seed=3)
    ds = rd.from_arrow(tbl)
    full = vocab_coverage(ds, range(VOCAB)).to_pandas()
    assert (full["n_oov"] == 0).all()

    cut = VOCAB // 2
    got = vocab_coverage(ds, range(cut)).to_pandas().set_index("doc_id")
    toks = tbl["tokens"].to_pylist()
    ids = tbl["doc_id"].to_pylist()
    for i in np.random.default_rng(0).choice(len(ids), 25, replace=False):
        expect = sum(1 for t in toks[i] if t >= cut)
        assert got.loc[ids[i], "n_oov"] == expect
