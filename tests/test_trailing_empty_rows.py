"""Regression: per-row segment reductions must be IDENTICAL whether or
not empty rows trail the batch.

The old idiom — ``starts = clip(offsets[:-1], 0, size-1)`` before
``*.reduceat`` — collapsed a trailing empty row's segment onto the last
data element, STEALING it from the preceding row (code-review finding,
reproduced at five sites).  The fix appends a reduce-identity sentinel
and clips to ``size``.  Each test compares a batch with trailing
empty/None rows against the same rows alone."""

import numpy as np
import pandas as pd
import pyarrow as pa


BENCH = ["ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789abcd"]  # one 40-byte text


def test_decontaminate_trailing_empty_doc():
    from parquet2_ray.stages.decontaminate import (
        _tag_batch,
        benchmark_fingerprints,
    )

    fp = benchmark_fingerprints(BENCH, k=40)
    dirty = "zzzz" + BENCH[0]  # contamination is the FINAL window
    alone = _tag_batch(pa.table({"text": [dirty]}), fp, "text", 40, 1)
    trailed = _tag_batch(pa.table({"text": [dirty, "", ""]}), fp, "text", 40, 1)
    assert alone["n_contam_windows"][0].as_py() >= 1
    assert trailed["n_contam_windows"][0].as_py() == \
        alone["n_contam_windows"][0].as_py()
    assert trailed["contaminated"][0].as_py() is True


def test_lm_score_trailing_empty_and_null_docs():
    from parquet2_ray.stages.lm import score_batch, train_ngram_lm

    m = train_ngram_lm(pa.table({"text": ["the cat sat on the mat"]}))
    alone = score_batch(pa.table({"text": ["the cat"]}), m)
    for trailer in [""], [None], ["", None]:
        t = pa.table({"text": ["the cat"] + trailer})
        got = score_batch(t, m)
        assert got["lm_logprob"][0].as_py() == \
            alone["lm_logprob"][0].as_py(), trailer
        for i in range(1, t.num_rows):
            assert got["lm_logprob"][i].as_py() is None


def test_vocab_coverage_trailing_empty_row(ray_session):
    import ray.data as rd

    from parquet2_ray.stages.text import vocab_coverage

    rows = [{"i": 0, "tokens": [1, 2, 999]}, {"i": 1, "tokens": []}]
    ds = rd.from_items(rows).map_batches(
        lambda b: pa.table({
            "i": b["i"],
            "tokens": b["tokens"].combine_chunks().cast(pa.list_(pa.int32())),
        }), batch_format="pyarrow")
    out = vocab_coverage(ds, vocab_ids=[1, 2, 3]).to_pandas().set_index("i")
    assert out.loc[0, "n_oov"] == 1  # 999, the FINAL token
    assert out.loc[1, "n_oov"] == 0


def test_minhash_signature_trailing_empty_doc():
    from parquet2_ray.stages.dedup import minhash_signatures_batch

    text = "abcdefghij" * 4
    alone = minhash_signatures_batch(
        pa.table({"doc_id": [0], "text": [text]}), k=5, num_perm=16)
    trailed = minhash_signatures_batch(
        pa.table({"doc_id": [0, 1], "text": [text, ""]}), k=5, num_perm=16)
    assert alone["sig"][0].as_py() == trailed["sig"][0].as_py()
    umax = np.iinfo(np.uint64).max
    assert all(v == umax for v in trailed["sig"][1].as_py())


def test_simhash_trailing_empty_doc():
    from parquet2_ray.stages.dedup import simhash_batch

    df = pd.DataFrame({"doc_id": [0], "text": ["alpha beta gamma delta"]})
    alone = simhash_batch(df)
    df2 = pd.DataFrame({"doc_id": [0, 1],
                        "text": ["alpha beta gamma delta", ""]})
    trailed = simhash_batch(df2)
    assert alone["simhash"][0] == trailed["simhash"][0]
    assert trailed["simhash"][1] == 0  # empty doc convention
