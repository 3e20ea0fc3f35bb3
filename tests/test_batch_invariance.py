"""Batch-boundary invariance: per-row operator outputs must be a pure
function of the ROW, never of how rows were grouped into batches (the
trailing-empty reduceat bug was exactly a batching artifact).

Each property runs the per-batch kernel on one whole batch and on
every prefix/suffix split of the same rows, including splits that
isolate empty/None rows at batch edges, and requires identical
per-row outputs."""

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

WORDS = ["the", "cat", "sat", "on", "mat", "dog", "ran", ""]


def _texts(draw_lists):
    return [" ".join(ws) if ws is not None else None for ws in draw_lists]


texts_strategy = st.lists(
    st.one_of(st.none(),
              st.lists(st.sampled_from(WORDS), min_size=0, max_size=8)),
    min_size=1, max_size=8,
).map(_texts)


def _splits(n):
    return [(i,) for i in range(1, n)]


@settings(max_examples=40, deadline=None)
@given(texts=texts_strategy)
def test_decontaminate_tag_batch_split_invariant(texts):
    from parquet2_ray.stages.decontaminate import (
        _tag_batch,
        benchmark_fingerprints,
    )

    fp = benchmark_fingerprints(["the cat sat on the mat today ok"], k=12)
    texts = ["" if t is None else t for t in texts]  # tag needs strings
    whole = _tag_batch(pa.table({"text": texts}), fp, "text", 12, 1)
    for (cut,) in _splits(len(texts)):
        a = _tag_batch(pa.table({"text": texts[:cut]}), fp, "text", 12, 1)
        b = _tag_batch(pa.table({"text": texts[cut:]}), fp, "text", 12, 1)
        got = a["n_contam_windows"].to_pylist() + \
            b["n_contam_windows"].to_pylist()
        assert got == whole["n_contam_windows"].to_pylist(), (texts, cut)


@settings(max_examples=40, deadline=None)
@given(texts=texts_strategy)
def test_lm_score_batch_split_invariant(texts):
    from parquet2_ray.stages.lm import score_batch, train_ngram_lm

    model = train_ngram_lm(pa.table(
        {"text": ["the cat sat on the mat", "the dog ran"]}))
    whole = score_batch(pa.table({"text": pa.array(texts, pa.string())}),
                        model)["lm_logprob"].to_pylist()
    for (cut,) in _splits(len(texts)):
        a = score_batch(pa.table(
            {"text": pa.array(texts[:cut], pa.string())}), model)
        b = score_batch(pa.table(
            {"text": pa.array(texts[cut:], pa.string())}), model)
        got = a["lm_logprob"].to_pylist() + b["lm_logprob"].to_pylist()
        # float sums only: reduceat's pairwise-summation grouping shifts
        # with array length, so equality is to the last ulp, not exact
        assert len(got) == len(whole), (texts, cut)
        for g, w in zip(got, whole):
            if g is None or w is None:
                assert g is None and w is None, (texts, cut)
            else:
                assert g == w or abs(g - w) < 1e-11, (texts, cut)


@settings(max_examples=40, deadline=None)
@given(texts=texts_strategy)
def test_minhash_signatures_split_invariant(texts):
    from parquet2_ray.stages.dedup import minhash_signatures_batch

    texts = ["" if t is None else t for t in texts]
    ids = list(range(len(texts)))
    whole = minhash_signatures_batch(
        pa.table({"doc_id": ids, "text": texts}), k=4, num_perm=8
    )["sig"].to_pylist()
    for (cut,) in _splits(len(texts)):
        a = minhash_signatures_batch(
            pa.table({"doc_id": ids[:cut], "text": texts[:cut]}),
            k=4, num_perm=8)["sig"].to_pylist()
        b = minhash_signatures_batch(
            pa.table({"doc_id": ids[cut:], "text": texts[cut:]}),
            k=4, num_perm=8)["sig"].to_pylist()
        assert a + b == whole, (texts, cut)


@settings(max_examples=40, deadline=None)
@given(texts=texts_strategy)
def test_simhash_split_invariant(texts):
    from parquet2_ray.stages.dedup import simhash_batch

    texts = ["" if t is None else t for t in texts]
    ids = list(range(len(texts)))
    whole = simhash_batch(pd.DataFrame(
        {"doc_id": ids, "text": texts}))["simhash"].tolist()
    for (cut,) in _splits(len(texts)):
        a = simhash_batch(pd.DataFrame(
            {"doc_id": ids[:cut], "text": texts[:cut]}))["simhash"].tolist()
        b = simhash_batch(pd.DataFrame(
            {"doc_id": ids[cut:], "text": texts[cut:]}))["simhash"].tolist()
        assert a + b == whole, (texts, cut)
