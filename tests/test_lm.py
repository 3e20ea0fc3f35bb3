"""CCNet-style n-gram LM quality scoring (stages/lm.py)."""

import math

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from parquet2_ray.stages.lm import (
    BACKOFF,
    lm_score,
    score_batch,
    train_ngram_lm,
)

REF = pa.table({"text": [
    "the cat sat on the mat",
    "the dog sat on the rug",
    "the cat and the dog",
]})


def test_train_counts():
    m = train_ngram_lm(REF)
    assert m["total"] == 17  # whitespace tokens
    # "the" appears 6 times
    from parquet2_ray.functions.hashing import hash_strings
    h_the = np.uint64(hash_strings(np.array(["the"], dtype=object))[0])
    at = np.searchsorted(m["uni_h"], h_the)
    assert m["uni_h"][at] == h_the and m["uni_c"][at] == 6
    # bigram "sat on" appears twice; no cross-doc bigram exists:
    # ("mat","the") would only arise by gluing doc 1 to doc 2
    def bi(w1, w2):
        from parquet2_ray.stages.lm import _GOLDEN
        hs = hash_strings(np.array([w1, w2], dtype=object)).astype(np.uint64)
        return (hs[0] * _GOLDEN) ^ hs[1]
    at = np.searchsorted(m["bi_h"], bi("sat", "on"))
    assert m["bi_h"][at] == bi("sat", "on") and m["bi_c"][at] == 2
    idx = np.searchsorted(m["bi_h"], bi("mat", "the"))
    assert idx == len(m["bi_h"]) or m["bi_h"][idx] != bi("mat", "the")


def test_scalar_reference_score():
    """Hand-computed stupid-backoff logprob for one doc."""
    m = train_ngram_lm(REF)
    out = score_batch(pa.table({"text": ["the cat sat"]}), m)
    total = m["total"]
    # p(the) = 6/17 ; p(cat|the) = c(the cat)/c(the) = 2/6 ;
    # p(sat|cat) = c(cat sat)/c(cat) = 1/2
    expect = (math.log10(6 / total) + math.log10(2 / 6)
              + math.log10(1 / 2)) / 3
    assert out["lm_logprob"][0].as_py() == pytest.approx(expect, rel=1e-9)
    assert out["lm_oov_frac"][0].as_py() == 0.0


def test_backoff_and_oov():
    m = train_ngram_lm(REF)
    # "zebra" unseen: unigram floor; "the zebra" unseen bigram: backoff
    out = score_batch(pa.table({"text": ["the zebra"]}), m)
    total = m["total"]
    floor = 1 / (10 * total)
    expect = (math.log10(6 / total) + math.log10(max(BACKOFF * floor, floor))) / 2
    assert out["lm_logprob"][0].as_py() == pytest.approx(expect, rel=1e-9)
    assert out["lm_oov_frac"][0].as_py() == pytest.approx(0.5)
    # empty doc → null score, zero oov
    out = score_batch(pa.table({"text": [""]}), m)
    assert out["lm_logprob"][0].as_py() is None
    assert out["lm_oov_frac"][0].as_py() == 0.0


@pytest.mark.usefixtures("ray_session")
def test_lm_score_separates_reference_like_from_gibberish():
    rng = np.random.default_rng(8)
    gib = lambda: " ".join(
        "".join(chr(c) for c in rng.integers(97, 123, 8)) for _ in range(12))
    docs = [{"doc_id": i, "text": "the cat sat on the mat and the dog"}
            for i in range(10)]
    docs += [{"doc_id": 100 + i, "text": gib()} for i in range(10)]
    scored = lm_score(rd.from_items(docs), train_ngram_lm(REF)).to_pandas()
    like = scored[scored["doc_id"] < 100]["lm_logprob"]
    junk = scored[scored["doc_id"] >= 100]["lm_logprob"]
    assert like.min() > junk.max() + 1.0  # clear margin in log10 space
    assert (scored[scored["doc_id"] >= 100]["lm_oov_frac"] == 1.0).all()


@pytest.mark.usefixtures("ray_session")
def test_train_from_dataset_matches_table():
    m1 = train_ngram_lm(REF)
    m2 = train_ngram_lm(rd.from_arrow(REF))
    for k in ("uni_h", "uni_c", "bi_h", "bi_c"):
        assert (m1[k] == m2[k]).all()
    assert m1["total"] == m2["total"]


def test_whitespace_tokenization_newlines_tabs():
    """Web text splits on ALL whitespace — a single-space split would
    glue 'mat.\\nThe' into one pseudo-token (review finding)."""
    from parquet2_ray.stages.lm import _doc_word_hashes

    h1, o1 = _doc_word_hashes(pa.array(["hello world two"]))
    h2, o2 = _doc_word_hashes(pa.array(["hello\nworld\ttwo"]))
    assert o1.tolist() == o2.tolist() == [0, 3]
    assert h1.tolist() == h2.tolist()
