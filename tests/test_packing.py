"""Sequence packing + deterministic shuffle (training last-mile ops)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from parquet2_ray.stages.packing import (
    deterministic_shuffle,
    pack_sequences,
    pack_token_arrays,
)


def test_pack_token_arrays_golden():
    arrays = [np.array([1, 2, 3], np.int32), np.array([4, 5], np.int32)]
    packed, n_real = pack_token_arrays(arrays, max_len=4, pad_id=0)
    assert packed.tolist() == [[1, 2, 3, 4], [5, 0, 0, 0]]
    assert n_real.tolist() == [4, 1]


def test_pack_token_arrays_sep_and_drop():
    arrays = [np.array([1, 2], np.int32), np.array([3], np.int32)]
    packed, n_real = pack_token_arrays(arrays, max_len=3, sep_id=99)
    # stream with separators: 1 2 99 3 99 → rows [1,2,99], [3,99,pad]
    assert packed.tolist() == [[1, 2, 99], [3, 99, 0]]
    assert n_real.tolist() == [3, 2]
    packed, n_real = pack_token_arrays(arrays, max_len=3, sep_id=99,
                                       drop_last=True)
    assert packed.tolist() == [[1, 2, 99]]


def test_pack_token_arrays_empty():
    packed, n_real = pack_token_arrays([], max_len=8)
    assert packed.shape == (0, 8) and n_real.size == 0


def _tokens_ds(n=200, seed=1):
    rng = np.random.default_rng(seed)
    lens = rng.integers(1, 50, n)
    toks = [rng.integers(0, 50_000, l).astype(np.int32) for l in lens]
    tbl = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "tokens": pa.array([t.tolist() for t in toks],
                           type=pa.list_(pa.int32())),
    })
    return tbl, toks


def test_pack_sequences_preserves_every_token(ray_session):
    tbl, toks = _tokens_ds()
    out = pack_sequences(rd.from_arrow(tbl).repartition(4), max_len=128,
                         pad_id=-1, nshards=8).to_pandas()
    assert (out["tokens"].str.len() == 128).all()  # fixed-length rows
    # every token survives exactly once (multiset equality, padding out)
    got = []
    for row, nr in zip(out["tokens"], out["n_real"]):
        got.extend(list(row)[: int(nr)])
    want = np.concatenate([t for t in toks])
    assert sorted(got) == sorted(want.tolist())
    # padding only in final partial rows
    assert (out["n_real"] <= 128).all()


def test_pack_sequences_deterministic_and_ordered(ray_session):
    tbl, toks = _tokens_ds(80, seed=7)
    a = pack_sequences(rd.from_arrow(tbl).repartition(3), max_len=64,
                       nshards=4).to_pandas().sort_values("seq_id")
    b = pack_sequences(rd.from_arrow(tbl).repartition(7), max_len=64,
                       nshards=4).to_pandas().sort_values("seq_id")
    # identical output regardless of input partitioning
    assert a["seq_id"].tolist() == b["seq_id"].tolist()
    assert [list(x) for x in a["tokens"]] == [list(x) for x in b["tokens"]]
    # inside a shard, the stream is doc_id-ordered: doc 0's first token
    # opens that shard's row 0
    from parquet2_ray.functions.hashing import shard_of

    sid0 = int(shard_of(np.array([0], np.int64), 4)[0])
    row0 = a[a["seq_id"] == f"{sid0}/0"]["tokens"].iloc[0]
    first_docs = sorted(
        i for i in range(80)
        if int(shard_of(np.array([i], np.int64), 4)[0]) == sid0)
    assert list(row0[: len(toks[first_docs[0]])]) == \
        toks[first_docs[0]].tolist()


def test_pack_sequences_string_ids_and_sep(ray_session):
    tbl = pa.table({
        "doc_id": pa.array(["a", "b", "c"]),
        "tokens": pa.array([[1, 2], [3], [4, 5, 6]],
                           type=pa.list_(pa.int32())),
    })
    out = pack_sequences(rd.from_arrow(tbl), max_len=5, sep_id=0,
                         nshards=2).to_pandas()
    total_real = int(out["n_real"].sum())
    assert total_real == 6 + 3  # tokens + one separator per doc


def test_deterministic_shuffle_reproducible(ray_session):
    tbl = pa.table({"doc_id": pa.array(np.arange(100, dtype=np.int64)),
                    "v": pa.array(np.arange(100.0))})
    a = deterministic_shuffle(rd.from_arrow(tbl).repartition(5),
                              seed=3).to_pandas()
    b = deterministic_shuffle(rd.from_arrow(tbl).repartition(2),
                              seed=3).to_pandas()
    c = deterministic_shuffle(rd.from_arrow(tbl), seed=4).to_pandas()
    assert a["doc_id"].tolist() == b["doc_id"].tolist()   # same seed
    assert a["doc_id"].tolist() != c["doc_id"].tolist()   # new epoch
    assert a["doc_id"].tolist() != sorted(a["doc_id"].tolist())  # shuffled


# ---- round-3 text additions: scrub / chunk / repetition signals ----

def test_scrub_text_batch(ray_session):
    import pandas as pd

    from parquet2_ray.stages.text import scrub_text_batch

    df = pd.DataFrame({
        "doc_id": [1, 2],
        "text": ["mail me at a.b@example.com or visit https://x.io/page now",
                 "call +1 (555) 123-4567 twice, no pii here otherwise"],
        "source": ["web", "books"],
    })
    out = scrub_text_batch(df)
    # pass-through columns (provenance) survive the scrub untouched
    assert out["source"].tolist() == ["web", "books"]
    assert out["n_email"].tolist() == [1, 0]
    assert out["n_url"].tolist() == [1, 0]
    assert out["n_phone"].tolist() == [0, 1]
    assert "<EMAIL>" in out["text"][0] and "<URL>" in out["text"][0]
    assert "<PHONE>" in out["text"][1]
    assert "a.b@example.com" not in out["text"][0]


def test_chunk_documents_batch():
    import pandas as pd

    from parquet2_ray.stages.text import chunk_documents_batch

    df = pd.DataFrame({"doc_id": [7, 8, 9],
                       "text": ["abcdefghij", "xy", ""]})
    out = chunk_documents_batch(df, chunk_chars=4, overlap=1)
    seven = out[out["doc_id"] == 7]
    # windows of 4 chars, step 3: abcd, defg, ghij (full coverage, no
    # redundant tail window that would add zero new characters)
    assert seven["chunk_text"].tolist() == ["abcd", "defg", "ghij"]
    assert seven["char_start"].tolist() == [0, 3, 6]
    assert out[out["doc_id"] == 8]["chunk_text"].tolist() == ["xy"]
    assert len(out[out["doc_id"] == 9]) == 0  # empty doc → no chunks
    # reconstruction: stripping the overlap re-concatenates the doc
    rec = "".join(c if i == 0 else c[1:]
                  for i, c in enumerate(seven["chunk_text"]))
    assert rec == "abcdefghij"


def test_repetition_signals_batch():
    import pandas as pd

    from parquet2_ray.stages.text import repetition_signals_batch

    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["same line\nsame line\nsame line\nother",
                 "all words distinct here today friend",
                 "spam spam spam spam spam spam"],
    })
    out = repetition_signals_batch(df, ngram=2)
    assert out["dup_line_frac"][0] == pytest.approx(0.5)   # 2 dups of 4
    assert out["dup_line_frac"][1] == 0.0
    assert out["top_ngram_frac"][1] == pytest.approx(2 / 6)
    assert out["top_ngram_frac"][2] == pytest.approx(1.0)  # all same bigram


def test_prepare_training_data_end_to_end(ray_session, tmp_path):
    """The composite corpus pipeline: scrub → dedup → gate → tokenize →
    pack → encode container, with bit-identity on decode."""
    import pandas as pd
    import ray.data as rd

    from parquet2_ray.pipelines.encode_pipeline import decode_dataset
    from parquet2_ray.pipelines.prepare_pipeline import prepare_training_data

    texts = {
        0: "the quick brown fox jumps over a lazy dog near the river bank",
        1: "the quick brown fox jumps over a lazy dog near the river bank",
        2: "contact me at who@example.org for details about the corpus",
        3: "boiler\nboiler\nboiler\nboiler\nboiler\nboiler\nboiler\nreal",
        4: "a completely different document with plenty of fresh words",
    }
    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": list(texts), "text": list(texts.values())}))
    out = str(tmp_path / "prep")
    s = prepare_training_data(docs, out, max_len=16, nshards=4,
                              max_dup_line_frac=0.7)
    # doc 1 deduped away (exact copy of 0); doc 3 gated (dup frac 0.75)
    assert s["kept_docs"] == 4
    dec = decode_dataset(out).to_pandas()
    assert s["packed_rows"] == len(dec)
    assert (dec["tokens"].str.len() == 16).all()
    # the scrubbed email must not survive into any token stream: the
    # placeholder hash differs from the raw address hash
    from parquet2_ray.sources.readers import _word_token_ids
    raw_tok = int(_word_token_ids(["who@example.org"])[0])
    scrub_tok = int(_word_token_ids(["<EMAIL>"])[0])
    all_tokens = {t for row in dec["tokens"] for t in row}
    assert raw_tok not in all_tokens and scrub_tok in all_tokens
    # token conservation: total real tokens == sum of kept docs' words
    kept_texts = [texts[0].replace("who@example.org", "<EMAIL>"),
                  texts[2].replace("who@example.org", "<EMAIL>"),
                  texts[4]]
    expect = sum(len(t.split()) for t in kept_texts)
    assert int(dec["n_real"].sum()) == expect


def test_prepare_with_benchmark_decontamination(ray_session, tmp_path):
    """prepare_training_data(benchmark_texts=...) drops contaminated
    docs BEFORE dedup, so a contaminated duplicate can't become the
    kept copy."""
    import pandas as pd
    import ray.data as rd

    from parquet2_ray.pipelines.prepare_pipeline import prepare_training_data

    bench = ["the secret benchmark passage that must never leak into training"]
    texts = {
        0: "an ordinary training document with plenty of regular words here",
        # contaminated (embeds the full benchmark passage)
        1: "prefix words then " + bench[0] + " and suffix words after it",
        2: "another clean document that should flow through the pipeline",
    }
    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": list(texts), "text": list(texts.values())}))
    out = str(tmp_path / "prep-decon")
    s = prepare_training_data(docs, out, max_len=16, nshards=2,
                              benchmark_texts=bench)
    assert s["kept_docs"] == 2  # doc 1 removed by decontamination


def test_prepare_with_lm_gate(ray_session, tmp_path):
    """prepare_training_data(lm_ref_texts, lm_min_logprob) drops docs
    unlike the reference corpus."""
    import pandas as pd
    import ray.data as rd

    from parquet2_ray.pipelines.prepare_pipeline import prepare_training_data

    ref = ["the cat sat on the mat and the dog ran over the rug"]
    texts = {
        0: "the cat sat on the mat",            # reference-like
        1: "qz vx jk wq zz xq kj zv",           # gibberish, all OOV
        2: "the dog ran over the rug",          # reference-like
    }
    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": list(texts), "text": list(texts.values())}))
    out = str(tmp_path / "prep-lm")
    s = prepare_training_data(docs, out, max_len=16, nshards=2,
                              lm_ref_texts=ref, lm_min_logprob=-1.5)
    # kept_docs counts DEDUP keepers (gates run later); the proof the
    # gibberish doc was gated is token conservation in the container
    from parquet2_ray.pipelines.encode_pipeline import decode_dataset

    dec = decode_dataset(out).to_pandas()
    expect = sum(len(texts[i].split()) for i in (0, 2))
    assert int(dec["n_real"].sum()) == expect
    assert s["kept_docs"] == 3  # dedup kept all three; the LM gate cut
