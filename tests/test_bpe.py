"""BPE subword tokenizer: distributed train + actor-pool apply
(stages/bpe.py).  The golden vector is the Sennrich et al. 2016
low/lower/newest/widest corpus, whose first merges are fixed by the
algorithm definition."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from parquet2_ray.stages.bpe import (
    EOW,
    BpeApply,
    bpe_vocab,
    encode_word,
    train_bpe,
)


def _sennrich_ds():
    # word frequencies: low×5, lower×2, newest×6, widest×3
    docs = (["low"] * 5 + ["lower"] * 2 + ["newest"] * 6
            + ["widest"] * 3)
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs),
    }))


def test_sennrich_golden_merges(ray_session):
    merges = train_bpe(_sennrich_ds(), n_merges=4)
    # est(6 in newest)+est(3 in widest) = 9 is the dominant pair chain:
    # (e,s)=9 → (es,t)=9 → (est,</w>)=9 → then (l,o)=7
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", EOW)
    assert merges[3] == ("l", "o")


def test_train_deterministic_across_block_layouts(ray_session):
    rng = np.random.default_rng(7)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    docs = [" ".join(rng.choice(vocab, size=rng.integers(3, 12)))
            for _ in range(300)]
    tbl = pa.table({"doc_id": pa.array(range(300), pa.int64()),
                    "text": pa.array(docs)})
    m1 = train_bpe(rd.from_arrow(tbl), n_merges=30)
    m2 = train_bpe(rd.from_arrow(tbl).repartition(13), n_merges=30)
    # block layout must not change the learned merges; the tiny vocab
    # exhausts (every remaining pair unique) before 30 merges
    assert m1 == m2 and len(m1) >= 20


def test_encode_word_roundtrip_and_compression():
    merges = [("e", "s"), ("es", "t"), ("est", EOW), ("l", "o"),
              ("lo", "w")]
    ranks = {p: i for i, p in enumerate(merges)}
    for w in ("lowest", "low", "newest", "slow", "w"):
        syms = encode_word(w, ranks)
        # roundtrip: concatenation reproduces word + EOW marker
        assert "".join(syms) == w + EOW
    assert encode_word("newest", ranks)[-1] == "est" + EOW
    assert encode_word("low", ranks) == ["low", EOW]


def test_apply_stage_matches_driver_encode(ray_session):
    ds = _sennrich_ds()
    merges = train_bpe(ds, n_merges=6)
    ranks = {p: i for i, p in enumerate(merges)}
    vocab = bpe_vocab(merges)

    out = (ds.map_batches(BpeApply, batch_format="pandas",
                          concurrency=2,
                          fn_constructor_args=(merges,))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    texts = (["low"] * 5 + ["lower"] * 2 + ["newest"] * 6
             + ["widest"] * 3)
    enc = BpeApply(merges)
    for i, t in enumerate(texts):
        want = []
        for w in t.split():
            want.extend(enc._sym_id(s) for s in encode_word(w, ranks))
        assert list(out.loc[i, "bpe_ids"]) == want
        assert out.loc[i, "n_bpe"] == len(want)
    # ids are consistent with the vocab for learned symbols
    assert vocab["est" + EOW] in set(
        x for row in out["bpe_ids"] for x in row)


def test_apply_handles_nulls_and_unknown_chars(ray_session):
    merges = [("a", "b")]
    df = pd.DataFrame({"doc_id": [0, 1, 2],
                       "text": [None, "ab ab", "héllo ☃"]})
    out = BpeApply(merges)(df)
    assert out.loc[0, "n_bpe"] == 0
    # 'ab' merges then gets EOW as a separate symbol
    assert out.loc[1, "bpe_ids"][:2] == [257, 256]
    # unknown high codepoints map deterministically
    snowman = 2_000_000 + ord("☃")
    assert snowman in out.loc[2, "bpe_ids"]


def test_trainer_stops_when_no_pair_repeats(ray_session):
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "text": pa.array(["xyz"]),
    }))
    merges = train_bpe(ds, n_merges=50)
    # every pair occurs once — nothing merges
    assert merges == []


@pytest.mark.usefixtures("ray_session")
def test_bpe_cli_train_and_apply(tmp_path, capsys):
    import json

    import pyarrow.parquet as pq

    from parquet2_ray.job import main

    docs = (["low"] * 5 + ["lower"] * 2 + ["newest"] * 6
            + ["widest"] * 3)
    src = tmp_path / "docs.parquet"
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs),
    }), str(src))
    mpath = str(tmp_path / "merges.json")
    out = str(tmp_path / "enc")
    assert main(["bpe", "--input", str(src), "--n-merges", "4",
                 "--merges-out", mpath, "--output", out,
                 "--concurrency", "2"]) == 0
    r = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r["n_merges"] == 4
    assert json.loads(open(mpath).read())[0] == ["e", "s"]
    enc = pq.read_table(out)
    assert enc.num_rows == len(docs)
    assert set(enc.column_names) == {"doc_id", "bpe_ids", "n_bpe"}
    # re-apply from the saved merges: identical encoding
    out2 = str(tmp_path / "enc2")
    assert main(["bpe", "--input", str(src), "--merges-in", mpath,
                 "--output", out2, "--concurrency", "2"]) == 0
    capsys.readouterr()
    a = pq.read_table(out).to_pandas().sort_values("doc_id")
    b = pq.read_table(out2).to_pandas().sort_values("doc_id")
    assert (a["n_bpe"].to_numpy() == b["n_bpe"].to_numpy()).all()
    assert all(list(x) == list(y)
               for x, y in zip(a["bpe_ids"], b["bpe_ids"]))
