"""Tests for training-data ops: dedup, text analysis, similarity, multimodal."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from parquet2_ray.stages.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures_batch,
    ngram_jaccard,
    simhash_batch,
)
from parquet2_ray.stages.multimodal import FeatureExtract, FrameSample, ImageDecode
from parquet2_ray.stages.similarity import ann_topk, lsh_bucketed_topk
from parquet2_ray.stages.text import (
    LangId,
    char_stats_batch,
    md5_batch,
    token_count_batch,
)


def _docs_table(n=60, dup_groups=5, seed=3):
    rng = np.random.default_rng(seed)
    vocab = ["data", "table", "row", "batch", "spark", "ray", "query", "join"]
    texts = []
    for i in range(n):
        words = rng.choice(vocab, size=rng.integers(20, 60)).tolist()
        texts.append(" ".join(words))
    # inject exact duplicates
    for g in range(dup_groups):
        texts[n - 1 - g] = texts[g]
    # inject near duplicates (single word changed)
    texts[10] = texts[11][: len(texts[11]) // 2] + texts[11][len(texts[11]) // 2 :].replace("data", "datum", 1)
    return pa.table(
        {
            "doc_id": pa.array(range(n), type=pa.int64()),
            "text": pa.array(texts),
        }
    )


def test_exact_dedup(ray_session):
    tbl = _docs_table()
    ds = rd.from_arrow(tbl)
    out = exact_dedup(ds).to_pandas()
    assert out["n_copies"].sum() == tbl.num_rows
    assert (out["n_copies"] > 1).sum() == 5
    # keeper is the min doc_id of each duplicate group
    dups = out[out["n_copies"] > 1]
    assert set(dups["doc_id"]) == {0, 1, 2, 3, 4}


def test_minhash_signatures_shape_and_determinism():
    tbl = _docs_table()
    s1 = minhash_signatures_batch(tbl, num_perm=32)
    s2 = minhash_signatures_batch(tbl, num_perm=32)
    assert s1.equals(s2)
    sigs = np.asarray(s1["sig"].combine_chunks().values).reshape(-1, 32)
    assert sigs.shape == (tbl.num_rows, 32)
    # identical docs → identical signatures
    assert (sigs[0] == sigs[-1]).all()


def test_minhash_estimates_jaccard():
    a = "the quick brown fox jumps over the lazy dog " * 5
    b = "the quick brown fox jumped over the lazy dog " * 5
    tbl = pa.table({"doc_id": pa.array([0, 1], type=pa.int64()),
                    "text": pa.array([a, b])})
    sigs = np.asarray(
        minhash_signatures_batch(tbl, num_perm=128)["sig"].combine_chunks().values
    ).reshape(2, 128)
    est = (sigs[0] == sigs[1]).mean()
    true = ngram_jaccard(a, b, k=5)
    assert abs(est - true) < 0.15


def test_minhash_lsh_pairs_finds_dups(ray_session):
    tbl = _docs_table()
    ds = rd.from_arrow(tbl)
    pairs = minhash_lsh_pairs(ds, threshold=0.9).to_pandas()
    found = {tuple(sorted(p)) for p in zip(pairs["id_a"], pairs["id_b"])}
    for g in range(5):  # exact dup pairs must be found with est_jaccard 1.0
        assert (g, 59 - g) in found
    # near-dup pair (10, 11) should surface too
    assert (10, 11) in found
    assert not pairs.duplicated(subset=["id_a", "id_b"]).any()


def test_simhash_near_dups_close():
    tbl = _docs_table()
    out = simhash_batch(tbl.to_pandas())
    h = out["simhash"].to_numpy().astype(np.uint64)
    assert (h[0] == h[59]) and (h[1] == h[58])  # exact dups equal
    d_near = bin(int(h[10]) ^ int(h[11])).count("1")
    rand = [bin(int(h[i]) ^ int(h[i + 20])).count("1") for i in range(5, 10)]
    assert d_near <= min(rand)


def test_simhash_empty_doc():
    df = pd.DataFrame({"doc_id": [0, 1], "text": ["", "hello world"]})
    out = simhash_batch(df)
    assert out["simhash"][0] == 0
    assert out["simhash"][1] != 0


def test_text_batches():
    df = pd.DataFrame(
        {"doc_id": [0, 1, 2], "text": ["a b  c", "", "one\ntwo three "]}
    )
    tc = token_count_batch(df)
    assert tc["n_ws_tok"].tolist() == [3, 0, 3]
    cs = char_stats_batch(df)
    assert cs["n_chars2"].tolist() == [6, 0, 14]
    assert cs["n_lines"].tolist() == [0, 0, 1]
    fp = md5_batch(df)
    import hashlib

    assert fp["fp"][0] == hashlib.md5(b"a b  c").hexdigest()


def test_lang_id():
    li = LangId()
    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "the cat sat on the mat and it is happy",
                "der hund ist ein gutes tier und die katze",
                "xyzzy qwerty",
            ],
        }
    )
    out = li(df)
    assert out["lang_pred"].tolist() == ["en", "de", "und"]


def _emb_table(n=200, dim=16, seed=5):
    rng = np.random.default_rng(seed)
    m = rng.normal(size=(n, dim)).astype(np.float32)
    return pa.table(
        {
            "vec_id": pa.array(range(n), type=pa.int64()),
            "embedding": pa.array([r.tolist() for r in m], type=pa.list_(pa.float32())),
        }
    ), m


def test_ann_topk_matches_numpy(ray_session):
    tbl, m = _emb_table()
    ds = rd.from_arrow(tbl)
    q = m[:3].astype(np.float64)
    out = ann_topk(ds, q, [0, 1, 2], k=5).to_pandas()
    # brute-force reference
    mm = m.astype(np.float64)
    mm = mm / np.linalg.norm(mm, axis=1, keepdims=True)
    for qi in range(3):
        sims = mm @ (q[qi] / np.linalg.norm(q[qi]))
        order = np.lexsort((np.arange(len(sims)), -sims))[:5]
        got = out[out["query_id"] == qi].sort_values("rank")["vec_id"].tolist()
        assert got == order.tolist()
        assert got[0] == qi  # self is rank 1


def test_ann_topk_driver_gather_bounded(ray_session):
    """VERDICT r4 #1: the final merge is distributed — the driver-side
    gather is exactly queries × k rows regardless of block count, and
    the result is block-count invariant."""
    from parquet2_ray.stages import similarity as sim

    tbl, m = _emb_table(n=300)
    q = m[:4].astype(np.float64)
    qids = [10, 11, 12, 13]
    base = ann_topk(rd.from_arrow(tbl), q, qids, k=6)
    for nblocks in (1, 7, 32):
        ds = rd.from_arrow(tbl).repartition(nblocks)
        # count the merged dataset the driver would take_all(): must be
        # queries × k rows even with 32 candidate blocks feeding it
        gathered = []
        orig = sim.rd.Dataset.take_all

        def counting_take_all(self, *a, **kw):
            rows = orig(self, *a, **kw)
            gathered.append(len(rows))
            return rows

        sim.rd.Dataset.take_all = counting_take_all
        try:
            out = ann_topk(ds, q, qids, k=6)
        finally:
            sim.rd.Dataset.take_all = orig
        assert gathered == [len(qids) * 6]
        assert out.equals(base)


def test_lsh_bucketed_topk_recall(ray_session):
    tbl, m = _emb_table(n=500)
    ds = rd.from_arrow(tbl)
    q = m[:2].astype(np.float64)
    exact = ann_topk(ds, q, [0, 1], k=5).to_pandas()
    approx = lsh_bucketed_topk(ds, q, [0, 1], k=5, n_planes=4).to_pandas()
    # the query vector itself always lands in its own bucket
    for qi in (0, 1):
        a = approx[approx["query_id"] == qi]
        assert a.iloc[0]["vec_id"] == qi
        e_ids = set(exact[exact["query_id"] == qi]["vec_id"])
        assert len(set(a["vec_id"]) & e_ids) >= 2  # decent recall at 4 planes


def test_multimodal_fake_plumbing(ray_session):
    rng = np.random.default_rng(0)
    blobs = [rng.bytes(100) for _ in range(20)]
    tbl = pa.table(
        {
            "video_id": pa.array(range(20), type=pa.int64()),
            "image": pa.array(blobs, type=pa.binary()),
            "video": pa.array(blobs, type=pa.binary()),
        }
    )
    ds = rd.from_arrow(tbl)
    dec = ds.map_batches(ImageDecode, fn_constructor_kwargs={"backend": "fake"},
                         batch_size=8, concurrency=2, batch_format="pyarrow")
    out = dec.to_pandas()
    assert (out["n_pixels"] == out["width"].astype("int64") * out["height"].astype("int64")).all()
    feats = ds.map_batches(FeatureExtract, fn_constructor_kwargs={"backend": "fake"},
                           batch_size=8, concurrency=2, batch_format="pyarrow").to_pandas()
    assert all(len(f) == 64 for f in feats["features"])
    frames = ds.select_columns(["video_id", "video"]).map_batches(
        FrameSample, fn_constructor_kwargs={"backend": "fake"},
        batch_size=8, concurrency=2, batch_format="pyarrow"
    ).to_pandas()
    assert (frames["frame_idx"] % 10 == 0).all()


def test_multimodal_real_backend(ray_session):
    from parquet2_ray.stages.multimodal import (
        AudioFeatures, ImageResize, decode_image, encode_ppm, encode_rawv,
        encode_wav)

    rng = np.random.default_rng(1)
    imgs = [rng.integers(0, 256, (24 + i, 32 + i, 3), dtype=np.uint8)
            for i in range(8)]
    vids = [rng.integers(0, 256, (25, 8, 6, 3), dtype=np.uint8)
            for _ in range(4)]
    rate = 8000
    t = np.arange(rate) / rate
    wavs = [encode_wav((10_000 * np.sin(2 * np.pi * f * t)).astype(np.int16), rate)
            for f in (440.0, 1000.0)]
    tbl = pa.table({
        "video_id": pa.array(range(8), type=pa.int64()),
        "image": pa.array([encode_ppm(im) for im in imgs], type=pa.binary()),
        "video": pa.array([encode_rawv(v) for v in vids] * 2, type=pa.binary()),
    })
    ds = rd.from_arrow(tbl)

    dec = ds.map_batches(ImageDecode, batch_size=4, concurrency=2,
                         batch_format="pyarrow").to_pandas().sort_values("video_id")
    assert list(dec["width"]) == [32 + i for i in range(8)]
    assert list(dec["height"]) == [24 + i for i in range(8)]
    for i in range(8):
        assert abs(dec["mean_lum"].iloc[i] - imgs[i].mean()) < 1e-6

    rs = ds.map_batches(ImageResize, fn_constructor_kwargs={"width": 8, "height": 8},
                        batch_size=4, concurrency=2, batch_format="pyarrow").to_pandas()
    shapes = {decode_image(b).shape for b in rs["image"]}
    assert shapes == {(8, 8, 3)}

    feats = ds.map_batches(FeatureExtract, batch_size=4, concurrency=2,
                           batch_format="pyarrow").to_pandas()
    for f in feats["features"]:
        v = np.asarray(f)
        assert v.shape == (64,) and abs(np.linalg.norm(v) - 1.0) < 1e-5

    frames = ds.select_columns(["video_id", "video"]).map_batches(
        FrameSample, fn_constructor_kwargs={"every_n": 10},
        batch_size=4, concurrency=2, batch_format="pyarrow").to_pandas()
    assert sorted(set(frames["frame_idx"])) == [0, 10, 20]
    one = frames[(frames["video_id"] == 0) & (frames["frame_idx"] == 10)]
    got = decode_image(one["frame"].iloc[0])
    assert np.array_equal(got, vids[0][10])

    at = pa.table({"audio_id": pa.array([0, 1], type=pa.int64()),
                   "audio": pa.array(wavs, type=pa.binary())})
    af = rd.from_arrow(at).map_batches(
        AudioFeatures, batch_size=2, concurrency=2,
        batch_format="pyarrow").to_pandas().sort_values("audio_id")
    assert abs(af["duration_s"].iloc[0] - 1.0) < 1e-9
    assert abs(af["dom_freq_hz"].iloc[0] - 440.0) < 2.0
    assert abs(af["dom_freq_hz"].iloc[1] - 1000.0) < 2.0
    # sine rms = A/sqrt(2) = (10000/32768)/sqrt(2) ≈ 0.2158
    assert 0.21 < af["rms"].iloc[0] < 0.22


def test_embed_neardup_pairs(ray_session):
    import ray.data as rd

    from parquet2_ray.stages.similarity import neardup_pairs

    ds = rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    pairs = neardup_pairs(ds, threshold=0.45).to_pandas()
    assert len(pairs) > 0
    assert (pairs["a_id"] < pairs["b_id"]).all()
    assert not pairs.duplicated(["a_id", "b_id"]).any()
    # absurd threshold finds nothing
    empty = neardup_pairs(ds, threshold=0.999).to_pandas()
    assert len(empty) == 0


def test_verified_neardup_pairs(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from parquet2_ray.stages.dedup import verified_neardup_pairs

    base = "the quick brown fox jumps over the lazy dog " * 8
    rows = {
        "doc_id": list(range(6)),
        "text": [base, base + "tail", "completely different text here " * 8,
                 base, "another unrelated document body " * 8, base + " tail2"],
    }
    src = tmp_path / "docs.parquet"
    pq.write_table(pa.table(rows), src)
    ds = rd.read_parquet(str(src))
    got = verified_neardup_pairs(ds, candidate_threshold=0.4,
                                 exact_threshold=0.6).to_pandas()
    found = {tuple(p) for p in got[["id_a", "id_b"]].to_numpy()}
    assert (0, 3) in found  # exact dupes must survive verification
    assert all(a < b for a, b in found)
    assert (got["jaccard"] >= 0.6).all()


def test_neardup_pairs_bucketed_matches_exact(ray_session):
    """Bucketed LSH near-dup (the corpus×corpus scale path): reported
    pairs are a SUBSET of the exact result (scores are exact, hashing
    only prunes), and with enough tables recall is total on this
    corpus (deterministic: fixed seed, fixed data)."""
    import ray.data as rd

    from parquet2_ray.stages.similarity import neardup_pairs, neardup_pairs_bucketed

    ds = rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    exact = neardup_pairs(ds, threshold=0.45).to_pandas()
    ex = set(zip(exact.a_id, exact.b_id))
    got = neardup_pairs_bucketed(ds, threshold=0.45, n_planes=4,
                                 n_tables=16).to_pandas()
    gt = set(zip(got.a_id, got.b_id))
    assert gt <= ex
    assert len(gt & ex) / max(len(ex), 1) >= 0.7
    assert (got["sim"] >= 0.45).all()


def test_ivf_topk(ray_session):
    """IVF coarse quantizer: exact when nprobe==n_centroids; decent
    recall at nprobe<n_centroids; deterministic given the seed."""
    from parquet2_ray.stages.similarity import ann_topk, ivf_topk

    tbl, m = _emb_table(n=400)
    ds = rd.from_arrow(tbl)
    q = m[:2].astype(np.float64)
    exact = ann_topk(ds, q, [0, 1], k=5).to_pandas()
    full = ivf_topk(ds, q, [0, 1], k=5, n_centroids=8, nprobe=8).to_pandas()
    pd.testing.assert_frame_equal(
        full.sort_values(["query_id", "rank"]).reset_index(drop=True),
        exact.sort_values(["query_id", "rank"]).reset_index(drop=True))
    approx = ivf_topk(ds, q, [0, 1], k=5, n_centroids=8, nprobe=3).to_pandas()
    for qi in (0, 1):
        a = set(approx[approx["query_id"] == qi]["vec_id"])
        e = set(exact[exact["query_id"] == qi]["vec_id"])
        assert qi in a            # the query's own cell is always probed
        assert len(a & e) >= 3    # recall at 3/8 probes


def test_md5_minhash_char_windows_match_duckdb_non_ascii():
    """Regression: md5 minhash shingles are CHARACTER windows (SQL
    substr semantics), not byte windows — they must match DuckDB
    bit-exactly on multibyte text."""
    import duckdb
    import numpy as np

    from parquet2_ray.stages.dedup import _PRIME, _md5_minhash_rows, _perm_params

    texts = ["café au lait, s'il vous plaît ☕", "plain ascii text here",
             "héllo wörld ünïcode", "ab"]
    k, num_perm, seed = 5, 64, 7
    sigs = _md5_minhash_rows(texts, k, num_perm, seed)
    a, b = _perm_params(num_perm, seed)
    con = duckdb.connect()
    con.execute("CREATE TABLE d AS SELECT * FROM (VALUES " +
                ",".join(f"({i}, ?)" for i in range(len(texts))) +
                ") t(id, text)", texts)
    cols = ", ".join(
        f"min(CAST((CAST({a[p]} AS HUGEINT)*h + {b[p]}) % 18446744073709551616 "
        f"AS UBIGINT) % {_PRIME}) AS s{p}" for p in range(num_perm))
    rows = con.execute(
        f"WITH sh AS (SELECT id, CAST(('0x' || substr(md5(substr(text, j, {k})), "
        f"1, 16)) AS UBIGINT) AS h FROM d, "
        f"unnest(range(1, greatest(length(text) - {k - 1}, 0) + 1)) AS u(j)) "
        f"SELECT id, {cols} FROM sh GROUP BY id ORDER BY id").fetchall()
    for row in rows:
        assert np.array_equal(np.array(row[1:], dtype=np.uint64), sigs[row[0]])
    # sub-k-char doc: engine fills umax (no shingles)
    assert (sigs[3] == np.iinfo(np.uint64).max).all()


def test_multimodal_null_payloads_real_backend(ray_session):
    """Regression: null/empty media payloads must yield null outputs in
    the real backend, never crash the actor task."""
    import pyarrow as pa

    from parquet2_ray.stages.multimodal import (
        AudioFeatures,
        FeatureExtract,
        FrameSample,
        ImageDecode,
        ImageResize,
        encode_ppm,
        encode_rawv,
    )

    img = encode_ppm(np.full((4, 4, 3), 128, dtype=np.uint8))
    t = pa.table({"image": pa.array([img, None, b""], type=pa.binary())})
    dec = ImageDecode()(t)
    assert dec["width"].null_count == 2 and dec["width"][0].as_py() == 4
    rz = ImageResize(2, 2)(t)
    assert rz["image"].null_count == 2
    fe = FeatureExtract(dim=4)(t)
    assert fe["features"].null_count == 2
    at = pa.table({"audio": pa.array([None, b""], type=pa.binary())})
    au = AudioFeatures()(at)
    assert au["duration_s"].null_count == 2
    vid = encode_rawv(np.zeros((2, 2, 2, 3), dtype=np.uint8))
    vt = pa.table({"video_id": pa.array([1, 2], pa.int64()),
                   "video": pa.array([vid, None], type=pa.binary())})
    fr = FrameSample(every_n=1)(vt)
    assert set(fr["video_id"].to_pylist()) == {1}  # null video → no frames


def test_delta_truncation_raises():
    """Regression: a payload cut into the valid-delta region must raise,
    not silently decode zeros (codec-level corruption check)."""
    import pytest

    from parquet2_ray.codecs import delta

    rng = np.random.default_rng(5)
    v = rng.integers(-10**6, 10**6, 1000)
    enc = delta.encode(v)
    with pytest.raises((ValueError, IndexError)):
        delta.decode(enc[:-100])


def test_bpe_token_count_matches_duckdb(ray_session):
    """BPE-ish regex token count: engine (compiled-once actor regex)
    vs DuckDB regexp_extract_all, exact parity including edge texts."""
    import duckdb
    import pandas as pd

    from parquet2_ray.stages.text import (BPE_PATTERN, BpeTokenCount,
                                          bpe_token_count_batch)

    texts = ["Hello world, it's 2026! I'll re-check  x42.", "",
             "don't-stop; cost=$1,234.56...", "ünïcode straße 999",
             "nbsp\xa0sep", "tabs\tand\nnewlines"]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    got = BpeTokenCount()(df)
    assert bpe_token_count_batch(df).equals(got)  # task twin identical
    con = duckdb.connect()
    con.register("documents", df)
    want = con.execute(
        "SELECT doc_id, CAST(length(regexp_extract_all(text, '"
        + BPE_PATTERN.replace("'", "''")
        + "')) AS BIGINT) AS n_bpe_tok FROM documents ORDER BY doc_id").df()
    assert got.sort_values("doc_id", ignore_index=True).equals(want)


def test_duplicate_tiles(ray_session):
    """Tile-hash substring dedup: docs sharing an aligned 8-char tile
    collide; within-doc repeats count once; short docs contribute none."""
    import pandas as pd
    import ray.data as rd

    from parquet2_ray.stages.dedup import duplicate_tiles

    shared = "ABCDEFGH"  # one full tile at position 0
    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [shared + "tailone!", shared + "tailtwo!",
                 "unique#1" + "unique#1",  # same tile twice WITHIN one doc
                 "short"],                  # < tile chars → no tiles
    })
    out = duplicate_tiles(rd.from_pandas(df), tile=8).to_pandas()
    assert len(out) == 1          # only the cross-doc shared tile
    assert out["n_docs"].tolist() == [2]


def test_bucket_runs_truncation_and_edges():
    import numpy as np

    from parquet2_ray.stages.bucket_pairs import bucket_runs

    # runs: [0,0,0], [1], [2,2], [3,3,3,3]
    keys = np.array([0, 0, 0, 1, 2, 2, 3, 3, 3, 3], dtype=np.uint64)
    starts, counts = bucket_runs(keys)
    assert starts.tolist() == [0, 4, 6]
    assert counts.tolist() == [3, 2, 4]
    # max_bucket clips counts but keeps starts (sorted input => smallest ids)
    starts, counts = bucket_runs(keys, max_bucket=2)
    assert starts.tolist() == [0, 4, 6]
    assert counts.tolist() == [2, 2, 2]
    # singleton-only and tiny inputs
    s, c = bucket_runs(np.array([7], dtype=np.uint64))
    assert s.size == 0 and c.size == 0
    s, c = bucket_runs(np.arange(5, dtype=np.uint64))
    assert s.size == 0
    s, c = bucket_runs(np.empty(0, dtype=np.uint64))
    assert s.size == 0


def test_minhash_pairs_invariant_to_nshards(ray_session):
    import ray.data as rd

    from parquet2_ray.stages.dedup import minhash_lsh_pairs

    tbl = _docs_table()
    for nshards in (1, 7, 4096):
        ds = rd.from_arrow(tbl)
        got = (
            minhash_lsh_pairs(ds, threshold=0.9, nshards=nshards)
            .to_pandas()
            .sort_values(["id_a", "id_b"])
            .reset_index(drop=True)
        )
        if nshards == 1:
            ref = got
        else:
            assert got.equals(ref)


def test_duplicate_tiles_fast_matches_md5_on_ascii(ray_session):
    """On pure-ASCII text byte tiles == char tiles, so the fast
    (rolling-ring) and md5 hashers must report the identical
    duplicated-tile structure: same number of dup tiles, same n_docs
    multiset, same doc coverage."""
    import pandas as pd
    import ray.data as rd

    from parquet2_ray.stages.dedup import duplicate_tiles

    rng = __import__("numpy").random.default_rng(3)
    base = "".join(chr(rng.integers(32, 127)) for _ in range(400))
    df = pd.DataFrame({
        "doc_id": list(range(6)),
        "text": [
            base + "A" * 100,
            base + "B" * 100,          # shares base's tiles with doc 0
            "C" * 999,                  # self-repeating, unique to doc 2
            "C" * 999,                  # exact dup of doc 2
            base[13:][:64] * 3,         # UNaligned slice of base: no collision
            "tiny",
        ],
    })
    outs = {}
    for h in ("fast", "md5"):
        out = duplicate_tiles(rd.from_pandas(df), tile=64, hasher=h).to_pandas()
        outs[h] = sorted(out["n_docs"].tolist())
    assert outs["fast"] == outs["md5"]
    assert len(outs["fast"]) > 0


def test_quantize_embeddings_roundtrip_bound(ray_session):
    from parquet2_ray.stages.quantize import (
        dequantize_embeddings_batch,
        quantize_embeddings,
        quantize_embeddings_batch,
    )

    tbl, m = _emb_table(n=300, dim=24, seed=11)
    q = quantize_embeddings(rd.from_arrow(tbl)).to_pandas().sort_values("vec_id")
    assert len(q) == 300
    scales = q["scale"].to_numpy()
    qm = np.stack(q["q"].to_numpy())
    # max element of every vector maps to ±127 exactly
    assert (np.abs(qm).max(axis=1) == 127).all()
    # reconstruction error bound: |x - q*s| <= s/2
    recon = qm * scales[:, None]
    err = np.abs(recon - m.astype(np.float64))
    assert (err <= scales[:, None] / 2 + 1e-12).all()
    # dequantize stage inverts to the same values
    deq = dequantize_embeddings_batch(quantize_embeddings_batch(tbl))
    back = np.stack(deq["embedding"].to_pandas().to_numpy())
    # _emb_table ids are already 0..n-1, so row order matches recon
    assert np.array_equal(back, recon)


def test_quantize_zero_and_empty_vectors():
    import pyarrow as pa

    from parquet2_ray.stages.quantize import quantize_embeddings_batch

    tbl = pa.table({
        "vec_id": pa.array([0, 1, 2], type=pa.int64()),
        "embedding": pa.array([[0.0, 0.0], [], [1.0, -2.0]],
                              type=pa.list_(pa.float32())),
    })
    out = quantize_embeddings_batch(tbl)
    assert out["scale"].to_pylist() == [0.0, 0.0, 2.0 / 127]
    assert out["q"].to_pylist() == [[0, 0], [], [64, -127]]


def test_verified_neardup_fast_matches_exact_on_ascii(ray_session):
    """The sharded fast-mode verification (rolling-hash byte shingles,
    np.intersect1d) must agree with the exact char-shingle mode on an
    ASCII corpus (byte == char windows there)."""
    import pyarrow as pa
    import ray.data as rd

    from parquet2_ray.stages.dedup import verified_neardup_pairs

    base = "the quick brown fox jumps over the lazy dog " * 6
    docs = {
        0: base, 1: base + "tail!",          # near-dup pair
        2: "completely different text here " * 8,
        3: base.replace("quick", "rapid"),   # still similar
        4: "another unrelated document body " * 7,
    }
    tbl = pa.table({"doc_id": pa.array(list(docs), pa.int64()),
                    "text": pa.array(list(docs.values()))})
    ds = rd.from_arrow(tbl)
    fast = verified_neardup_pairs(ds, candidate_threshold=0.3,
                                  exact_threshold=0.5, hasher="fast",
                                  nshards=4)
    exact = verified_neardup_pairs(ds, candidate_threshold=0.3,
                                   exact_threshold=0.5, hasher="md5",
                                   nshards=4)
    fast_pairs = list(zip(fast["id_a"].to_pylist(), fast["id_b"].to_pylist()))
    exact_pairs = list(zip(exact["id_a"].to_pylist(), exact["id_b"].to_pylist()))
    assert (0, 1) in exact_pairs
    assert fast_pairs == exact_pairs
    import numpy as np
    assert np.allclose(fast["jaccard"].to_numpy(),
                       exact["jaccard"].to_numpy(), atol=1e-9)


def test_semantic_dedup_pairs_matches_bruteforce(ray_session):
    """SemDeDup pairs: exact scores; with well-separated clusters and
    enough centroids, recall equals the brute-force reference."""
    from parquet2_ray.stages.similarity import semantic_dedup_pairs

    rng = np.random.default_rng(44)
    # 4 well-separated anchor directions, each with a family of
    # near-duplicates (small perturbations) plus background noise
    dim, nfam, per = 16, 4, 6
    anchors = rng.normal(size=(nfam, dim)) * 10
    rows = []
    for f in range(nfam):
        for j in range(per):
            rows.append(anchors[f] + rng.normal(scale=0.05, size=dim))
    noise = rng.normal(size=(40, dim))
    m = np.concatenate([np.stack(rows), noise]).astype(np.float32)
    tbl = pa.table({
        "vec_id": pa.array(range(len(m)), type=pa.int64()),
        "embedding": pa.array([r.tolist() for r in m],
                              type=pa.list_(pa.float32())),
    })
    thr = 0.95
    got = (semantic_dedup_pairs(rd.from_arrow(tbl).repartition(4),
                                threshold=thr, n_clusters=8,
                                sample_rows=1000)
           .to_pandas().sort_values(["a_id", "b_id"])
           .reset_index(drop=True))
    # brute force reference
    mn = m.astype(np.float64)
    mn = mn / np.linalg.norm(mn, axis=1, keepdims=True)
    sims = mn @ mn.T
    iu, ju = np.triu_indices(len(m), k=1)
    ref = {(int(a), int(b)): float(s) for a, b, s in
           zip(iu, ju, sims[iu, ju]) if s >= thr}
    got_pairs = {(int(r.a_id), int(r.b_id)): float(r.sim)
                 for r in got.itertuples()}
    # precision 1.0 always; recall exact here because each family is
    # tight and the anchors are far apart (one cluster per family)
    assert set(got_pairs) == set(ref)
    for k in ref:
        assert abs(got_pairs[k] - ref[k]) < 1e-12
    assert len(ref) >= nfam * (per * (per - 1)) // 2  # sanity: dups found


def test_semantic_dedup_keeps_min_id_per_cluster(ray_session):
    from parquet2_ray.stages.similarity import semantic_dedup

    rng = np.random.default_rng(45)
    dim = 12
    a = rng.normal(size=dim) * 8
    b = rng.normal(size=dim) * 8
    m = np.stack([
        a, a + 0.01, a - 0.01,          # family A: ids 0,1,2
        b, b + 0.01,                    # family B: ids 3,4
        rng.normal(size=dim) * 8,       # singletons: 5,6
        rng.normal(size=dim) * 8,
    ]).astype(np.float32)
    tbl = pa.table({
        "vec_id": pa.array(range(len(m)), type=pa.int64()),
        "embedding": pa.array([r.tolist() for r in m],
                              type=pa.list_(pa.float32())),
    })
    out = semantic_dedup(rd.from_arrow(tbl).repartition(3),
                         threshold=0.99, n_clusters=4)
    kept = sorted(r["vec_id"] for r in out.take_all())
    assert kept == [0, 3, 5, 6]


def test_semantic_dedup_no_dups_is_identity(ray_session):
    from parquet2_ray.stages.similarity import semantic_dedup

    rng = np.random.default_rng(46)
    m = rng.normal(size=(30, 8)).astype(np.float32)
    tbl = pa.table({
        "vec_id": pa.array(range(30), type=pa.int64()),
        "embedding": pa.array([r.tolist() for r in m],
                              type=pa.list_(pa.float32())),
    })
    out = semantic_dedup(rd.from_arrow(tbl), threshold=0.999)
    assert sorted(r["vec_id"] for r in out.take_all()) == list(range(30))


def _line_dedup_oracle(df, min_len=1):
    import duckdb

    con = duckdb.connect()
    con.register("t", df)
    return con.execute(f"""
        WITH lines AS (
          SELECT doc_id, unnest(string_split(text, chr(10))) AS line,
                 generate_subscripts(string_split(text, chr(10)), 1) AS lidx
          FROM t),
        marked AS (
          SELECT doc_id, lidx, line,
            CASE WHEN length(line) >= {min_len} THEN
              row_number() OVER (PARTITION BY line
                                 ORDER BY doc_id, lidx) = 1
            ELSE TRUE END AS keep
          FROM lines)
        SELECT doc_id,
          coalesce(string_agg(line, chr(10) ORDER BY lidx)
                   FILTER (WHERE keep), '') AS text
        FROM marked GROUP BY doc_id ORDER BY doc_id
    """).df()


def test_line_dedup_matches_duckdb(ray_session):
    """Corpus-wide first-occurrence line dedup == the SQL window-rank
    formulation, on a corpus with cross-doc, within-doc, and empty-line
    cases (md5 keys: the SQL-parity twin)."""
    from parquet2_ray.stages.dedup import line_dedup

    docs = {
        0: "alpha\nbeta\nalpha\n\ngamma",
        1: "beta\ndelta\n\nalpha",
        2: "",
        3: "delta\ndelta\nepsilon",
        4: "gamma",
    }
    df = pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())})
    got = (line_dedup(rd.from_pandas(df).repartition(3), hasher="md5")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    want = _line_dedup_oracle(df)
    pd.testing.assert_frame_equal(got, want)
    # every doc survives, even fully-deduped ones
    assert len(got) == len(docs)


def test_line_dedup_fast_matches_md5(ray_session):
    from parquet2_ray.stages.dedup import line_dedup

    rng = np.random.default_rng(12)
    lines = [f"line number {i}" for i in range(40)]
    docs = ["\n".join(rng.choice(lines, size=rng.integers(1, 15)))
            for _ in range(120)]
    df = pd.DataFrame({"doc_id": range(120), "text": docs})
    a = (line_dedup(rd.from_pandas(df), hasher="fast")
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b = (line_dedup(rd.from_pandas(df), hasher="md5")
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    want = _line_dedup_oracle(df)
    pd.testing.assert_frame_equal(a, want)


def test_line_dedup_min_len_keeps_short_lines(ray_session):
    from parquet2_ray.stages.dedup import line_dedup

    df = pd.DataFrame({
        "doc_id": [0, 1],
        "text": ["ok\nX\nlong duplicate line",
                 "X\nlong duplicate line\nok"],
    })
    got = (line_dedup(rd.from_pandas(df), min_len=3, hasher="md5")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    want = _line_dedup_oracle(df, min_len=3)
    pd.testing.assert_frame_equal(got, want)
    # short lines ('ok', 'X') survive everywhere
    assert got.loc[1, "text"].split("\n") == ["X", "ok"]
