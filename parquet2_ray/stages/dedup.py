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
from ray.data.aggregate import Count, Min

from ..functions.hashing import hash_strings, rolling_window_hashes

__all__ = [
    "exact_dedup",
    "minhash_signatures_batch",
    "minhash_lsh_pairs",
    "simhash_batch",
    "ngram_jaccard",
]


def exact_dedup(ds: rd.Dataset, text_col: str = "text", id_col: str = "doc_id") -> rd.Dataset:
    """One row per distinct content: (doc_id=min id, n_copies)."""

    def add_hash(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "h": hash_strings(batch[text_col].to_numpy(dtype=object)).astype("uint64"),
                id_col: batch[id_col],
            }
        )

    hashed = ds.map_batches(add_hash, batch_format="pandas")
    agg = hashed.groupby("h").aggregate(
        Min(id_col, alias_name=id_col), Count(alias_name="n_copies")
    )
    return agg.select_columns([id_col, "n_copies"])


# ---------------------------------------------------------------- MinHash/LSH

_PRIME = (1 << 61) - 1


def _perm_params(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _PRIME, num_perm, dtype=np.uint64)
    b = rng.integers(0, _PRIME, num_perm, dtype=np.uint64)
    return a, b


def minhash_signatures_batch(
    batch: pa.Table,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    num_perm: int = 64,
    seed: int = 7,
) -> pa.Table:
    """(id, sig: list<uint64>[num_perm]) per row, fully vectorized:
    one rolling-hash pass over the concatenated utf8 buffer, then
    per-permutation min via ``np.minimum.reduceat`` over doc ranges."""
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
        starts = np.clip(offsets[:-1], 0, win.size - 1)
        umax = np.iinfo(np.uint64).max
        for p in range(num_perm):
            ph = (a[p] * win + b[p]) % np.uint64(_PRIME)  # wraps; uniform enough
            ph[cross] = umax
            sigs[:, p] = np.minimum.reduceat(ph, starts)
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
) -> rd.Dataset:
    """Candidate near-duplicate pairs with estimated Jaccard ≥ threshold.

    shingle→minhash→band→bucket (ray_guide.md near-dup recipe).  The
    EXPENSIVE stage — shingling + num_perm permutation mins over the
    text bytes — runs distributed in ``map_batches``.  The resulting
    sketch table is tiny (num_perm+bands u64 per doc ≈ 640 B), so bucket
    pairing runs vectorized on the gathered sketch: per band, argsort the
    bucket hashes, pair ids inside equal-hash runs, then verify by
    full-signature agreement.  PARTITIONING ASSUMPTION: the sketch table
    fits one node (≈ 0.6 GB per 10^6 docs); beyond ~10^8 docs the pairing
    step must become a hash-shuffle groupby on (band, bucket-hash).
    Pairs are verified by full-signature agreement before being emitted.
    """
    rows_per_band = num_perm // bands

    def to_sketch(batch: pa.Table) -> pa.Table:
        sig_tbl = minhash_signatures_batch(batch, text_col, id_col, k, num_perm, seed)
        sigs = np.asarray(sig_tbl["sig"].combine_chunks().values).reshape(-1, num_perm)
        n = len(sig_tbl)
        band_hashes = np.empty((n, bands), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for b_i in range(bands):
                chunk = sigs[:, b_i * rows_per_band : (b_i + 1) * rows_per_band]
                h = np.full(n, 14695981039346656037, dtype=np.uint64)
                for c in range(rows_per_band):
                    h = (h ^ chunk[:, c]) * np.uint64(1099511628211)
                band_hashes[:, b_i] = h
        return pa.table(
            {
                id_col: sig_tbl[id_col],
                "bands": pa.array(list(band_hashes), type=pa.list_(pa.uint64())),
                "sig": sig_tbl["sig"],
            }
        )

    sketch_parts = ds.map_batches(to_sketch, batch_format="pyarrow").to_arrow_refs()
    tables = [t if isinstance(t, pa.Table) else ray.get(t) for t in sketch_parts]
    tables = [t for t in tables if t.num_rows]  # empty blocks may carry null-typed schemas
    if not tables:
        return rd.from_arrow(pa.table({"id_a": pa.array([], pa.int64()),
                                       "id_b": pa.array([], pa.int64()),
                                       "est_jaccard": pa.array([], pa.float64())}))
    sk = pa.concat_tables(tables).combine_chunks()
    n = sk.num_rows
    empty = pa.table({"id_a": pa.array([], pa.int64()),
                      "id_b": pa.array([], pa.int64()),
                      "est_jaccard": pa.array([], pa.float64())})
    if n < 2:
        return rd.from_arrow(empty)
    ids = sk[id_col].to_numpy(zero_copy_only=False)
    bh = np.asarray(sk["bands"].combine_chunks().values).reshape(n, bands)
    sigs = np.asarray(sk["sig"].combine_chunks().values).reshape(n, num_perm)

    cand_a: list[np.ndarray] = []
    cand_b: list[np.ndarray] = []
    for b_i in range(bands):
        order = np.argsort(bh[:, b_i], kind="stable")
        h = bh[order, b_i]
        # runs of equal bucket hash → all intra-run pairs
        boundary = np.flatnonzero(np.diff(h) != 0) + 1
        starts = np.concatenate([[0], boundary])
        ends = np.concatenate([boundary, [n]])
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            members = np.sort(order[s:e])
            ii, jj = np.triu_indices(len(members), k=1)
            cand_a.append(members[ii])
            cand_b.append(members[jj])
    if not cand_a:
        return rd.from_arrow(empty)
    a_idx = np.concatenate(cand_a)
    b_idx = np.concatenate(cand_b)
    uniq = np.unique(np.stack([a_idx, b_idx], axis=1), axis=0)
    a_idx, b_idx = uniq[:, 0], uniq[:, 1]
    est = (sigs[a_idx] == sigs[b_idx]).mean(axis=1)
    keep = est >= threshold
    out = pa.table({
        "id_a": pa.array(np.minimum(ids[a_idx[keep]], ids[b_idx[keep]]), type=pa.int64()),
        "id_b": pa.array(np.maximum(ids[a_idx[keep]], ids[b_idx[keep]]), type=pa.int64()),
        "est_jaccard": pa.array(est[keep], type=pa.float64()),
    })
    return rd.from_arrow(out)


def simhash_batch(
    batch: pd.DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> pd.DataFrame:
    """64-bit SimHash per document over whitespace tokens, vectorized
    via token-hash bit expansion + per-doc reduceat sums."""
    tokens = batch[text_col].str.split()
    lens = tokens.str.len().fillna(0).astype(int).to_numpy()
    flat = [w for ws in tokens for w in (ws or ())]
    n = len(batch)
    if not flat:
        return pd.DataFrame({id_col: batch[id_col], "simhash": np.zeros(n, dtype=np.uint64)})
    h = hash_strings(np.asarray(flat, dtype=object))
    bits = np.unpackbits(h.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little")
    signed = bits.astype(np.int32) * 2 - 1
    bounds = np.concatenate([[0], np.cumsum(lens)])[:-1]
    sums = np.add.reduceat(signed, bounds.clip(0, max(len(flat) - 1, 0)), axis=0)
    sums[lens == 0] = -1  # empty docs → simhash 0
    sig_bits = (sums > 0).astype(np.uint8)
    sig = np.packbits(sig_bits, axis=1, bitorder="little").view(np.uint64).ravel()
    return pd.DataFrame({id_col: batch[id_col], "simhash": sig})


def ngram_jaccard(a: str, b: str, k: int = 5) -> float:
    """Exact character-k-gram Jaccard (verification helper for tests)."""
    sa = {a[i : i + k] for i in range(max(len(a) - k + 1, 0))}
    sb = {b[i : i + k] for i in range(max(len(b) - k + 1, 0))}
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def verified_neardup_pairs(
    ds: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    candidate_threshold: float = 0.5,
    exact_threshold: float = 0.5,
) -> pa.Table:
    """Two-stage near-dedup: MinHash+LSH candidates → exact k-shingle
    Jaccard verification (the production shape: the cheap sketch prunes
    the O(n²) space, the exact measure decides).

    The candidate-pair set is small by construction, so verification
    reads only the texts of candidate ids (filter pushed to the scan)
    and runs driver-side.
    """
    cand = minhash_lsh_pairs(
        ds, text_col=text_col, id_col=id_col, k=k, threshold=candidate_threshold
    ).to_pandas()
    if not len(cand):
        return pa.table({"id_a": pa.array([], pa.int64()),
                         "id_b": pa.array([], pa.int64()),
                         "jaccard": pa.array([], pa.float64())})
    need = sorted(set(cand["id_a"]) | set(cand["id_b"]))
    import pyarrow.compute as pc

    texts = {}
    for batch in ds.iter_batches(batch_format="pyarrow"):
        m = pc.is_in(batch[id_col], value_set=pa.array(need))
        sel = batch.filter(m)
        texts.update(zip(sel[id_col].to_pylist(), sel[text_col].to_pylist()))
    out_a, out_b, out_j = [], [], []
    for a, b in zip(cand["id_a"], cand["id_b"]):
        j = ngram_jaccard(texts[a], texts[b], k)
        if j >= exact_threshold:
            out_a.append(int(a)); out_b.append(int(b)); out_j.append(j)
    return pa.table({"id_a": pa.array(out_a, pa.int64()),
                     "id_b": pa.array(out_b, pa.int64()),
                     "jaccard": pa.array(out_j, pa.float64())})
