"""Incremental NEAR-dup: an ingest increment against a persisted
MinHash index of the historical corpus (P39 — the near-dup twin of
``incremental_dedup``).

Historical texts are never re-read.  The index persists two stores,
both fs-generic parquet shard files (same atomic-commit discipline as
``incremental_dedup``):

- **band store** — LSH band keys: per doc, ``bands`` keys derived from
  its ``num_perm``-wide MinHash signature; shard files hold
  (bkey uint64, doc_id) sorted by bkey.  ~16 B × bands per doc.
- **signature store** — (doc_id, sig list<uint64>[num_perm]) sharded
  by ``doc_id % sig_shards``, sorted by doc_id.  8·num_perm B per doc
  (the standard MinHash-LSH storage shape).

Probe (two bounded exchanges, candidate-proportional after the first):

1. increment → signatures (map-only) → band keys → ``groupby(shard)``;
   each task ``searchsorted``s its own sorted band shard → candidate
   (new_id, hist_id) pairs.
2. pairs (carrying the increment doc's signature) →
   ``groupby(hist_id % sig_shards)``; each task loads one signature
   shard and accepts when the signature-estimated Jaccard
   ``mean(sig_new == sig_hist)`` ≥ ``threshold`` — the unbiased
   MinHash estimator (Broder 1997), so no historical text is needed.

In-increment near-dups are the BATCH problem — run
``stages.dedup.verified_neardup_pairs`` on the (small) increment
itself; this module handles increment-vs-history.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd

from ..stages.dedup import minhash_signatures_batch
from ..state import fsio

__all__ = [
    "write_minhash_index",
    "append_minhash_index",
    "incremental_neardup_ids",
]

_GOLD = np.uint64(0x9E3779B97F4A7C15)


def _band_keys(sigs: np.ndarray, bands: int) -> np.ndarray:
    """(n, bands) uint64 keys: golden-ratio fold of each band's rows.
    Identical signatures ⇒ identical keys; the band index is mixed in
    so band i of one doc never collides with band j of another by
    construction."""
    n, num_perm = sigs.shape
    rows = num_perm // bands
    out = np.empty((n, bands), dtype=np.uint64)
    for b in range(bands):
        h = np.full(n, np.uint64(b + 1), dtype=np.uint64)
        for r in range(b * rows, (b + 1) * rows):
            h = (h * _GOLD) ^ sigs[:, r]
        out[:, b] = h * _GOLD
    return out


def _sig_matrix(t: pa.Table) -> np.ndarray:
    col = t["sig"].combine_chunks()
    vals = col.flatten().to_numpy(zero_copy_only=False).astype(np.uint64)
    return vals.reshape(len(col), -1)


def _band_path(d: str, s: int) -> str:
    return d.rstrip("/") + f"/bands-{s:05d}.parquet"


def _sig_path(d: str, s: int) -> str:
    return d.rstrip("/") + f"/sigs-{s:05d}.parquet"


def _write_pq(path: str, tbl: pa.Table) -> None:
    sink = pa.BufferOutputStream()
    pq.write_table(tbl, sink)
    fsio.atomic_write(path, sink.getvalue().to_pybytes(), fsync=False)


def _read_pq(path: str) -> pa.Table | None:
    if not fsio.exists(path):
        return None
    return pq.read_table(pa.BufferReader(fsio.read_bytes(path)))


def _meta(d: str) -> dict:
    return json.loads(fsio.read_bytes(d.rstrip("/") + "/_meta.json"))


def _write_neardup_meta(d: str, p: dict, counts: dict) -> None:
    """Persist index params + per-sig-shard row counts: appends update
    only touched shards' counts, so the total never needs a full
    signature-store scan (same discipline as incremental_dedup)."""
    fsio.atomic_write(
        d.rstrip("/") + "/_meta.json",
        json.dumps(dict(
            p, total=sum(counts.values()),
            sig_shard_counts={str(k): v for k, v in
                              sorted(counts.items())})).encode(),
        fsync=False)


def _signatures(ds: rd.Dataset, text_col: str, id_col: str,
                p: dict) -> rd.Dataset:
    return ds.map_batches(
        lambda b: minhash_signatures_batch(
            b, text_col, id_col, k=p["k"], num_perm=p["num_perm"],
            seed=p["seed"]),
        batch_format="pyarrow")


def _band_rows(sig_ds: rd.Dataset, id_col: str, bands: int,
               nshards: int) -> rd.Dataset:
    def expand(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"shard": pa.array([], pa.int32()),
                             "bkey": pa.array([], pa.uint64()),
                             id_col: pa.array([], t[id_col].type)})
        keys = _band_keys(_sig_matrix(t), bands)          # (n, bands)
        ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        flat = keys.reshape(-1)
        return pa.table({
            "shard": pa.array((flat % np.uint64(nshards)).astype(np.int32)),
            "bkey": pa.array(flat),
            id_col: pa.array(np.repeat(ids.astype(np.int64), bands)),
        })

    return sig_ds.map_batches(expand, batch_format="pyarrow")


def write_minhash_index(
    ds: rd.Dataset,
    index_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    k: int = 5,
    seed: int = 7,
    nshards: int = 64,
    sig_shards: int = 64,
) -> int:
    """Build both stores from scratch (every shard slot overwritten —
    a reused directory cannot leak a previous corpus).  Returns the
    number of indexed documents."""
    if num_perm % bands:
        raise ValueError("num_perm must be a multiple of bands")
    # integer doc ids are part of the index contract (sig-store routing
    # is id % sig_shards); string-id corpora should map ids first
    fsio.ensure_dir(index_dir)
    p = {"num_perm": num_perm, "bands": bands, "k": k, "seed": seed,
         "nshards": nshards, "sig_shards": sig_shards}
    sig_ds = _signatures(ds, text_col, id_col, p).materialize()

    def write_band_shard(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"shard": pa.array([], pa.int32())})
        s = int(g["shard"][0].as_py())
        order = pa.compute.sort_indices(g, sort_keys=[("bkey", "ascending")])
        _write_pq(_band_path(index_dir, s),
                  g.select(["bkey", id_col]).take(order))
        return pa.table({"shard": pa.array([s], pa.int32())})

    done_b = (_band_rows(sig_ds, id_col, bands, nshards)
              .groupby("shard")
              .map_groups(write_band_shard, batch_format="pyarrow"))
    seen_b = {int(r["shard"]) for r in done_b.take_all()}
    empty_band = pa.table({"bkey": pa.array([], pa.uint64()),
                           id_col: pa.array([], pa.int64())})
    for s in range(nshards):
        if s not in seen_b:
            _write_pq(_band_path(index_dir, s), empty_band)

    def add_sig_shard(t: pa.Table) -> pa.Table:
        ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        return t.append_column("sshard", pa.array(
            (ids % sig_shards).astype(np.int32)))

    def write_sig_shard(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"sshard": pa.array([], pa.int32()),
                             "n": pa.array([], pa.int64())})
        s = int(g["sshard"][0].as_py())
        order = pa.compute.sort_indices(
            g, sort_keys=[(id_col, "ascending")])
        _write_pq(_sig_path(index_dir, s),
                  g.select([id_col, "sig"]).take(order))
        return pa.table({"sshard": pa.array([s], pa.int32()),
                         "n": pa.array([g.num_rows], pa.int64())})

    done_s = (sig_ds.map_batches(add_sig_shard, batch_format="pyarrow")
              .groupby("sshard")
              .map_groups(write_sig_shard, batch_format="pyarrow"))
    counts = {int(r["sshard"]): int(r["n"]) for r in done_s.take_all()}
    empty_sig = pa.table({id_col: pa.array([], pa.int64()),
                          "sig": pa.array([], pa.list_(pa.uint64()))})
    # EVERY slot the new corpus didn't write is overwritten empty — a
    # reused directory must not keep a previous corpus's sig shards
    # (the band store already overwrites all nshards slots above)
    for s in range(sig_shards):
        if s not in counts:
            _write_pq(_sig_path(index_dir, s), empty_sig)
            counts[s] = 0
    total = sum(counts.values())
    _write_neardup_meta(index_dir, p, counts)
    return total


def incremental_neardup_ids(
    new_ds: rd.Dataset,
    index_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    join_partitions: int = 16,
) -> rd.Dataset:
    """Increment ids whose signature-estimated Jaccard against ANY
    indexed historical doc is ≥ ``threshold``.  Candidate generation is
    banded (a pair sharing no band is never tested — standard LSH
    recall); verification needs only stored signatures."""
    p = _meta(index_dir)
    # materialized: the signature stage (tokenize + MinHash, the most
    # expensive map of the probe) feeds BOTH the band probe and the
    # verify join — unmaterialized it would re-execute per consumer.
    # Bounded: increment-sized, 8·num_perm B + id per row.
    sig_new = _signatures(new_ds, text_col, id_col, p).materialize()

    def probe_bands(g: pa.Table) -> pa.Table:
        empty = pa.table({id_col: pa.array([], pa.int64()),
                          "hist_id": pa.array([], pa.int64()),
                          "vshard": pa.array([], pa.int32())})
        if g.num_rows == 0:
            return empty
        s = int(g["shard"][0].as_py())
        idx = _read_pq(_band_path(index_dir, s))
        if idx is None or idx.num_rows == 0:
            return empty
        ikeys = idx["bkey"].to_numpy()
        iids = idx.column(1).to_numpy(zero_copy_only=False)
        q = g["bkey"].combine_chunks().to_numpy()
        lo = np.searchsorted(ikeys, q, side="left")
        hi = np.searchsorted(ikeys, q, side="right")
        cnt = hi - lo
        if not cnt.any():
            return empty
        take = np.concatenate(
            [np.arange(a, b) for a, b in zip(lo[cnt > 0], hi[cnt > 0])])
        new_ids = np.repeat(
            g[id_col].combine_chunks().to_numpy(zero_copy_only=False),
            cnt)
        hist = iids[take]
        # dedupe (new, hist) pairs within the shard before the verify
        # exchange — one doc pair can share several bands
        u = np.unique(np.stack(
            [new_ids.astype(np.int64), hist.astype(np.int64)]), axis=1)
        return pa.table({
            id_col: pa.array(u[0]),
            "hist_id": pa.array(u[1]),
            "vshard": pa.array(
                (u[1] % p["sig_shards"]).astype(np.int32)),
        })

    cands = (_band_rows(sig_new, id_col, p["bands"], p["nshards"])
             .groupby("shard")
             .map_groups(probe_bands, batch_format="pyarrow")
             .materialize())  # bounded: candidate pairs only
    if cands.count() == 0:
        # nothing shares a band — the join would see a schema-less
        # empty dataset; return a typed empty result instead
        return rd.from_arrow(pa.table({id_col: pa.array([], pa.int64())}))

    # pairs ride with the increment signature into the verify exchange:
    # one hash join on the increment id (Ray Dataset.join, ≥2.46).
    # Acero rejects list-typed join payloads, so the signature rides as
    # fixed-size binary (zero-copy repack of the uint64 matrix)
    def sig_to_bin(t: pa.Table) -> pa.Table:
        width = p["num_perm"] * 8
        if t.num_rows == 0:
            # _sig_matrix's reshape would raise on an empty block
            return pa.table({
                id_col: t[id_col],
                "sigbin": pa.array([], pa.binary(width))})
        m = np.ascontiguousarray(_sig_matrix(t))
        arr = pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(width), len(m),
            [None, pa.py_buffer(m.tobytes())])
        return pa.table({id_col: t[id_col], "sigbin": arr})

    pairs = cands.join(
        sig_new.map_batches(sig_to_bin, batch_format="pyarrow"),
        join_type="inner", num_partitions=join_partitions, on=(id_col,))

    def verify(g: pa.Table) -> pa.Table:
        empty = pa.table({id_col: pa.array([], pa.int64())})
        if g.num_rows == 0:
            return empty
        s = int(g["vshard"][0].as_py())
        store = _read_pq(_sig_path(index_dir, s))
        if store is None or store.num_rows == 0:
            return empty
        hids = store.column(0).to_numpy(zero_copy_only=False)
        hsig = _sig_matrix(store)
        want = g["hist_id"].combine_chunks().to_numpy()
        pos = np.searchsorted(hids, want)
        ok = (pos < hids.size) & (hids[np.minimum(
            pos, max(hids.size - 1, 0))] == want)
        if not ok.any():
            return empty
        col = g["sigbin"].combine_chunks()
        # zero-copy unpack of the fixed-size-binary signature column:
        # one frombuffer over the values buffer (respecting the array
        # offset), not a per-row as_py() loop — this is the hot path
        # when the candidate-pair set is large
        width = col.type.byte_width // 8
        nsig = np.frombuffer(
            col.buffers()[1], dtype=np.uint64,
            count=(col.offset + len(col)) * width,
        ).reshape(-1, width)[col.offset:]
        est = (nsig[ok] == hsig[pos[ok]]).mean(axis=1)
        hit = est >= threshold
        ids = g[id_col].combine_chunks().to_numpy(
            zero_copy_only=False)[ok][hit]
        return pa.table({id_col: pa.array(np.unique(ids))})

    verified = (pairs.groupby("vshard")
                .map_groups(verify, batch_format="pyarrow"))
    # a new doc can match history via several vshards: one last tiny
    # distinct over the (small) removal id set
    return verified.groupby(id_col).map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow")


def append_minhash_index(
    kept_ds: rd.Dataset,
    index_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> int:
    """Fold a (near-dedup-accepted) increment into both stores:
    per-shard sorted merges, O(touched shards), idempotent."""
    p = _meta(index_dir)
    sig_ds = _signatures(kept_ds, text_col, id_col, p).materialize()

    def merge_band_shard(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"shard": pa.array([], pa.int32())})
        s = int(g["shard"][0].as_py())
        add = g.select(["bkey", id_col])
        old = _read_pq(_band_path(index_dir, s))
        merged = pa.concat_tables([old, add]) if old is not None else add
        order = pa.compute.sort_indices(
            merged, sort_keys=[("bkey", "ascending")])
        merged = merged.take(order)
        # idempotent: drop exact (bkey, id) duplicates from re-runs
        kk = merged["bkey"].to_numpy()
        ii = merged.column(1).to_numpy(zero_copy_only=False)
        keep = np.r_[True, (kk[1:] != kk[:-1]) | (ii[1:] != ii[:-1])]
        _write_pq(_band_path(index_dir, s),
                  merged.filter(pa.array(keep)))
        return pa.table({"shard": pa.array([s], pa.int32())})

    (_band_rows(sig_ds, id_col, p["bands"], p["nshards"])
     .groupby("shard")
     .map_groups(merge_band_shard, batch_format="pyarrow")).materialize()

    def add_sig_shard(t: pa.Table) -> pa.Table:
        ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        return t.append_column("sshard", pa.array(
            (ids % p["sig_shards"]).astype(np.int32)))

    def merge_sig_shard(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"sshard": pa.array([], pa.int32()),
                             "n": pa.array([], pa.int64())})
        s = int(g["sshard"][0].as_py())
        add = g.select([id_col, "sig"])
        old = _read_pq(_sig_path(index_dir, s))
        merged = pa.concat_tables(
            [old, add.cast(old.schema)]) if old is not None \
            and old.num_rows else add
        order = pa.compute.sort_indices(
            merged, sort_keys=[(id_col, "ascending")])
        merged = merged.take(order)
        ii = merged.column(0).to_numpy(zero_copy_only=False)
        keep = np.r_[True, ii[1:] != ii[:-1]]
        merged = merged.filter(pa.array(keep))
        _write_pq(_sig_path(index_dir, s), merged)
        return pa.table({"sshard": pa.array([s], pa.int32()),
                         "n": pa.array([merged.num_rows], pa.int64())})

    done = (sig_ds.map_batches(add_sig_shard, batch_format="pyarrow")
            .groupby("sshard")
            .map_groups(merge_sig_shard, batch_format="pyarrow"))
    # untouched shards keep their prior meta counts — O(touched shards),
    # never a full signature-store scan.  A pre-counts index (meta
    # without sig_shard_counts) is seeded with one full scan, once.
    if "sig_shard_counts" in p:
        counts = {int(k): int(v)
                  for k, v in p["sig_shard_counts"].items()}
    else:
        counts = {}
        for s in range(p["sig_shards"]):
            t = _read_pq(_sig_path(index_dir, s))
            counts[s] = t.num_rows if t is not None else 0
    for r in done.take_all():
        counts[int(r["sshard"])] = int(r["n"])
    params = {k: v for k, v in p.items()
              if k not in ("total", "sig_shard_counts")}
    _write_neardup_meta(index_dir, params, counts)
    return sum(counts.values())
