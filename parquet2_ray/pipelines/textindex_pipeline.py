"""Persisted full-text inverted index over a container (P67).

The corpus-search shape: "fetch every document containing these terms
out of 100 TB" must not scan text.  The index is a sidecar directory of
``nshards`` parquet posting files — sorted ``(term_hash uint64,
doc_id)`` pairs, one row per DISTINCT (term, document) — built with ONE
``groupby(shard)`` exchange of the tokenized projection and probed with
O(terms) column-projected GETs + ``searchsorted``.

Search is two-phase so the driver never holds a stop-word posting list:

1. *count phase* — per-shard tasks return only each term's document
   frequency (two ``searchsorted`` calls against the sorted hash
   column; the doc column is never materialized),
2. *fetch phase* — for AND the rarest term's postings are fetched
   first (bounded by ``max_postings``) and broadcast; every other
   term's postings are intersected against that seed INSIDE the shard
   task, so what returns to the driver is always ⊆ the rarest term's
   list.  OR fetches all lists (their total is the answer's size, so
   the guard applies to the sum).

Matched ids then route through ``lookup_rows`` — manifest-bloom
partition pruning + page-index block pruning + projection — so the
container read is O(matching rows), never a scan.

Tokenizer: lowercase, split on non-alphanumeric runs (``[^a-z0-9]+``),
empty tokens dropped — chosen because DuckDB expresses it exactly
(``list_contains(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
term)``), which is what the driver oracle ``q_text_search`` checks.
Term hashes are pandas' 64-bit siphash (``functions.hashing
.hash_strings``) — deterministic across processes; a cross-term
collision is ≈ 2^-64 per pair.

The reference has no text search (SURVEY §2: it is a codec library);
this is the §2.10 training-pipeline family extended with the corpus
retrieval primitive (find contaminated docs, inspect dedup clusters,
audit scrubbing) every real corpus run needs.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data as rd

from ..functions.hashing import hash_strings, shard_of
from ..state import fsio

__all__ = [
    "build_text_index",
    "index_container_text",
    "refresh_text_index",
    "append_text_index",
    "probe_text_index",
    "search_container",
    "term_hashes",
]

_INDEX_SHARDS = 64
_TOKEN_SPLIT = r"[^a-z0-9]+"
_TOKENIZER_ID = "lower-alnum-v1"


def _shard_path(index_dir: str, shard: int) -> str:
    return index_dir.rstrip("/") + f"/postings-{shard:05d}.parquet"


def _meta_path(index_dir: str) -> str:
    return index_dir.rstrip("/") + "/_meta.json"


def term_hashes(terms) -> np.ndarray:
    """uint64 hash per query term.  Each term must normalize to exactly
    one token of the index's tokenizer — a multi-word or empty query
    string would silently match nothing, so it raises instead."""
    toks = []
    for t in terms:
        parts = [p for p in pd.Series([t]).str.lower()
                 .str.split(_TOKEN_SPLIT, regex=True)[0] if p]
        if len(parts) != 1:
            raise ValueError(
                f"query term {t!r} tokenizes to {parts} — pass single "
                "tokens (phrase search is not an index operation)")
        toks.append(parts[0])
    return hash_strings(np.asarray(toks, dtype=object))


def _distinct_pairs(h: np.ndarray, d: np.ndarray):
    """Sort by (hash, doc) and drop duplicate (term, doc) pairs."""
    if h.size == 0:
        return h, d
    order = np.lexsort((d, h))
    h, d = h[order], d[order]
    keep = np.empty(h.size, dtype=bool)
    keep[0] = True
    keep[1:] = (h[1:] != h[:-1]) | (d[1:] != d[:-1])
    return h[keep], d[keep]


def _posting_batch(batch: pd.DataFrame, text_col: str, id_col: str,
                   nshards: int) -> pd.DataFrame:
    """(term_hash, doc, shard) rows — the index's exchange projection.
    Distinct per (term, doc) already inside the batch, so the exchange
    carries each document's vocabulary once, not its token stream."""
    words = batch[text_col].fillna("").str.lower().str.split(
        _TOKEN_SPLIT, regex=True)
    lens = words.str.len().fillna(0).astype(np.int64).to_numpy()
    flat = np.asarray(
        [w for ws in words for w in (ws or ())], dtype=object)
    docs = np.repeat(batch[id_col].to_numpy(), lens)
    if flat.size:
        nonempty = flat != ""      # split() yields '' at boundary runs
        flat, docs = flat[nonempty], docs[nonempty]
    h = (hash_strings(flat) if flat.size
         else np.empty(0, dtype=np.uint64))
    h, docs = _distinct_pairs(h, docs)
    return pd.DataFrame({
        "h": h,
        "doc": docs,
        "shard": shard_of(h, nshards) if h.size
        else np.empty(0, dtype=np.int64),
    })


def _write_shard_file(path: str, h: np.ndarray, d: np.ndarray,
                      doc_type: pa.DataType) -> None:
    sink = pa.BufferOutputStream()
    pq.write_table(pa.table({"h": pa.array(h, pa.uint64()),
                             "doc": pa.array(d, doc_type)}), sink)
    fsio.atomic_write(path, sink.getvalue().to_pybytes(), fsync=False)


def _read_shard_file(path: str, columns=None) -> pa.Table:
    if not fsio.exists(path):
        return pa.table({"h": pa.array([], pa.uint64()),
                         "doc": pa.array([], pa.int64())})
    return pq.read_table(pa.BufferReader(fsio.read_bytes(path)),
                         columns=columns)


def build_text_index(
    ds: rd.Dataset,
    index_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    nshards: int = _INDEX_SHARDS,
) -> dict:
    """Build the inverted index of ``ds`` under ``index_dir``.

    One ``groupby(shard)`` exchange of the (term_hash, doc) projection;
    each shard task sorts its postings and commits one parquet file
    (fs-generic atomic write, same contract as the container).  Every
    shard slot is overwritten — a reused dir keeps no stale postings.

    Returns ``{"postings": total, "terms": distinct terms}``."""
    fsio.ensure_dir(index_dir)
    proj = ds.map_batches(
        lambda b: _posting_batch(b, text_col, id_col, nshards),
        batch_format="pandas")
    doc_type_holder: list = []

    def write_shard(group: pa.Table) -> pa.Table:
        empty = pa.table({"shard": pa.array([], pa.int32()),
                          "n": pa.array([], pa.int64()),
                          "terms": pa.array([], pa.int64()),
                          "doc_type": pa.array([], pa.string())})
        if group.num_rows == 0:
            return empty
        shard = int(group["shard"][0].as_py())
        h = group["h"].combine_chunks().to_numpy()
        d = group["doc"].combine_chunks().to_numpy(zero_copy_only=False)
        h, d = _distinct_pairs(h, d)   # cross-batch duplicate pairs
        _write_shard_file(_shard_path(index_dir, shard), h, d,
                          group.schema.field("doc").type)
        nterms = int((np.diff(h) != 0).sum()) + 1 if h.size else 0
        return pa.table({
            "shard": pa.array([shard], pa.int32()),
            "n": pa.array([h.size], pa.int64()),
            "terms": pa.array([nterms], pa.int64()),
            "doc_type": pa.array([str(group.schema.field("doc").type)],
                                 pa.string())})

    written = (proj.groupby("shard")
               .map_groups(write_shard, batch_format="pyarrow"))
    rows = written.take_all()
    counts = {int(r["shard"]): (int(r["n"]), int(r["terms"]))
              for r in rows}
    doc_type_holder = [r["doc_type"] for r in rows]
    doc_type = doc_type_holder[0] if doc_type_holder else "int64"
    # overwrite every untouched slot so a reused index_dir holds no
    # stale postings (same discipline as write_hash_index)
    e = np.empty(0, dtype=np.uint64)
    for s in range(nshards):
        if s not in counts:
            _write_shard_file(_shard_path(index_dir, s), e,
                              np.empty(0, dtype=np.int64), pa.int64())
            counts[s] = (0, 0)
    meta = {
        "nshards": nshards,
        "tokenizer": _TOKENIZER_ID,
        "id_col": id_col,
        "text_col": text_col,
        "doc_type": doc_type,
        "postings": sum(n for n, _ in counts.values()),
        "terms": sum(t for _, t in counts.values()),
    }
    fsio.atomic_write(_meta_path(index_dir),
                      json.dumps(meta).encode(), fsync=False)
    return {"postings": meta["postings"], "terms": meta["terms"]}


def _index_meta(index_dir: str) -> dict:
    return json.loads(fsio.read_bytes(_meta_path(index_dir)))


def _source_txn(container_dir: str) -> int:
    from ..state import manifest as mf

    records = mf.load_manifest(container_dir)
    return max((mf.record_txn(r) for r in records.values()), default=0)


def index_container_text(
    container_dir: str,
    index_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    nshards: int = _INDEX_SHARDS,
) -> dict:
    """Build the inverted index OF A CONTAINER and bind them: the meta
    records the source path and its transaction cursor, which is what
    lets ``refresh_text_index`` later converge the index from the
    container's own CDC feed instead of rebuilding."""
    from .encode_pipeline import decode_dataset

    # cursor BEFORE the read: anything committed in between lands in
    # the first refresh window instead of being skipped
    cursor = _source_txn(container_dir)
    stats = build_text_index(
        decode_dataset(container_dir, columns=[id_col, text_col]),
        index_dir, text_col=text_col, id_col=id_col, nshards=nshards)
    meta = _index_meta(index_dir)
    meta["source"] = container_dir
    meta["cursor"] = cursor
    fsio.atomic_write(_meta_path(index_dir),
                      json.dumps(meta).encode(), fsync=False)
    from .sidecar_registry import register_sidecar

    register_sidecar(container_dir, "text_index", index_dir)
    return stats


def refresh_text_index(index_dir: str) -> dict:
    """Converge a container-bound index to the container's current
    snapshot by consuming its CDC feed (P56) — the same convergence
    contract as replicas (P66) and materialized views (P70).

    Deleted/updated documents PURGE every posting carrying their id
    (a document's postings all derive from the text that changed, so
    id-level purge needs no pair matching); inserted/updated documents
    re-add their vocabulary through the ordinary posting projection.
    One exchange O(changed docs' vocabulary) + a purge sweep over the
    shard files; idempotent (purging an absent id and re-adding an
    existing pair are both no-ops), cursor advances last.  A
    retention-swept cursor window falls back to a full rebuild."""
    from .history_pipeline import row_changes

    meta = _index_meta(index_dir)
    if "source" not in meta:
        raise ValueError(
            f"{index_dir}: index is not bound to a container (built "
            "from a raw Dataset) — use index_container_text")
    source, cursor = meta["source"], int(meta["cursor"])
    id_col, text_col = meta["id_col"], meta["text_col"]
    nshards = int(meta["nshards"])
    now = _source_txn(source)
    if now <= cursor:
        return {"refreshed": False, "cursor": cursor}
    try:
        feed = row_changes(source, since_txn=cursor, key=id_col,
                           columns=[id_col, text_col])
    except RuntimeError:
        # cursor snapshot swept — no diff window; rebuild in place
        stats = index_container_text(source, index_dir,
                                     text_col=text_col, id_col=id_col,
                                     nshards=nshards)
        return {"refreshed": True, "rebuild": True, "cursor": now,
                **stats}

    # materialize the feed ONCE: it is consumed twice below (purge
    # gather + additions exchange), and re-executing row_changes would
    # decode + shuffle the churned partitions a second time
    feed = feed.materialize()

    # purge ids: every doc whose old content leaves the index
    def purge_batch(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        m = pc.is_in(b["_change_type"],
                     value_set=pa.array(["delete", "update_pre"]))
        return pa.table({id_col: b.filter(m)[id_col]})

    from ..stages.dedup import gather_small

    purge_tbl = gather_small(
        feed.map_batches(purge_batch, batch_format="pyarrow"),
        pa.table({id_col: pa.array([], pa.int64())}))
    purge = np.unique(purge_tbl[id_col].to_numpy(zero_copy_only=False))
    purge_ref = ray.put(purge)

    # additions: the new content's postings (re-projected fresh)
    def add_batch(b: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc

        m = pc.is_in(b["_change_type"],
                     value_set=pa.array(["insert", "update_post"]))
        return _posting_batch(b.filter(m).to_pandas(), text_col,
                              id_col, nshards)

    adds = feed.map_batches(add_batch, batch_format="pyarrow")

    def merge_shard(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({"shard": pa.array([], pa.int32())})
        shard = int(group["shard"][0].as_py())
        _apply_shard(index_dir, shard, ray.get(purge_ref),
                     group["h"].combine_chunks().to_numpy(),
                     group["doc"].combine_chunks().to_numpy(zero_copy_only=False),
                     group.schema.field("doc").type)
        return pa.table({"shard": pa.array([shard], pa.int32())})

    touched = {int(r["shard"]) for r in
               (adds.groupby("shard")
                .map_groups(merge_shard, batch_format="pyarrow")
                .take_all())}
    # purge-only shards (no additions hashed into them) still sweep;
    # the purge set ships as the ray.put ref (dereferenced on arrival,
    # once per node), not by value per task
    if purge.size:
        rest = [s for s in range(nshards) if s not in touched]
        ray.get([_purge_shard_task.remote(index_dir, s, purge_ref)
                 for s in rest])
    meta["cursor"] = now
    fsio.atomic_write(_meta_path(index_dir),
                      json.dumps(meta).encode(), fsync=False)
    return {"refreshed": True, "cursor": now,
            "purged_docs": int(purge.size)}


def _apply_shard(index_dir: str, shard: int, purge: np.ndarray,
                 add_h: np.ndarray, add_d: np.ndarray,
                 doc_type: pa.DataType) -> None:
    """Purge ids then merge additions into one shard file (atomic)."""
    path = _shard_path(index_dir, shard)
    old = _read_shard_file(path)
    h = old["h"].to_numpy()
    d = old["doc"].to_numpy()
    if purge.size and d.size:
        keep = ~np.isin(d, purge)
        h, d = h[keep], d[keep]
    if add_h.size:
        h = np.concatenate([h, add_h])
        d = np.concatenate([d, add_d])
    h, d = _distinct_pairs(h, d)
    if old.num_rows:
        doc_type = old.schema.field("doc").type
    _write_shard_file(path, h, d, doc_type)


@ray.remote
def _purge_shard_task(index_dir: str, shard: int,
                      purge: np.ndarray) -> None:
    _apply_shard(index_dir, shard, purge,
                 np.empty(0, dtype=np.uint64),
                 np.empty(0, dtype=np.int64), pa.int64())


def append_text_index(
    ds: rd.Dataset,
    index_dir: str,
) -> dict:
    """Fold new documents into an existing index (the daily-ingest
    shape, mirroring ``append_hash_index``): one exchange of the
    increment's projection, then a per-shard sorted merge + atomic
    rewrite.  Bytes rewritten: only the shards the increment hashes
    into."""
    meta = _index_meta(index_dir)
    nshards = int(meta["nshards"])
    proj = ds.map_batches(
        lambda b: _posting_batch(b, meta["text_col"], meta["id_col"],
                                 nshards),
        batch_format="pandas")

    def merge_shard(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({"shard": pa.array([], pa.int32()),
                             "dn": pa.array([], pa.int64())})
        shard = int(group["shard"][0].as_py())
        path = _shard_path(index_dir, shard)
        old = _read_shard_file(path)
        h = np.concatenate([old["h"].to_numpy(),
                            group["h"].combine_chunks().to_numpy()])
        d = np.concatenate([old["doc"].to_numpy(),
                            group["doc"].combine_chunks().to_numpy(zero_copy_only=False)])
        h, d = _distinct_pairs(h, d)
        doc_type = (old.schema.field("doc").type if old.num_rows
                    else group.schema.field("doc").type)
        _write_shard_file(path, h, d, doc_type)
        return pa.table({"shard": pa.array([shard], pa.int32()),
                         "dn": pa.array([h.size - old.num_rows],
                                        pa.int64())})

    merged = (proj.groupby("shard")
              .map_groups(merge_shard, batch_format="pyarrow"))
    added = sum(int(r["dn"]) for r in merged.take_all())
    meta["postings"] = int(meta["postings"]) + added
    meta.pop("terms", None)    # exact term count needs a full rescan
    fsio.atomic_write(_meta_path(index_dir),
                      json.dumps(meta).encode(), fsync=False)
    return {"added_postings": added}


@ray.remote
def _count_task(index_dir: str, shard: int, hs: np.ndarray) -> dict:
    """Document frequency per term hash — only the sorted ``h`` column
    is read; postings never leave the shard."""
    h = _read_shard_file(_shard_path(index_dir, shard),
                         columns=["h"])["h"].to_numpy()
    lo = np.searchsorted(h, hs, side="left")
    hi = np.searchsorted(h, hs, side="right")
    return {int(t): int(n) for t, n in zip(hs, hi - lo)}


@ray.remote
def _fetch_task(index_dir: str, shard: int, hs: np.ndarray,
                seed) -> dict:
    """Postings per term hash, intersected with the broadcast seed id
    set (if any) INSIDE the task — the driver only ever receives
    subsets of the rarest term's list.  ``seed`` is passed as an
    ``ray.put`` ObjectRef at the call site; Ray dereferences it on
    arrival, so the array ships to each node once, not per task."""
    t = _read_shard_file(_shard_path(index_dir, shard))
    h = t["h"].to_numpy()
    d = t["doc"].to_numpy()
    out = {}
    for th in hs:
        lo = np.searchsorted(h, th, side="left")
        hi = np.searchsorted(h, th, side="right")
        docs = d[lo:hi]
        if seed is not None:
            docs = docs[np.isin(docs, seed, assume_unique=True)]
        out[int(th)] = docs
    return out


def probe_text_index(
    index_dir: str,
    terms,
    mode: str = "and",
    max_postings: int = 10_000_000,
) -> np.ndarray:
    """Resolve ``terms`` against the index → sorted array of matching
    doc ids.  ``mode``: "and" (every term) or "or" (any term).

    ``max_postings`` bounds what the driver materializes: for AND it
    caps the RAREST term's document frequency (the fetch seed — other
    lists are intersected shard-side); for OR it caps the total, which
    is the answer's own size.  A stop-word query that exceeds it
    raises instead of silently melting the driver."""
    if mode not in ("and", "or"):
        raise ValueError(f"mode must be 'and' or 'or', got {mode!r}")
    terms = list(terms)
    if not terms:
        raise ValueError("probe_text_index needs at least one term")
    meta = _index_meta(index_dir)
    nshards = int(meta["nshards"])
    hs = np.unique(term_hashes(terms))
    shards = shard_of(hs, nshards)
    by_shard = {int(s): hs[shards == s] for s in np.unique(shards)}

    # phase 1: document frequencies only
    counts: dict[int, int] = {}
    for c in ray.get([_count_task.remote(index_dir, s, shs)
                      for s, shs in by_shard.items()]):
        counts.update(c)
    dfs = np.array([counts[int(t)] for t in hs], dtype=np.int64)

    if mode == "and":
        if (dfs == 0).any():
            return np.empty(0, dtype=np.int64)
        rare = hs[int(np.argmin(dfs))]
        if counts[int(rare)] > max_postings:
            raise ValueError(
                f"rarest term still has {counts[int(rare)]} postings "
                f"(> max_postings={max_postings}) — refine the query")
        rare_shard = int(shard_of(np.array([rare]), nshards)[0])
        seed = ray.get(_fetch_task.remote(
            index_dir, rare_shard, np.array([rare], dtype=np.uint64),
            None))[int(rare)]
        rest = hs[hs != rare]
        if rest.size == 0:
            return np.sort(seed)
        seed_ref = ray.put(np.unique(seed))
        rest_shards = shard_of(rest, nshards)
        fetched = ray.get([
            _fetch_task.remote(index_dir, int(s),
                               rest[rest_shards == s], seed_ref)
            for s in np.unique(rest_shards)])
        result = np.unique(seed)
        for chunk in fetched:
            for docs in chunk.values():
                result = result[np.isin(result, docs,
                                        assume_unique=True)]
                if result.size == 0:
                    return result
        return result

    # mode == "or"
    total = int(dfs.sum())
    if total > max_postings:
        raise ValueError(
            f"OR over {len(terms)} terms yields {total} postings "
            f"(> max_postings={max_postings}) — refine the query")
    fetched = ray.get([_fetch_task.remote(index_dir, s, shs, None)
                       for s, shs in by_shard.items()])
    parts = [docs for chunk in fetched for docs in chunk.values()]
    if not parts:
        return np.empty(0, dtype=np.int64)
    return np.unique(np.concatenate(parts))


def search_container(
    container_dir: str,
    index_dir: str,
    terms,
    mode: str = "and",
    columns: list[str] | None = None,
    max_postings: int = 10_000_000,
) -> rd.Dataset:
    """Full-text search over a container: probe the inverted index,
    then fetch exactly the matching rows via ``lookup_rows`` (manifest
    bloom + page-index pruning + projection) — container bytes read are
    O(matches), never a scan."""
    from .encode_pipeline import lookup_rows

    meta = _index_meta(index_dir)
    ids = probe_text_index(index_dir, terms, mode=mode,
                           max_postings=max_postings)
    if ids.size == 0:
        return rd.from_arrow(pa.table({}))
    return lookup_rows(container_dir, meta["id_col"], ids.tolist(),
                       columns=columns)
