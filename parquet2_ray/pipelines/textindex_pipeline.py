"""Persisted full-text inverted index over a container (P67).

The corpus-search shape: "fetch every document containing these terms
out of 100 TB" must not scan text.  The index is a sidecar directory of
``nshards`` parquet posting files — sorted ``(term_hash uint64, doc_id,
tf)`` rows, one per DISTINCT (term, document) with the in-document term
frequency (P73) — plus per-shard ``doclens-*`` files (doc_hash → token
length), BOTH landed by ONE kind-tagged ``groupby(shard)`` exchange of
the tokenized projection and probed with O(terms) column-projected GETs
+ ``searchsorted``.  Boolean retrieval uses the two-phase probe below;
``ranked_search_index`` answers BM25 top-k from the same files.

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
    "apply_stoplist",
    "explain_terms",
    "search_container",
    "ranked_search_index",
    "search_container_ranked",
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


def _merge_pairs(h: np.ndarray, d: np.ndarray, tf: np.ndarray):
    """Sort by (hash, doc) and combine duplicate (term, doc) pairs by
    MAX tf — max (not sum) keeps every merge path idempotent: folding
    the same document's postings twice must not inflate its term
    frequencies."""
    if h.size == 0:
        return h, d, tf
    order = np.lexsort((d, h))
    h, d, tf = h[order], d[order], tf[order]
    new = np.empty(h.size, dtype=bool)
    new[0] = True
    new[1:] = (h[1:] != h[:-1]) | (d[1:] != d[:-1])
    grp = np.cumsum(new) - 1
    out_tf = np.zeros(int(grp[-1]) + 1, dtype=np.int64)
    np.maximum.at(out_tf, grp, tf)
    return h[new], d[new], out_tf


def _posting_batch(batch, text_col: str, id_col: str,
                   nshards: int) -> pd.DataFrame:
    """The index's ONE exchange projection, kind-tagged so a single
    ``groupby(shard)`` routes both record types:

    - ``kind=0`` postings: (term_hash, doc, tf) — one row per DISTINCT
      (term, doc), tf = the term's in-document count (BM25's tf),
      routed by ``shard_of(term_hash)``;
    - ``kind=1`` doclens: (doc_hash, doc, len) — one row per document,
      len = its token count (BM25's |d|), routed by
      ``shard_of(doc_hash)``.

    Tokenization runs in Arrow kernels (``utf8_lower`` +
    ``split_pattern_regex`` — VERDICT r4 hygiene #9); only the flat
    token array crosses to numpy, for the hash the index layout is
    keyed on.  Tokens are ``[a-z0-9]+`` runs, so the kernels' case
    mapping matches Python ``str.lower`` for every character that can
    reach a token.  Accepts a pyarrow Table or a pandas DataFrame.
    """
    import pyarrow.compute as pc

    from ..functions.hashing import column_hashes

    if isinstance(batch, pd.DataFrame):
        batch = pa.Table.from_pandas(batch, preserve_index=False)
    txt = pc.fill_null(batch[text_col], "")
    toks = pc.split_pattern_regex(
        pc.utf8_lower(txt), _TOKEN_SPLIT).combine_chunks()
    lens = np.diff(toks.offsets.to_numpy(zero_copy_only=False)) \
        .astype(np.int64)
    flat = toks.values.to_numpy(zero_copy_only=False)
    docs = np.repeat(
        batch[id_col].to_numpy(zero_copy_only=False), lens)
    if flat.size:
        nonempty = flat != ""      # split() yields '' at boundary runs
        flat, docs = flat[nonempty], docs[nonempty]
        # per-row non-empty token count = the BM25 doc length
        row_ids = np.repeat(np.arange(len(batch)), lens)[nonempty]
        doclen = np.bincount(row_ids, minlength=len(batch))
    else:
        doclen = np.zeros(len(batch), dtype=np.int64)
    hs = (hash_strings(flat) if flat.size
          else np.empty(0, dtype=np.uint64))
    if hs.size:
        # one lexsort: duplicate (term, doc) occurrences collapse to a
        # run; the run length IS the in-document term frequency
        order = np.lexsort((docs, hs))
        hs, ds_ = hs[order], docs[order]
        new = np.empty(hs.size, dtype=bool)
        new[0] = True
        new[1:] = (hs[1:] != hs[:-1]) | (ds_[1:] != ds_[:-1])
        grp = np.cumsum(new) - 1
        tf = np.bincount(grp).astype(np.int64)
        h, pdocs = hs[new], ds_[new]
    else:
        h, pdocs, tf = hs, docs, np.empty(0, np.int64)
    all_ids = batch[id_col].to_numpy()
    dhash = (column_hashes(pa.array(all_ids)) if len(batch)
             else np.empty(0, dtype=np.uint64))
    kind = np.concatenate([np.zeros(h.size, np.int8),
                           np.ones(dhash.size, np.int8)])
    return pd.DataFrame({
        "h": np.concatenate([h, dhash]),
        "doc": np.concatenate([pdocs, all_ids]),
        "tf": np.concatenate([tf, doclen.astype(np.int64)]),
        "kind": kind,
        "shard": shard_of(np.concatenate([h, dhash]), nshards)
        if (h.size + dhash.size) else np.empty(0, dtype=np.int64),
    })


def _write_shard_file(path: str, h: np.ndarray, d: np.ndarray,
                      doc_type: pa.DataType,
                      tf: np.ndarray | None = None) -> None:
    if tf is None:
        tf = np.ones(h.size, dtype=np.int64)
    sink = pa.BufferOutputStream()
    pq.write_table(pa.table({"h": pa.array(h, pa.uint64()),
                             "doc": pa.array(d, doc_type),
                             "tf": pa.array(tf, pa.int64())}), sink)
    fsio.atomic_write(path, sink.getvalue().to_pybytes(), fsync=False)


def _read_shard_file(path: str, columns=None) -> pa.Table:
    if not fsio.exists(path):
        return pa.table({"h": pa.array([], pa.uint64()),
                         "doc": pa.array([], pa.int64()),
                         "tf": pa.array([], pa.int64())})
    t = pq.read_table(pa.BufferReader(fsio.read_bytes(path)),
                      columns=columns)
    # pre-P73 shard files have no tf column — synthesize tf=1 so
    # refresh/append over an old index degrade gracefully (boolean
    # search is unaffected; rebuild to get real frequencies)
    if (columns is None or "tf" in columns) and \
            "tf" not in t.column_names:
        t = t.append_column(
            "tf", pa.array(np.ones(t.num_rows, np.int64)))
    return t


def _doclen_path(index_dir: str, shard: int) -> str:
    return index_dir.rstrip("/") + f"/doclens-{shard:05d}.parquet"


def _write_doclen_file(path: str, h: np.ndarray, lens: np.ndarray) \
        -> None:
    sink = pa.BufferOutputStream()
    pq.write_table(pa.table({"h": pa.array(h, pa.uint64()),
                             "len": pa.array(lens, pa.int64())}), sink)
    fsio.atomic_write(path, sink.getvalue().to_pybytes(), fsync=False)


def _read_doclen_file(path: str) -> tuple[np.ndarray, np.ndarray]:
    if not fsio.exists(path):
        return (np.empty(0, np.uint64), np.empty(0, np.int64))
    t = pq.read_table(pa.BufferReader(fsio.read_bytes(path)))
    return t["h"].to_numpy(), t["len"].to_numpy()


def _merge_doclens(h: np.ndarray, lens: np.ndarray):
    """Sort by doc hash; duplicates keep the LAST write (replace)."""
    if h.size == 0:
        return h, lens
    order = np.argsort(h, kind="stable")
    h, lens = h[order], lens[order]
    last = np.empty(h.size, dtype=bool)
    last[:-1] = h[1:] != h[:-1]
    last[-1] = True
    return h[last], lens[last]


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
        batch_format="pyarrow")
    doc_type_holder: list = []

    def write_shard(group: pa.Table) -> pa.Table:
        empty = pa.table({"shard": pa.array([], pa.int32()),
                          "n": pa.array([], pa.int64()),
                          "terms": pa.array([], pa.int64()),
                          "ndocs": pa.array([], pa.int64()),
                          "toklen": pa.array([], pa.int64()),
                          "doc_type": pa.array([], pa.string())})
        if group.num_rows == 0:
            return empty
        shard = int(group["shard"][0].as_py())
        kind = group["kind"].to_numpy(zero_copy_only=False)
        h = group["h"].combine_chunks().to_numpy()
        d = group["doc"].combine_chunks().to_numpy(zero_copy_only=False)
        tf = group["tf"].combine_chunks().to_numpy()
        pm = kind == 0
        ph, pd_, ptf = _merge_pairs(h[pm], d[pm], tf[pm])
        _write_shard_file(_shard_path(index_dir, shard), ph, pd_,
                          group.schema.field("doc").type, ptf)
        dh, dl = _merge_doclens(h[~pm], tf[~pm])
        _write_doclen_file(_doclen_path(index_dir, shard), dh, dl)
        nterms = int((np.diff(ph) != 0).sum()) + 1 if ph.size else 0
        return pa.table({
            "shard": pa.array([shard], pa.int32()),
            "n": pa.array([ph.size], pa.int64()),
            "terms": pa.array([nterms], pa.int64()),
            "ndocs": pa.array([dh.size], pa.int64()),
            "toklen": pa.array([int(dl.sum())], pa.int64()),
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
            _write_doclen_file(_doclen_path(index_dir, s), e,
                               np.empty(0, dtype=np.int64))
            counts[s] = (0, 0)
    # per-shard ABSOLUTE doclen stats: folds update a shard's entry
    # with the file's absolute state, so a crashed-then-rerun window
    # converges instead of double-counting deltas
    dstats = {str(int(r["shard"])): [int(r["ndocs"]), int(r["toklen"])]
              for r in rows}
    for s in range(nshards):
        dstats.setdefault(str(s), [0, 0])
    meta = {
        "nshards": nshards,
        "tokenizer": _TOKENIZER_ID,
        "id_col": id_col,
        "text_col": text_col,
        "doc_type": doc_type,
        "postings": sum(n for n, _ in counts.values()),
        "terms": sum(t for _, t in counts.values()),
        "doclen_shards": dstats,
        "ndocs": sum(v[0] for v in dstats.values()),
        "total_tokens": sum(v[1] for v in dstats.values()),
    }
    fsio.atomic_write(_meta_path(index_dir),
                      json.dumps(meta).encode(), fsync=False)
    return {"postings": meta["postings"], "terms": meta["terms"],
            "ndocs": meta["ndocs"]}


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


def refresh_text_index(index_dir: str, to_txn: int | None = None) -> dict:
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
    now = int(to_txn) if to_txn is not None else _source_txn(source)
    if now <= cursor:
        return {"refreshed": False, "cursor": cursor}
    try:
        # window pinned to [cursor, now]: a concurrent append lands in
        # the NEXT refresh instead of straddling this one
        feed = row_changes(source, since_txn=cursor, key=id_col,
                           to_txn=now, columns=[id_col, text_col])
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

    from ..functions.hashing import column_hashes

    purge_tbl = gather_small(
        feed.map_batches(purge_batch, batch_format="pyarrow"),
        pa.table({id_col: pa.array([], pa.int64())}))
    purge = np.unique(purge_tbl[id_col].to_numpy(zero_copy_only=False))
    # hashes of the purged ids locate their doclen entries
    purge_h = (np.unique(column_hashes(pa.array(purge)))
               if purge.size else np.empty(0, np.uint64))
    purge_ref = ray.put((purge, purge_h))

    # additions: the new content's postings (re-projected fresh)
    def add_batch(b: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc

        m = pc.is_in(b["_change_type"],
                     value_set=pa.array(["insert", "update_post"]))
        return _posting_batch(b.filter(m), text_col, id_col, nshards)

    adds = feed.map_batches(add_batch, batch_format="pyarrow")

    def merge_shard(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({"shard": pa.array([], pa.int32()),
                             "ddocs": pa.array([], pa.int64()),
                             "dtok": pa.array([], pa.int64())})
        shard = int(group["shard"][0].as_py())
        kind = group["kind"].to_numpy(zero_copy_only=False)
        pm = kind == 0
        gh = group["h"].combine_chunks().to_numpy()
        gd = group["doc"].combine_chunks().to_numpy(
            zero_copy_only=False)
        gtf = group["tf"].combine_chunks().to_numpy()
        pg, pgh = ray.get(purge_ref)
        adocs, atok = _apply_shard(
            index_dir, shard, pg, pgh,
            gh[pm], gd[pm], gtf[pm].astype(np.int64),
            gh[~pm], gtf[~pm].astype(np.int64),
            group.schema.field("doc").type)
        return pa.table({"shard": pa.array([shard], pa.int32()),
                         "adocs": pa.array([adocs], pa.int64()),
                         "atok": pa.array([atok], pa.int64())})

    rows = (adds.groupby("shard")
            .map_groups(merge_shard, batch_format="pyarrow")
            .take_all())
    touched = {int(r["shard"]) for r in rows}
    _ensure_doclen_stats(meta, index_dir)
    for r in rows:
        meta["doclen_shards"][str(int(r["shard"]))] = \
            [int(r["adocs"]), int(r["atok"])]
    # purge-only shards (no additions hashed into them) still sweep;
    # the purge set ships as the ray.put ref (dereferenced on arrival,
    # once per node), not by value per task
    if purge.size:
        rest = [s for s in range(nshards) if s not in touched]
        for s, (adocs, atok) in zip(rest, ray.get([
                _purge_shard_task.remote(index_dir, s, purge_ref)
                for s in rest])):
            meta["doclen_shards"][str(s)] = [adocs, atok]
    meta["ndocs"] = sum(v[0] for v in meta["doclen_shards"].values())
    meta["total_tokens"] = sum(v[1] for v in
                               meta["doclen_shards"].values())
    # purges/additions change the posting count by an amount only a
    # full rescan could recover — drop the stat rather than let it
    # drift (same discipline as append's meta.pop('terms'); ADVICE r4)
    meta.pop("postings", None)
    meta.pop("terms", None)
    meta["cursor"] = now
    fsio.atomic_write(_meta_path(index_dir),
                      json.dumps(meta).encode(), fsync=False)
    return {"refreshed": True, "cursor": now,
            "purged_docs": int(purge.size)}


def _apply_shard(index_dir: str, shard: int, purge: np.ndarray,
                 purge_h: np.ndarray,
                 add_h: np.ndarray, add_d: np.ndarray,
                 add_tf: np.ndarray,
                 len_h: np.ndarray, len_v: np.ndarray,
                 doc_type: pa.DataType) -> tuple[int, int]:
    """Purge ids then merge additions into one shard's posting AND
    doclen files (atomic each).  Returns the ABSOLUTE (docs, tokens)
    of the doclen file after the write — absolute so the meta fold is
    idempotent across crashed-and-rerun windows."""
    path = _shard_path(index_dir, shard)
    old = _read_shard_file(path)
    h = old["h"].to_numpy()
    d = old["doc"].to_numpy()
    tf = old["tf"].to_numpy()
    if purge.size and d.size:
        keep = ~np.isin(d, purge)
        h, d, tf = h[keep], d[keep], tf[keep]
    if add_h.size:
        h = np.concatenate([h, add_h])
        d = np.concatenate([d, add_d])
        tf = np.concatenate([tf, add_tf])
    h, d, tf = _merge_pairs(h, d, tf)
    if old.num_rows:
        doc_type = old.schema.field("doc").type
    _write_shard_file(path, h, d, doc_type, tf)
    # doclen side: purge by doc HASH, then replace-merge additions
    lpath = _doclen_path(index_dir, shard)
    oh, ol = _read_doclen_file(lpath)
    if purge_h.size and oh.size:
        keep = ~np.isin(oh, purge_h)
        oh, ol = oh[keep], ol[keep]
    if len_h.size:
        oh = np.concatenate([oh, len_h])
        ol = np.concatenate([ol, len_v])
    oh, ol = _merge_doclens(oh, ol)
    _write_doclen_file(lpath, oh, ol)
    return (int(oh.size), int(ol.sum()) if ol.size else 0)


@ray.remote
def _purge_shard_task(index_dir: str, shard: int,
                      purge_pair) -> tuple[int, int]:
    purge, purge_h = purge_pair
    e64 = np.empty(0, dtype=np.uint64)
    ei = np.empty(0, dtype=np.int64)
    return _apply_shard(index_dir, shard, purge, purge_h,
                        e64, ei, ei, e64, ei, pa.int64())


@ray.remote
def _doclen_probe_task(index_dir: str, shard: int,
                       hs: np.ndarray) -> np.ndarray:
    """Which of the probe hashes are already indexed in this shard's
    doclen sidecar (KB-sized; postings never read)."""
    h, _ = _read_doclen_file(_doclen_path(index_dir, shard))
    return hs[np.isin(hs, h)] if h.size else hs[:0]


def append_text_index(
    ds: rd.Dataset,
    index_dir: str,
    on_existing: str = "error",
) -> dict:
    """Fold new documents into an existing index (the daily-ingest
    shape, mirroring ``append_hash_index``): one exchange of the
    increment's projection, then a per-shard sorted merge + atomic
    rewrite.  Bytes rewritten: only the shards the increment hashes
    into.

    Append is INSERT-ONLY by contract: a re-ingested document whose
    text changed would leave its old content's postings in place (and
    the MAX-merge can never lower a tf) — only the refresh/rebuild
    paths purge old content.  ``on_existing`` guards that assumption
    (ADVICE r4):

    - ``"error"`` (default): probe the doclen sidecars for the
      increment's ids and raise if any are already indexed;
    - ``"replace"``: purge already-present ids from every shard first
      (the refresh purge path), then add — correct for re-ingested
      changed documents at the cost of a full purge sweep;
    - ``"unchecked"``: skip the probe; the caller guarantees fresh ids
      (e.g. monotonically assigned).  Identical re-ingests are safe
      here — the pair merge and doclen replace are idempotent.
    """
    if on_existing not in ("error", "replace", "unchecked"):
        raise ValueError(f"on_existing={on_existing!r}; one of "
                         "error/replace/unchecked")
    meta = _index_meta(index_dir)
    nshards = int(meta["nshards"])
    if on_existing != "unchecked":
        from ..functions.hashing import column_hashes
        from ..stages.dedup import gather_small

        id_col = meta["id_col"]
        ids_tbl = gather_small(
            ds.select_columns([id_col]),
            pa.table({id_col: pa.array([], pa.int64())}))
        inc_ids = np.unique(
            ids_tbl[id_col].to_numpy(zero_copy_only=False))
        inc_h = (column_hashes(pa.array(inc_ids)) if inc_ids.size
                 else np.empty(0, np.uint64))
        shards = shard_of(inc_h, nshards) if inc_h.size else inc_h
        present_h = np.concatenate([np.asarray(r) for r in ray.get([
            _doclen_probe_task.remote(index_dir, int(s),
                                      inc_h[shards == s])
            for s in np.unique(shards)])] or
            [np.empty(0, np.uint64)])
        if present_h.size:
            present_ids = inc_ids[np.isin(inc_h, present_h)]
            if on_existing == "error":
                raise ValueError(
                    f"append_text_index: {present_ids.size} increment "
                    f"id(s) already indexed (e.g. "
                    f"{present_ids[:5].tolist()}); append is "
                    "insert-only — use on_existing='replace' or "
                    "refresh_text_index for changed documents")
            purge_ref = ray.put((present_ids, np.unique(present_h)))
            _ensure_doclen_stats(meta, index_dir)
            for s, (adocs, atok) in zip(range(nshards), ray.get([
                    _purge_shard_task.remote(index_dir, s, purge_ref)
                    for s in range(nshards)])):
                meta["doclen_shards"][str(s)] = [adocs, atok]
            # purged posting count is unknown without a rescan — the
            # running total goes stale, drop it (the 'terms' rule)
            meta.pop("postings", None)
    proj = ds.map_batches(
        lambda b: _posting_batch(b, meta["text_col"], meta["id_col"],
                                 nshards),
        batch_format="pyarrow")

    def merge_shard(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({"shard": pa.array([], pa.int32()),
                             "dn": pa.array([], pa.int64()),
                             "ddocs": pa.array([], pa.int64()),
                             "dtok": pa.array([], pa.int64())})
        shard = int(group["shard"][0].as_py())
        kind = group["kind"].to_numpy(zero_copy_only=False)
        gh = group["h"].combine_chunks().to_numpy()
        gd = group["doc"].combine_chunks().to_numpy(
            zero_copy_only=False)
        gtf = group["tf"].combine_chunks().to_numpy()
        pm = kind == 0
        path = _shard_path(index_dir, shard)
        old = _read_shard_file(path)
        h = np.concatenate([old["h"].to_numpy(), gh[pm]])
        d = np.concatenate([old["doc"].to_numpy(), gd[pm]])
        tf = np.concatenate([old["tf"].to_numpy(),
                             gtf[pm].astype(np.int64)])
        h, d, tf = _merge_pairs(h, d, tf)
        doc_type = (old.schema.field("doc").type if old.num_rows
                    else group.schema.field("doc").type)
        _write_shard_file(path, h, d, doc_type, tf)
        # doclens: new rows replace (stable sort keeps the increment)
        lpath = _doclen_path(index_dir, shard)
        oh, ol = _read_doclen_file(lpath)
        nh, nl = _merge_doclens(
            np.concatenate([oh, gh[~pm]]),
            np.concatenate([ol, gtf[~pm].astype(np.int64)]))
        _write_doclen_file(lpath, nh, nl)
        # absolute file state, not deltas: meta folds stay idempotent
        # across crashed-and-rerun windows
        return pa.table({
            "shard": pa.array([shard], pa.int32()),
            "dn": pa.array([h.size - old.num_rows], pa.int64()),
            "adocs": pa.array([nh.size], pa.int64()),
            "atok": pa.array([int(nl.sum()) if nl.size else 0],
                             pa.int64())})

    merged = (proj.groupby("shard")
              .map_groups(merge_shard, batch_format="pyarrow"))
    rows = merged.take_all()
    added = sum(int(r["dn"]) for r in rows)
    if "postings" in meta:   # absent after a purge path dropped it
        meta["postings"] = int(meta["postings"]) + added
    _ensure_doclen_stats(meta, index_dir)
    for r in rows:
        meta["doclen_shards"][str(int(r["shard"]))] = \
            [int(r["adocs"]), int(r["atok"])]
    meta["ndocs"] = sum(v[0] for v in meta["doclen_shards"].values())
    meta["total_tokens"] = sum(v[1] for v in
                               meta["doclen_shards"].values())
    meta.pop("terms", None)    # exact term count needs a full rescan
    fsio.atomic_write(_meta_path(index_dir),
                      json.dumps(meta).encode(), fsync=False)
    return {"added_postings": added}


def _ensure_doclen_stats(meta: dict, index_dir: str) -> None:
    """Initialize per-shard doclen stats for a pre-P73 meta by reading
    the doclen files once (absent files count as empty)."""
    if "doclen_shards" in meta:
        return
    stats = {}
    for s in range(int(meta["nshards"])):
        h, lens = _read_doclen_file(_doclen_path(index_dir, s))
        stats[str(s)] = [int(h.size),
                         int(lens.sum()) if lens.size else 0]
    meta["doclen_shards"] = stats


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
    arrival, so the array ships to each node once, not per task.
    Boolean probing never needs term frequencies — project them out."""
    t = _read_shard_file(_shard_path(index_dir, shard),
                         columns=["h", "doc"])
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


def explain_terms(index_dir: str, terms) -> dict:
    """EXPLAIN for a text query: per-term document frequency (count
    phase only — no postings move), the rarest term an AND would seed
    from, and the fetch mass each mode would pay.  The planning
    surface for choosing terms/mode before paying the fetch."""
    meta = _index_meta(index_dir)
    nshards = int(meta["nshards"])
    terms = list(terms)
    hs = term_hashes(terms)
    shards = shard_of(np.unique(hs), nshards)
    uh = np.unique(hs)
    by_shard = {int(s): uh[shards == s] for s in np.unique(shards)}
    counts: dict[int, int] = {}
    for c in ray.get([_count_task.remote(index_dir, s, shs)
                      for s, shs in by_shard.items()]):
        counts.update(c)
    dfs = {t: int(counts.get(int(h), 0))
           for t, h in zip(terms, hs)}
    rarest = min(dfs, key=dfs.get) if dfs else None
    return {
        "terms": dfs,
        "ndocs": int(meta.get("ndocs", 0)) or None,
        "rarest": rarest,
        "and_fetch_mass": dfs.get(rarest, 0),
        "or_fetch_mass": int(sum(dfs.values())),
    }


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
    dropped = set(meta.get("dropped_terms", []))
    if dropped:
        bad = [t for t, h in zip(terms, term_hashes(terms))
               if int(h) in dropped]
        if bad:
            raise ValueError(
                f"term(s) {bad} were stoplisted at build/maintenance "
                f"(df > {meta.get('stoplist_max_df')} of the corpus) "
                "— a boolean query on them is unanswerable from this "
                "index; drop them from the query")
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


@ray.remote
def _fetch_tf_task(index_dir: str, shard: int, hs: np.ndarray) -> dict:
    """(doc ids, term frequencies) per term hash — the ranked-search
    fetch.  Returned mass is bounded by the caller's Σdf guard."""
    t = _read_shard_file(_shard_path(index_dir, shard))
    h = t["h"].to_numpy()
    d = t["doc"]
    tf = t["tf"].to_numpy()
    out = {}
    for th in hs:
        lo = np.searchsorted(h, th, side="left")
        hi = np.searchsorted(h, th, side="right")
        out[int(th)] = (d[lo:hi].to_numpy(zero_copy_only=False),
                        tf[lo:hi].astype(np.float64))
    return out


@ray.remote
def _doclen_task(index_dir: str, shard: int, dh: np.ndarray) -> dict:
    """doc_hash → token length for the requested hashes (searchsorted
    over the shard's sorted doclen file)."""
    h, lens = _read_doclen_file(_doclen_path(index_dir, shard))
    if h.size == 0:
        return {}
    idx = np.searchsorted(h, dh)
    ok = (idx < h.size) & (h[np.minimum(idx, h.size - 1)] == dh)
    return {int(x): int(lens[i])
            for x, i, hit in zip(dh, idx, ok) if hit}


def ranked_search_index(
    index_dir: str,
    terms,
    k: int = 10,
    k1: float = 1.5,
    b: float = 0.75,
    max_postings: int = 10_000_000,
) -> pa.Table:
    """BM25 top-k over the inverted index (P73): classic Robertson/
    Spärck-Jones scoring — idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)),
    tf saturation k1, length normalization b against the corpus
    average doc length (both maintained in the index meta; doc lengths
    come from the per-shard doclen files built in the same exchange as
    the postings).

    Ranked retrieval is OR-shaped, so the fetch mass is Σ df over the
    query terms — guarded by ``max_postings`` like the boolean OR.
    Returns (doc, score, rank), ties broken by ascending doc id."""
    from ..functions.hashing import column_hashes

    terms = list(terms)
    if not terms:
        raise ValueError("ranked_search_index needs at least one term")
    meta = _index_meta(index_dir)
    nshards = int(meta["nshards"])
    n_docs = int(meta.get("ndocs", 0))
    if n_docs <= 0:
        raise ValueError(f"{index_dir}: index predates ranked search "
                         "(no ndocs in meta) — rebuild it")
    avgdl = max(1.0, float(meta.get("total_tokens", 0)) / n_docs)
    dropped = set(meta.get("dropped_terms", []))
    if dropped:
        # stoplisted terms contribute ~zero idf by construction
        terms = [t for t, h in zip(terms, term_hashes(terms))
                 if int(h) not in dropped]
        if not terms:
            return pa.table({"doc": pa.array([]),
                             "score": pa.array([], pa.float64()),
                             "rank": pa.array([], pa.int64())})
    hs = np.unique(term_hashes(terms))
    shards = shard_of(hs, nshards)
    by_shard = {int(s): hs[shards == s] for s in np.unique(shards)}

    counts: dict[int, int] = {}
    for c in ray.get([_count_task.remote(index_dir, s, shs)
                      for s, shs in by_shard.items()]):
        counts.update(c)
    total = int(sum(counts.values()))
    if total == 0:
        return pa.table({"doc": pa.array([]),
                         "score": pa.array([], pa.float64()),
                         "rank": pa.array([], pa.int64())})
    if total > max_postings:
        raise ValueError(
            f"ranked query fetches {total} postings "
            f"(> max_postings={max_postings}) — refine the query")

    fetched: dict[int, tuple] = {}
    for part in ray.get([_fetch_tf_task.remote(index_dir, s, shs)
                         for s, shs in by_shard.items()]):
        fetched.update(part)

    docs_all = np.concatenate([fetched[int(t)][0] for t in hs])
    tf_all = np.concatenate([fetched[int(t)][1] for t in hs])
    idf = {int(t): float(np.log1p(
        (n_docs - counts[int(t)] + 0.5) / (counts[int(t)] + 0.5)))
        for t in hs}
    w_all = np.concatenate([
        np.full(fetched[int(t)][0].size, idf[int(t)]) for t in hs])

    cand = np.unique(docs_all)             # sorted — the tie-break key
    # doc lengths for the candidates (distributed probe by doc hash)
    ch = column_hashes(pa.array(cand))
    cshards = shard_of(ch, nshards)
    lenmap: dict[int, int] = {}
    for part in ray.get([
            _doclen_task.remote(index_dir, int(s), ch[cshards == s])
            for s in np.unique(cshards)]):
        lenmap.update(part)
    dl = np.array([lenmap.get(int(x), avgdl) for x in ch],
                  dtype=np.float64)

    pos = np.searchsorted(cand, docs_all)
    norm = k1 * (1.0 - b + b * dl / avgdl)
    scores = np.zeros(cand.size, dtype=np.float64)
    np.add.at(scores, pos,
              w_all * tf_all * (k1 + 1.0) / (tf_all + norm[pos]))
    # cand is ascending; a stable sort on -score keeps doc-ascending
    # order inside score ties
    order = np.argsort(-scores, kind="stable")[:k]
    return pa.table({
        "doc": pa.array(cand[order]),
        "score": pa.array(scores[order], pa.float64()),
        "rank": pa.array(np.arange(1, order.size + 1), pa.int64()),
    })


def search_container_ranked(
    container_dir: str,
    index_dir: str,
    terms,
    k: int = 10,
    columns: list[str] | None = None,
    k1: float = 1.5,
    b: float = 0.75,
    max_postings: int = 10_000_000,
) -> rd.Dataset:
    """BM25 top-k + row fetch: rank against the index, then pull only
    the k winning rows through ``lookup_rows``' pruning; the score and
    rank columns ride along (broadcast of a k-sized map)."""
    from .encode_pipeline import lookup_rows

    meta = _index_meta(index_dir)
    ranked = ranked_search_index(index_dir, terms, k=k, k1=k1, b=b,
                                 max_postings=max_postings)
    if ranked.num_rows == 0:
        return rd.from_arrow(pa.table({}))
    id_col = meta["id_col"]
    score_of = {d: (float(s), int(r)) for d, s, r in
                zip(ranked["doc"].to_pylist(),
                    ranked["score"].to_pylist(),
                    ranked["rank"].to_pylist())}

    # lookup_rows drops the key column when the projection excludes
    # it, but attach needs it to map scores — request it, then drop it
    # back out if the caller didn't ask for it
    read_cols = columns
    drop_id = False
    if columns is not None and id_col not in columns:
        read_cols = list(columns) + [id_col]
        drop_id = True

    def attach(bt: pa.Table) -> pa.Table:
        vals = bt[id_col].to_pylist()
        bt = (bt.append_column("score", pa.array(
            [score_of[v][0] for v in vals], pa.float64()))
            .append_column("rank", pa.array(
                [score_of[v][1] for v in vals], pa.int64())))
        return bt.drop_columns([id_col]) if drop_id else bt

    rows = lookup_rows(container_dir, id_col,
                       ranked["doc"].to_pylist(), columns=read_cols)
    return rows.map_batches(attach, batch_format="pyarrow")


@ray.remote
def _stoplist_shard_task(index_dir: str, shard: int,
                         max_df_count: int) -> list:
    """Drop this shard's terms with df > max_df_count from its posting
    file; returns the dropped term hashes (a term lives entirely in
    ONE shard, so per-shard df IS global df)."""
    path = _shard_path(index_dir, shard)
    t = _read_shard_file(path)
    h = t["h"].to_numpy()
    if h.size == 0:
        return []
    # df per term over the sorted hash column
    new = np.empty(h.size, dtype=bool)
    new[0] = True
    new[1:] = h[1:] != h[:-1]
    starts = np.flatnonzero(new)
    dfs = np.diff(np.append(starts, h.size))
    heavy = starts[dfs > max_df_count]
    if heavy.size == 0:
        return []
    heavy_hashes = h[heavy]
    keep = ~np.isin(h, heavy_hashes)
    _write_shard_file(path, h[keep],
                      t["doc"].to_numpy(zero_copy_only=False)[keep],
                      t.schema.field("doc").type,
                      t["tf"].to_numpy()[keep])
    return [int(x) for x in heavy_hashes]


def apply_stoplist(index_dir: str, max_df: float = 0.5) -> dict:
    """Stop-word pruning (the 100 TB index-size mitigation): drop every
    term present in more than ``max_df`` of the corpus's documents from
    the posting files — the Zipf head is a handful of terms carrying a
    huge share of the postings, and a boolean query on one would be
    guard-rejected anyway (``max_postings``).

    Dropped term hashes are recorded in the meta (the Zipf head is
    SMALL, so the list is bounded); ``probe_text_index`` raises a
    clear error for a stoplisted term instead of silently returning
    nothing, and BM25 skips them (their idf ≈ 0 contribution).
    Appends/refreshes may partially reintroduce a dropped term until
    the stoplist is re-applied — ``apply_stoplist`` is idempotent and
    ``maintain``-friendly; re-run it after heavy ingest."""
    if not (0.0 < max_df <= 1.0):
        raise ValueError("max_df must be in (0, 1]")
    meta = _index_meta(index_dir)
    ndocs = int(meta.get("ndocs", 0))
    if ndocs <= 0:
        raise ValueError(f"{index_dir}: index predates doc counting — "
                         "rebuild it before applying a stoplist")
    cutoff = int(max_df * ndocs)
    dropped: set[int] = set(meta.get("dropped_terms", []))
    before = len(dropped)
    for part in ray.get([
            _stoplist_shard_task.remote(index_dir, s, cutoff)
            for s in range(int(meta["nshards"]))]):
        dropped.update(part)
    meta["dropped_terms"] = sorted(dropped)
    meta["stoplist_max_df"] = max_df
    fsio.atomic_write(_meta_path(index_dir),
                      json.dumps(meta).encode(), fsync=False)
    return {"dropped_terms": len(dropped),
            "newly_dropped": len(dropped) - before,
            "df_cutoff": cutoff}
