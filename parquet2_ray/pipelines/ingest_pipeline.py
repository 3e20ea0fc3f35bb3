"""The daily-ingest composite: dedup a new increment against the
corpus, append the survivors, fold their hashes into the index —
one call, crash-safe at every boundary.

Composes three primitives that each already carry their own resume
story (P38 ``incremental_dedup``, P40 ``append_dataset``, P51
``changes_since``), but the COMPOSITION has an ordering hazard none of
them owns: if the hash index folds before the append commits, a crash
between the two makes the re-run see the increment's own hashes in the
index and silently drop every document (data loss, the worst failure
mode an ingest pipeline has).  The fix is a phase ledger
(``<container>/_ingests.json``) and this order:

1. **filter** — removal ids against the UNFOLDED index (recomputable:
   nothing has mutated yet), keep-filter the increment;
2. **append** — ``append_dataset(kept, ...)`` under a deterministic
   ``ingest_id`` (the standard two-phase id/txn reservation + per-
   partition fingerprint resume); only after it fully commits, write
   the ledger phase ``appended`` with the append's txn;
3. **fold** — re-read exactly the appended rows from the container via
   ``changes_since(txn-1)`` and fold their hashes
   (``append_hash_index`` is a sorted-unique merge — idempotent);
   then mark ``done``.

Re-run after a crash anywhere: before ``appended`` the index is
untouched, so the filter recomputes identically and the append resumes;
after ``appended`` the filter/append are SKIPPED entirely (the index
may be partially folded — recomputing removals against it would drop
the increment) and the fold re-runs from the container, idempotent.
``done`` is a no-op.  Single writer per container, like every
maintenance op.

No reference analog (parquet2 has no dedup or ingest); this is the
GPT-3/Dolma-style crawl-ingest hygiene loop expressed over the
engine's own container + index primitives.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from ..state import fsio
from .encode_pipeline import EncodeOptions

__all__ = ["ingest_increment"]


def _ledger_path(container_dir: str) -> str:
    return os.path.join(container_dir, "_ingests.json")


def _load_ledger(container_dir: str) -> dict:
    p = _ledger_path(container_dir)
    if not fsio.exists(p):
        return {}
    return json.loads(fsio.read_bytes(p))


def _save_ledger(container_dir: str, ledger: dict) -> None:
    fsio.atomic_write(_ledger_path(container_dir),
                      json.dumps(ledger, indent=1).encode(), fsync=False)


def ingest_increment(
    new_input: str | list[str] | rd.Dataset,
    container_dir: str,
    index_dir: str,
    opts: EncodeOptions | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    ingest_id: str | None = None,
    filesystem=None,
) -> dict:
    """One ingest cycle: dedup ``new_input`` against ``index_dir``,
    append survivors to ``container_dir``, fold their hashes back.

    ``ingest_id`` identifies the increment for resume (REQUIRED for
    Dataset inputs; path inputs derive a content hash).  A first call
    on a fresh ``index_dir`` bootstraps an empty index.  Returns
    ``{ingested, dropped, txn, done, container}``; re-running a
    completed ingest is a no-op."""
    from .incremental_dedup import (
        _INDEX_SHARDS,
        _index_meta,
        _write_meta,
        append_hash_index,
        incremental_removal_ids,
    )

    if isinstance(new_input, rd.Dataset):
        if ingest_id is None:
            raise ValueError(
                "ingest_increment with a Dataset input needs an explicit "
                "ingest_id (stable across retries) — path inputs derive "
                "one from file contents")
        new_ds = new_input
    else:
        from .append_pipeline import _input_append_id

        if ingest_id is None:
            ingest_id = _input_append_id(new_input, filesystem)
        new_ds = rd.read_parquet(new_input, filesystem=filesystem)

    fsio.ensure_dir(container_dir)
    if not fsio.exists(index_dir.rstrip("/") + "/_meta.json"):
        # bootstrap: an empty index (shard probes treat missing shard
        # files as empty) — the first increment dedups against itself
        fsio.ensure_dir(index_dir)
        _write_meta(index_dir, _INDEX_SHARDS, {})

    ledger = _load_ledger(container_dir)
    mine = ledger.get(ingest_id) or {"phase": "new"}
    if mine["phase"] == "done":
        return {"ingested": mine.get("ingested", 0),
                "dropped": mine.get("dropped", 0),
                "txn": mine.get("txn"), "done": True,
                "container": container_dir, "noop": True}

    if mine["phase"] == "new":
        # ---- phase 1+2: filter against the (still-unfolded) index,
        # append survivors.  Everything up to the ledger write below is
        # recomputable: the index has not mutated.
        from ..stages.dedup import gather_small
        from .append_pipeline import _load_sessions, append_dataset

        removals = incremental_removal_ids(new_ds, index_dir,
                                           text_col, id_col)
        sch = new_ds.schema()
        id_type = sch.types[list(sch.names).index(id_col)]
        rm_tbl = gather_small(
            removals, pa.table({id_col: pa.array([], id_type)}))
        rm_ref = ray.put(rm_tbl[id_col].combine_chunks())
        n_removed = rm_tbl.num_rows

        def keep_only(b: pa.Table) -> pa.Table:
            return b.filter(pc.invert(
                pc.is_in(b[id_col], value_set=ray.get(rm_ref))))

        # the increment is bounded (a crawl day, not the corpus);
        # materializing it here is what lets one lineage feed both the
        # emptiness check and the append without re-reading the input
        kept = new_ds.map_batches(
            keep_only, batch_format="pyarrow").materialize()
        n_kept = kept.count()
        if n_kept == 0:
            mine = {"phase": "done", "txn": None,
                    "ingested": 0, "dropped": n_removed}
            ledger[ingest_id] = mine
            _save_ledger(container_dir, ledger)
            return {"ingested": 0, "dropped": n_removed, "txn": None,
                    "done": True, "container": container_dir}
        append_dataset(kept, container_dir, opts, append_id=ingest_id)
        txn = next(int(s["txn"]) for s in _load_sessions(container_dir)
                   if s["append_id"] == ingest_id)
        # the append is fully committed — ONLY now may the index mutate
        mine = {"phase": "appended", "txn": txn,
                "ingested": n_kept, "dropped": n_removed}
        ledger[ingest_id] = mine
        _save_ledger(container_dir, ledger)

    # ---- phase 3: fold the appended rows' hashes, reading them back
    # from the container itself (changes_since pins exactly this
    # append's rows) — a partially-folded crash re-runs here without
    # ever recomputing removals against the mutated index
    from .history_pipeline import changes_since

    txn = int(mine["txn"])
    appended = changes_since(container_dir, txn - 1,
                             columns=[id_col, text_col])
    append_hash_index(appended, index_dir, text_col, id_col)
    mine["phase"] = "done"
    ledger[ingest_id] = mine
    _save_ledger(container_dir, ledger)
    return {"ingested": int(mine["ingested"]),
            "dropped": int(mine["dropped"]),
            "txn": txn, "done": True, "container": container_dir}
