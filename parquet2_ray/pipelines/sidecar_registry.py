"""Sidecar registry: the container knows its derived artifacts (P72).

P67/P69/P70 bind each sidecar to its source (the sidecar's meta holds
the source path + txn cursor), which lets it converge from the CDC
feed — but nothing told the CONTAINER what follows it, so keeping ten
indexes and views current meant ten hand-run refreshes.  The registry
closes that: builders self-register under ``_manifest/sidecars.json``,
and ``refresh_sidecars`` (or ``maintain_container``, which calls it)
converges everything in one verb.

Ordering inside maintenance matters: ``maintain_container`` refreshes
sidecars AFTER fold/compact but BEFORE the retention sweep — at that
point the pre-maintenance snapshots are still intact, so every sidecar
consumes its pending window as a cheap diff AND advances its cursor
past the rewrite-only transactions; only then does the sweep hollow
the old snapshots.  Refreshing after the sweep would push every
sidecar into its full-rebuild fallback.

Registration is a read-modify-write of a small JSON file — registering
is a human-cadence operation (one writer), not a data-plane one.
"""

from __future__ import annotations

import json
import os

from ..state import fsio
from ..state import manifest as mf

__all__ = [
    "register_sidecar",
    "unregister_sidecar",
    "list_sidecars",
    "refresh_sidecars",
]

_KINDS = ("text_index", "vector_index", "agg_view")


def _reg_path(container_dir: str) -> str:
    return mf.manifest_dir(container_dir).rstrip("/") + "/sidecars.json"


def _load(container_dir: str) -> list[dict]:
    p = _reg_path(container_dir)
    if not fsio.exists(p):
        return []
    return json.loads(fsio.read_bytes(p))


def _norm(path: str) -> str:
    return path if "://" in path else os.path.abspath(path)


def register_sidecar(container_dir: str, kind: str, path: str) -> dict:
    """Idempotent: (kind, path) pairs dedupe."""
    if kind not in _KINDS:
        raise ValueError(f"unknown sidecar kind {kind!r}; "
                         f"one of {_KINDS}")
    entries = _load(container_dir)
    entry = {"kind": kind, "path": _norm(path)}
    if entry not in entries:
        entries.append(entry)
        fsio.atomic_write(_reg_path(container_dir),
                          json.dumps(entries).encode(), fsync=False)
    return {"registered": len(entries)}


def unregister_sidecar(container_dir: str, path: str) -> dict:
    entries = [e for e in _load(container_dir)
               if e["path"] != _norm(path)]
    fsio.atomic_write(_reg_path(container_dir),
                      json.dumps(entries).encode(), fsync=False)
    return {"registered": len(entries)}


def list_sidecars(container_dir: str) -> list[dict]:
    return _load(container_dir)


def refresh_sidecars(container_dir: str,
                     to_txn: int | None = None) -> dict:
    """Converge every registered sidecar; returns per-path results.
    A sidecar whose files are gone reports an error entry instead of
    aborting the rest (it stays registered — deletion is explicit via
    ``unregister_sidecar``).

    The target transaction is PINNED once (``to_txn`` or the source's
    latest at entry) and passed to every refresh, so ALL sidecars land
    on the SAME source snapshot even when appends commit concurrently
    — cross-sidecar consistency, not just per-sidecar convergence."""
    pin = (int(to_txn) if to_txn is not None
           else max((mf.record_txn(r) for r in
                     mf.load_manifest(container_dir).values()),
                    default=0))
    results: dict[str, dict] = {}
    for e in _load(container_dir):
        path = e["path"]
        try:
            if e["kind"] == "text_index":
                from .textindex_pipeline import refresh_text_index

                results[path] = refresh_text_index(path, to_txn=pin)
            elif e["kind"] == "vector_index":
                from .vecindex_pipeline import refresh_vector_index

                results[path] = refresh_vector_index(path, to_txn=pin)
            else:
                from .matview_pipeline import refresh_agg_view

                results[path] = refresh_agg_view(path, to_txn=pin)
        except Exception as err:  # noqa: BLE001 — one bad sidecar must
            # not abort the container's maintenance pass; the error is
            # surfaced in the result for the operator to act on
            results[path] = {"error": f"{type(err).__name__}: {err}"}
    return results
