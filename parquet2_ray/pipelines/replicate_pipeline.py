"""Incremental container replication (P66, `replicate_container`, CLI
``replicate``): keep a FOLLOWER container converged to a source by
consuming the source's own change-data-feed — the "apply changes"
composition that proves the DML family closes: P56 ``row_changes``
computes the net diff, P62 dv-deletes remove the gone keys, P55
``upsert_rows`` applies updates + inserts, and a cursor file records
the source txn the follower reflects.

Semantics: after ``replicate_container(src, dst, key)`` the follower's
rows equal the source's current snapshot (order-insensitive).  The
``key`` must be UNIQUE in the source (the upsert's contract — declare
a P65 unique constraint on the source to enforce it) and non-null
(null keys have no cross-container identity; the feed refuses them).

Convergence & crash safety: the applied steps are (1) delete the
feed's 'delete' keys, (2) upsert the feed's 'update_post' + 'insert'
rows, (3) advance the cursor — each individually idempotent, so a
crash anywhere re-runs to the same end state (deleting already-gone
keys removes 0 rows; re-upserting the same rows replaces them with
themselves).  The cursor only advances after both steps commit.

Scale contract: the feed is O(net changes in the window), never
O(container) — shared partitions are skipped unread by ``row_changes``.
The upsert side streams as a Ray Dataset (no driver materialization);
the delete-key list is driver-side O(deletes in the window) — bound
the window by replicating regularly.  The feed itself is materialized
once (it feeds two consumers); its size is the window's churn.

The Delta "APPLY CHANGES INTO" / Debezium-sink shape, derived entirely
from the container's own lineage — no change journal, no external
queue.
"""

from __future__ import annotations

import json
import os

import pyarrow.compute as pc

from ..state import fsio
from ..state import manifest as mf
from .encode_pipeline import EncodeOptions

__all__ = ["replicate_container"]


def _cursor_path(dst_dir: str) -> str:
    return os.path.join(dst_dir, "_manifest", "replica.json")


def _src_latest_txn(src_dir: str) -> int:
    raw, _fams = mf.load_raw_records(src_dir)
    if not raw:
        raise FileNotFoundError(f"no committed partitions under {src_dir}")
    ftxn = mf.family_txns(raw)
    return max((ftxn[r["family"]] if r.get("family")
                else mf.record_txn(r)) for r in raw.values())


def replicate_container(src_dir: str, dst_dir: str, key: str,
                        opts: EncodeOptions | None = None,
                        fsync: bool = True) -> dict:
    """Converge ``dst_dir`` to ``src_dir``'s current snapshot.  First
    call initializes the follower from a full snapshot read; later
    calls apply only the CDC window since the recorded cursor."""
    from .append_pipeline import append_dataset
    from .encode_pipeline import decode_dataset

    opts = opts or EncodeOptions()
    cur = _src_latest_txn(src_dir)
    cpath = _cursor_path(dst_dir)
    state = (json.loads(fsio.read_bytes(cpath))
             if fsio.exists(cpath) else None)
    if state is not None and os.path.abspath(state["src"]) != \
            os.path.abspath(src_dir):
        raise ValueError(
            f"{dst_dir} follows {state['src']}, not {src_dir} — one "
            "follower tracks one source")
    if state is None:
        mdir = os.path.join(dst_dir, "_manifest")
        if fsio.exists(mdir) and any(
                n.startswith("part-") for n in fsio.listdir(mdir)):
            raise FileExistsError(
                f"{dst_dir} already holds a container without a replica "
                "cursor; replicate refuses to merge into foreign history")
        snap = decode_dataset(src_dir, as_of=cur)
        append_dataset(snap, dst_dir, opts,
                       append_id=f"replica-init-{cur}")
        mf.manifest_dir(dst_dir)
        fsio.atomic_write(cpath, json.dumps(
            {"src": os.path.abspath(src_dir), "txn": cur}).encode(),
            fsync=fsync)
        combined = mf.load_manifest(dst_dir)
        return {"initialized": True, "src_txn": cur,
                "n_rows": int(sum(r["n_rows"] for r in combined.values())),
                "out_dir": dst_dir}
    since = int(state["txn"])
    if since == cur:
        return {"noop": True, "src_txn": cur, "out_dir": dst_dir}
    if since > cur:
        raise RuntimeError(
            f"follower cursor {since} is AHEAD of the source's latest "
            f"txn {cur} — the source was rolled back past the cursor; "
            "re-initialize the follower")
    from .history_pipeline import row_changes

    feed = row_changes(src_dir, since, key=key, to_txn=cur).materialize()
    n_del = n_ups = 0
    if feed.count():
        kt = feed.select_columns([key, "_change_type"])
        null_keys = 0
        del_keys: list = []
        for b in kt.iter_batches(batch_format="pyarrow"):
            null_keys += b[key].null_count
            m = pc.equal(b["_change_type"], "delete")
            del_keys.extend(b.filter(m)[key].drop_null().to_pylist())
        if null_keys:
            raise ValueError(
                f"feed contains {null_keys} null-key rows: null keys "
                f"have no cross-container identity — replicate needs a "
                f"non-null unique {key!r} in the source")
        import pyarrow as pa

        def _ups_batch(b: "pa.Table") -> "pa.Table":
            m = pc.is_in(b["_change_type"],
                         value_set=pa.array(["update_post", "insert"]))
            return b.filter(m).drop_columns(["_change_type"])

        ups = feed.map_batches(_ups_batch, batch_format="pyarrow")
        n_ups = ups.count()
        if del_keys:
            from .delete_pipeline import delete_rows

            s = delete_rows(dst_dir, key, values=del_keys, fsync=fsync,
                            mode="dv")
            n_del = s["n_deleted"]
        if n_ups:
            from .upsert_pipeline import upsert_rows

            upsert_rows(dst_dir, ups, key, opts,
                        upsert_id=f"replica-{since}-{cur}", gc=False)
    fsio.atomic_write(cpath, json.dumps(
        {"src": os.path.abspath(src_dir), "txn": cur}).encode(),
        fsync=fsync)
    return {"since_txn": since, "src_txn": cur, "n_deleted": int(n_del),
            "n_upserted": int(n_ups), "out_dir": dst_dir}
