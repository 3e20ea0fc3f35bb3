"""Encoded-partition container format + per-partition lineage manifest.

Container (one file per output partition — the analog of a parquet file
with one row group):

    [column payloads back-to-back]
    [JSON footer]
    [u32 LE footer length]
    b"P2R1"

Footer-at-end framing mirrors the parquet layout the reference parses
(/root/reference/src/lib.rs:27-29 PAR1 magic;
/root/reference/src/read/metadata.rs:35-97 footer sniff). The JSON
footer plays the role of the thrift ``FileMetaData`` — column name,
codec, arrow type, byte range, per-column stats.

Lineage ledger: one JSON record per partition under
``<out_dir>/_manifest/part-<pid>.json`` committed atomically
(write-temp + rename), recording input fingerprint, codec choices,
raw/encoded bytes, row/token counts and wall time — the
``PageWriteSpec``/FileWriter-state analog
(/root/reference/src/write/page.rs:43-52,
/root/reference/src/write/file.rs:50-62). Resume = read the ledger,
skip committed partitions whose fingerprint matches (SURVEY.md §4
checkpoint/resume row).
"""

from __future__ import annotations

import hashlib
import json
import os

import pyarrow as pa
import pyarrow.compute as pc

from ..codecs.column import EncodedColumn
from . import fsio

MAGIC = b"P2R1"

__all__ = [
    "MAGIC",
    "canonical_fingerprint",
    "write_partition_file",
    "read_partition_footer",
    "read_partition_file",
    "write_dv_file",
    "read_dv_mask",
    "resolve_dv_base",
    "commit_manifest_record",
    "load_manifest",
    "load_raw_records",
    "write_manifest_checkpoint",
    "resolve_active",
    "record_txn",
    "family_txns",
    "next_txn",
    "manifest_dir",
    "write_global_manifest",
]


def sort_table(table: pa.Table, keys: str | list[str]) -> pa.Table:
    if isinstance(keys, str):
        keys = [keys]
    idx = pc.sort_indices(table, sort_keys=[(k, "ascending") for k in keys])
    return table.take(idx)


def canonical_fingerprint(table: pa.Table, sort_key: str | list[str] | None = None) -> str:
    """Order-canonical content hash of a table.

    If ``sort_key`` is given the table is sorted by it first, so the
    fingerprint is invariant to row order produced by the shuffle —
    encode-task retries and the decode-verify pass re-derive the same
    value (SURVEY.md §4 "deterministic retries"). Hash is sha256
    (truncated to 128 bits) over the Arrow IPC stream of the
    canonicalized, single-chunk table — sha256 runs
    hardware-accelerated at ~5× blake2b here (1.15 GB/s vs 230 MB/s
    measured), and fingerprinting was ~10% of partition-encode wall.
    (Fingerprints from earlier blake2b-era manifests don't compare
    equal — a resume against one re-encodes, which is safe: commit is
    atomic and idempotent.)

    Physical-layout canonicalization: the IPC bytes of a table are NOT
    a function of its logical content alone — a zero-copy slice (what
    the exchange hands a reduce task for a small group) or a redundant
    all-valid validity buffer serializes differently from a freshly
    built table with the same rows, which made encode-side and
    verify-side fingerprints of 1-row partitions disagree.  ``take``
    rebuilds every buffer compacted and offset-free, so the hash sees
    one layout per content; the sort path gets this for free from its
    own take, the unsorted/1-row path pays one explicit identity take
    (a memcpy — small next to the sha256 itself).
    """
    if sort_key is not None and table.num_rows > 1:
        table = sort_table(table, sort_key)
    elif table.num_rows:
        import numpy as np

        table = table.take(pa.array(np.arange(table.num_rows)))
    table = table.combine_chunks()
    # normalize schema: drop key-value/field metadata (e.g. parquet's
    # ARROW:schema), nullability flags, and list child field names
    # (parquet says "element", Arrow says "item") — carriers of
    # provenance, not content, must not perturb the fingerprint
    norm = pa.schema(
        [pa.field(f.name, _norm_type(f.type), nullable=True) for f in table.schema]
    )
    table = table.cast(norm).replace_schema_metadata(None)
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, table.schema) as w:
        w.write_table(table)
    h = hashlib.sha256()
    h.update(memoryview(sink.getvalue()))
    return h.hexdigest()[:32]


def _norm_type(t: pa.DataType) -> pa.DataType:
    if pa.types.is_list(t):
        return pa.list_(_norm_type(t.value_type))
    if pa.types.is_large_list(t):
        return pa.large_list(_norm_type(t.value_type))
    if pa.types.is_struct(t):
        return pa.struct(
            [pa.field(f.name, _norm_type(f.type), nullable=True) for f in t]
        )
    if pa.types.is_map(t):
        return pa.map_(_norm_type(t.key_type), _norm_type(t.item_type))
    return t


def _atomic_write(path: str, data: bytes, fsync: bool = True) -> None:
    """Atomic commit via the fs-generic layer (state/fsio.py): local
    paths keep write-temp + rename (+ optional fsync); object-store
    URIs commit with one atomic PUT — see fsio docstring."""
    fsio.atomic_write(path, data, fsync=fsync)


_COMPRESSIONS = {"zstd", "lz4", "snappy", "gzip", "brotli"}
# codecs that accept a level knob (reference parquet_bridge.rs:100-258:
# Gzip 0-10 / Brotli 0-11 / Zstd 1-22); snappy has none, and pyarrow's
# lz4 "frame" codec accepts 1-12
_LEVELED = {"zstd", "gzip", "brotli", "lz4"}


def parse_compression(spec: str | None):
    """Parse a compression spec into ``(pa.Codec | None, bare_name)``.

    Accepts ``"zstd"`` (codec default level) or ``"zstd:19"`` — the
    CPU-for-size knob the reference exposes as CompressionOptions
    levels (parquet_bridge.rs:100-258).  The bare name is what lands
    in column meta: decode never needs the level."""
    if not spec:
        return None, None
    name, _, lvl = spec.partition(":")
    if name not in _COMPRESSIONS:
        raise ValueError(f"unknown compression {name!r}")
    if not lvl:
        return pa.Codec(name), name
    if name not in _LEVELED:
        raise ValueError(f"{name!r} does not take a compression level")
    level = int(lvl)
    lo = pa.Codec.minimum_compression_level(name)
    hi = pa.Codec.maximum_compression_level(name)
    if not lo <= level <= hi:
        raise ValueError(
            f"{name} level {level} outside supported range [{lo}, {hi}]")
    return pa.Codec(name, compression_level=level), name


def write_partition_file(
    path: str, columns: list[EncodedColumn], num_rows: int,
    extra: dict | None = None, compression: str | None = None,
    fsync: bool = True,
) -> int:
    """Write one encoded-partition container atomically. Returns bytes.

    ``compression``: optional block compression applied per column payload
    after the lightweight encoding — the reference's C1/C3
    (/root/reference/src/compression.rs:28-130,
    /root/reference/src/write/compression.rs:12-50). Off by default: the
    north rule targets lightweight codecs; this is the opt-in flag.
    """
    codec, comp_name = parse_compression(compression)
    body = bytearray()
    col_meta = []
    for c in columns:
        payload = c.payload
        meta = dict(c.meta)
        if codec is not None:
            compressed = codec.compress(payload, asbytes=True)
            if len(compressed) < len(payload):  # keep only if it helps
                meta["compression"] = comp_name
                meta["uncompressed_size"] = len(payload)
                payload = compressed
        col_meta.append(
            {
                "name": c.name,
                "codec": c.codec,
                "arrow_type": c.arrow_type,
                "num_values": c.num_values,
                "offset": len(body),
                "size": len(payload),
                "meta": meta,
            }
        )
        body += payload
    footer = {
        "num_rows": num_rows,
        "columns": col_meta,
        "created_by": "parquet2_ray",
        **(extra or {}),
    }
    fb = json.dumps(footer, separators=(",", ":")).encode()
    blob = bytes(body) + fb + len(fb).to_bytes(4, "little") + MAGIC
    _atomic_write(path, blob, fsync=fsync)
    return len(blob)


def write_partition_file_paged(
    path: str, blocks: list[dict], num_rows: int,
    extra: dict | None = None, compression: str | None = None,
    fsync: bool = True,
) -> int:
    """Write a ROW-BLOCKED container: ``blocks`` is a list of
    ``{"columns": [EncodedColumn...], "num_rows": int, "stats": {col: [min, max]}}``.

    The footer records per-block byte ranges and per-column min/max — the
    page-index analog (/root/reference/src/indexes/intervals.rs:62-138):
    a reader selects only the blocks whose stats overlap its predicate
    and decodes a byte-subrange of the file, not the whole partition.
    """
    codec, comp_name = parse_compression(compression)
    body = bytearray()
    blocks_meta = []
    row_start = 0
    for blk in blocks:
        col_meta = []
        for c in blk["columns"]:
            payload = c.payload
            meta = dict(c.meta)
            if codec is not None:
                compressed = codec.compress(payload, asbytes=True)
                if len(compressed) < len(payload):
                    meta["compression"] = comp_name
                    meta["uncompressed_size"] = len(payload)
                    payload = compressed
            col_meta.append(
                {"name": c.name, "codec": c.codec, "arrow_type": c.arrow_type,
                 "num_values": c.num_values, "offset": len(body),
                 "size": len(payload), "meta": meta}
            )
            body += payload
        blocks_meta.append(
            {"row_start": row_start, "num_rows": blk["num_rows"],
             "stats": blk.get("stats", {}), "columns": col_meta}
        )
        row_start += blk["num_rows"]
    footer = {
        "num_rows": num_rows,
        "paged": True,
        "blocks": blocks_meta,
        "created_by": "parquet2_ray",
        **(extra or {}),
    }
    fb = json.dumps(footer, separators=(",", ":")).encode()
    blob = bytes(body) + fb + len(fb).to_bytes(4, "little") + MAGIC
    _atomic_write(path, blob, fsync=fsync)
    return len(blob)


def write_dv_file(
    path: str, base_path: str, keep_mask, extra: dict | None = None,
    fsync: bool = True,
) -> int:
    """Write a DELETION-VECTOR sidecar (merge-on-read delete): a tiny
    container-framed file whose body is the zstd-packed KEEP bitmap
    over the BASE partition's rows and whose footer names the base
    file.  Readers (``decode_partition_path``) decode the base and
    apply the mask — the Delta deletion-vector / Iceberg position-
    delete shape: deleting 0.1% of a 1 GB partition writes KBs, not a
    partition rewrite.  Returns bytes written.

    ``base_path`` is stored as a BASENAME when the base lives in the
    sidecar's own directory (the container stays relocatable), absolute
    otherwise (a clone-side DV over a source-owned base)."""
    import numpy as np

    mask = np.asarray(keep_mask, dtype=bool)
    packed = np.packbits(mask).tobytes()
    body = pa.Codec("zstd", 3).compress(packed, asbytes=True)
    base_ref = (os.path.basename(base_path)
                if os.path.dirname(os.path.abspath(base_path))
                == os.path.dirname(os.path.abspath(path))
                and "://" not in base_path else base_path)
    footer = {
        "dv_base": base_ref,
        "base_rows": int(mask.size),
        "num_rows": int(mask.sum()),
        "bitmap_bytes": len(packed),
        "created_by": "parquet2_ray",
        **(extra or {}),
    }
    fb = json.dumps(footer, separators=(",", ":")).encode()
    blob = body + fb + len(fb).to_bytes(4, "little") + MAGIC
    _atomic_write(path, blob, fsync=fsync)
    return len(blob)


def read_dv_mask(path: str):
    """Read a deletion-vector sidecar → (footer, bool keep-mask over
    the base partition's rows)."""
    import numpy as np

    blob = fsio.read_bytes(path)
    if blob[-4:] != MAGIC:
        raise ValueError(f"{path}: bad magic")
    flen = int.from_bytes(blob[-8:-4], "little")
    footer = json.loads(blob[-8 - flen: -8])
    if "dv_base" not in footer:
        raise ValueError(f"{path}: not a deletion-vector sidecar")
    packed = pa.Codec("zstd").decompress(
        blob[: -8 - flen], footer["bitmap_bytes"], asbytes=True)
    mask = np.unpackbits(
        np.frombuffer(packed, dtype=np.uint8))[: footer["base_rows"]]
    return footer, mask.astype(bool)


def resolve_dv_base(dv_path: str, footer: dict) -> str:
    """Resolve a DV footer's base reference against the sidecar's own
    directory (relative refs keep the container relocatable)."""
    base = footer["dv_base"]
    if "://" in base or os.path.isabs(base):
        return base
    return os.path.join(os.path.dirname(dv_path), base)


def _decompress_payload(comp: str, payload: bytes, size: int) -> bytes:
    """Decompress one column payload.  ``lz4`` routes through the
    Hadoop-frame sniffer (reference compression.rs:195-198): this
    engine writes the LZ4 frame format, but a foreign producer on the
    legacy codec id may have used the Hadoop Lz4Codec framing."""
    if comp == "lz4":
        from .lz4_legacy import decompress_lz4_any

        return decompress_lz4_any(payload, size)
    return pa.Codec(comp).decompress(payload, size, asbytes=True)


def _cols_from_meta(col_meta: list[dict], blob_read) -> list[EncodedColumn]:
    """Materialize EncodedColumns from footer col_meta via ``blob_read
    (offset, size) -> bytes`` (whole-buffer slice or file pread)."""
    cols = []
    for m in col_meta:
        payload = blob_read(m["offset"], m["size"])
        meta = m.get("meta", {})
        comp = meta.get("compression")
        if comp:
            payload = _decompress_payload(
                comp, payload, meta["uncompressed_size"])
            meta = {k: v for k, v in meta.items()
                    if k not in ("compression", "uncompressed_size")}
        cols.append(EncodedColumn(
            name=m["name"], codec=m["codec"], arrow_type=m["arrow_type"],
            num_values=m["num_values"], payload=payload, meta=meta))
    return cols


def block_overlaps(block_meta: dict, column: str, lo=None, hi=None) -> bool:
    """Page-index predicate: does this block's [min,max] for ``column``
    overlap [lo,hi]?  Blocks without stats for the column are kept
    (same conservative rule as partition-level pruning)."""
    st = block_meta.get("stats", {}).get(column)
    if not st or st[0] is None:
        return True
    from ..functions.stats import bound_in_profile_domain

    # temporal bounds compare in the stats' isoformat domain
    lo = bound_in_profile_domain(lo, st[0])
    hi = bound_in_profile_domain(hi, st[0])
    if lo is not None and st[1] < lo:
        return False
    if hi is not None and st[0] > hi:
        return False
    return True


def _project_meta(col_meta: list[dict], columns,
                  missing_ok: bool = False) -> list[dict]:
    """Column projection over a block's footer entries (reference S7,
    /root/reference/src/read/column/mod.rs:22-205 — column-chunk-at-a-
    time iteration).  Preserves footer order; unknown names raise so a
    typo can't silently return fewer columns — except with
    ``missing_ok`` (schema-evolved containers: the caller validated the
    projection against the UNION schema, and this partition simply
    predates the column)."""
    if columns is None:
        return col_meta
    names = {m["name"] for m in col_meta}
    missing = [c for c in columns if c not in names]
    if missing and not missing_ok:
        raise KeyError(f"container has no column(s) {missing}; "
                       f"available: {sorted(names)}")
    want = set(columns)
    return [m for m in col_meta if m["name"] in want]


def read_partition_blocks(
    path: str, column: str | None = None, lo=None, hi=None,
    columns: list[str] | None = None,
    block_range: tuple[int, int] | None = None,
    missing_ok: bool = False,
    preds: list[tuple] | None = None,
) -> tuple[dict, list[list[EncodedColumn]], int]:
    """Read a paged container, decoding ONLY the row-blocks whose page
    index overlaps [lo,hi] on ``column`` (all blocks when no predicate)
    and ONLY the chunks named in ``columns`` (all when None).
    Byte-ranges of skipped blocks and non-projected columns are never
    read from disk
    (/root/reference/src/read/page/indexed_reader.rs:25-209).
    ``block_range=(start, stop)`` restricts to that half-open slice of
    the footer's block list — the fan-out handle that lets one huge
    paged partition split across several read tasks.
    ``preds``: a CONJUNCTION of ``(column, lo, hi)`` range predicates —
    a block is decoded only when its stats overlap EVERY predicate
    (the multi-column probe a Z-ordered container is laid out for);
    the single (column, lo, hi) form is kept as legacy sugar.
    Returns (footer, [(row_start, n_rows, columns), ...], data_bytes_read)
    — row offsets are in BASE row space so a deletion-vector mask can
    slice per surviving block; ``data_bytes_read`` counts COLUMN
    PAYLOAD bytes only (the footer is fixed metadata cost, read once
    regardless of the predicate).

    A deletion-vector sidecar (``write_dv_file``) returns
    ``(footer, None, 0)`` — the caller resolves ``footer["dv_base"]``
    and re-reads the base with the mask."""
    if preds is None and column is not None:
        preds = [(column, lo, hi)]
    f, size = fsio.open_input(path)
    try:
        f.seek(size - 8)
        tail = f.read(8)
        if tail[4:] != MAGIC:
            raise ValueError(f"{path}: bad magic")
        flen = int.from_bytes(tail[:4], "little")
        f.seek(size - 8 - flen)
        footer = json.loads(f.read(flen))
        if "dv_base" in footer:
            return footer, None, 0
        bytes_read = 0

        def pread(o, s):
            f.seek(o)
            return f.read(s)

        if not footer.get("paged"):
            # single-block container: treat as one all-covering block
            if block_range is not None and block_range[0] > 0:
                return footer, [], 0
            meta = _project_meta(footer["columns"], columns, missing_ok)
            cols = _cols_from_meta(meta, pread)
            bytes_read += sum(m["size"] for m in meta)
            return footer, [(0, footer["num_rows"], cols)], bytes_read

        out = []
        for bi, bm in enumerate(footer["blocks"]):
            if block_range is not None and not (
                    block_range[0] <= bi < block_range[1]):
                continue
            if preds is not None and not all(
                    block_overlaps(bm, c, l, h) for c, l, h in preds):
                continue
            meta = _project_meta(bm["columns"], columns, missing_ok)
            out.append((bm["row_start"], bm["num_rows"],
                        _cols_from_meta(meta, pread)))
            bytes_read += sum(m["size"] for m in meta)
    finally:
        f.close()
    return footer, out, bytes_read


def read_partition_footer(path: str, resolve_dv: bool = True) -> dict:
    """Container footer.  For a deletion-vector sidecar the default
    resolves through to the BASE footer (so schema/blocks consumers —
    union-schema fallback, append validation, datasource fan-out,
    tools — see real column metadata) with the sidecar's own row count
    and the ``dv_base`` marker kept; ``resolve_dv=False`` returns the
    raw sidecar footer."""
    f, size = fsio.open_input(path)
    try:
        f.seek(size - 8)
        tail = f.read(8)
        if tail[4:] != MAGIC:
            raise ValueError(f"{path}: bad magic")
        flen = int.from_bytes(tail[:4], "little")
        f.seek(size - 8 - flen)
        footer = json.loads(f.read(flen))
    finally:
        f.close()
    if resolve_dv and "dv_base" in footer:
        base = read_partition_footer(
            resolve_dv_base(path, footer), resolve_dv=False)
        if "dv_base" in base:
            raise ValueError(
                f"{path}: deletion-vector base is itself a sidecar — "
                "DV chains must be composed at write time")
        footer = {**base, "num_rows": footer["num_rows"],
                  "dv_base": footer["dv_base"],
                  "base_rows": footer["base_rows"]}
    return footer


def read_partition_file(path: str) -> tuple[dict, list[EncodedColumn]]:
    blob = fsio.read_bytes(path)
    if blob[-4:] != MAGIC:
        raise ValueError(f"{path}: bad magic")
    flen = int.from_bytes(blob[-8:-4], "little")
    footer = json.loads(blob[-8 - flen : -8])
    if footer.get("paged"):
        raise ValueError(
            f"{path}: paged container — use read_partition_blocks")
    if "dv_base" in footer:
        raise ValueError(
            f"{path}: deletion-vector sidecar — decode via "
            "decode_partition_path (it resolves the base + mask)")
    cols = []
    for m in footer["columns"]:
        payload = blob[m["offset"] : m["offset"] + m["size"]]
        meta = m.get("meta", {})
        comp = meta.get("compression")
        if comp:
            # reference C2/C4 decompress-at-read
            # (/root/reference/src/compression.rs:134-225)
            payload = _decompress_payload(
                comp, payload, meta["uncompressed_size"])
            meta = {k: v for k, v in meta.items()
                    if k not in ("compression", "uncompressed_size")}
        cols.append(
            EncodedColumn(
                name=m["name"],
                codec=m["codec"],
                arrow_type=m["arrow_type"],
                num_values=m["num_values"],
                payload=payload,
                meta=meta,
            )
        )
    return footer, cols


def manifest_dir(out_dir: str) -> str:
    d = os.path.join(out_dir, "_manifest")
    fsio.ensure_dir(d)
    return d


def commit_manifest_record(out_dir: str, record: dict,
                           fsync: bool = True) -> None:
    d = manifest_dir(out_dir)
    path = os.path.join(d, f"part-{record['part_id']}.json")
    _atomic_write(path, json.dumps(record, separators=(",", ":")).encode(),
                  fsync=fsync)


def load_manifest_record(out_dir: str, part_id: str) -> dict | None:
    """Read ONE partition's record — O(1) per encode task, so resume
    checks stay constant-cost at 10^5+ partitions."""
    path = os.path.join(out_dir, "_manifest", f"part-{part_id}.json")
    if not fsio.exists(path):
        return None
    return json.loads(fsio.read_bytes(path))


def record_txn(r: dict) -> int:
    """A record's transaction stamp.  Maintenance ops (append, compact,
    delete, incremental recluster) stamp ``txn``/``op`` into every
    record they commit; the base encode's records carry none and read
    as txn 0 — the container's initial snapshot."""
    return int(r.get("txn") or 0)


CHECKPOINT_NAME = "checkpoint.bin"
_CKPT_MAGIC = b"P2RC"


def write_manifest_checkpoint(out_dir: str, fsync: bool = True) -> dict:
    """Collapse the per-partition manifest scan into ONE file (P58).

    ``load_raw_records`` reads one small JSON object per partition —
    at 10^6 partitions on an object store that is 10^6 GET round trips
    *per driver-side manifest load* (every decode plan, history op,
    GC, append validation).  The checkpoint stores every ``part-*``
    record RAW (replaces/family/txn intact — time travel, GC and
    rollback semantics are resolution-time concerns and unchanged)
    keyed by file name, each entry validated at load time against the
    listing's ``(size, mtime_ns)`` — stats that ride free with the
    LIST response — so the checkpoint is a pure read-amplification
    cache, never a second source of truth:

    - records committed AFTER the checkpoint are simply absent and
      read from their files as before;
    - records a rollback/sweep UNLINKED disappear from the listing
      and are dropped (the Delta-style "delete covered files" design
      would instead have to rewrite the checkpoint inside those ops'
      crash windows);
    - a REWRITTEN file (id reuse after a sweep, resumed-run
      re-commit) fails the stat match and is re-read;
    - a corrupt/missing checkpoint degrades to the full scan.

    Payload is zstd-compressed JSON behind a magic + raw-length
    header.  Single-writer per container, like every maintenance op.
    Returns ``{"files": n, "bytes": compressed, "raw_bytes": n}``.
    """
    d = manifest_dir(out_dir)
    entries = fsio.listdir_stat(d)
    # reuse the previous checkpoint's still-valid entries so a REFRESH
    # costs O(changes since last checkpoint) reads, not O(partitions) —
    # what lets maintenance ops refresh after every commit
    cached = (_load_checkpoint(d)
              if any(n == CHECKPOINT_NAME for n, _, _ in entries) else {})
    files: dict[str, list] = {}
    for name, size, mtime in entries:
        if name.startswith("part-") and name.endswith(".json"):
            ent = cached.get(name)
            if ent is not None and ent[0] == size and ent[1] == mtime:
                files[name] = ent
            else:
                rec = json.loads(fsio.read_bytes(os.path.join(d, name)))
                files[name] = [size, mtime, rec]
    payload = json.dumps({"version": 1, "files": files},
                         separators=(",", ":")).encode()
    codec = pa.Codec("zstd", compression_level=3)
    blob = (_CKPT_MAGIC + len(payload).to_bytes(8, "little")
            + codec.compress(payload, asbytes=True))
    _atomic_write(os.path.join(d, CHECKPOINT_NAME), blob, fsync=fsync)
    return {"files": len(files), "bytes": len(blob),
            "raw_bytes": len(payload)}


def refresh_checkpoint(out_dir: str, fsync: bool = True) -> None:
    """Re-write the checkpoint IF one exists (no-op otherwise) — called
    at the end of every maintenance op that commits or unlinks records,
    so a container whose operator opted into checkpointing stays at a
    near-100% cache hit ratio without manual re-checkpoints.  Cost is
    O(this op's changes) reads (the writer reuses still-valid cached
    entries) + one small write.  A crash between the op's commit and
    this refresh only leaves the checkpoint stale, which the loader's
    stat reconciliation already absorbs."""
    d = os.path.join(out_dir, "_manifest")
    if fsio.exists(os.path.join(d, CHECKPOINT_NAME)):
        write_manifest_checkpoint(out_dir, fsync=fsync)


def _load_checkpoint(mdir: str) -> dict:
    """Cached record entries ``{file_name: [size, mtime_ns, record]}``;
    {} when absent or unreadable (any failure degrades to the full
    scan — a checkpoint must never be able to fail a read)."""
    path = os.path.join(mdir, CHECKPOINT_NAME)
    try:
        blob = fsio.read_bytes(path)
        if blob[:4] != _CKPT_MAGIC:
            return {}
        rawlen = int.from_bytes(blob[4:12], "little")
        payload = pa.Codec("zstd").decompress(
            blob[12:], rawlen, asbytes=True)
        doc = json.loads(payload)
        if doc.get("version") != 1:
            return {}
        return doc["files"]
    except (FileNotFoundError, OSError, ValueError, KeyError):
        return {}


def load_raw_records(
        out_dir: str) -> tuple[dict[str, dict], set[str]]:
    """EVERY committed part record (active, replaced, family-staged)
    keyed by part_id, plus the set of committed family ids — the one
    O(partitions) manifest scan behind visibility resolution, GC,
    history and rollback.

    With a checkpoint present (``write_manifest_checkpoint``) the scan
    reads ONE checkpoint file plus only the part files the listing's
    ``(size, mtime_ns)`` stats say the checkpoint does not cover —
    O(changes since checkpoint) instead of O(partitions) GETs; the
    directory listing itself (where deletions and new commits surface)
    remains the ground truth, so results are bit-identical to the
    uncheckpointed scan."""
    d = os.path.join(out_dir, "_manifest")
    raw: dict[str, dict] = {}
    committed_families: set[str] = set()
    entries = fsio.listdir_stat(d)
    cached = (_load_checkpoint(d)
              if any(n == CHECKPOINT_NAME for n, _, _ in entries) else {})
    for name, size, mtime in entries:
        if name.startswith("family-") and name.endswith(".json"):
            committed_families.add(name[len("family-"):-len(".json")])
        elif name.startswith("part-") and name.endswith(".json"):
            ent = cached.get(name)
            if ent is not None and ent[0] == size and ent[1] == mtime:
                r = ent[2]
            else:
                r = json.loads(fsio.read_bytes(os.path.join(d, name)))
            raw[r["part_id"]] = r
    return raw, committed_families


def family_txns(raw: dict[str, dict]) -> dict[str, int]:
    """Per-family transaction stamp: the MAX over members.  A resumed
    incremental recluster can stamp late members with a higher txn than
    the crashed attempt's; the family activates (and time-travels) as
    one unit at the latest stamp — all-or-none, never a partial
    family."""
    out: dict[str, int] = {}
    for r in raw.values():
        fid = r.get("family")
        if fid:
            out[fid] = max(out.get(fid, 0), record_txn(r))
    return out


def resolve_active(
    raw: dict[str, dict],
    committed_families: set[str],
    as_of: int | None = None,
) -> dict[str, dict]:
    """Visibility resolution over raw records: which partitions a
    reader sees.  With ``as_of`` the snapshot is reconstructed at that
    transaction — records stamped later (and families whose stamp is
    later) are excluded, and only the INCLUDED records' ``replaces``
    apply, so the pre-rewrite partitions become visible again exactly
    as they were."""
    ftxn = family_txns(raw) if as_of is not None else {}
    records: dict[str, dict] = {}
    replaced: set[str] = set()
    for r in raw.values():
        fid = r.get("family")
        if fid:
            if fid not in committed_families:
                continue
            if as_of is not None and ftxn[fid] > as_of:
                continue
        elif as_of is not None and record_txn(r) > as_of:
            continue
        records[r["part_id"]] = r
        replaced.update(r.get("replaces") or ())
    for pid in replaced:
        records.pop(pid, None)
    return records


def load_manifest(out_dir: str, as_of: int | None = None) -> dict[str, dict]:
    """Active partition records.  A record's ``replaces`` list names
    partition ids whose rows it now carries (compaction): those ids are
    dropped here, so the visibility flip is the ONE atomic commit of
    the replacing record — every reader (decode, Datasource, pruning,
    verify, tools) inherits crash safety through this filter.  Replaced
    records/files linger until GC'd; they are never returned.

    A record may instead carry ``family: <fid>`` — a MULTI-partition
    atomic commit (incremental recluster: one old partition's rows
    scatter across several new ones, so no single record's ``replaces``
    could flip visibility without a lost- or duplicate-rows crash
    window).  Family members stay STAGED (invisible, replaces ignored)
    until the one atomic write of ``_manifest/family-<fid>.json``
    activates every member and their replaces together.  Staged state a
    crashed run abandons is invisible forever and reclaimed by the
    standard GC sweep; records without a family behave exactly as
    before.

    ``as_of``: reconstruct the snapshot at that transaction instead of
    the current one (time travel) — valid while the superseded
    records/files have not been GC'd (``sweep_invisible`` collapses
    history to the snapshots it is told to retain)."""
    raw, committed_families = load_raw_records(out_dir)
    return resolve_active(raw, committed_families, as_of)


def next_txn(out_dir: str, raw: dict[str, dict] | None = None) -> int:
    """Allocate the next transaction stamp: max over ALL raw records
    (replaced and staged included — their stamps are history) + 1.
    Maintenance ops are single-writer per container, so driver-side
    allocation is race-free by the same contract as id allocation."""
    if raw is None:
        raw, _ = load_raw_records(out_dir)
    return max((record_txn(r) for r in raw.values()), default=0) + 1


def commit_family(out_dir: str, family_id: str, fsync: bool = True) -> str:
    """THE atomic visibility flip of a multi-partition commit: after
    this write every staged record carrying ``family_id`` is active and
    its ``replaces`` take effect — all together, or (on crash) not at
    all."""
    path = os.path.join(manifest_dir(out_dir), f"family-{family_id}.json")
    _atomic_write(path, json.dumps({"family": family_id}).encode(),
                  fsync=fsync)
    return path


def family_committed(out_dir: str, family_id: str) -> bool:
    return fsio.exists(os.path.join(manifest_dir(out_dir),
                                    f"family-{family_id}.json"))


def write_global_manifest(out_dir: str, summary: dict) -> str:
    """Dataset-level manifest after all partitions commit — the
    ``write_metadata_sidecar`` analog (/root/reference/src/write/file.rs:63-77)."""
    path = os.path.join(out_dir, "_MANIFEST.json")
    _atomic_write(path, json.dumps(summary, indent=1).encode())
    return path
