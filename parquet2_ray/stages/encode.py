"""Encode / decode stage callables for Ray Data pipelines.

``encode_partition_table`` is the per-group body used by
``groupby("_part").map_groups(...)``: codec auto-selection + encode +
stats + container write + atomic lineage commit, all inside ONE task so
an output partition is the unit of retry and resume (the analog of the
reference's write_row_group single-task invariant —
/root/reference/src/write/row_group.rs:78-139, and of
"single codec per chunk" — /root/reference/src/write/column_chunk.rs:109-122:
the codec is chosen once per (partition, column) before encoding).
"""

from __future__ import annotations

import os
import time

import pyarrow as pa
import pyarrow.compute as pc

from ..codecs import column as col_mod
from ..functions.selector import select_and_encode, select_codec
from ..functions.stats import column_profile
from ..state import manifest as mf

__all__ = ["encode_partition_table", "decode_partition_path", "PART_COL"]

PART_COL = "_part"


def encode_partition_table(
    group: pa.Table,
    out_dir: str,
    sort_key: str | list[str] | None = None,
    weight_col: str | None = None,
    forced_codecs: dict[str, str] | None = None,
    resume: bool = True,
    compression: str | None = None,
    fsync: bool = True,
    rows_per_block: int | None = None,
    extra_record: dict | None = None,
    part_id: str | None = None,
) -> pa.Table:
    """Encode one partition; returns a one-row manifest-record table.

    ``extra_record``: extra fields merged into the manifest record in
    the SAME atomic commit (compaction's ``replaces`` visibility flip
    rides here — a second commit would open a duplicate-rows crash
    window between the new record landing and the flip).

    Deterministic: the group is canonicalized by ``sort_key`` before
    fingerprinting and encoding, so shuffle nondeterminism and task
    retries cannot change the committed bytes.
    """
    t0 = time.time()
    tm: dict[str, float] = {}
    part_id = part_id or "p0"
    if PART_COL in group.column_names:
        # explicit part_id wins — an EMPTY group (a delete tombstone)
        # has no row 0 to read the id from
        if group.num_rows and part_id == "p0":
            part_id = f"p{group[PART_COL][0].as_py():06d}"
        group = group.drop_columns([PART_COL])
    if sort_key is not None and group.num_rows > 1:
        group = mf.sort_table(group, sort_key)
    group = group.combine_chunks()
    tm["sort_s"] = round(time.time() - t0, 4)
    fp = mf.canonical_fingerprint(group)
    tm["fp_s"] = round(time.time() - t0 - tm["sort_s"], 4)

    path = os.path.join(out_dir, f"part-{part_id}.bin")
    # resume skips only when BOTH the data fingerprint AND the
    # encoding-affecting options match — re-running with a different
    # compression / forced codec / paging must re-encode, not silently
    # keep the old bytes
    enc_opts = {"compression": compression,
                "forced_codecs": forced_codecs or {},
                "rows_per_block": rows_per_block}
    prior = mf.load_manifest_record(out_dir, part_id) if resume else None
    if (prior is not None and prior.get("fingerprint") == fp
            and prior.get("encoding_opts") == enc_opts
            and mf.fsio.exists(path)):
        rec = dict(prior)
        rec["skipped"] = True
        rec["wall_s"] = time.time() - t0
        return _record_table(rec)

    # codec chosen ONCE per (partition, column) — also for every row-block
    # of a paged partition (single-codec-per-chunk, column_chunk.rs:109-122)
    t1 = time.time()
    paged = bool(rows_per_block) and group.num_rows > rows_per_block
    codecs: dict[str, str] = {}
    pre_enc: dict[str, col_mod.EncodedColumn] = {}
    profiles = []
    for name in group.column_names:
        arr = group[name].combine_chunks()
        forced = (forced_codecs or {}).get(name)
        if forced:
            codecs[name] = forced
        elif paged:
            codecs[name] = select_codec(arr, compression=compression)
        else:
            # small columns are priced WHOLE — reuse the winner's
            # priced encode instead of re-running train+encode
            codecs[name], enc = select_and_encode(
                name, arr, compression=compression)
            if enc is not None:
                pre_enc[name] = enc
        profiles.append(column_profile(name, arr))
    tm["select_s"] = round(time.time() - t1, 4)

    t1 = time.time()
    encoded: list[col_mod.EncodedColumn] = []
    blocks: list[dict] = []
    if paged:
        # row-blocked encode + per-block page index (sub-partition
        # pruning — SURVEY.md T6; reference intervals.rs:62-138)
        for start in range(0, group.num_rows, rows_per_block):
            blk = group.slice(start, rows_per_block)
            cols = []
            stats = {}
            for name in group.column_names:
                arr = blk[name].combine_chunks()
                cols.append(col_mod.encode_array(name, arr, codecs[name],
                                                 compression=compression))
                p = column_profile(name, arr)
                if p["min"] is not None:
                    stats[name] = [p["min"], p["max"]]
            blocks.append({"columns": cols, "num_rows": blk.num_rows,
                           "stats": stats})
    else:
        for name in group.column_names:
            encoded.append(pre_enc.get(name) or col_mod.encode_array(
                name, group[name].combine_chunks(), codecs[name],
                compression=compression))
    tm["encode_s"] = round(time.time() - t1, 4)
    n_weight = 0
    if weight_col and weight_col in group.column_names:
        n_weight = int(pc.sum(group[weight_col]).as_py() or 0)
    # per-partition membership sketch of the key column (SURVEY.md A6);
    # probed by decode-side pruning (the T1 PageFilter analog)
    bloom_b64 = bloom_type = None
    bloom_col = sort_key[0] if isinstance(sort_key, list) else sort_key
    if bloom_col and bloom_col in group.column_names and group.num_rows:
        import base64

        from ..functions import bloom

        key_arr = group[bloom_col].combine_chunks()
        h = bloom.hash_arrow(key_arr)
        bits = bloom.build(h, bloom.num_blocks_for(group.num_rows))
        bloom_b64 = base64.b64encode(bits).decode()
        bloom_type = col_mod.type_to_str(key_arr.type)
    t1 = time.time()
    if paged:
        total_bytes = mf.write_partition_file_paged(
            path, blocks, group.num_rows,
            extra={"part_id": part_id, "fingerprint": fp},
            compression=compression, fsync=fsync,
        )
    else:
        total_bytes = mf.write_partition_file(
            path,
            encoded,
            group.num_rows,
            extra={"part_id": part_id, "fingerprint": fp},
            compression=compression,
            fsync=fsync,
        )
    rec = {
        "part_id": part_id,
        "path": path,
        "fingerprint": fp,
        "n_rows": group.num_rows,
        "n_weight": n_weight,
        "raw_bytes": group.nbytes,
        "encoded_bytes": total_bytes,
        "codecs": codecs,
        "profiles": profiles,
        # ordering metadata (reference O1-O3: SortOrder / BoundaryOrder /
        # dict is_sorted — /root/reference/src/metadata/sort.rs:18-94,
        # /root/reference/src/parquet_bridge.rs:370-380): rows inside a
        # partition are canonically sorted by sort_key; partition-level
        # boundary order over the weight ranges is ascending by plan
        "sort_key": sort_key if isinstance(sort_key, list) else (
            [sort_key] if sort_key else []),
        "boundary_order": "ascending" if sort_key else "unordered",
        # dict pages are sorted by construction (codecs/dictionary.py:
        # np.unique / pc.dictionary_encode with sorted remap) — record
        # the flag per dict column (reference O3 is_sorted)
        "dict_is_sorted": {c: True for c, k in codecs.items()
                           if k.startswith("dict")},
        # recorded so maintenance ops (compaction) can recompute mass
        # with the same column a later re-encode would use
        "weight_col": weight_col,
        "bloom_key": bloom_col if bloom_b64 else None,
        "bloom": bloom_b64,
        "bloom_type": bloom_type if bloom_b64 else None,
        "encoding_opts": enc_opts,
        "timings": {**tm, "write_s": round(time.time() - t1, 4)},
        "wall_s": time.time() - t0,
        "skipped": False,
    }
    if extra_record:
        rec.update(extra_record)
    mf.commit_manifest_record(out_dir, rec, fsync=fsync)
    return _record_table(rec)


def _record_table(rec: dict) -> pa.Table:
    import json

    return pa.table(
        {
            "part_id": [rec["part_id"]],
            "path": [rec["path"]],
            "fingerprint": [rec["fingerprint"]],
            "n_rows": [rec["n_rows"]],
            "n_weight": [rec["n_weight"]],
            "raw_bytes": [rec["raw_bytes"]],
            "encoded_bytes": [rec["encoded_bytes"]],
            "codecs": [json.dumps(rec["codecs"])],
            "wall_s": [rec["wall_s"]],
            "skipped": [rec["skipped"]],
        }
    )


def decode_partition_path(
    path: str, key_col: str | None = None, lo=None, hi=None,
    columns: list[str] | None = None,
    block_range: tuple[int, int] | None = None,
    missing_ok: bool = False,
    preds: list[tuple] | None = None,
) -> pa.Table:
    """Read + decode one container file back to a pyarrow Table.

    With ``key_col``/[lo,hi] (or a ``preds`` conjunction of such
    triples), a paged container decodes ONLY the row-blocks whose page
    index overlaps the range(s) (sub-partition predicate pushdown —
    reference indexed_reader.rs:25-209); a single-block container
    decodes fully (the predicate is re-applied upstream by the caller
    in either case).

    With ``columns``, only those column chunks are read from disk and
    decoded (column projection — reference ColumnIterator,
    src/read/column/mod.rs:22-205).

    A DELETION-VECTOR record (merge-on-read delete, ``mf.write_dv_file``)
    decodes its base partition with the same pruning/projection args and
    applies the keep-mask per surviving block — every path-only consumer
    (datasource, verify, compact, CDC, joins, aggregates) inherits the
    masked view with zero call-site changes."""
    footer, block_cols, _ = mf.read_partition_blocks(
        path, key_col, lo, hi, columns=columns, block_range=block_range,
        missing_ok=missing_ok, preds=preds)
    mask = None
    if block_cols is None:               # deletion-vector sidecar
        _, mask = mf.read_dv_mask(path)
        base = mf.resolve_dv_base(path, footer)
        footer, block_cols, _ = mf.read_partition_blocks(
            base, key_col, lo, hi, columns=columns,
            block_range=block_range, missing_ok=missing_ok, preds=preds)
        if block_cols is None:
            raise ValueError(
                f"{path}: deletion-vector base {base} is itself a "
                "sidecar — DV chains must be composed at write time")
    tables = []
    for row_start, n_rows, cols in block_cols:
        arrays = [col_mod.decode_array(c) for c in cols]
        t = pa.table({c.name: a for c, a in zip(cols, arrays)})
        if mask is not None:
            sl = mask[row_start:row_start + n_rows]
            if not sl.all():
                t = t.filter(pa.array(sl))
        tables.append(t)
    if not tables:  # every block pruned — empty table, schema from footer meta
        proto = (footer["blocks"][0]["columns"] if footer.get("paged")
                 else footer["columns"])
        if columns is not None:
            want = set(columns)
            proto = [m for m in proto if m["name"] in want]
        return pa.table({m["name"]: pa.nulls(0, col_mod.str_to_type(m["arrow_type"]))
                         for m in proto})
    return pa.concat_tables(tables) if len(tables) > 1 else tables[0]
