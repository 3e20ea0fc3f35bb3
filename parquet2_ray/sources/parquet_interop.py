"""Standard-Parquet interchange.

The reference's raison d'être is the real parquet format
(/root/reference/src/write/file.rs:20-41); our engine's native output
is the P2R1 container (lightweight codecs + lineage manifest).  This
module closes the interchange gap (VERDICT.md "What's missing" #6):

- READ side: ``encode_dataset`` already consumes standard parquet via
  ``ray.data.read_parquet`` — any parquet file is an input.
- WRITE side: ``container_to_parquet`` decodes a P2R1 container and
  writes real ``.parquet`` files — one file per container partition
  (resumable, same partitioning discipline as the encode side),
  distributed as a ``map_batches`` over the manifest records.  Our
  per-partition codec selections are mapped onto the nearest standard
  parquet encodings so the interchange artifact keeps (most of) the
  size win:

    dict_rle / dict_binary / dict_flba  → RLE_DICTIONARY (use_dictionary)
    delta_binary_packed / for_bitpack / rle → DELTA_BINARY_PACKED
    delta_length_byte_array             → DELTA_LENGTH_BYTE_ARRAY
    delta_byte_array                    → DELTA_BYTE_ARRAY
    fsst / plain*                       → PLAIN  (FSST has no standard
                                          parquet encoding)

  pyarrow constraint: explicit ``column_encoding`` requires
  ``use_dictionary=False`` — when any column chose a dict codec we
  prefer dictionary (parquet's main lightweight codec) and let the
  rest default to PLAIN; otherwise we emit explicit per-column
  encodings.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd

from ..state import fsio
from ..state import manifest as mf

__all__ = ["container_to_parquet", "parquet_write_args_for",
           "load_bloom_sidecar", "prune_files_by_bloom"]

_TO_PARQUET_ENCODING = {
    "delta_binary_packed": "DELTA_BINARY_PACKED",
    "for_bitpack": "DELTA_BINARY_PACKED",
    "pfor": "DELTA_BINARY_PACKED",
    "rle": "DELTA_BINARY_PACKED",
    "delta_length_byte_array": "DELTA_LENGTH_BYTE_ARRAY",
    "delta_byte_array": "DELTA_BYTE_ARRAY",
    "plain": "PLAIN",
    "plain_byte_array": "PLAIN",
    "plain_flba": "PLAIN",
    "fsst": "PLAIN",
    "byte_stream_split": "BYTE_STREAM_SPLIT",
    # parquet has no ALP encoding; BYTE_STREAM_SPLIT is its float
    # transform with the closest intent (codecs/alp.py docstring)
    "alp": "BYTE_STREAM_SPLIT",
    "alp_rd": "BYTE_STREAM_SPLIT",
}

_DICT_CODECS = {"dict_rle", "dict_binary", "dict_flba"}


def parquet_write_args_for(codecs: dict[str, str]) -> dict:
    """pyarrow ``write_table`` kwargs matching our codec selections.
    Every interchange file carries a ColumnIndex/OffsetIndex so
    downstream readers (including ``page_index.read_parquet_indexed``)
    can prune at page granularity."""
    out = {"write_page_index": True}
    dict_cols = sorted(c for c, k in codecs.items() if k in _DICT_CODECS)
    if dict_cols:
        out["use_dictionary"] = dict_cols
        return out
    enc = {c: _TO_PARQUET_ENCODING[k] for c, k in codecs.items()
           if k in _TO_PARQUET_ENCODING}
    if enc:
        out.update({"use_dictionary": False, "column_encoding": enc})
    return out


def container_to_parquet(
    container_dir: str,
    out_dir: str,
    compression: str = "NONE",
    embed_blooms: bool = False,
) -> dict:
    """Decode a P2R1 container into standard ``.parquet`` files.

    One output file per container partition (``part-<id>.parquet``),
    written by parallel tasks — already-written files are skipped
    (atomic rename), so a failed export resumes where it stopped.

    ``embed_blooms=True`` writes the SBBF sketches as SPEC-EMBEDDED
    parquet bloom filters inside each file (per row group, patched
    into the footer via ``parquet_bloom.embed_blooms``) instead of
    the ``_bloom.*.json`` sidecars — any engine implementing the
    parquet bloom spec (reference bloom_filter/read.rs:14) consumes
    them with no sidecar convention needed.

    Returns a summary {n_partitions, rows, parquet_bytes}.
    """
    import json

    records = sorted(mf.load_manifest(container_dir).values(),
                     key=lambda r: r["part_id"])
    if not records:
        raise ValueError(f"no committed partitions under {container_dir}")
    fsio.ensure_dir(out_dir)

    def export(batch: pa.Table) -> pa.Table:
        from ..stages.encode import decode_partition_path

        out_rows = {"part_id": [], "rows": [], "parquet_bytes": [], "skipped": []}
        for pid, path, n_rows, codecs_json, bkey in zip(
                batch["part_id"].to_pylist(), batch["path"].to_pylist(),
                batch["n_rows"].to_pylist(), batch["codecs"].to_pylist(),
                batch["bloom_key"].to_pylist()):
            dest = os.path.join(out_dir, f"part-{pid}.parquet")
            if fsio.exists(dest):
                if not embed_blooms:
                    _write_bloom_sidecar(dest, blooms.get(pid))  # resume fill
                out_rows["part_id"].append(pid)
                # ledger row count, so a resumed export still reports
                # the dataset total instead of undercounting skips
                out_rows["rows"].append(n_rows)
                out_rows["parquet_bytes"].append(fsio.getsize(dest))
                out_rows["skipped"].append(True)
                continue
            tbl = decode_partition_path(path)
            # encodings follow THIS partition's auto-selected codecs
            # (selections can differ per partition)
            args = parquet_write_args_for(json.loads(codecs_json))
            local_fs, dest_local = fsio.resolve(dest)
            if local_fs is None and not embed_blooms:
                # local fast path: stream straight to a tmp + rename —
                # no whole-file buffering, one write.  The tmp name is
                # pid-unique (duplicate task execution must not
                # interleave into one file) and '_'-prefixed (crash
                # debris stays invisible to parquet dataset discovery)
                d, base = os.path.split(dest_local)
                tmp = os.path.join(d, f"_{base}.tmp.{os.getpid()}")
                pq.write_table(tbl, tmp, compression=compression, **args)
                os.replace(tmp, dest_local)
                nbytes = os.path.getsize(dest_local)
            else:
                # pyarrow writes + the bloom footer patch need a LOCAL
                # seekable file; the finished bytes then commit through
                # fsio (object store: one atomic PUT) so out_dir may be
                # any URI
                import tempfile

                with tempfile.TemporaryDirectory() as td:
                    tmp = os.path.join(td, "part.parquet")
                    pq.write_table(tbl, tmp, compression=compression, **args)
                    if embed_blooms:
                        from .parquet_bloom import embed_blooms as _embed

                        # bloom ONLY the manifest's key column; a
                        # container without one embeds nothing (parity
                        # with the sidecar path, which writes nothing)
                        cols = [bkey] if bkey in tbl.column_names else []
                        _embed(tmp, tmp + ".b", columns=cols)
                        tmp = tmp + ".b"
                    with open(tmp, "rb") as f:
                        blob = f.read()
                fsio.atomic_write(dest, blob, fsync=False)
                nbytes = len(blob)
            if not embed_blooms:
                _write_bloom_sidecar(dest, blooms.get(pid))
            out_rows["part_id"].append(pid)
            out_rows["rows"].append(tbl.num_rows)
            out_rows["parquet_bytes"].append(nbytes)
            out_rows["skipped"].append(False)
        return pa.table(out_rows)

    items = [{"part_id": r["part_id"], "path": r["path"],
              "n_rows": r["n_rows"],
              "bloom_key": r.get("bloom_key") or "",
              "codecs": (r["codecs"] if isinstance(r.get("codecs"), str)
                         else json.dumps(r.get("codecs") or {}))}
             for r in records]
    # SBBF bloom sidecars travel with the interchange files (pyarrow /
    # duckdb in this environment can neither write nor expose parquet's
    # embedded bloom pages, so the sketch ships as `<file>.bloom.json`
    # in the spec's exact SBBF byte layout + xxh64-over-PLAIN hashes —
    # any engine implementing the parquet bloom spec can consume it)
    blooms = {r["part_id"]: {"column": r.get("bloom_key"),
                             "type": r.get("bloom_type"),
                             "sbbf_b64": r.get("bloom")}
              for r in records if r.get("bloom")}
    stats = rd.from_items(items).map_batches(
        export, batch_size=1, batch_format="pyarrow").to_pandas()
    return {
        "n_partitions": len(stats),
        "rows": int(stats["rows"].sum()),
        "parquet_bytes": int(stats["parquet_bytes"].sum()),
        "skipped": int(stats["skipped"].sum()),
        "out_dir": out_dir,
    }


def _bloom_sidecar_path(parquet_path: str) -> str:
    """Sidecar name starts with ``_`` so parquet dataset discovery
    (pyarrow ignore_prefixes, spark _SUCCESS convention) skips it."""
    d, base = os.path.split(parquet_path)
    return os.path.join(d, f"_bloom.{base}.json")


def _write_bloom_sidecar(parquet_path: str, bloom: dict | None) -> None:
    """Persist a partition's SBBF sketch next to its interchange file
    (skipped when absent or already written — resume-safe)."""
    import json

    if not bloom or not bloom.get("sbbf_b64"):
        return
    path = _bloom_sidecar_path(parquet_path)
    if fsio.exists(path):
        return
    fsio.atomic_write(
        path, json.dumps(bloom, separators=(",", ":")).encode(), fsync=False)


def load_bloom_sidecar(parquet_path: str) -> dict | None:
    """Load the SBBF sidecar of one interchange file (None if absent).
    Returns {"column", "type", "bitset": bytes}."""
    import base64
    import json

    path = _bloom_sidecar_path(parquet_path)
    if not fsio.exists(path):
        return None
    d = json.loads(fsio.read_bytes(path))
    return {"column": d["column"], "type": d["type"],
            "bitset": base64.b64decode(d["sbbf_b64"])}


def prune_files_by_bloom(out_dir: str, values) -> list[str]:
    """Scan-pruning consumer for the interchange output: return only
    the parquet files whose bloom sidecar says one of ``values`` MIGHT
    be present (plus any file without a sidecar — no sketch, no claim).

    This is the read side of the bloom interop (reference
    bloom_filter/read.rs:14): the probe runs the spec's xxh64-over-
    PLAIN hash + salted SBBF block check, vectorized over values."""
    import fnmatch

    import numpy as np

    from ..functions import bloom as _bloom

    from .parquet_bloom import read_embedded_blooms

    keep: list[str] = []
    names = [n for n in fsio.listdir(out_dir)
             if fnmatch.fnmatch(n, "part-*.parquet")]
    for f in (os.path.join(out_dir, n) for n in names):
        sc = load_bloom_sidecar(f)
        if sc is None:
            # foreign files may carry SPEC-EMBEDDED blooms instead of
            # our sidecars — consume those through the thrift reader
            # (sources/parquet_bloom.py); no sketch of either kind ⇒
            # no claim ⇒ keep
            rfs, rp = fsio.resolve(f)
            embedded = read_embedded_blooms(rp, filesystem=rfs)
            if not embedded:
                keep.append(f)
                continue
            # hash with each bloomed column's DECLARED type (the spec
            # hashes the PLAIN encoding, so an int32 key hashed at the
            # inferred int64 width would false-negative and wrongly
            # prune a file that contains the value)
            try:
                schema = (pq.read_schema(rp, filesystem=rfs) if rfs
                          else pq.read_schema(rp))
            except Exception:
                schema = None
            hit = False
            for b in embedded:
                ts = None
                if schema is not None and b["column"] in schema.names:
                    from ..codecs.column import type_to_str

                    try:
                        ts = type_to_str(schema.field(b["column"]).type)
                    except TypeError:
                        ts = None
                h = _bloom.hash_values(list(values), ts)
                if bool(np.any(_bloom.might_contain(b["bitset"], h))):
                    hit = True
                    break
            if hit:
                keep.append(f)
            continue
        h = _bloom.hash_values(list(values), sc["type"])
        if bool(np.any(_bloom.might_contain(sc["bitset"], h))):
            keep.append(f)
    return keep
