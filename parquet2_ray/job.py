"""``ray job submit`` entry point for the encode pipeline.

The north rule runs the 10^12-sequence job on a fixed-size cluster via
``ray job submit``; this module is that submission target:

    ray job submit --working-dir . -- \
        python -m parquet2_ray.job encode \
            --input  s3://corpus/tokens/*.parquet \
            --output /mnt/out/tokens_enc \
            --group-col source --weight-col n_tok --sort-key doc_id

Subcommands:

- ``encode``  — full pipeline (plan → shuffle → per-partition codec
  auto-select → encode → container write + lineage manifest).  Re-runs
  resume from the last committed partition (manifest fingerprints).
- ``decode``  — stream a container back out as standard parquet
  (sources/parquet_interop).
- ``verify``  — bit-identity check of a container against its source.
- ``dedup``   — exact + near-dup corpus dedup to parquet.
- ``prepare`` — full training-data preparation (decontaminate [raw
  text, so eval-set overlaps are matched pre-scrub] → scrub → dedup →
  gates [repetition + optional LM logprob] → tokenize → pack →
  encode); see --benchmark / --lm-ref / --lm-min-logprob.
- ``mix``     — per-source token-budget mixture resampling.

Ray session ownership: inside a Ray Job the cluster is already up, so
``ray.init`` is guarded — this is one of the three places allowed to
init (bench.py, CLI entry points, test fixture); library code never
does.
"""

from __future__ import annotations

# sandbox-VM THP/malloc env pins: `python -m parquet2_ray.job` runs the
# package __init__ (which sets them) before this module body, so no
# duplicate block is needed here
import argparse
import json
import sys


def _ensure_ray(num_cpus: int | None) -> None:
    import ray

    if not ray.is_initialized():
        kwargs = {"include_dashboard": False}
        if num_cpus is not None:
            kwargs["num_cpus"] = num_cpus
            kwargs["address"] = "local"
        ray.init(**kwargs)


def cmd_encode(args) -> dict:
    from .pipelines.encode_pipeline import EncodeOptions, encode_dataset

    opts = EncodeOptions(
        group_col=args.group_col,
        weight_col=args.weight_col,
        sort_key=args.sort_key,
        target_weight=args.target_weight,
        compression=args.compression,
    )
    inp = args.input
    fmt = getattr(args, "input_format", "parquet")
    if fmt != "parquet":
        # raw-crawl formats (jsonl/csv/arrow) route through a Dataset
        from .sources.readers import read_corpus

        inp = read_corpus(args.input, fmt=fmt)
    if getattr(args, "append", False):
        from .pipelines.append_pipeline import append_dataset

        return append_dataset(
            inp, args.output, opts,
            append_id=getattr(args, "append_id", None)
            or (_dataset_append_id(args.input, fmt)
                if fmt != "parquet" else None),
            evolve_schema=getattr(args, "evolve_schema", False))
    return encode_dataset(inp, args.output, opts)


_CORPUS_SUFFIXES = {
    "jsonl": (".jsonl", ".json"), "json": (".jsonl", ".json"),
    "csv": (".csv",),
    "arrow": (".arrow", ".ipc", ".feather"),
    "ipc": (".arrow", ".ipc", ".feather"),
    "feather": (".arrow", ".ipc", ".feather"),
}


def _dataset_append_id(path: str, fmt: str) -> str:
    """Identity of a Dataset-routed (non-parquet) increment: sha256 over
    the resolved (file, size, mtime) stats.  A path-only id let a re-run
    after the file's CONTENT changed at the same path resume the stale
    reservation and silently skip the new rows (ADVICE r4 medium);
    hashing stats mirrors ``_input_append_id`` for parquet inputs, plus
    mtime since raw-crawl drops are commonly rewritten in place."""
    import hashlib

    from .sources.readers import resolve_input_files

    fs, files = resolve_input_files(
        path, None, suffixes=_CORPUS_SUFFIXES.get(fmt, ()))
    h = hashlib.sha256(f"cli-{fmt}".encode())
    for f, info in zip(files, fs.get_file_info(files)):
        mt = getattr(info, "mtime_ns", None) or getattr(info, "mtime", None)
        for part in (f, str(info.size or 0), str(mt)):
            h.update(part.encode())
            h.update(b"\0")
    return h.hexdigest()[:32]


def cmd_decode(args) -> dict:
    from .sources.parquet_interop import container_to_parquet

    return container_to_parquet(args.input, args.output,
                                embed_blooms=args.embed_blooms)


def cmd_scan(args) -> dict:
    """Predicate-pruned scan of FOREIGN parquet (or any corpus format):
    parquet inputs route through the page-index consumer — only
    surviving pages' byte ranges are read on files carrying a
    ColumnIndex/OffsetIndex, with an exact fallback otherwise."""

    def _coerce(v):
        if v is None or v == "":
            return None
        try:
            return int(v)
        except ValueError:
            try:
                return float(v)
            except ValueError:
                return v

    from .sources.readers import read_corpus

    predicates = []
    for spec in args.where or []:
        parts = spec.split(":", 2)
        if len(parts) != 3:
            raise SystemExit(f"--where {spec!r}: expected col:lo:hi "
                             "(empty side = unbounded)")
        predicates.append((parts[0], _coerce(parts[1]),
                           _coerce(parts[2])))
    ds = read_corpus(args.input, fmt=args.input_format,
                     columns=args.columns.split(",") if args.columns
                     else None,
                     predicates=predicates or None)
    if args.output:
        ds.write_parquet(args.output)
        return {"rows": None, "output": args.output}
    return {"rows": ds.count()}


def cmd_bpe(args) -> dict:
    """BPE subword tokenizer: train merges from the corpus (writes a
    JSON merge list) and/or apply an existing merge list as the
    actor-pool encode stage (writes (id, bpe_ids, n_bpe) parquet)."""
    import json as _json

    import ray.data as rd

    from .state import fsio

    ds = rd.read_parquet(args.input)
    merges = None
    if args.merges_in:
        merges = [tuple(p) for p in
                  _json.loads(fsio.read_bytes(args.merges_in))]
    else:
        from .stages.bpe import train_bpe

        merges = train_bpe(ds, n_merges=args.n_merges,
                           text_col=args.text_col,
                           max_words=args.max_words)
        if args.merges_out:
            fsio.atomic_write(args.merges_out,
                              _json.dumps(merges).encode(),
                              fsync=False)
    out = {"n_merges": len(merges)}
    if args.output:
        from .stages.bpe import BpeApply

        enc = ds.map_batches(
            BpeApply, batch_format="pandas",
            concurrency=args.concurrency,
            fn_constructor_args=(merges, args.text_col, args.id_col))
        enc.write_parquet(args.output)
        out["output"] = args.output
    return out


def cmd_view(args) -> dict:
    """P70 materialized aggregate views: create / refresh / status."""
    from .pipelines.matview_pipeline import (
        create_agg_view,
        refresh_agg_view,
        view_status,
    )

    if args.action == "create":
        if not args.source or not args.key:
            raise SystemExit("view create needs --source and --key")
        aggs: dict[str, list[str]] = {}
        for spec in args.agg or []:
            col, fn = spec.split(":", 1)
            aggs.setdefault(col, []).append(fn)
        if not aggs:
            raise SystemExit("view create needs at least one --agg col:fn")
        key = (args.key.split(",") if "," in args.key else args.key)
        return create_agg_view(args.source, args.view, key, aggs,
                               target_rows=args.target_rows)
    if args.action == "refresh":
        return refresh_agg_view(args.view)
    return view_status(args.view)


def cmd_index_vec(args) -> dict:
    """Build (or fold into) the P69 IVF-Flat vector index sidecar."""
    from .pipelines.vecindex_pipeline import (
        append_vector_index,
        build_vector_index,
    )

    if args.refresh:
        from .pipelines.vecindex_pipeline import refresh_vector_index

        return refresh_vector_index(args.index)
    if args.append:
        from .pipelines.encode_pipeline import decode_dataset

        ds = decode_dataset(args.container,
                            columns=[args.id_col, args.emb_col])
        return append_vector_index(ds, args.index)
    return build_vector_index(args.container, args.index,
                              emb_col=args.emb_col, id_col=args.id_col,
                              n_centroids=args.n_centroids,
                              subshards=args.subshards)


def cmd_ann(args) -> dict:
    """ANN search the persisted index with vectors from a parquet file."""
    import numpy as np
    import pyarrow.parquet as pq

    from .pipelines.vecindex_pipeline import ann_search_index

    qt = pq.read_table(args.queries)
    q = np.stack([np.asarray(v, np.float64)
                  for v in qt[args.emb_col].to_pylist()])
    qids = (qt[args.id_col].to_pylist() if args.id_col in qt.column_names
            else list(range(len(q))))
    out = ann_search_index(args.index, q, qids, k=args.k,
                           nprobe=args.nprobe)
    return {"rows": out.num_rows, "first": out.slice(0, args.limit).to_pylist()}


def cmd_analyze(args) -> dict:
    """Compute/refresh P68 column statistics; print without sketches."""
    from .pipelines.analyze_pipeline import analyze_container

    cols = args.columns.split(",") if args.columns else None
    doc = analyze_container(args.container, columns=cols,
                            incremental=args.incremental)
    return {k: v for k, v in doc.items() if k != "sketches"}


def cmd_explain(args) -> dict:
    """EXPLAIN a range read against persisted stats (no data read)."""
    from .pipelines.analyze_pipeline import explain_read

    def _coerce(v):
        if v is None:
            return None
        try:
            return int(v)
        except ValueError:
            try:
                return float(v)
            except ValueError:
                return v

    return explain_read(args.container, args.column,
                        _coerce(args.lo), _coerce(args.hi))


def cmd_index_text(args) -> dict:
    """Build / fold / refresh the P67 inverted text index of a container."""
    from .pipelines.textindex_pipeline import (
        append_text_index,
        index_container_text,
        refresh_text_index,
    )

    if args.stoplist is not None:
        from .pipelines.textindex_pipeline import apply_stoplist

        return apply_stoplist(args.index, max_df=args.stoplist)
    if args.refresh:
        return refresh_text_index(args.index)
    if args.append:
        from .pipelines.encode_pipeline import decode_dataset

        ds = decode_dataset(args.container,
                            columns=[args.id_col, args.text_col])
        # the CLI fold decodes the FULL container, so already-indexed
        # ids are expected — identical re-ingest is idempotent
        return append_text_index(ds, args.index,
                                 on_existing=args.on_existing)
    return index_container_text(args.container, args.index,
                                text_col=args.text_col,
                                id_col=args.id_col,
                                nshards=args.nshards)


def cmd_search(args) -> dict:
    """Full-text search: probe the index, fetch matches via lookup_rows.
    --ranked switches to BM25 top-k (P73)."""
    from .pipelines.textindex_pipeline import (
        search_container,
        search_container_ranked,
    )

    cols = args.columns.split(",") if args.columns else None
    if args.explain:
        from .pipelines.textindex_pipeline import explain_terms

        return explain_terms(args.index, args.terms)
    if args.ranked:
        ds = search_container_ranked(args.container, args.index,
                                     args.terms, k=args.k,
                                     columns=cols)
    else:
        ds = search_container(args.container, args.index, args.terms,
                              mode=args.mode, columns=cols)
    if args.output:
        ds = ds.materialize()  # one execution feeds write + count
        ds.write_parquet(args.output)
        return {"output": args.output, "rows": ds.count()}
    ds = ds.materialize()  # small by construction (probed matches)
    return {"rows": ds.count(), "first": ds.take(args.limit)}


def cmd_dedup(args) -> dict:
    """Deduplicated corpus → parquet (exact + optional near-dup, or
    SemDeDup embedding-space dedup with --semantic)."""
    import ray.data as rd

    ds = rd.read_parquet(args.input)
    if getattr(args, "lines", False):
        from .stages.dedup import line_dedup

        out = line_dedup(ds, text_col=args.text_col,
                         id_col=args.id_col,
                         min_len=args.line_min_len)
    elif getattr(args, "semantic", False):
        from .stages.similarity import semantic_dedup

        out = semantic_dedup(ds, threshold=args.sem_threshold,
                             n_clusters=args.sem_clusters,
                             emb_col=args.emb_col, id_col=args.id_col)
    else:
        from .pipelines.dedup_pipeline import dedup_corpus

        out = dedup_corpus(ds, text_col=args.text_col,
                           id_col=args.id_col,
                           near=not args.exact_only,
                           cluster_exact=args.cluster_exact,
                           cc_max_rounds=args.cc_max_rounds)
    # materialize ONCE: count + write on the lazy pipeline would
    # re-execute the whole read+filter lineage twice
    out = out.materialize()
    rows = out.count()
    # coalesce: the removal filter can leave schema-less EMPTY blocks,
    # which would become unreadable 0-column parquet files (one file
    # per block); repartition also right-sizes output files (~1M rows)
    out = out.repartition(max(1, min(200, rows // 1_000_000 + 1)))
    out.write_parquet(args.output)
    return {"output": args.output, "rows": rows}


def _prepare_input(args):
    fmt = getattr(args, "input_format", "parquet")
    if fmt != "parquet":
        from .sources.readers import read_corpus

        return read_corpus(args.input, fmt=fmt)
    import ray.data as rd

    return rd.read_parquet(args.input)


def cmd_prepare(args) -> dict:
    """Full training-data preparation: decontaminate → scrub → dedup →
    gates → tokenize → pack → encode container."""
    if (args.lm_ref is None) != (args.lm_min_logprob is None):
        raise SystemExit(
            "--lm-ref and --lm-min-logprob must be passed together "
            "(one without the other would silently skip the LM gate)")
    import ray.data as rd

    from .pipelines.prepare_pipeline import prepare_training_data

    ds = _prepare_input(args)
    bench = lm_ref = None
    if args.benchmark or args.lm_ref:
        import pyarrow.parquet as pq

        if args.benchmark:
            bench = pq.read_table(args.benchmark)["text"].to_pylist()
        if args.lm_ref:
            lm_ref = pq.read_table(args.lm_ref)["text"].to_pylist()
    return prepare_training_data(ds, args.output, max_len=args.max_len,
                                 scrub=not args.no_scrub,
                                 benchmark_texts=bench,
                                 lm_ref_texts=lm_ref,
                                 lm_min_logprob=args.lm_min_logprob)


def cmd_mix(args) -> dict:
    """Resample a multi-source corpus to per-source token budgets."""
    import json as _json

    import ray.data as rd

    from .stages.sampling import mix_sources

    ds = rd.read_parquet(args.input)
    budgets = {k: int(v) for k, v in _json.loads(args.budgets).items()}
    out, report = mix_sources(ds, budgets, source_col=args.source_col,
                              weight_col=args.weight_col,
                              id_col=args.id_col, seed=args.seed,
                              upsample=args.upsample)
    out.write_parquet(args.output)
    return {"output": args.output, "mixture": report}


def cmd_verify(args) -> dict:
    # distributed bit-identity proof: decode every committed partition,
    # recompute the canonical fingerprint, compare to the manifest
    from .pipelines.verify_pipeline import verify_manifest

    return verify_manifest(args.container)


def cmd_delete(args) -> dict:
    from .pipelines.delete_pipeline import delete_rows
    from .state import manifest as mf

    # type the bounds from the container's recorded column type, not by
    # guessing from the string shape — "--lo 100" on a STRING column
    # must stay the string "100" (an int bound would crash the pruning
    # comparison and there'd be no syntax to express the string)
    def _typed(v):
        if v is None:
            return None
        records = mf.load_manifest(args.container)
        first = records[min(records, key=lambda p: int(p[1:]))]
        footer = mf.read_partition_footer(first["path"])
        cols = (footer["blocks"][0]["columns"] if footer.get("paged")
                else footer["columns"])
        m = next((c for c in cols if c["name"] == args.column), None)
        ts = m["arrow_type"] if m else ""
        if ts.startswith(("int", "uint")):
            return int(v)
        if ts.startswith(("float", "double", "decimal")):
            return float(v)
        return v

    values = json.loads(args.values) if args.values else None
    return delete_rows(args.container, args.column,
                       lo=_typed(args.lo), hi=_typed(args.hi),
                       values=values, mode=args.mode)


def cmd_update(args) -> dict:
    from .pipelines.update_pipeline import update_rows
    from .state import manifest as mf

    def _typed(v):
        if v is None:
            return None
        records = mf.load_manifest(args.container)
        first = records[min(records, key=lambda p: int(p[1:]))]
        footer = mf.read_partition_footer(first["path"])
        cols = (footer["blocks"][0]["columns"] if footer.get("paged")
                else footer["columns"])
        m = next((c for c in cols if c["name"] == args.column), None)
        ts = m["arrow_type"] if m else ""
        if ts.startswith(("int", "uint")):
            return int(v)
        if ts.startswith(("float", "double", "decimal")):
            return float(v)
        return v

    values = json.loads(args.values) if args.values else None
    return update_rows(args.container, args.column,
                       set=json.loads(args.set),
                       lo=_typed(args.lo), hi=_typed(args.hi),
                       values=values)


def cmd_maintain(args) -> dict:
    from .pipelines.maintain_pipeline import maintain_container

    return maintain_container(
        args.container, target_weight=args.target_weight,
        fold_min_waste=args.fold_min_waste,
        retain_from_txn=args.retain_from_txn,
        refresh_sidecars=not args.no_sidecars)


def cmd_generated(args) -> dict:
    """Declare or show P74 generated columns."""
    import json as _json

    from .pipelines.generated_pipeline import get_generated, set_generated

    if args.set:
        specs = {}
        for item in args.set:
            name, spec = item.split("=", 1)
            specs[name] = _json.loads(spec)
        return set_generated(args.container, specs,
                             validate=not args.no_validate)
    return {"generated": get_generated(args.container)}


def cmd_sidecars(args) -> dict:
    """List or refresh a container's registered sidecars (P72)."""
    from .pipelines.sidecar_registry import (
        list_sidecars,
        refresh_sidecars,
        unregister_sidecar,
    )

    if args.unregister:
        return unregister_sidecar(args.container, args.unregister)
    if args.refresh:
        return refresh_sidecars(args.container, to_txn=args.to_txn)
    return {"sidecars": list_sidecars(args.container)}


def cmd_replicate(args) -> dict:
    from .pipelines.replicate_pipeline import replicate_container

    return replicate_container(args.src, args.dst, args.key)


def cmd_constraints(args) -> dict:
    from .pipelines.constraints_pipeline import (
        drop_constraints,
        get_constraints,
        set_constraints,
    )

    if args.drop:
        return drop_constraints(args.container)
    if args.set:
        return set_constraints(args.container, json.loads(args.set),
                               validate=not args.no_validate)
    return {"constraints": get_constraints(args.container),
            "out_dir": args.container}


def cmd_compact(args) -> dict:
    from .pipelines.compact_pipeline import compact_container

    return compact_container(args.container,
                             target_weight=args.target_weight,
                             small_frac=args.small_frac,
                             gc=not args.no_gc)


def cmd_recluster(args) -> dict:
    from .pipelines.encode_pipeline import EncodeOptions
    from .pipelines.recluster_pipeline import (
        incremental_recluster,
        recluster_container,
    )

    keys = args.key.split(",")
    opts = EncodeOptions(target_weight=args.target_weight,
                         weight_col=args.weight_col,
                         compression=args.compression)
    if args.incremental:
        if args.output is not None:
            raise SystemExit("--incremental reclusters IN PLACE; "
                             "--output not allowed")
        if len(keys) != 1:
            raise SystemExit("--incremental takes a single key")
        return incremental_recluster(args.container, keys[0], opts)
    if args.output is None:
        raise SystemExit("--output required (or pass --incremental "
                         "for in-place maintenance)")
    return recluster_container(
        args.container, args.output,
        keys[0] if len(keys) == 1 else keys, opts)


def cmd_join(args) -> dict:
    from .pipelines.container_join import merge_join_containers

    ds = merge_join_containers(
        args.left, args.right, args.key,
        left_columns=args.left_columns.split(",")
        if args.left_columns else None,
        right_columns=args.right_columns.split(",")
        if args.right_columns else None,
        how=args.how)
    ds.write_parquet(args.output)
    import pyarrow as pa
    import pyarrow.dataset as pads

    try:
        n = pads.dataset(args.output).count_rows()
    except (OSError, pa.ArrowInvalid):  # zero-match join → no files
        n = 0
    return {"rows": n, "output": args.output, "how": args.how}


def cmd_agg(args) -> dict:
    from .pipelines.container_agg import aggregate_clustered

    aggs: dict = {}
    for spec in args.agg:
        if ":" not in spec:
            raise SystemExit(f"--agg {spec!r}: expected column:fn "
                             "(sum|count|min|max|mean)")
        col, fn = spec.rsplit(":", 1)
        aggs.setdefault(col, []).append(fn)
    key = args.key.split(",") if "," in args.key else args.key
    t = aggregate_clustered(args.container, key, aggs)
    if args.output:
        import pyarrow.parquet as pq

        pq.write_table(t, args.output)
        return {"groups": t.num_rows, "output": args.output}
    return {"groups": t.num_rows,
            "rows": t.slice(0, args.limit).to_pylist()}


def cmd_history(args) -> dict:
    from .pipelines.history_pipeline import container_history

    entries = container_history(args.container)
    if not args.verbose:
        for e in entries:   # ids are the bulky part; keep the default
            e.pop("part_ids", None)   # output one line per txn
    return {"container": args.container, "history": entries}


def cmd_rollback(args) -> dict:
    from .pipelines.history_pipeline import rollback_container

    return rollback_container(args.container, args.to_txn,
                              sweep=not args.no_sweep)


def cmd_changes(args) -> dict:
    from .pipelines.history_pipeline import changes_since

    ds = changes_since(args.container, args.since,
                       columns=args.columns.split(",")
                       if args.columns else None)
    if args.output:
        ds.write_parquet(args.output)
        import pyarrow as pa
        import pyarrow.dataset as pads

        try:
            n = pads.dataset(args.output).count_rows()
        except (OSError, pa.ArrowInvalid):  # empty increment → no files
            n = 0
        return {"rows": n, "since": args.since, "output": args.output}
    return {"rows": ds.count(), "since": args.since}


def cmd_diff(args) -> dict:
    from .pipelines.history_pipeline import row_changes

    import pyarrow as pa
    import pyarrow.compute as pc

    ds = row_changes(args.container, args.since, args.key,
                     to_txn=args.to_txn,
                     columns=args.columns.split(",")
                     if args.columns else None)
    counts: dict = {}

    def _tally(arr) -> None:
        for e in pc.value_counts(arr).to_pylist():
            counts[e["values"]] = counts.get(e["values"], 0) + e["counts"]

    if args.output:
        # one execution: write the feed, then count from the files
        ds.write_parquet(args.output)
        import pyarrow.dataset as pads

        try:
            tbl = pads.dataset(args.output).to_table(
                columns=["_change_type"])
            _tally(tbl["_change_type"].combine_chunks())
        except (OSError, pa.ArrowInvalid):  # empty feed -> no files
            pass
        return {"since": args.since, "to": args.to_txn,
                "changes": counts, "output": args.output}
    for b in ds.select_columns(["_change_type"]).iter_batches(
            batch_format="pyarrow"):
        _tally(b["_change_type"].combine_chunks())
    return {"since": args.since, "to": args.to_txn, "changes": counts}


def cmd_clone(args) -> dict:
    from .pipelines.clone_pipeline import clone_container

    as_of = args.as_of
    if as_of is not None and str(as_of).lstrip("-").isdigit():
        as_of = int(as_of)
    return clone_container(args.src, args.dst, as_of=as_of)


def cmd_upsert(args) -> dict:
    from .pipelines.encode_pipeline import EncodeOptions
    from .pipelines.upsert_pipeline import upsert_rows

    opts = EncodeOptions(target_weight=args.target_weight,
                         sort_key=args.sort_key or args.key,
                         compression=args.compression)
    return upsert_rows(args.container, args.input, args.key, opts,
                       upsert_id=args.upsert_id, gc=not args.no_gc,
                       mode=args.mode)


def cmd_tag(args) -> dict:
    from .pipelines.history_pipeline import (
        delete_tag,
        list_tags,
        tag_snapshot,
    )

    if args.delete:
        return delete_tag(args.container, args.delete)
    if args.name:
        return tag_snapshot(args.container, args.name, txn=args.txn)
    return {"container": args.container,
            "tags": list_tags(args.container)}


def cmd_ingest(args) -> dict:
    from .pipelines.encode_pipeline import EncodeOptions
    from .pipelines.ingest_pipeline import ingest_increment

    opts = EncodeOptions(target_weight=args.target_weight,
                         compression=args.compression)
    return ingest_increment(args.input, args.container, args.index,
                            opts, text_col=args.text_col,
                            id_col=args.id_col,
                            ingest_id=args.ingest_id)


def cmd_publish(args) -> dict:
    from .pipelines.clone_pipeline import publish_clone

    return publish_clone(args.clone, link=args.link)


def cmd_checkpoint(args) -> dict:
    from .state.manifest import write_manifest_checkpoint

    out = write_manifest_checkpoint(args.container)
    return {**out, "container": args.container}


def cmd_sweep(args) -> dict:
    from .pipelines.compact_pipeline import sweep_invisible

    swept = sweep_invisible(args.container,
                            retain_from_txn=args.retain_from)
    return {"swept": swept, "container": args.container,
            "retain_from_txn": args.retain_from}


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="parquet2_ray.job")
    ap.add_argument("--num-cpus", type=int, default=None,
                    help="local-mode CPU count (omit inside a Ray Job)")
    sub = ap.add_subparsers(dest="cmd", required=True)

    enc = sub.add_parser("encode")
    enc.add_argument("--input", required=True)
    enc.add_argument("--output", required=True)
    enc.add_argument("--group-col", default="source")
    enc.add_argument("--weight-col", default="n_tok")
    enc.add_argument("--sort-key", default="doc_id")
    enc.add_argument("--target-weight", type=int, default=4_000_000)
    enc.add_argument("--compression", default=None)
    enc.add_argument("--input-format", default="parquet",
                     choices=["parquet", "jsonl", "csv", "arrow"],
                     help="raw-crawl ingest formats route through a "
                          "Dataset read (P77)")
    enc.add_argument("--append", action="store_true",
                     help="incremental ingest: add the input's partitions "
                          "to an EXISTING container after its committed "
                          "ones (crash-safe reserved id range; the encode "
                          "side of the incremental dedup/near-dup family)")
    enc.add_argument("--append-id", default=None,
                     help="stable identity of this increment for resume "
                          "(default: hash of the resolved input files)")
    enc.add_argument("--evolve-schema", action="store_true",
                     help="with --append: the increment may add new "
                          "columns (null for history) or omit committed "
                          "ones (null for its rows); shared columns keep "
                          "their types")

    dec = sub.add_parser("decode")
    dec.add_argument("--input", required=True, help="container dir")
    dec.add_argument("--output", required=True, help="parquet output dir")
    dec.add_argument("--embed-blooms", action="store_true",
                     help="embed spec SBBF blooms in the parquet footers "
                          "instead of writing sidecars")

    ver = sub.add_parser("verify")
    ver.add_argument("--container", required=True)

    scn = sub.add_parser("scan",
                         help="predicate-pruned scan of foreign "
                              "parquet via its page index")
    scn.add_argument("--input", required=True)
    scn.add_argument("--input-format", default="parquet",
                     choices=["parquet", "jsonl", "json", "csv",
                              "arrow", "ipc", "feather"])
    scn.add_argument("--columns", default=None,
                     help="comma-separated projection")
    scn.add_argument("--where", action="append", default=None,
                     metavar="COL:LO:HI",
                     help="inclusive range conjunct; empty side = "
                          "unbounded (repeatable)")
    scn.add_argument("--output", default=None,
                     help="write matching rows as parquet here "
                          "(prints only a row count otherwise)")

    dele = sub.add_parser("delete")
    dele.add_argument("--container", required=True)
    dele.add_argument("--column", required=True)
    dele.add_argument("--lo", default=None)
    dele.add_argument("--hi", default=None)
    dele.add_argument("--values", default=None,
                      help="JSON list of values to delete "
                           "(alternative to --lo/--hi)")
    dele.add_argument("--mode", default="rewrite",
                      choices=["rewrite", "dv"],
                      help="rewrite = copy-on-write re-encode; dv = "
                           "merge-on-read deletion-vector sidecar")

    upd = sub.add_parser("update",
                         help="UPDATE ... SET ... WHERE over a container")
    upd.add_argument("--container", required=True)
    upd.add_argument("--column", required=True,
                     help="WHERE predicate column")
    upd.add_argument("--lo", default=None)
    upd.add_argument("--hi", default=None)
    upd.add_argument("--values", default=None,
                     help="JSON list of values to match "
                          "(alternative to --lo/--hi)")
    upd.add_argument("--set", required=True,
                     help='JSON object of column: value assignments, '
                          'e.g. \'{"quality": 0}\'')

    cmp_ = sub.add_parser("compact")
    cmp_.add_argument("--container", required=True)
    cmp_.add_argument("--target-weight", type=int, default=4_000_000)
    cmp_.add_argument("--small-frac", type=float, default=0.5)
    cmp_.add_argument("--no-gc", action="store_true",
                      help="leave replaced records/files for a later sweep")

    mnt = sub.add_parser("maintain",
                         help="OPTIMIZE: fold dv masks + compact small "
                              "runs + refresh checkpoint + sweep")
    mnt.add_argument("--container", required=True)
    mnt.add_argument("--target-weight", type=int, default=4_000_000)
    mnt.add_argument("--fold-min-waste", type=float, default=0.0,
                     help="fold only dv partitions whose deleted "
                          "fraction is at least this (0 = fold all)")
    mnt.add_argument("--retain-from-txn", type=int, default=None,
                     help="keep snapshots from this txn onward "
                          "restorable (default: current only)")
    mnt.add_argument("--no-sidecars", action="store_true",
                     help="skip the P72 sidecar-refresh step")

    gen = sub.add_parser("generated",
                         help="declare/show P74 generated columns")
    gen.add_argument("--container", required=True)
    gen.add_argument("--set", action="append", default=None,
                     help='name=["op","src",arg] (JSON spec); repeatable')
    gen.add_argument("--no-validate", action="store_true",
                     help="skip retroactive validation of existing rows")

    sdc = sub.add_parser("sidecars",
                         help="list/refresh registered sidecars (P72)")
    sdc.add_argument("--container", required=True)
    sdc.add_argument("--refresh", action="store_true")
    sdc.add_argument("--to-txn", type=int, default=None,
                     help="pin every sidecar to this source txn "
                          "(default: latest, resolved once)")
    sdc.add_argument("--unregister", default=None,
                     help="sidecar path to drop from the registry")

    cst = sub.add_parser("constraints",
                         help="declare / show / drop CHECK constraints")
    cst.add_argument("--container", required=True)
    cst.add_argument("--set", default=None,
                     help='JSON list, e.g. \'[{"column": "n_tok", '
                          '"op": ">", "value": 0}]\'')
    cst.add_argument("--drop", action="store_true")
    cst.add_argument("--no-validate", action="store_true",
                     help="skip validating existing rows at declaration")

    rpl = sub.add_parser("replicate",
                         help="converge a follower container to a "
                              "source via its CDC feed")
    rpl.add_argument("--src", required=True)
    rpl.add_argument("--dst", required=True)
    rpl.add_argument("--key", required=True,
                     help="unique non-null key column in the source")

    rcl = sub.add_parser("recluster")
    rcl.add_argument("--container", required=True, help="source container")
    rcl.add_argument("--output", default=None, help="new container dir "
                     "(omit with --incremental)")
    rcl.add_argument("--incremental", action="store_true",
                     help="in-place maintenance: rewrite only the "
                          "partitions whose key ranges overlap (the "
                          "messy tail appends accrue)")
    rcl.add_argument("--key", required=True,
                     help="column to range-cluster and sort by; a "
                          "comma-separated list Z-order-clusters on "
                          "all of them")
    rcl.add_argument("--weight-col", default="n_tok")
    rcl.add_argument("--target-weight", type=int, default=4_000_000)
    rcl.add_argument("--compression", default=None)

    jn = sub.add_parser("join")
    jn.add_argument("--left", required=True, help="left container")
    jn.add_argument("--right", required=True, help="right container")
    jn.add_argument("--key", required=True)
    jn.add_argument("--output", required=True, help="parquet output dir")
    jn.add_argument("--how", default="inner",
                    choices=["inner", "left outer", "left semi",
                             "left anti"])
    jn.add_argument("--left-columns", default=None)
    jn.add_argument("--right-columns", default=None)

    agg = sub.add_parser("agg")
    agg.add_argument("--container", required=True)
    agg.add_argument("--key", required=True)
    agg.add_argument("--agg", action="append", required=True,
                     help="column:fn (sum|count|min|max|mean); repeatable")
    agg.add_argument("--output", default=None, help="parquet file (omit "
                     "to print the first --limit groups)")
    agg.add_argument("--limit", type=int, default=20)

    vw = sub.add_parser("view",
                        help="P70 materialized aggregate view")
    vw.add_argument("action", choices=["create", "refresh", "status"])
    vw.add_argument("--view", required=True)
    vw.add_argument("--source", default=None,
                    help="source container (create only)")
    vw.add_argument("--key", default=None, help="group key (create only)")
    vw.add_argument("--agg", action="append", default=None,
                    help="column:fn (sum|count|min|max|mean); repeatable")
    vw.add_argument("--target-rows", type=int, default=500_000)

    ivx = sub.add_parser("index-vec",
                         help="build/append the P69 IVF vector index")
    ivx.add_argument("--container", required=True)
    ivx.add_argument("--index", required=True)
    ivx.add_argument("--emb-col", default="embedding")
    ivx.add_argument("--id-col", default="vec_id")
    ivx.add_argument("--n-centroids", type=int, default=64)
    ivx.add_argument("--subshards", type=int, default=1)
    ivx.add_argument("--append", action="store_true")
    ivx.add_argument("--refresh", action="store_true",
                     help="converge via the container's CDC feed (P71)")

    annp = sub.add_parser("ann",
                          help="ANN top-k against a P69 vector index")
    annp.add_argument("--index", required=True)
    annp.add_argument("--queries", required=True,
                      help="parquet file of query vectors")
    annp.add_argument("--emb-col", default="embedding")
    annp.add_argument("--id-col", default="vec_id")
    annp.add_argument("--k", type=int, default=10)
    annp.add_argument("--nprobe", type=int, default=4)
    annp.add_argument("--limit", type=int, default=20)

    anl = sub.add_parser("analyze",
                         help="compute/refresh P68 column statistics")
    anl.add_argument("--container", required=True)
    anl.add_argument("--columns", default=None,
                     help="comma-separated subset (default: all)")
    anl.add_argument("--incremental", action="store_true",
                     help="fold only partitions not yet covered")

    expl = sub.add_parser("explain",
                          help="EXPLAIN a range read from persisted stats")
    expl.add_argument("--container", required=True)
    expl.add_argument("--column", required=True)
    expl.add_argument("--lo", default=None)
    expl.add_argument("--hi", default=None)

    tix = sub.add_parser("index-text",
                         help="build/append the P67 inverted text index")
    tix.add_argument("--container", required=True)
    tix.add_argument("--index", required=True)
    tix.add_argument("--text-col", default="text")
    tix.add_argument("--id-col", default="doc_id")
    tix.add_argument("--nshards", type=int, default=64)
    tix.add_argument("--append", action="store_true",
                     help="fold the container's docs into an existing "
                          "index instead of rebuilding")
    tix.add_argument("--refresh", action="store_true",
                     help="converge a bound index via the container's "
                          "CDC feed (P71)")
    tix.add_argument("--stoplist", type=float, default=None,
                     help="drop terms with df > this fraction of the "
                          "corpus (stop-word pruning)")
    tix.add_argument("--on-existing", default="unchecked",
                     choices=["error", "replace", "unchecked"],
                     help="--append behavior for already-indexed ids "
                          "(the CLI fold re-reads the full container, "
                          "so 'unchecked' is the default here)")

    srch = sub.add_parser("search",
                          help="full-text search a container via its index")
    srch.add_argument("--container", required=True)
    srch.add_argument("--index", required=True)
    srch.add_argument("terms", nargs="+")
    srch.add_argument("--mode", choices=["and", "or"], default="and")
    srch.add_argument("--columns", default=None,
                      help="comma-separated projection")
    srch.add_argument("--output", default=None,
                      help="parquet dir (omit to print --limit rows)")
    srch.add_argument("--limit", type=int, default=20)
    srch.add_argument("--ranked", action="store_true",
                      help="BM25 top-k instead of boolean matching")
    srch.add_argument("--k", type=int, default=10,
                      help="result count for --ranked")
    srch.add_argument("--explain", action="store_true",
                      help="per-term dfs + fetch-mass estimate only")

    ddp = sub.add_parser("dedup")
    ddp.add_argument("--input", required=True)
    ddp.add_argument("--output", required=True)
    ddp.add_argument("--text-col", default="text")
    ddp.add_argument("--id-col", default="doc_id")
    ddp.add_argument("--exact-only", action="store_true")
    ddp.add_argument("--cluster-exact", action="store_true",
                     help="transitive-closure near-dup clusters")
    ddp.add_argument("--cc-max-rounds", type=int, default=16,
                     help="label-propagation round cap (raise for "
                          "long duplicate chains; non-convergence raises)")
    ddp.add_argument("--lines", action="store_true",
                     help="corpus-wide exact LINE dedup (keep each "
                          "line's globally-first occurrence, "
                          "reassemble documents)")
    ddp.add_argument("--line-min-len", type=int, default=1,
                     help="lines shorter than this always survive")
    ddp.add_argument("--semantic", action="store_true",
                     help="SemDeDup: k-means-cluster the embedding "
                          "column, keep the min id of every "
                          "within-cluster near-dup group")
    ddp.add_argument("--emb-col", default="embedding")
    ddp.add_argument("--sem-threshold", type=float, default=0.85)
    ddp.add_argument("--sem-clusters", type=int, default=64)

    bpe = sub.add_parser("bpe",
                         help="train / apply a BPE subword tokenizer")
    bpe.add_argument("--input", required=True)
    bpe.add_argument("--text-col", default="text")
    bpe.add_argument("--id-col", default="doc_id")
    bpe.add_argument("--n-merges", type=int, default=1000)
    bpe.add_argument("--max-words", type=int, default=100_000)
    bpe.add_argument("--merges-in", default=None,
                     help="JSON merge list to APPLY (skips training)")
    bpe.add_argument("--merges-out", default=None,
                     help="write the learned merge list here")
    bpe.add_argument("--output", default=None,
                     help="encode the corpus and write "
                          "(id, bpe_ids, n_bpe) parquet here")
    bpe.add_argument("--concurrency", type=int, default=4)

    prep = sub.add_parser("prepare")
    prep.add_argument("--input", required=True)
    prep.add_argument("--output", required=True)
    prep.add_argument("--max-len", type=int, default=2048)
    prep.add_argument("--input-format", default="parquet",
                      choices=["parquet", "jsonl", "csv", "arrow"],
                      help="raw-crawl ingest (P77)")
    prep.add_argument("--no-scrub", action="store_true")
    prep.add_argument("--benchmark", default=None,
                      help="parquet file of eval texts (column 'text'); "
                           "contaminated docs are dropped before dedup")
    prep.add_argument("--lm-ref", default=None,
                      help="parquet file of reference texts (column "
                           "'text') for the CCNet-style LM quality gate")
    prep.add_argument("--lm-min-logprob", type=float, default=None,
                      help="drop docs whose mean log10 token probability "
                           "under the reference LM is below this")

    mix = sub.add_parser("mix")
    mix.add_argument("--input", required=True)
    mix.add_argument("--output", required=True)
    mix.add_argument("--budgets", required=True,
                     help="JSON {source: target_tokens}, e.g. "
                          "'{\"web\":1000000,\"code\":250000}'")
    mix.add_argument("--source-col", default="source")
    mix.add_argument("--weight-col", default="n_tok")
    mix.add_argument("--id-col", default="doc_id")
    mix.add_argument("--seed", type=int, default=0)
    mix.add_argument("--upsample", action="store_true")

    hist = sub.add_parser("history",
                          help="per-transaction commit history")
    hist.add_argument("--container", required=True)
    hist.add_argument("--verbose", action="store_true",
                      help="include per-txn partition id lists")

    rbk = sub.add_parser("rollback",
                         help="restore the snapshot at --to-txn, "
                              "discarding later transactions")
    rbk.add_argument("--container", required=True)
    rbk.add_argument("--to-txn", type=int, required=True)
    rbk.add_argument("--no-sweep", action="store_true",
                     help="skip the post-rollback invisible-state sweep")

    chg = sub.add_parser("changes",
                         help="incremental read: rows appended after "
                              "--since (append-only window required)")
    chg.add_argument("--container", required=True)
    chg.add_argument("--since", type=int, required=True)
    chg.add_argument("--columns", default=None,
                     help="comma-separated projection")
    chg.add_argument("--output", default=None,
                     help="parquet output dir (omit to just count)")


    dif = sub.add_parser("diff",
                         help="row-level change feed: net snapshot diff "
                              "between --since and --to-txn, tagged "
                              "insert/delete/update_pre/update_post")
    dif.add_argument("--container", required=True)
    dif.add_argument("--since", required=True)
    dif.add_argument("--to-txn", dest="to_txn", default=None)
    dif.add_argument("--key", required=True,
                     help="pairing column for update detection")
    dif.add_argument("--columns", default=None,
                     help="comma-separated projection (must include key)")
    dif.add_argument("--output", default=None,
                     help="parquet output dir (omit to just count)")


    cln = sub.add_parser("clone",
                         help="shallow clone: branch a container in "
                              "O(metadata), data files shared")
    cln.add_argument("--src", required=True)
    cln.add_argument("--dst", required=True)
    cln.add_argument("--as-of", dest="as_of", default=None,
                     help="clone a past snapshot (txn or tag)")

    ups = sub.add_parser("upsert",
                         help="MERGE: increment rows replace container "
                              "rows sharing their key; the rest insert "
                              "(one family-atomic flip)")
    ups.add_argument("--input", required=True)
    ups.add_argument("--container", required=True)
    ups.add_argument("--key", required=True)
    ups.add_argument("--sort-key", default=None,
                     help="sort key for rewritten/new partitions "
                          "(default: --key)")
    ups.add_argument("--upsert-id", default=None)
    ups.add_argument("--mode", default="rewrite",
                     choices=["rewrite", "dv"],
                     help="rewrite = copy-on-write re-encode of touched "
                          "partitions; dv = merge-on-read deletion-"
                          "vector sidecars for the matched rows")
    ups.add_argument("--target-weight", type=int, default=4_000_000)
    ups.add_argument("--compression", default=None)
    ups.add_argument("--no-gc", action="store_true")

    tag = sub.add_parser("tag",
                         help="name a snapshot (a retention root the "
                              "sweep keeps restorable); no args = list")
    tag.add_argument("--container", required=True)
    tag.add_argument("--name", default=None)
    tag.add_argument("--txn", type=int, default=None,
                     help="snapshot to tag (default: latest)")
    tag.add_argument("--delete", default=None, metavar="NAME")

    ing = sub.add_parser("ingest",
                         help="daily-ingest cycle: dedup the increment "
                              "against the corpus hash index, append "
                              "survivors, fold their hashes back "
                              "(crash-safe phase ledger)")
    ing.add_argument("--input", required=True)
    ing.add_argument("--container", required=True)
    ing.add_argument("--index", required=True,
                     help="hash-index dir (bootstrapped when empty)")
    ing.add_argument("--text-col", default="text")
    ing.add_argument("--id-col", default="doc_id")
    ing.add_argument("--ingest-id", default=None,
                     help="stable increment id (defaults to a content "
                          "hash of the input files)")
    ing.add_argument("--target-weight", type=int, default=4_000_000)
    ing.add_argument("--compression", default=None)

    swp = sub.add_parser("sweep",
                         help="GC invisible records/files; --retain-from "
                              "keeps snapshots at txn >= N restorable")
    swp.add_argument("--container", required=True)
    swp.add_argument("--retain-from", type=int, default=None)

    pub = sub.add_parser("publish",
                         help="merge a clone's additions back into its "
                              "source (family-atomic; refuses if the "
                              "clone rewrote shared data)")
    pub.add_argument("--clone", required=True)
    pub.add_argument("--link", action="store_true",
                     help="zero-copy: reference the clone's files "
                          "instead of copying bytes")

    ckp = sub.add_parser("checkpoint",
                         help="collapse the per-partition manifest scan "
                              "into one file; later loads read checkpoint "
                              "+ only post-checkpoint changes")
    ckp.add_argument("--container", required=True)

    args = ap.parse_args(argv)
    _ensure_ray(args.num_cpus)
    out = {"encode": cmd_encode, "decode": cmd_decode, "verify": cmd_verify,
           "scan": cmd_scan,
           "compact": cmd_compact, "delete": cmd_delete,
           "recluster": cmd_recluster, "join": cmd_join, "agg": cmd_agg,
           "dedup": cmd_dedup, "prepare": cmd_prepare,
           "bpe": cmd_bpe,
           "mix": cmd_mix, "history": cmd_history,
           "rollback": cmd_rollback, "changes": cmd_changes,
           "diff": cmd_diff, "clone": cmd_clone,
           "sweep": cmd_sweep, "ingest": cmd_ingest,
           "checkpoint": cmd_checkpoint, "publish": cmd_publish,
           "tag": cmd_tag, "upsert": cmd_upsert,
           "update": cmd_update, "maintain": cmd_maintain,
           "constraints": cmd_constraints,
           "replicate": cmd_replicate,
           "sidecars": cmd_sidecars,
           "generated": cmd_generated,
           "index-text": cmd_index_text,
           "search": cmd_search,
           "analyze": cmd_analyze,
           "explain": cmd_explain,
           "index-vec": cmd_index_vec,
           "ann": cmd_ann,
           "view": cmd_view}[args.cmd](args)
    print(json.dumps(out, default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main())
