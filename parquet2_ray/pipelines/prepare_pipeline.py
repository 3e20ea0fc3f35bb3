"""End-to-end training-data preparation: the composite pipeline a real
LLM corpus run executes, assembled from this engine's stages.

    documents (parquet / object store)
      → benchmark decontamination       (map-only, broadcast eval-set
                                         window hashes — optional;
                                         FIRST, on the raw text: the
                                         eval set is raw, so matching
                                         post-scrub text would miss
                                         overlaps containing scrubbed
                                         spans)
      → PII scrub                       (map-only, per-worker regexes)
      → exact dedup                     (one 16 B/row hash exchange)
      → quality gate                    (map-only repetition signals,
                                         plus an optional CCNet-style
                                         LM-logprob threshold)
      → tokenize                        (map-only, vocab-hash words)
      → pack to fixed max_len rows      (one shard shuffle + reshape)
      → encode into the P2R1 container  (the flagship encode pipeline:
                                         plan → one all-to-all → codec
                                         auto-select → lineage manifest)

Every stage streams with backpressure; the whole run pays exactly
THREE all-to-all exchanges (dedup hash groupby, packing shard groupby,
the encode exchange) regardless of corpus size, and the output is the
resumable partition container — a failed run re-encodes only missing
partitions.  The reference has no pipeline layer at all (SURVEY.md §3:
it is a codec library); this module is the proof that the stages
compose into the actual 100 TB workload.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

__all__ = ["prepare_training_data"]


def prepare_training_data(
    docs: rd.Dataset,
    out_dir: str,
    max_len: int = 2048,
    pad_id: int = 0,
    max_dup_line_frac: float = 0.9,
    scrub: bool = True,
    benchmark_texts=None,
    lm_ref_texts=None,
    lm_min_logprob: float | None = None,
    nshards: int = 256,
    encode_opts=None,
) -> dict:
    """Run the full preparation pipeline; returns the container summary
    plus per-stage row counts ({"kept_docs", "packed_rows", ...}).

    ``docs`` must carry (doc_id, text) columns; dedup keeps the min-id
    copy of identical texts, the quality gate drops documents whose
    duplicate-line fraction exceeds ``max_dup_line_frac``."""
    import ray

    from ..sources.readers import _tokenize_batch
    from ..stages.decontaminate import decontaminate
    from ..stages.lm import score_batch, train_ngram_lm
    from ..stages.packing import pack_sequences
    from ..stages.text import repetition_signals_batch, scrub_text_batch
    from .encode_pipeline import EncodeOptions, encode_dataset

    if benchmark_texts:
        # eval-set overlap removal BEFORE dedup: contaminated docs must
        # not survive as the kept copy of a duplicate cluster
        docs = decontaminate(docs, benchmark_texts, text_col="text")

    if scrub:
        # deliberately NOT materialized: the scrubbed corpus is consumed
        # twice (the dedup hash pass and the main anti-filter pass), and
        # re-running the map-only deterministic scrub lineage is cheaper
        # at 100 TB than a full-corpus object-store materialization.
        # The dedup branch touches only the narrow hash projection below.
        docs = docs.map_batches(scrub_text_batch, batch_format="pandas")

    # exact dedup → REMOVAL id set, broadcast once.  Removals are
    # O(duplicates) — small by construction — unlike the keeper set,
    # which is the corpus's whole distinct-document population and must
    # never land on the driver.  Only the ~20 B/row (hash, id, shard)
    # projection is materialized: its count is then metadata-free and
    # the shard groupby reads it without re-running the scrub.
    from ..stages.dedup import gather_small
    from .dedup_pipeline import hash_ids, removals_from_hashes

    hashed = hash_ids(docs, text_col="text", id_col="doc_id",
                      nshards=nshards).materialize()
    n_docs = hashed.count()
    hsch = hashed.schema()
    id_type = hsch.types[list(hsch.names).index("doc_id")]
    rm_tbl = gather_small(
        removals_from_hashes(hashed, id_col="doc_id"),
        pa.table({"doc_id": pa.array([], id_type)}))
    rm_ref = ray.put(rm_tbl["doc_id"].combine_chunks())
    n_keep = n_docs - rm_tbl.num_rows

    def keep_only(b: pa.Table) -> pa.Table:
        mask = pc.is_in(b["doc_id"], value_set=ray.get(rm_ref))
        return b.filter(pc.invert(mask))

    kept = docs.map_batches(keep_only, batch_format="pyarrow")

    # quality gate: map-only repetition signal + threshold filter
    def gate(b):
        sig = repetition_signals_batch(b)
        return b[sig["dup_line_frac"].to_numpy() <= max_dup_line_frac]

    gated = kept.map_batches(gate, batch_format="pandas")

    if lm_ref_texts is not None and lm_min_logprob is not None:
        # CCNet-style LM gate: the reference model is bounded by design
        # (stages/lm.py) and broadcast once; scoring is map-only
        lm_model = ray.put(train_ngram_lm(
            pa.table({"text": pa.array(list(lm_ref_texts), pa.string())})))

        def lm_gate(b: pa.Table) -> pa.Table:
            scored = score_batch(b, ray.get(lm_model))
            lp = scored["lm_logprob"]
            keep = pc.and_kleene(pc.is_valid(lp),
                                 pc.greater_equal(lp, lm_min_logprob))
            return b.filter(pc.fill_null(keep, False))

        gated = gated.map_batches(lm_gate, batch_format="pyarrow")

    # tokenize + pack — source column is optional for plain-text inputs
    def tok(b: pa.Table) -> pa.Table:
        if "source" not in b.column_names:
            b = b.append_column(
                "source", pa.array(["corpus"] * b.num_rows,
                                   type=pa.string()))
        return _tokenize_batch(b)

    tokens = gated.map_batches(tok, batch_format="pyarrow")
    packed = pack_sequences(tokens, max_len=max_len, pad_id=pad_id,
                            nshards=nshards)

    opts = encode_opts or EncodeOptions(
        group_col=None, weight_col="n_real", sort_key="seq_id",
        target_weight=max_len * 50_000)
    summary = encode_dataset(packed, out_dir, opts)
    summary["kept_docs"] = int(n_keep)
    summary["packed_rows"] = int(summary["n_rows"])
    return summary
