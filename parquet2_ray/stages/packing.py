"""Sequence packing — turning variable-length token documents into
fixed-length training examples.

The canonical last mile of a tokens pipeline (the BASELINE.json input
shape is ``(doc_id, tokens:list<int32>, n_tok, source)``): training
consumes fixed ``max_len`` windows, so documents are concatenated (with
an optional separator token) and re-sliced.  The reference has no
analog (it is a codec library); this operator exists because a 10^12-
sequence corpus is packed exactly once per training run and the naive
per-row Python version is the classic pipeline bottleneck.

Ray-Data-first shape:

* Packing is SHARD-LOCAL: a global concatenation order would serialize
  the corpus through one task, and training does not need one — it
  needs deterministic, reproducible examples.  Rows route to
  ``hash(doc_id) % nshards`` (ONE shuffle); inside a shard, documents
  are ordered by ``doc_id`` (a pure function of the data — re-runs and
  repartitioning cannot change the output) and packed fully vectorized:
  one ``np.concatenate`` + one reshape, no per-token or per-row Python.
* Every token appears exactly once, in document order within its
  shard.  The final partial window of a shard is either padded with
  ``pad_id`` (``drop_last=False``, with ``n_real`` recording the
  boundary) or dropped.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

__all__ = ["pack_sequences", "pack_token_arrays", "deterministic_shuffle"]


def pack_token_arrays(
    token_arrays: list[np.ndarray] | np.ndarray,
    max_len: int,
    sep_id: int | None = None,
    pad_id: int = 0,
    drop_last: bool = False,
) -> tuple[np.ndarray, np.ndarray]:
    """Pack a list of int32 token arrays into a (rows, max_len) matrix.

    Returns ``(packed, n_real)`` where ``n_real[i]`` counts the
    non-padding tokens of row i.  Vectorized: one concatenate (+ an
    interleaved separator column when ``sep_id`` is given), one pad,
    one reshape."""
    if sep_id is not None and len(token_arrays):
        with_sep = []
        for a in token_arrays:
            with_sep.append(np.asarray(a, dtype=np.int32))
            with_sep.append(np.array([sep_id], dtype=np.int32))
        flat = np.concatenate(with_sep) if with_sep else np.empty(0, np.int32)
    else:
        flat = (np.concatenate([np.asarray(a, dtype=np.int32)
                                for a in token_arrays])
                if len(token_arrays) else np.empty(0, np.int32))
    n = flat.size
    if n == 0:
        return np.empty((0, max_len), np.int32), np.empty(0, np.int64)
    full_rows, rem = divmod(n, max_len)
    if rem and drop_last:
        flat = flat[: full_rows * max_len]
        rem = 0
    elif rem:
        flat = np.concatenate(
            [flat, np.full(max_len - rem, pad_id, dtype=np.int32)])
    rows = flat.size // max_len
    packed = flat.reshape(rows, max_len)
    n_real = np.full(rows, max_len, dtype=np.int64)
    if rem:
        n_real[-1] = rem
    return packed, n_real


def pack_sequences(
    ds: rd.Dataset,
    max_len: int = 2048,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    sep_id: int | None = None,
    pad_id: int = 0,
    drop_last: bool = False,
    nshards: int = 256,
) -> rd.Dataset:
    """Pack a tokens-shaped Dataset into fixed-length training rows.

    Output: ``(seq_id:string, tokens:list<int32> of len max_len,
    n_real:int64)`` — ``seq_id`` is ``"<shard>/<index>"``, deterministic
    given the data.  One shuffle (groupby shard); everything else is
    numpy reshape math.  Raise ``nshards`` with corpus size — per-shard
    memory is O(corpus tokens / nshards)."""
    import pyarrow.compute as pc

    from ..functions.hashing import hash_strings, shard_of

    def shard(b: pa.Table) -> pa.Table:
        b = b.select([id_col, tokens_col]).filter(
            pc.is_valid(b[tokens_col]))
        ids = b[id_col].combine_chunks()
        if pa.types.is_integer(ids.type):
            key = ids.to_numpy(zero_copy_only=False).astype(np.int64)
        else:  # string ids hash to a stable int key
            key = hash_strings(np.asarray(ids.to_pylist(), dtype=object)
                               ).view(np.int64)
        return b.append_column(
            "_shard", pa.array(shard_of(key, nshards).astype(np.int64)))

    def pack(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({
                "seq_id": pa.nulls(0, pa.string()),
                "tokens": pa.nulls(0, pa.large_list(pa.int32())),
                "n_real": pa.nulls(0, pa.int64()),
            })
        sid = int(group["_shard"][0].as_py())
        # deterministic order inside the shard: sort by doc id
        order = pc.sort_indices(group[id_col])
        toks = group[tokens_col].take(order).combine_chunks()
        la = toks.cast(pa.large_list(pa.int32()))
        offs = np.frombuffer(la.buffers()[1], dtype=np.int64)[
            la.offset : la.offset + len(la) + 1]
        values = la.values.to_numpy(zero_copy_only=False)[offs[0]:offs[-1]] \
            .astype(np.int32, copy=False)
        if sep_id is None:
            flat = values
            n = flat.size
            full_rows, rem = divmod(n, max_len)
            if rem and drop_last:
                flat = flat[: full_rows * max_len]
                rem = 0
            elif rem:
                flat = np.concatenate(
                    [flat, np.full(max_len - rem, pad_id, dtype=np.int32)])
            rows = flat.size // max_len
            packed = flat.reshape(rows, max_len) if rows else \
                np.empty((0, max_len), np.int32)
            n_real = np.full(rows, max_len, dtype=np.int64)
            if rem:
                n_real[-1] = rem
        else:
            # per-doc arrays only when a separator must interleave
            arrays = [values[offs[i] - offs[0]: offs[i + 1] - offs[0]]
                      for i in range(len(la))]
            packed, n_real = pack_token_arrays(
                arrays, max_len, sep_id=sep_id, pad_id=pad_id,
                drop_last=drop_last)
        rows = packed.shape[0]
        seq_ids = pa.array([f"{sid}/{i}" for i in range(rows)],
                           type=pa.string())
        # int64 offsets (large_list): a shard can pack > 2^31 tokens at
        # the 10^12-token scale this targets, where int32 offsets wrap
        offsets = pa.array(np.arange(rows + 1, dtype=np.int64) * max_len,
                           type=pa.int64())
        toks_out = pa.LargeListArray.from_arrays(
            offsets, pa.array(packed.ravel(), type=pa.int32()))
        return pa.table({"seq_id": seq_ids, "tokens": toks_out,
                         "n_real": pa.array(n_real, type=pa.int64())})

    return (ds.map_batches(shard, batch_format="pyarrow")
              .groupby("_shard")
              .map_groups(pack, batch_format="pyarrow"))


def deterministic_shuffle(
    ds: rd.Dataset,
    key_col: str = "doc_id",
    seed: int = 0,
    out_col: str = "_order",
    keep_order_col: bool = False,
) -> rd.Dataset:
    """Seeded, reproducible global shuffle: rows sort by
    ``md5(seed || key)`` — a pure function of (data, seed), so re-runs,
    retries and repartitioning produce the identical order (Ray's
    ``random_shuffle`` is not reproducible across cluster shapes).
    One sort exchange; change ``seed`` per epoch."""
    from ..functions.hashing import md5_hex

    def tag(b: pa.Table) -> pa.Table:
        keys = [f"{seed}|{v}" for v in b[key_col].to_pylist()]
        return b.append_column(out_col, pa.array(md5_hex(keys)))

    out = ds.map_batches(tag, batch_format="pyarrow").sort(out_col)
    if keep_order_col:
        return out
    return out.drop_columns([out_col])
