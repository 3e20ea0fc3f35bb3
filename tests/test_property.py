"""Property-based codec roundtrips (hypothesis).

The reference validates codecs against a fixture matrix
(/root/reference/tests/write_pyarrow.py:150-154); these properties cover
the same space generatively: arbitrary widths, signs, runs, and sizes
must roundtrip bit-identically through every numeric/binary codec.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from parquet2_ray.codecs import bitpack, delta, for_pack, hybrid_rle
from parquet2_ray.codecs.column import _dec_rle, _enc_rle

_SETTINGS = dict(max_examples=60, deadline=None)


@given(
    w=st.integers(1, 64),
    vals=st.lists(st.integers(0, 2**64 - 1), min_size=0, max_size=300),
)
@settings(**_SETTINGS)
def test_bitpack_roundtrip(w, vals):
    v = np.array(vals, dtype=np.uint64)
    mask = np.uint64((1 << w) - 1) if w < 64 else np.uint64(2**64 - 1)
    packed = bitpack.pack(v, w)
    assert len(packed) == (len(v) * w + 7) // 8
    got = bitpack.unpack(packed, w, len(v))
    assert np.array_equal(got, v & mask)


@given(
    vals=st.lists(st.integers(-(2**63), 2**63 - 1), min_size=0, max_size=400),
    miniblocks=st.sampled_from([1, 4]),
)
@settings(**_SETTINGS)
def test_delta_roundtrip(vals, miniblocks):
    v = np.array(vals, dtype=np.int64)
    enc = delta.encode(v, miniblocks=miniblocks)
    got, used = delta.decode(enc)
    assert used == len(enc)
    assert np.array_equal(got, v)


@given(
    vals=st.lists(
        # run-heavy generator: each element repeated a random count
        st.tuples(st.integers(0, 1023), st.integers(1, 40)),
        min_size=0, max_size=40,
    )
)
@settings(**_SETTINGS)
def test_hybrid_rle_roundtrip_runs(vals):
    v = np.concatenate(
        [np.full(c, x, dtype=np.uint64) for x, c in vals]
    ) if vals else np.empty(0, dtype=np.uint64)
    nb = int(v.max()).bit_length() if v.size else 0
    enc = hybrid_rle.encode(v, nb)
    got = hybrid_rle.decode(enc, nb, len(v))
    assert np.array_equal(got, v)


@given(
    vals=arrays(
        dtype=np.int32,
        shape=st.integers(0, 500),
        elements=st.integers(-(2**31), 2**31 - 1),
    )
)
@settings(**_SETTINGS)
def test_for_pack_roundtrip_int32(vals):
    enc = for_pack.encode(vals)
    got = for_pack.decode(enc)
    assert np.array_equal(got, vals.astype(np.int64))


@given(
    vals=arrays(
        dtype=np.int64,
        shape=st.integers(1, 300),
        elements=st.integers(-(2**40), 2**40),
    )
)
@settings(**_SETTINGS)
def test_rle_codec_roundtrip(vals):
    got = _dec_rle(_enc_rle(vals))
    assert np.array_equal(got, vals)


@given(
    unscaled=st.lists(st.integers(-(2**126), 2**126 - 1), min_size=0, max_size=120),
    scale=st.integers(0, 10),
    with_nulls=st.booleans(),
)
@settings(**_SETTINGS)
def test_decimal_roundtrip_property(unscaled, scale, with_nulls):
    import decimal

    import pyarrow as pa

    from parquet2_ray.codecs.column import decode_array, encode_array

    t = pa.decimal128(38, scale)
    vals = [decimal.Decimal(u).scaleb(-scale) for u in unscaled]
    py = list(vals)
    if with_nulls and py:
        py[0] = None
    arr = pa.array(py, type=t)
    assert decode_array(encode_array("x", arr, "decimal")).equals(arr)


@given(data=st.binary(min_size=0, max_size=200), seed=st.integers(0, 2**64 - 1))
@settings(**_SETTINGS)
def test_xxh64_matches_scalar_reference(data, seed):
    from parquet2_ray.functions.xxh import xxh64
    from tests.test_xxh import _ref_xxh64

    assert xxh64(data, seed) == _ref_xxh64(data, seed)


@given(
    groups=st.lists(st.sampled_from(["a", "b", "c", ""]), min_size=0, max_size=300),
    weights=st.data(),
    target=st.integers(min_value=1, max_value=500),
)
@settings(**_SETTINGS)
def test_plan_split_partition_invariants(groups, weights, target):
    """Exchange core invariant: for ANY (group, weight) distribution the
    plan assigns every row exactly one partition id in range, and the
    split cores emit shards that partition the block losslessly."""
    import pyarrow as pa

    from parquet2_ray.pipelines.encode_pipeline import (
        EncodeOptions,
        _fold_plan,
        _light_stats,
        _part_ids,
        _split_core,
        _split_core_coarse,
    )

    n = len(groups)
    w = weights.draw(
        st.lists(st.integers(min_value=0, max_value=10_000),
                 min_size=n, max_size=n))
    tbl = pa.table({
        "source": pa.array(groups, type=pa.string()),
        "n_tok": pa.array(w, type=pa.int64()),
        "row_id": pa.array(list(range(n)), type=pa.int64()),
    })
    opts = EncodeOptions(group_col="source", weight_col="n_tok",
                         target_weight=target, target_rows=max(1, target))
    partials = _light_stats(tbl, "source", "n_tok").to_pylist()
    plan = _fold_plan(partials, opts)
    part = _part_ids(tbl, plan, "source", "n_tok")
    assert part.shape == (n,)
    assert (part >= 0).all() and (part < plan.n_parts).all()
    # flat split: every row lands in exactly one shard, ids preserved
    shards = _split_core(tbl, plan, "source", "n_tok", plan.n_parts)
    seen = []
    for s in shards:
        if s is not None:
            seen.extend(pa.ipc.open_stream(s).read_all()["row_id"].to_pylist())
    assert sorted(seen) == list(range(n))
    # coarse split: same invariant at group granularity
    fan = 3
    n_groups = -(-plan.n_parts // fan)
    coarse = _split_core_coarse(tbl, plan, "source", "n_tok", n_groups, fan)
    seen2 = []
    for s in coarse:
        if s is not None:
            t2 = pa.ipc.open_stream(s).read_all()
            seen2.extend(t2["row_id"].to_pylist())
            # fine part ids ride along and agree with the plan
            assert (np.asarray(t2["_part"]) // fan < n_groups).all()
    assert sorted(seen2) == list(range(n))


@given(
    st.lists(
        st.one_of(
            st.none(),
            st.lists(st.tuples(st.text(max_size=6),
                               st.one_of(st.none(),
                                         st.integers(-2**40, 2**40))),
                     max_size=5)),
        max_size=30),
)
@settings(max_examples=60, deadline=None)
def test_map_codec_roundtrip_property(rows):
    import pyarrow as pa

    from parquet2_ray.codecs import decode_array, encode_array

    # unique keys per map (parquet map semantics)
    clean = [None if r is None else list({k: v for k, v in r}.items())
             for r in rows]
    arr = pa.array(clean, type=pa.map_(pa.string(), pa.int64()))
    dec = decode_array(encode_array("m", arr, "map"))
    assert dec.equals(arr)


@given(
    st.lists(st.lists(st.integers(0, 2**31 - 1), max_size=20), max_size=25),
    st.integers(1, 17),
    st.booleans(),
)
@settings(max_examples=60, deadline=None)
def test_pack_token_arrays_property(arrays_, max_len, drop_last):
    import numpy as np

    from parquet2_ray.stages.packing import pack_token_arrays

    arrs = [np.array(a, np.int32) for a in arrays_]
    packed, n_real = pack_token_arrays(arrs, max_len, pad_id=-1,
                                       drop_last=drop_last)
    assert packed.shape[1] == max_len if packed.size else True
    flat = np.concatenate(arrs) if arrs else np.empty(0, np.int32)
    got = np.concatenate([packed[i, : n_real[i]]
                          for i in range(packed.shape[0])]) \
        if packed.shape[0] else np.empty(0, np.int32)
    if drop_last:
        assert (got == flat[: got.size]).all()     # prefix preserved
        assert flat.size - got.size < max_len      # at most one partial lost
    else:
        assert (got == flat).all()                 # every token, in order
    # padding never leaks into the real region
    assert all((packed[i, : n_real[i]] != -1).all() | (flat < 0).any()
               for i in range(packed.shape[0]))


@given(st.binary(max_size=4000), st.integers(16, 600))
@settings(max_examples=40, deadline=None)
def test_fsst_roundtrip_property(data, chunk):
    from parquet2_ray.codecs import fsst

    table = fsst.train(data[:1000])
    d = np.frombuffer(data, dtype=np.uint8)
    payload = fsst._encode_payload(table, d, chunk)
    enc = bytearray(table.serialize())
    from parquet2_ray.codecs.uleb import uleb_encode
    enc += uleb_encode(payload.size)
    enc += payload.tobytes()
    assert fsst.decode(bytes(enc)) == data
