"""Patched frame-of-reference (PFOR) codec tests.

Covers the wire-level kernels (``codecs/pfor.py``), the column-layer
integration (nulls, slices, temporal types), selector behavior on the
skewed token-id distributions PFOR exists for, and size guarantees vs
plain FOR+bitpack.  Complements the reference's bitpacked tests
(/root/reference/src/encoding/bitpacked/mod.rs tests) with the
exception-patch semantics the reference has no analog of.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra import numpy as hnp

from parquet2_ray.codecs import column as col
from parquet2_ray.codecs import for_pack, pfor
from parquet2_ray.functions.selector import candidate_sizes, select_codec


def _rt(v: np.ndarray) -> None:
    out = pfor.decode(pfor.encode(v))
    assert out.dtype == np.int64
    assert np.array_equal(out, np.asarray(v).astype(np.int64))


# ------------------------------------------------------------- wire level
def test_empty_and_singleton():
    _rt(np.array([], dtype=np.int32))
    _rt(np.array([42], dtype=np.int32))
    _rt(np.array([-42], dtype=np.int64))


def test_constant_and_two_level():
    _rt(np.zeros(999, dtype=np.int64))
    _rt(np.full(1000, -7, dtype=np.int16))
    # one extreme outlier: the patch arm must carry it alone
    v = np.zeros(100_001, dtype=np.int64)
    v[50_000] = 2**62
    buf = pfor.encode(v)
    _rt(v)
    # the outlier must not force 62-bit main-lane packing
    assert len(buf) < 100_001 // 4


def test_int32_full_range_and_int64_extremes():
    _rt(np.array([-(2**31), 2**31 - 1], dtype=np.int32))
    _rt(np.array([-(2**63), 2**63 - 1, 0], dtype=np.int64))


def test_zipf_shapes_beat_for_bitpack():
    rng = np.random.default_rng(11)
    v = np.minimum(rng.zipf(1.25, 200_000) - 1, 9_999).astype(np.int32)
    p = pfor.encode(v)
    f = for_pack.encode(v)
    _rt(v)
    # the codec's reason to exist: ≥30% smaller than plain FOR on a
    # Zipf token stream (measured ~9.3 vs 14 bits/token)
    assert len(p) < 0.7 * len(f)


def test_uniform_degenerates_to_plain_arm():
    rng = np.random.default_rng(3)
    v = rng.integers(0, 50_257, 100_000).astype(np.int32)
    p = pfor.encode(v)
    f = for_pack.encode(v)
    # uniform has no patchable tail: sizes within a percent
    assert len(p) <= len(f) * 1.01
    _rt(v)


def test_position_list_vs_bitmap_arms():
    # sparse exceptions → packed position list wins
    v = np.zeros(100_000, dtype=np.int64)
    idx = np.arange(0, 100_000, 5000)
    v[idx] = 1_000_000
    _rt(v)
    # dense exceptions → bitmap wins
    rng = np.random.default_rng(5)
    d = np.where(rng.random(50_000) < 0.4,
                 rng.integers(1 << 10, 1 << 14, 50_000),
                 rng.integers(0, 64, 50_000)).astype(np.int64)
    _rt(d)


def test_depth_cap_terminates_on_pathological_cascade():
    # widths spread so every level wants another patch level
    rng = np.random.default_rng(9)
    v = (2 ** rng.integers(0, 62, 20_000)).astype(np.int64)
    _rt(v)


@settings(deadline=None, max_examples=60)
@given(
    vals=hnp.arrays(
        dtype=np.int64,
        shape=st.integers(0, 400),
        elements=st.integers(-(2**62), 2**62),
    )
)
def test_pfor_roundtrip_property_int64(vals):
    _rt(vals)


@settings(deadline=None, max_examples=60)
@given(
    vals=hnp.arrays(
        dtype=np.int32,
        shape=st.integers(0, 400),
        elements=st.integers(-(2**31), 2**31 - 1),
    ),
    zipf=st.booleans(),
)
def test_pfor_roundtrip_property_int32(vals, zipf):
    if zipf and len(vals):
        vals = np.abs(vals) % 257  # skew into the patch-profitable regime
    _rt(vals)


# ------------------------------------------------------------ column layer
def test_column_roundtrip_with_nulls(rng):
    v = np.minimum(rng.zipf(1.3, 4000) - 1, 9999).astype(np.int32)
    mask = rng.random(4000) < 0.15
    arr = pa.array(v, mask=mask)
    enc = col.encode_array("tokens", arr, "pfor")
    out = col.decode_array(enc)
    assert out.equals(arr)


def test_column_roundtrip_sliced(rng):
    base = pa.array(np.minimum(rng.zipf(1.3, 3000) - 1, 999).astype(np.int64))
    enc = col.encode_array("c", base.slice(137, 2000), "pfor")
    assert col.decode_array(enc).equals(base.slice(137, 2000))


def test_column_roundtrip_temporal():
    ts = pa.array([0, 10**15, None, 3], type=pa.timestamp("us"))
    enc = col.encode_array("ts", ts, "pfor")
    assert col.decode_array(enc).equals(ts)


# ---------------------------------------------------------------- selector
def test_selector_picks_pfor_on_zipf_tokens(rng):
    v = np.minimum(rng.zipf(1.25, 60_000) - 1, 9_999).astype(np.int32)
    arr = pa.array(v)
    assert select_codec(arr) == "pfor"
    sizes = candidate_sizes(arr)
    assert sizes["pfor"] < sizes["for_bitpack"]


def test_selector_keeps_for_bitpack_on_uniform(rng):
    v = rng.integers(0, 50_257, 60_000).astype(np.int32)
    arr = pa.array(v)
    # ties break toward the simpler built-in
    assert select_codec(arr) in ("for_bitpack", "rle")
