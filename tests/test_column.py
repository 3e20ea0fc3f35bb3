"""Column-layer tests: pyarrow.Array ↔ EncodedColumn, codec selection."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from parquet2_ray.codecs import column as col
from parquet2_ray.functions.selector import candidate_sizes, select_codec


def _roundtrip(arr: pa.Array, codec: str) -> pa.Array:
    enc = col.encode_array("c", arr, codec)
    out = col.decode_array(enc)
    assert out.type == arr.type
    assert out.equals(arr), f"{codec} roundtrip mismatch"
    return out


INT_CODECS = ["plain", "for_bitpack", "pfor", "delta_binary_packed",
              "dict_rle", "rle"]
STR_CODECS = [
    "plain_byte_array",
    "delta_length_byte_array",
    "delta_byte_array",
    "dict_binary",
    "fsst",
]


@pytest.mark.parametrize("codec", INT_CODECS)
def test_int_column_roundtrip(codec, rng):
    arr = pa.array(rng.integers(-500, 500, 2000), type=pa.int64())
    _roundtrip(arr, codec)


@pytest.mark.parametrize("codec", INT_CODECS)
def test_int32_column_roundtrip(codec, rng):
    arr = pa.array(rng.integers(0, 50257, 2000).astype(np.int32))
    _roundtrip(arr, codec)


@pytest.mark.parametrize("codec", INT_CODECS)
def test_int_column_with_nulls(codec, rng):
    v = rng.integers(0, 100, 500).astype(np.int64)
    mask = rng.random(500) < 0.2
    arr = pa.array(v, mask=mask)
    _roundtrip(arr, codec)


def test_all_null_column():
    arr = pa.array([None, None, None], type=pa.int64())
    _roundtrip(arr, "plain")


@pytest.mark.parametrize("codec", STR_CODECS)
def test_string_column_roundtrip(codec, rng):
    pool = ["web", "code", "books", "wiki", "", "a-much-longer-category-name"]
    arr = pa.array([pool[i] for i in rng.integers(0, len(pool), 1500)])
    _roundtrip(arr, codec)


@pytest.mark.parametrize("codec", STR_CODECS)
def test_string_column_with_nulls(codec, rng):
    pool = ["alpha", "beta", "", "gamma-delta"]
    vals = [pool[i] if rng.random() > 0.15 else None for i in rng.integers(0, 4, 800)]
    arr = pa.array(vals, type=pa.string())
    _roundtrip(arr, codec)


def test_temporal_columns_roundtrip():
    ts = pa.array([1, 2, 3_000_000, None], type=pa.timestamp("us"))
    for codec in INT_CODECS:
        _roundtrip(ts, codec)
    d32 = pa.array([10, 20, None, 40], type=pa.date32())
    _roundtrip(d32, "plain")
    _roundtrip(d32, "for_bitpack")


def test_float_plain_roundtrip(rng):
    arr = pa.array(rng.normal(size=1000), type=pa.float64())
    _roundtrip(arr, "plain")
    arr32 = pa.array(rng.normal(size=1000).astype(np.float32), type=pa.float32())
    _roundtrip(arr32, "plain")


def test_bool_bitmap_roundtrip(rng):
    arr = pa.array(rng.random(999) < 0.5)
    _roundtrip(arr, "bitmap")


def test_list_int32_roundtrip(tokens_table):
    arr = tokens_table["tokens"].combine_chunks()
    _roundtrip(arr, "list")


def test_list_float_roundtrip(rng):
    vals = [rng.normal(size=8).astype(np.float32).tolist() for _ in range(100)]
    arr = pa.array(vals, type=pa.list_(pa.float32()))
    _roundtrip(arr, "list")


def test_list_with_nulls_and_empties(rng):
    vals = [[1, 2, 3], [], None, [7], [5] * 50, None, list(range(100))]
    arr = pa.array(vals, type=pa.list_(pa.int32()))
    _roundtrip(arr, "list")


def test_empty_arrays():
    for t, codec in [
        (pa.int64(), "plain"),
        (pa.string(), "delta_length_byte_array"),
        (pa.list_(pa.int32()), "list"),
    ]:
        arr = pa.array([], type=t)
        _roundtrip(arr, codec)


def test_sliced_array_roundtrip(rng):
    base = pa.array(rng.integers(0, 100, 1000), type=pa.int64())
    _roundtrip(base.slice(100, 500), "for_bitpack")
    s = pa.array([f"doc-{i}" for i in range(1000)])
    _roundtrip(s.slice(37, 400), "delta_length_byte_array")


# ------------------------------------------------------------------ selector
def test_selector_narrow_range_picks_bitpack_family(rng):
    arr = pa.array(rng.integers(100, 357, 5000).astype(np.int32))
    assert select_codec(arr) in ("for_bitpack", "rle", "dict_rle", "pfor")
    sizes = candidate_sizes(arr)
    assert sizes["for_bitpack"] < sizes["plain"] / 2


def test_selector_sorted_picks_delta(rng):
    arr = pa.array(np.cumsum(rng.integers(0, 5, 5000)).astype(np.int64))
    choice = select_codec(arr)
    assert choice == "delta_binary_packed"


def test_selector_runs_pick_rle():
    v = np.repeat(np.arange(50), 200)  # 50 runs of 200
    arr = pa.array(v, type=pa.int64())
    assert select_codec(arr) in ("rle", "delta_binary_packed")
    sizes = candidate_sizes(arr)
    assert sizes["rle"] < sizes["for_bitpack"] / 4


def test_selector_low_cardinality_strings_pick_dict(rng):
    pool = ["web", "code", "books", "wiki"]
    arr = pa.array([pool[i] for i in rng.integers(0, 4, 4000)])
    assert select_codec(arr) == "dict_binary"


def test_selector_sorted_prefixed_keys_pick_front_coding():
    arr = pa.array([f"books/0001/doc-{i:08d}" for i in range(4000)])
    assert select_codec(arr) == "delta_byte_array"


def test_selector_float_and_bool():
    # decimal-looking floats price smallest under ALP (15, 25 at k=1
    # pack to a couple of bytes vs 16 raw)
    assert select_codec(pa.array([1.5, 2.5])) == "alp"
    # true high-entropy reals must NOT pick classic ALP
    rng = np.random.default_rng(7)
    assert select_codec(pa.array(rng.standard_normal(4000))) in (
        "plain", "byte_stream_split", "alp_rd")
    assert select_codec(pa.array([True, False])) == "bitmap"


def test_selector_deterministic(rng):
    arr = pa.array(rng.integers(0, 1000, 3000), type=pa.int64())
    assert select_codec(arr) == select_codec(arr)


# ------------------------------------------------------- struct / fixed-len


def _mk_flba(rng, n=400, k=16, card=None, nulls=False):
    if card:
        pool = [bytes(rng.integers(0, 256, k, dtype=np.uint8)) for _ in range(card)]
        vals = [pool[int(i)] for i in rng.integers(0, card, n)]
    else:
        vals = [bytes(rng.integers(0, 256, k, dtype=np.uint8)) for _ in range(n)]
    if nulls:
        vals = [None if i % 7 == 0 else v for i, v in enumerate(vals)]
    return pa.array(vals, type=pa.binary(k))


@pytest.mark.parametrize("codec", ["plain_flba", "dict_flba"])
def test_flba_roundtrip(codec, rng):
    _roundtrip(_mk_flba(rng), codec)
    _roundtrip(_mk_flba(rng, card=5), codec)
    _roundtrip(_mk_flba(rng, nulls=True), codec)
    _roundtrip(pa.array([], type=pa.binary(8)), codec)


def test_flba_trailing_nul_slots_survive_dict(rng):
    # numpy 'S' dtype would strip trailing NULs — the void-view must not
    vals = [b"ab\x00\x00", b"ab\x00\x01", b"ab\x00\x00", None]
    _roundtrip(pa.array(vals, type=pa.binary(4)), "dict_flba")
    _roundtrip(pa.array(vals, type=pa.binary(4)), "plain_flba")


def test_flba_selector(rng):
    assert select_codec(_mk_flba(rng, card=4)) == "dict_flba"
    assert select_codec(_mk_flba(rng, n=9000)) == "plain_flba"


def test_flba_sliced(rng):
    a = _mk_flba(rng, n=100)
    _roundtrip(a.slice(13, 50), "plain_flba")
    _roundtrip(a.slice(13, 50), "dict_flba")


STRUCT_T = pa.struct([("a", pa.int32()), ("b", pa.string()),
                      ("c", pa.list_(pa.int64()))])


def _mk_struct(n=300):
    vals = [
        None if i % 11 == 0 else
        {"a": None if i % 5 == 0 else i,
         "b": None if i % 3 == 0 else f"s{i % 17}",
         "c": None if i % 7 == 0 else list(range(i % 4))}
        for i in range(n)
    ]
    return pa.array(vals, type=STRUCT_T)


def test_struct_roundtrip():
    _roundtrip(_mk_struct(), "struct")
    assert select_codec(_mk_struct()) == "struct"


def test_struct_empty_and_all_null():
    _roundtrip(pa.array([], type=STRUCT_T), "struct")
    _roundtrip(pa.array([None, None], type=STRUCT_T), "struct")


def test_nested_struct_list_combinations():
    s = _mk_struct(60)
    ls = pa.array([s[:3].to_pylist(), None, [], s[4:6].to_pylist()] * 20,
                  type=pa.list_(STRUCT_T))
    _roundtrip(ls, "list")
    outer = pa.StructArray.from_arrays(
        [ls, pa.array(range(80), type=pa.int64())], names=["inner", "k"])
    _roundtrip(outer, "struct")


def test_struct_type_grammar():
    for t in (pa.binary(16), STRUCT_T, pa.list_(STRUCT_T),
              pa.struct([("weird,name<>", pa.binary(3))])):
        assert col.str_to_type(col.type_to_str(t)) == t


def test_arbitrary_nesting_depth_roundtrips():
    """Arbitrary group trees (VERDICT missing #1; reference
    schema_descriptor.rs:100-144 builds per-leaf def/rep levels for any
    depth) — recursion over list/struct/decimal handles every combo."""
    import decimal

    import pyarrow as pa

    from parquet2_ray.codecs.column import decode_array, encode_array
    from parquet2_ray.functions.selector import select_codec

    cases = [
        pa.array([[[1, 2], [3]], None, [[], [4, 5, 6]], [[7]]],
                 type=pa.list_(pa.list_(pa.int32()))),
        pa.array(
            [{"a": {"x": 1, "y": "p"}, "b": 2.5}, None,
             {"a": {"x": None, "y": "q"}, "b": None}],
            type=pa.struct([("a", pa.struct([("x", pa.int32()),
                                             ("y", pa.string())])),
                            ("b", pa.float64())])),
        pa.array([[{"k": 1, "v": "a"}, {"k": 2, "v": "b"}], [], None,
                  [{"k": None, "v": None}]],
                 type=pa.list_(pa.struct([("k", pa.int64()),
                                          ("v", pa.string())]))),
        pa.array([{"xs": [1, 2, 3], "n": "a"}, {"xs": None, "n": None}, None],
                 type=pa.struct([("xs", pa.list_(pa.int64())),
                                 ("n", pa.string())])),
        pa.array([[decimal.Decimal("1.25")], None, []],
                 type=pa.list_(pa.decimal128(10, 2))),
    ]
    for arr in cases:
        col = encode_array("x", arr, select_codec(arr))
        assert decode_array(col).equals(arr), arr.type


def test_register_custom_codec():
    """User-extension surface (SURVEY.md §2.9): a consumer-supplied
    codec competes in the auto-selector and round-trips."""
    import numpy as np
    import pyarrow as pa

    from parquet2_ray.codecs.column import (
        decode_array,
        encode_array,
        register_codec,
    )
    from parquet2_ray.functions.selector import select_codec

    def xor_enc(v: np.ndarray) -> bytes:
        x = (v.astype(np.int64) ^ 0x55).astype("<i8")
        return x.tobytes()

    def xor_dec(body: bytes, arrow_type: str, n: int) -> np.ndarray:
        return np.frombuffer(body, dtype="<i8") ^ 0x55

    register_codec("xor_plain", "numeric", xor_enc, xor_dec)
    arr = pa.array([1, 2, None, 4], type=pa.int64())
    col = encode_array("x", arr, "xor_plain")
    assert col.codec == "xor_plain"
    assert decode_array(col).equals(arr)
    # the selector now sees it as a candidate (constant 8B/value loses to
    # rle here, but it must be priced)
    from parquet2_ray.functions.selector import candidate_sizes

    sizes = candidate_sizes(pa.array(range(1000), type=pa.int64()))
    assert "xor_plain" in sizes
    assert select_codec(pa.array(range(1000), type=pa.int64())) != "xor_plain"


# ---- map logical type (reference parquet_bridge.rs:505-508) ----

def _map_cases():
    import pyarrow as pa
    return [
        pa.array([[("a", 1), ("b", 2)], None, [], [("c", None)]],
                 type=pa.map_(pa.string(), pa.int64())),
        pa.array([], type=pa.map_(pa.string(), pa.float64())),
        pa.array([[(1, "x")], [(2, "y"), (3, None)]],
                 type=pa.map_(pa.int32(), pa.string())),
        pa.array([None, None], type=pa.map_(pa.string(), pa.int64())),
        pa.array([[("a", [1, 2])], None],
                 type=pa.map_(pa.string(), pa.list_(pa.int64()))),
    ]


def test_map_roundtrips():
    from parquet2_ray.codecs import decode_array, encode_array
    from parquet2_ray.functions.selector import select_codec

    for arr in _map_cases():
        codec = select_codec(arr)
        assert codec == "map"
        dec = decode_array(encode_array("m", arr, codec))
        assert dec.equals(arr), arr.type


def test_map_sliced_and_keys_sorted():
    import pyarrow as pa

    from parquet2_ray.codecs import decode_array, encode_array

    big = pa.array([[(f"k{i}", i)] for i in range(100)],
                   type=pa.map_(pa.string(), pa.int64()))
    sl = big.slice(10, 50)
    dec = decode_array(encode_array("m", sl, "map"))
    assert dec.equals(pa.array(sl.to_pylist(), type=sl.type))

    t = pa.map_(pa.string(), pa.int64(), keys_sorted=True)
    arr = pa.array([[("a", 1), ("b", 2)]], type=t)
    dec = decode_array(encode_array("m", arr, "map"))
    assert dec.type.equals(t) and dec.equals(arr)


def test_map_type_grammar():
    import pyarrow as pa

    from parquet2_ray.codecs.column import str_to_type, type_to_str

    for t in [pa.map_(pa.string(), pa.int64()),
              pa.map_(pa.int32(), pa.list_(pa.float64())),
              pa.map_(pa.string(), pa.struct([("x", pa.int64())])),
              pa.map_(pa.string(), pa.int64(), keys_sorted=True)]:
        assert str_to_type(type_to_str(t)).equals(t)
