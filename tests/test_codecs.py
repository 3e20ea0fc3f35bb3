"""Codec kernel tests — roundtrips + golden vectors from the reference.

Golden byte strings are taken from the reference's inline tests (cited
per case) so our wire format is independently validated, exactly as the
reference validated against pyarrow/spark dumps (SURVEY.md §5).
"""

from __future__ import annotations

import numpy as np
import pytest

from parquet2_ray.codecs import (
    bitpack,
    byte_array,
    delta,
    dictionary,
    for_pack,
    fsst,
    hybrid_rle,
    plain,
    uleb,
)


# ---------------------------------------------------------------- uleb/zigzag
def test_uleb_golden():
    # /root/reference/src/encoding/uleb128.rs:47-97 — 624485 → [0xE5,0x8E,0x26]
    assert uleb.uleb_encode(624485) == bytes([0xE5, 0x8E, 0x26])
    assert uleb.uleb_decode(bytes([0xE5, 0x8E, 0x26])) == (624485, 3)


@pytest.mark.parametrize("v", [0, 1, 127, 128, 255, 2**32, 2**64 - 1])
def test_uleb_roundtrip(v):
    assert uleb.uleb_decode(uleb.uleb_encode(v))[0] == v


@pytest.mark.parametrize("v", [0, -1, 1, -2, 2, 2**62, -(2**62), 2**63 - 1, -(2**63)])
def test_zigzag_roundtrip(v):
    assert uleb.zigzag_decode(uleb.zigzag_encode(v)) == v


def test_zigzag_mapping():
    # 0,-1,1,-2 → 0,1,2,3
    assert [uleb.zigzag_encode(v) for v in [0, -1, 1, -2]] == [0, 1, 2, 3]


# ------------------------------------------------------------------- bitpack
def test_bitpack_golden_3bits():
    # /root/reference/src/encoding/bitpacked/mod.rs:172-219:
    # 0..8 at 3 bits → [0b10001000, 0b11000110, 0b11111010]
    out = bitpack.pack(np.arange(8, dtype=np.uint64), 3)
    assert out == bytes([0b10001000, 0b11000110, 0b11111010])
    back = bitpack.unpack(out, 3, 8)
    assert back.tolist() == list(range(8))


@pytest.mark.parametrize("num_bits", [1, 2, 3, 5, 7, 8, 13, 17, 31, 32, 47, 64])
@pytest.mark.parametrize("n", [1, 7, 8, 31, 32, 33, 1000])
def test_bitpack_roundtrip(num_bits, n, rng):
    hi = (1 << num_bits) - 1
    v = rng.integers(0, hi + 1 if hi < 2**63 else 2**63, n).astype(np.uint64)
    if num_bits == 64:
        v[0] = 2**64 - 1
    out = bitpack.pack(v, num_bits)
    assert bitpack.unpack(out, num_bits, n).tolist() == v.tolist()


def test_bitpack_truncates_wide_values():
    out = bitpack.pack(np.array([0b1111], dtype=np.uint64), 2)
    assert bitpack.unpack(out, 2, 1)[0] == 0b11


def test_bitpack_errors():
    # /root/reference/src/encoding/bitpacked/decode.rs:199-211 error table
    assert bitpack.unpack(b"", 1, 0).size == 0
    with pytest.raises(ValueError):
        bitpack.unpack(b"", 1, 8)
    with pytest.raises(ValueError):
        bitpack.unpack(b"\xff", 0, 8)


# ---------------------------------------------------------------- hybrid RLE
def test_hybrid_rle_bitpacked_roundtrip():
    # mirrors /root/reference/src/encoding/hybrid_rle/mod.rs:140-221
    # (0..1000) % 512 at 10 bits — pure bitpacked arm
    v = (np.arange(1000) % 512).astype(np.uint64)
    out = hybrid_rle.encode(v, 10)
    assert hybrid_rle.decode(out, 10, 1000).tolist() == v.tolist()


def test_hybrid_rle_run_arm():
    # long runs → RLE arm must be emitted and decode correctly
    v = np.concatenate(
        [np.full(100, 7), np.arange(13), np.full(50, 3), np.arange(5)]
    ).astype(np.uint64)
    out = hybrid_rle.encode(v, 5)
    assert hybrid_rle.decode(out, 5, len(v)).tolist() == v.tolist()
    # pure bitpacked encoding of the same data is larger
    pure = bytearray()
    pure += uleb.uleb_encode(((len(v) + 7) // 8 << 1) | 1)
    assert len(out) < len(pure) + (len(v) * 5 + 7) // 8


def test_hybrid_rle_decode_reference_run_semantics():
    # RLE run: header = run_len << 1, value in ceil8(bits) bytes
    # (/root/reference/src/encoding/hybrid_rle/decoder.rs:48-63)
    buf = uleb.uleb_encode(10 << 1) + bytes([9])  # 10 × value 9 at ≤8 bits
    assert hybrid_rle.decode(buf, 4, 10).tolist() == [9] * 10


def test_hybrid_rle_empty_and_zero_bits():
    # /root/reference/src/encoding/hybrid_rle/mod.rs:238-263
    assert hybrid_rle.decode(b"", 1, 5).tolist() == [0] * 5  # empty → zeros
    assert hybrid_rle.decode(b"", 0, 4).tolist() == [0] * 4  # 0 bits → zeros
    assert hybrid_rle.encode(np.zeros(8, dtype=np.uint64), 0) == b""


def test_hybrid_rle_single_value():
    v = np.array([3], dtype=np.uint64)
    out = hybrid_rle.encode(v, 2)
    assert hybrid_rle.decode(out, 2, 1).tolist() == [3]


def test_hybrid_rle_segmentation_branches():
    # encode() picks a segmentation strategy from the repeat count
    # (none-possible / sparse-repeats / dense-changes); all three must
    # produce the same stream, exercised around the 2*MIN_RLE_RUN
    # profitability threshold at start/middle/end positions
    M = 2 * hybrid_rle.MIN_RLE_RUN
    base = (np.arange(100) % 97 + 100).astype(np.uint64)  # run-free filler
    for d in (-1, 0, 1):
        run = np.full(M + d, 7, dtype=np.uint64)
        for v in (
            np.concatenate([run, base]),          # sparse-repeats branch
            np.concatenate([base, run, base]),
            np.concatenate([base, run]),
            np.concatenate([run, run + 1, base]), # adjacent distinct runs
            np.repeat(base[: M + d], M),          # dense-changes branch
            base,                                 # no long run possible
        ):
            nb = int(v.max()).bit_length()
            out = hybrid_rle.encode(v, nb)
            assert hybrid_rle.decode(out, nb, len(v)).tolist() == v.tolist()


def test_hybrid_rle_many_runs_array_path_matches_loop():
    # >24 profitable runs dispatch to the vectorized array emitter;
    # its stream must be byte-identical to the generic segment loop,
    # which is pinned here by rebuilding the exact expected stream from
    # the decoder-visible segment grammar on curated shapes: adjacent
    # runs covering the whole column (no bit-packed spans at all), runs
    # at position 0 and at the very end, and unaligned gaps that force
    # alignment steals.
    rng = np.random.default_rng(5)
    shapes = [
        np.repeat(np.arange(40, dtype=np.uint64), 16),  # 40 adjacent runs
        np.concatenate([np.full(17, 9, dtype=np.uint64)] + [
            np.concatenate([rng.integers(0, 90, 13).astype(np.uint64),
                            np.full(16 + int(k % 5), int(k), dtype=np.uint64)])
            for k in range(30)
        ]),                                             # 31 runs, odd gaps
        np.concatenate([rng.integers(100, 900, 11).astype(np.uint64)] + [
            np.full(21, int(k), dtype=np.uint64) for k in range(26)
        ]),                                             # run to the very end
    ]
    for v in shapes:
        nb = int(v.max()).bit_length()
        out = hybrid_rle.encode(v, nb)
        assert hybrid_rle.decode(out, nb, len(v)).tolist() == v.tolist()
        # grammar walk: the stream must consume exactly and alternate
        # well-formed headers (catches off-by-one header/payload splits
        # that a lenient decoder would forgive via implicit zeros)
        pos, seen = 0, 0
        while pos < len(out):
            header, pos = uleb.uleb_decode(out, pos)
            if header & 1:
                pos += (header >> 1) * nb
            else:
                pos += (nb + 7) // 8
                assert (header >> 1) >= hybrid_rle.MIN_RLE_RUN
            seen += 1
        assert pos == len(out) and seen >= 3


def test_bitpack_byte_multiple_fast_path_matches_bit_layout():
    # widths 8/16/24/32/40: the fast path must produce the exact
    # LSB-first stream the generic shift/OR formulation defines —
    # cross-checked against an unpackbits-based reference packer
    rng = np.random.default_rng(11)
    for w in (8, 16, 24, 32, 40):
        v = rng.integers(0, 1 << min(w, 48), 257).astype(np.uint64)
        got = bitpack.pack(v, w)
        bits = np.zeros((v.size, w), dtype=np.uint8)
        for b in range(w):
            bits[:, b] = (v >> np.uint64(b)) & np.uint64(1)
        ref = np.packbits(bits.reshape(-1), bitorder="little").tobytes()
        assert got == ref[: len(got)] and len(got) == v.size * w // 8
        back = bitpack.unpack(got, w, v.size)
        assert (back == (v & np.uint64((1 << w) - 1))).all()
    # misaligned ndarray input: the zero-copy view can't reinterpret a
    # slice whose start isn't container-aligned — must still decode
    v = np.arange(100, dtype=np.uint64) * 3
    p = bitpack.pack(v, 16)
    arr = np.frombuffer(b"x" + p, dtype=np.uint8)[1:]
    assert (bitpack.unpack(arr, 16, 100) == v).all()
    # mutable inputs must yield a fresh writable result (no aliasing of
    # a caller's reusable read buffer); only bytes input may be a
    # read-only zero-copy view
    ba = bytearray(p)
    u = bitpack.unpack(ba, 16, 100, dtype=np.uint16)
    u += 1
    ba[0] ^= 0xFF
    assert u[0] == v[0] + 1 and u[1] == v[1] + 1


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_hybrid_rle_mixed_fuzz(seed):
    rng = np.random.default_rng(seed)
    parts = []
    for _ in range(30):
        if rng.random() < 0.5:
            parts.append(np.full(int(rng.integers(1, 200)), int(rng.integers(0, 100))))
        else:
            parts.append(rng.integers(0, 100, int(rng.integers(1, 50))))
    v = np.concatenate(parts).astype(np.uint64)
    out = hybrid_rle.encode(v, 7)
    assert hybrid_rle.decode(out, 7, len(v)).tolist() == v.tolist()


# ---------------------------------------------------- DELTA_BINARY_PACKED
def test_delta_golden():
    # /root/reference/src/encoding/delta_bitpacked/encoder.rs:84-99:
    # [1,2,3,4,5] → [128,1, 1, 5, 2, 2, 0]
    out = delta.encode(np.array([1, 2, 3, 4, 5]))
    assert out == bytes([128, 1, 1, 5, 2, 2, 0])
    vals, consumed = delta.decode(out)
    assert vals.tolist() == [1, 2, 3, 4, 5]
    assert consumed == 7


def test_delta_negative_min_delta():
    # /root/reference/src/encoding/delta_bitpacked/encoder.rs:101-125
    v = [1, 2, 3, 4, -1, -2, -3, -4, -5]
    out = delta.encode(np.array(v))
    vals, _ = delta.decode(out)
    assert vals.tolist() == v


@pytest.mark.parametrize(
    "v",
    [
        [],
        [0],
        [7],
        [-100],
        list(range(1000)),
        list(range(1000, 0, -1)),
        [2**62, -(2**62), 0, 2**63 - 1, -(2**63)],
    ],
)
def test_delta_roundtrip(v):
    out = delta.encode(np.array(v, dtype=np.int64))
    vals, _ = delta.decode(out)
    assert vals.tolist() == v


def test_delta_roundtrip_random(rng):
    v = rng.integers(-(2**40), 2**40, 10_000)
    vals, _ = delta.decode(delta.encode(v))
    assert vals.tolist() == v.tolist()


# ------------------------------------------------------------- byte arrays
def _od(strings: list[bytes]):
    offsets = np.zeros(len(strings) + 1, dtype=np.int64)
    np.cumsum([len(s) for s in strings], out=offsets[1:])
    data = np.frombuffer(b"".join(strings), dtype=np.uint8)
    return offsets, data


def _strings(offsets, data):
    b = data.tobytes()
    return [b[offsets[i] : offsets[i + 1]] for i in range(len(offsets) - 1)]


def test_delta_length_golden():
    # reference encoder uses miniblocks=1
    # (/root/reference/src/encoding/delta_bitpacked/encoder.rs:13):
    # lengths [5,5] → header [128,1,1,2,10] + block [0,0], then raw bytes
    o, d = _od([b"Hello", b"World"])
    out = byte_array.delta_length_encode(o, d)
    assert out == bytes([128, 1, 1, 2, 10, 0, 0]) + b"HelloWorld"
    oo, dd = byte_array.delta_length_decode(out, 2)
    assert _strings(oo, dd) == [b"Hello", b"World"]


def test_delta_length_decode_4_miniblock_layout():
    # parquet-format doc example for DELTA_LENGTH_BYTE_ARRAY uses 4
    # miniblocks per block — our decoder must read that layout too
    buf = bytes([128, 1, 4, 2, 10, 0, 0, 0, 0, 0]) + b"HelloWorld"
    oo, dd = byte_array.delta_length_decode(buf, 2)
    assert _strings(oo, dd) == [b"Hello", b"World"]


@pytest.mark.parametrize("codec", ["plain", "delta_length", "delta_ba"])
@pytest.mark.parametrize(
    "strings",
    [
        [],
        [b""],
        [b"", b"", b""],
        [b"a"],
        [b"Hello", b"World"],
        [b"Hello", b"Helicopter", b"Help", b"Hels", b"Hels"],
        [f"web/{i:04d}/doc-{i:08d}".encode() for i in range(500)],
        [b"\x00\x01", b"\x00\x01\x02", b"\xff" * 40],
    ],
)
def test_byte_array_roundtrips(codec, strings):
    o, d = _od(strings)
    if codec == "plain":
        out = byte_array.plain_encode(o, d)
        oo, dd = byte_array.plain_decode(out, len(strings))
    elif codec == "delta_length":
        out = byte_array.delta_length_encode(o, d)
        oo, dd = byte_array.delta_length_decode(out, len(strings))
    else:
        out = byte_array.delta_ba_encode(o, d)
        oo, dd = byte_array.delta_ba_decode(out, len(strings))
    assert _strings(oo, dd) == strings


def test_delta_ba_prefix_compression_wins_on_sorted_keys():
    strings = [f"source/shard/doc-{i:08d}".encode() for i in range(1000)]
    o, d = _od(strings)
    dba = byte_array.delta_ba_encode(o, d)
    dl = byte_array.delta_length_encode(o, d)
    assert len(dba) < len(dl) / 2  # front coding strips the shared prefixes


# ------------------------------------------------------------- dictionary
def test_dictionary_int_roundtrip(rng):
    v = rng.choice([3, 17, 99, -5, 2**40], 5000)
    out = dictionary.encode_int(v)
    assert dictionary.decode_int(out).tolist() == v.tolist()
    assert len(out) < 5000  # low cardinality → far below 8B/value


def test_dictionary_binary_roundtrip(rng):
    pool = [b"web", b"code", b"books", b"wiki"]
    strings = [pool[i] for i in rng.integers(0, 4, 3000)]
    o, d = _od(strings)
    out = dictionary.encode_binary(o, d)
    oo, dd = dictionary.decode_binary(out)
    assert _strings(oo, dd) == strings
    assert len(out) < sum(map(len, strings)) // 4


# ---------------------------------------------------------------- for_pack
@pytest.mark.parametrize(
    "v",
    [
        [],
        [42],
        [100, 101, 356, 200],
        [-50, -20, -50],
        [7] * 100,
        list(range(-1000, 1000)),
    ],
)
def test_for_pack_roundtrip(v):
    out = for_pack.encode(np.array(v, dtype=np.int64))
    assert for_pack.decode(out).tolist() == v


def test_for_pack_narrow_range_is_small(rng):
    v = rng.integers(100, 357, 10_000)  # 257 distinct → 9 bits
    out = for_pack.encode(v)
    assert len(out) < 10_000 * 9 / 8 + 64


# -------------------------------------------------------------------- plain
def test_plain_roundtrip(rng):
    for dt in ["int32", "int64", "float32", "float64"]:
        v = rng.integers(-1000, 1000, 100).astype(dt)
        out = plain.encode(v)
        assert plain.decode(out, dt if dt in ("int32", "int64") else {"float32": "float32", "float64": "float64"}[dt], 100).tolist() == v.tolist()


# --------------------------------------------------------------------- fsst
def test_fsst_roundtrip():
    data = (b"http://example.com/page/" * 50) + b"tail-bytes\x00\xff"
    table = fsst.train(data)
    out = fsst.encode(table, data)
    assert fsst.decode(out) == data
    assert len(out) < len(data)  # repetitive input must compress


def test_fsst_empty_and_incompressible(rng):
    assert fsst.decode(fsst.encode(fsst.train(b""), b"")) == b""
    noise = rng.integers(0, 256, 2000).astype(np.uint8).tobytes()
    table = fsst.train(noise)
    assert fsst.decode(fsst.encode(table, noise)) == noise


# ------------------------------------------------------- byte_stream_split
def test_bss_roundtrip_dtypes(rng):
    from parquet2_ray.codecs import byte_stream_split as bss

    for dt in ["float32", "float64", "int32", "int64", "uint32",
               "int8", "int16", "uint8", "uint16"]:
        v = rng.integers(-1000, 1000, 1000).astype(dt)
        assert bss.decode(bss.encode(v), dt, 1000).tolist() == v.tolist()


def test_bss_plane_layout():
    from parquet2_ray.codecs import byte_stream_split as bss

    # spec layout: all byte-0s, then all byte-1s, ... (format spec
    # Encodings.md BYTE_STREAM_SPLIT worked example)
    v = np.array([0x03020100, 0x07060504], dtype=np.uint32)
    assert bss.encode(v) == bytes([0x00, 0x04, 0x01, 0x05,
                                   0x02, 0x06, 0x03, 0x07])


def test_bss_empty_and_length_check(rng):
    from parquet2_ray.codecs import byte_stream_split as bss

    assert bss.decode(bss.encode(np.empty(0, np.float64)), "float64", 0).size == 0
    with pytest.raises(ValueError):
        bss.decode(b"\x00" * 7, "float64", 1)


def test_bss_arrow_roundtrip_with_nulls():
    import pyarrow as pa

    from parquet2_ray.codecs import decode_array, encode_array

    a = pa.array([1.5, None, 2.25, -0.5, None, 3.5], type=pa.float32())
    col = encode_array("x", a, "byte_stream_split")
    assert decode_array(col).equals(a)


def test_selector_bss_only_under_compression(rng):
    import pyarrow as pa

    from parquet2_ray.functions.selector import select_codec

    # smooth floats: exponent bytes near-constant.  ALP-RD now beats
    # both floors outright (the near-constant left part dictionary-codes
    # to ~2 bits); the original BSS-vs-PLAIN contrast survives in the
    # RELATIVE sizes — BSS ties PLAIN uncompressed but beats it under
    # zstd, which is what the compression-aware pricing exists to see
    from parquet2_ray.functions.selector import candidate_sizes

    f = pa.array(rng.normal(1.0, 0.01, 8192).astype(np.float32))
    assert select_codec(f) == "alp_rd"
    raw = candidate_sizes(f)
    comp = candidate_sizes(f, compression="zstd")
    assert raw["byte_stream_split"] == raw["plain"]
    assert comp["byte_stream_split"] < comp["plain"]


def test_bss_small_int_arrow_roundtrip(rng):
    """Regression: high-entropy small-int columns auto-select BSS (it is
    the only header-free fixed-width codec); decode must reassemble with
    the TRUE byte width, not a default int64."""
    import pyarrow as pa

    from parquet2_ray.codecs import decode_array, encode_array
    from parquet2_ray.functions.selector import select_codec

    for t in (pa.int8(), pa.int16(), pa.uint8(), pa.uint16()):
        info = np.iinfo(t.to_pandas_dtype())
        a = pa.array(rng.integers(info.min, info.max, 8192, endpoint=True)
                     .astype(t.to_pandas_dtype()), type=t)
        c = select_codec(a)
        assert decode_array(encode_array("x", a, c)).equals(a), (t, c)
        assert decode_array(encode_array("x", a, "byte_stream_split")).equals(a), t
