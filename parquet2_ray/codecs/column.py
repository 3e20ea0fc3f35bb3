"""Arrow-aware column codec layer: pyarrow.Array ↔ EncodedColumn.

This is the analog of the reference's page assembly/deserialize dispatch
(/root/reference/src/deserialize/native.rs:54-99 — encoding × dict ×
optional dispatch): a registry of named codecs, each a pair of
vectorized encode/decode functions over Arrow buffers.

Null handling mirrors parquet's def-level design
(/root/reference/src/page/mod.rs:352-431 — [levels][values]): the
payload frames an optional validity bitmap (LSB-first, the Arrow layout
— SURVEY.md E5 "zero-copy pass-through") followed by the encoded
NON-NULL values only.

Payload frame:

    uleb(num_rows) uleb(null_count)
    [validity bitmap ceil8(num_rows) bytes, present iff null_count > 0]
    encoded non-null values

List columns are composite: uleb-framed (offsets payload, child
payload); offsets are encoded as lengths via DELTA_BINARY_PACKED (Arrow
list offsets ↔ Dremel rep/def levels, SURVEY.md §1 mapping).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from . import (
    alp,
    byte_array,
    byte_stream_split,
    delta,
    dictionary,
    fixed_len,
    for_pack,
    fsst,
    pfor,
    hybrid_rle,
    plain,
)
from .bitpack import bits_needed
from .uleb import uleb_decode, uleb_encode, zz_uleb_decode, zz_uleb_encode

__all__ = [
    "EncodedColumn",
    "encode_array",
    "decode_array",
    "NUMERIC_CODECS",
    "BINARY_CODECS",
    "codecs_for_type",
]


# ---------------------------------------------------------------------------
# arrow type (de)serialization — the limited grammar we support

_SIMPLE_TYPES = {
    "bool": pa.bool_(),
    "int8": pa.int8(),
    "int16": pa.int16(),
    "int32": pa.int32(),
    "int64": pa.int64(),
    "uint8": pa.uint8(),
    "uint16": pa.uint16(),
    "uint32": pa.uint32(),
    "uint64": pa.uint64(),
    "float": pa.float32(),
    "double": pa.float64(),
    "string": pa.string(),
    "large_string": pa.large_string(),
    "binary": pa.binary(),
    "large_binary": pa.large_binary(),
    "date32[day]": pa.date32(),
    "timestamp[s]": pa.timestamp("s"),
    "timestamp[ms]": pa.timestamp("ms"),
    "timestamp[us]": pa.timestamp("us"),
    "timestamp[ns]": pa.timestamp("ns"),
}


def type_to_str(t: pa.DataType) -> str:
    s = str(t)
    if s in _SIMPLE_TYPES:
        return s
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{type_to_str(t.value_type)}>"
    if pa.types.is_fixed_size_binary(t):
        return f"fixed_size_binary[{t.byte_width}]"
    if pa.types.is_decimal128(t):
        return f"decimal128({t.precision},{t.scale})"
    if pa.types.is_struct(t):
        # JSON field list — robust to arbitrary field names
        import json

        return "struct<" + json.dumps(
            [[f.name, type_to_str(f.type)] for f in t],
            separators=(",", ":")) + ">"
    if pa.types.is_map(t):
        # parquet GroupLogicalType::Map (reference
        # parquet_bridge.rs:505-508): physically list<struct<key,value>>
        import json

        return "map<" + json.dumps(
            [type_to_str(t.key_type), type_to_str(t.item_type),
             bool(t.keys_sorted)], separators=(",", ":")) + ">"
    raise TypeError(f"unsupported arrow type: {t}")


def str_to_type(s: str) -> pa.DataType:
    if s in _SIMPLE_TYPES:
        return _SIMPLE_TYPES[s]
    if s.startswith("list<") and s.endswith(">"):
        return pa.list_(str_to_type(s[5:-1]))
    if s.startswith("fixed_size_binary[") and s.endswith("]"):
        return pa.binary(int(s[18:-1]))
    if s.startswith("decimal128(") and s.endswith(")"):
        p, sc = s[11:-1].split(",")
        return pa.decimal128(int(p), int(sc))
    if s.startswith("struct<") and s.endswith(">"):
        import json

        return pa.struct([(n, str_to_type(ts)) for n, ts in json.loads(s[7:-1])])
    if s.startswith("map<") and s.endswith(">"):
        import json

        k, v, sorted_ = json.loads(s[4:-1])
        return pa.map_(str_to_type(k), str_to_type(v), keys_sorted=sorted_)
    raise TypeError(f"unsupported arrow type string: {s}")


# ---------------------------------------------------------------------------


@dataclass
class EncodedColumn:
    """One encoded column of one partition (≈ a parquet column chunk)."""

    name: str
    codec: str
    arrow_type: str
    num_values: int
    payload: bytes
    meta: dict = field(default_factory=dict)

    @property
    def encoded_bytes(self) -> int:
        return len(self.payload)


# numeric value codecs: np int/float array (non-null) -> bytes
def _enc_rle(v: np.ndarray) -> bytes:
    ref = int(v.min()) if len(v) else 0
    rng = int(v.max()) - ref if len(v) else 0
    if len(v) and v.dtype.itemsize <= 4 and rng < 2**31:
        # stay in the narrow dtype (int32 tokens never touch int64);
        # ref == 0 (token ids start at 0) skips a full-column temp
        residual = v if ref == 0 else v - v.dtype.type(ref)
        if np.issubdtype(residual.dtype, np.signedinteger):
            residual = residual.view(np.dtype(f"<u{residual.dtype.itemsize}"))
    else:
        residual = (v.astype(np.int64) - ref).astype(np.uint64)
    nb = bits_needed(rng) if len(v) else 0
    out = bytearray(zz_uleb_encode(ref))
    out += uleb_encode(nb)
    out += uleb_encode(len(v))
    out += hybrid_rle.encode(residual, nb)
    return bytes(out)


def _dec_rle(buf: bytes) -> np.ndarray:
    ref, pos = zz_uleb_decode(buf, 0)
    nb, pos = uleb_decode(buf, pos)
    n, pos = uleb_decode(buf, pos)
    residual = hybrid_rle.decode(buf[pos:], nb, n)
    return residual.view(np.int64) + ref


_NUMERIC_ENC = {
    "plain": plain.encode,
    "for_bitpack": for_pack.encode,
    "pfor": pfor.encode,
    "delta_binary_packed": lambda v: delta.encode(v, miniblocks=4),
    "dict_rle": lambda v: dictionary.encode_int(v),
    "rle": _enc_rle,
    "byte_stream_split": byte_stream_split.encode,
    "alp": alp.encode,
    "alp_rd": alp.encode_rd,
}


def _np_dtype_of(arrow_type: str) -> str:
    return {
        "int32": "int32", "int64": "int64", "float": "float32",
        "double": "float64", "uint32": "uint32", "uint64": "uint64",
        "int8": "int8", "int16": "int16",
        "uint8": "uint8", "uint16": "uint16",
        "date32[day]": "int32",
    }.get(arrow_type, "int64")  # temporal stored as int64


# numeric decoders: (body, arrow_type_str, n_dense) -> np.ndarray
_NUMERIC_DEC = {
    "plain": lambda b, at, n: plain.decode(b, _np_dtype_of(at), n),
    "for_bitpack": lambda b, at, n: for_pack.decode(b),
    "pfor": lambda b, at, n: pfor.decode(b),
    "delta_binary_packed": lambda b, at, n: delta.decode(b)[0],
    "dict_rle": lambda b, at, n: dictionary.decode_int(b),
    "rle": lambda b, at, n: _dec_rle(b),
    "byte_stream_split": lambda b, at, n: byte_stream_split.decode(
        b, _np_dtype_of(at), n),
    "alp": lambda b, at, n: alp.decode(b),
    "alp_rd": lambda b, at, n: alp.decode_rd(b),
}

# alp/alp_rd are float-only: they live in the numeric registries (same
# np-array value contract) but codecs_for_type offers them only for
# floating types, so integer/temporal columns never price them
NUMERIC_CODECS = set(_NUMERIC_ENC) - {"alp", "alp_rd"}
FLOAT_CODECS = {"plain", "byte_stream_split", "alp", "alp_rd"}

# binary value codecs: (offsets:int64, data:uint8) -> bytes
# 16 KB train sample — the FSST paper's own sampling scale; measured
# ratio identical to 64 KB on the documents corpus, 4× cheaper to train
_FSST_SAMPLE = 1 << 14


def _enc_fsst(offsets: np.ndarray, data: np.ndarray) -> bytes:
    raw = data.tobytes()
    table = fsst.train(raw[:_FSST_SAMPLE])
    out = bytearray(uleb_encode(len(offsets) - 1))
    lens_enc = delta.encode(np.diff(offsets), miniblocks=4)
    out += uleb_encode(len(lens_enc))
    out += lens_enc
    out += fsst.encode(table, raw)
    return bytes(out)


def _dec_fsst(buf: bytes) -> tuple[np.ndarray, np.ndarray]:
    n, pos = uleb_decode(buf, 0)
    lens_len, pos = uleb_decode(buf, pos)
    lens, _ = delta.decode(buf[pos : pos + lens_len])
    pos += lens_len
    raw = fsst.decode(buf[pos:])
    offsets = np.zeros(n + 1, dtype=np.int64)
    if n:
        np.cumsum(lens, out=offsets[1:])
    return offsets, np.frombuffer(raw, dtype=np.uint8)


_BINARY_ENC = {
    "plain_byte_array": byte_array.plain_encode,
    "delta_length_byte_array": lambda o, d: byte_array.delta_length_encode(o, d, miniblocks=4),
    "delta_byte_array": byte_array.delta_ba_encode,
    "dict_binary": dictionary.encode_binary,
    "fsst": _enc_fsst,
}

# binary decoders: (body, n_dense) -> (offsets:int64, data:uint8)
_BINARY_DEC = {
    "plain_byte_array": byte_array.plain_decode,
    "delta_length_byte_array": byte_array.delta_length_decode,
    "delta_byte_array": byte_array.delta_ba_decode,
    "dict_binary": lambda b, n: dictionary.decode_binary(b),
    "fsst": lambda b, n: _dec_fsst(b),
}

BINARY_CODECS = set(_BINARY_ENC)


def register_codec(name: str, kind: str, encode, decode) -> None:
    """User-extension surface (SURVEY.md §2.9; the analog of the
    reference's consumer-supplied deserialization — page states are
    public, /root/reference/README.md:108-119, src/deserialize/*):
    plug a custom codec into the registry; the auto-selector then
    competes it against the built-ins on every partition sample.

    kind="numeric": encode(values: np.ndarray) -> bytes,
                    decode(body: bytes, arrow_type: str, n: int) -> np.ndarray
    kind="binary":  encode(offsets: np.int64[n+1], data: np.uint8[]) -> bytes,
                    decode(body: bytes, n: int) -> (offsets, data)

    Registration is per-process: in a distributed pipeline, register at
    import time of a module your map_batches UDFs import, so every Ray
    worker sees the codec (same contract as the reference: the consumer
    links its deserializer into every thread).
    """
    from ..functions import selector as _sel

    if kind == "numeric":
        _NUMERIC_ENC[name] = encode
        _NUMERIC_DEC[name] = decode
        NUMERIC_CODECS.add(name)
    elif kind == "binary":
        _BINARY_ENC[name] = encode
        _BINARY_DEC[name] = decode
        BINARY_CODECS.add(name)
    else:
        raise ValueError(f"unknown codec kind {kind!r}")
    if name not in _sel._PRIO:  # ties break toward built-ins
        _sel._PRIO[name] = len(_sel._PRIO)

# FLBA codecs: (data:uint8, byte_width) -> bytes
# (/root/reference/src/deserialize/fixed_len.rs:56-110)
FLBA_CODECS = {"plain_flba", "dict_flba"}


def codecs_for_type(t: pa.DataType) -> set[str]:
    if pa.types.is_floating(t):
        return set(FLOAT_CODECS)
    if pa.types.is_integer(t) or pa.types.is_temporal(t):
        return set(NUMERIC_CODECS)
    if pa.types.is_fixed_size_binary(t):
        return set(FLBA_CODECS)
    if pa.types.is_string(t) or pa.types.is_large_string(t) or pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return set(BINARY_CODECS)
    if pa.types.is_boolean(t):
        return {"bitmap"}
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return {"list"}
    if pa.types.is_struct(t):
        return {"struct"}
    if pa.types.is_map(t):
        return {"map"}
    if pa.types.is_decimal128(t):
        return {"decimal"}
    raise TypeError(f"no codecs for arrow type {t}")


# ---------------------------------------------------------------------------
# value extraction (vectorized, via Arrow kernels)


def _numeric_np(arr: pa.Array) -> np.ndarray:
    """Non-null values of a numeric/temporal array as a numpy array."""
    t = arr.type
    if pa.types.is_temporal(t):
        if pa.types.is_date32(t):
            arr = arr.cast(pa.int32())
        else:
            arr = arr.cast(pa.int64())
    return arr.to_numpy(zero_copy_only=False)


def _binary_np(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Non-null (offsets, data) of a string/binary array."""
    arr = arr.cast(pa.large_binary())
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], dtype=np.int64)[arr.offset : arr.offset + len(arr) + 1]
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.empty(0, np.uint8)
    data = data[offsets[0] : offsets[-1]]
    return offsets - offsets[0], data


def _flba_np(arr: pa.Array) -> tuple[np.ndarray, int]:
    """Non-null raw slot bytes of a fixed_size_binary array + byte_width."""
    k = arr.type.byte_width
    bufs = arr.buffers()
    if bufs[1] is None:
        return np.empty(0, dtype=np.uint8), k
    data = np.frombuffer(bufs[1], dtype=np.uint8)
    return data[arr.offset * k : (arr.offset + len(arr)) * k], k


def _ceil8(v: int) -> int:
    return (v + 7) // 8


# ---------------------------------------------------------------------------


def encode_array(
    name: str, arr: pa.Array | pa.ChunkedArray, codec: str,
    logical: str | None = None, compression: str | None = None,
) -> EncodedColumn:
    """Encode one column with the named codec. Nulls → validity frame.

    ``logical`` optionally annotates the column with a parquet logical
    type (``"uuid"`` / ``"json"`` / ``"enum"`` / ``"decimal"``); the
    (annotation, physical type) pairing is validated exactly as the
    reference's spec checks do (see codecs/logical.py) and recorded in
    the column meta for round-trip.

    ``compression`` does not compress anything here (that's the
    writer's job, state/manifest.py) — it informs the CHILD codec
    selection of composite codecs (list/struct/decimal sub-encode), so
    e.g. a list<float> child picks BYTE_STREAM_SPLIT exactly when the
    pipeline will block-compress the payload.
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if logical is not None:
        from .logical import check_logical

        check_logical(logical, arr.type)
        col = encode_array(name, arr, codec, compression=compression)
        col.meta["logical"] = logical
        return col
    t = arr.type
    if codec not in codecs_for_type(t):  # raises TypeError for unsupported t
        raise ValueError(f"codec {codec!r} does not support arrow type {t}")
    n = len(arr)
    null_count = arr.null_count
    head = bytearray(uleb_encode(n))
    head += uleb_encode(null_count)
    if null_count:
        valid = pc.is_valid(arr).to_numpy(zero_copy_only=False)
        head += np.packbits(valid, bitorder="little").tobytes()
        dense = arr.drop_null()
    else:
        dense = arr

    if codec == "list":
        child_codec_name = None
        # offsets → lengths → DELTA_BINARY_PACKED; child encoded recursively
        la = dense.cast(pa.large_list(dense.type.value_type)) if not pa.types.is_large_list(dense.type) else dense
        bufs = la.buffers()
        offs = np.frombuffer(bufs[1], dtype=np.int64)[la.offset : la.offset + len(la) + 1]
        lens = np.diff(offs)
        child = la.values[offs[0] : offs[-1]] if len(offs) else la.values[:0]
        from ..functions.selector import select_codec  # late import, no cycle at module load

        child_codec_name = select_codec(child, compression=compression)
        child_col = encode_array("values", child, child_codec_name,
                                 compression=compression)
        lens_enc = delta.encode(lens, miniblocks=4)
        body = bytearray(uleb_encode(len(lens_enc)))
        body += lens_enc
        body += uleb_encode(len(child_col.payload))
        body += child_col.payload
        meta = {"child_codec": child_codec_name,
                "child_type": type_to_str(child.type)}
        if child_col.meta:  # nested list/struct children carry their own meta
            meta["child_meta"] = child_col.meta
        return EncodedColumn(
            name=name,
            codec="list",
            arrow_type=type_to_str(t),
            num_values=n,
            payload=bytes(head) + bytes(body),
            meta=meta,
        )

    if codec == "map":
        # Map logical type (reference parquet_bridge.rs:505-508;
        # GroupLogicalType::Map is physically list<struct<key req,
        # value>>): cast the entries view to a list<struct> and reuse
        # the list+struct composite codecs wholesale — the key column
        # sub-encodes with the binary/numeric selector like any other
        # leaf.  keys_sorted is carried in the type string.
        entries_t = pa.list_(pa.struct([
            pa.field("key", t.key_type, nullable=False),
            pa.field("value", t.item_type)]))
        sub = encode_array(name, dense.cast(entries_t), "list",
                           compression=compression)
        return EncodedColumn(
            name=name, codec="map", arrow_type=type_to_str(t),
            num_values=n, payload=bytes(head) + sub.payload,
            meta={"entries_type": sub.arrow_type, "list_meta": sub.meta},
        )

    if codec == "struct":
        # per-field recursive encode, parent validity in the head frame —
        # the group-tree / per-leaf def-level analog
        # (/root/reference/src/metadata/schema_descriptor.rs:100-144)
        from ..functions.selector import select_codec

        body = bytearray()
        fields_meta = []
        for i in range(t.num_fields):
            f = t.field(i)
            child = dense.field(i) if len(dense) else pa.nulls(0, f.type)
            ccodec = select_codec(child, compression=compression)
            ccol = encode_array(f.name, child, ccodec,
                                compression=compression)
            fields_meta.append([f.name, ccol.arrow_type, ccodec, ccol.meta])
            body += uleb_encode(len(ccol.payload))
            body += ccol.payload
        return EncodedColumn(
            name=name,
            codec="struct",
            arrow_type=type_to_str(t),
            num_values=n,
            payload=bytes(head) + bytes(body),
            meta={"fields": fields_meta},
        )

    if codec == "decimal":
        # decimal128 (spec invariants per the reference's spec.rs): if
        # every value's high 64 bits are pure sign extension the column
        # is a scaled int64 — sub-encode it with the numeric selector
        # (scaled prices dict/delta/FOR-compress extremely well);
        # otherwise fall back to raw 16-byte slots.
        from .logical import check_decimal

        check_decimal(t.precision, t.scale)
        bufs = dense.buffers()
        raw = (
            np.frombuffer(bufs[1], dtype=np.uint8)[dense.offset * 16 : (dense.offset + len(dense)) * 16]
            if bufs[1] is not None
            else np.empty(0, np.uint8)
        )
        pairs = raw.view("<u8").reshape(-1, 2) if raw.size else np.empty((0, 2), np.uint64)
        lo, hi = pairs[:, 0], pairs[:, 1]
        sign_ext = np.where((lo >> np.uint64(63)).astype(bool),
                            np.uint64(0xFFFFFFFFFFFFFFFF), np.uint64(0))
        meta: dict = {}
        if pairs.shape[0] == 0 or (hi == sign_ext).all():
            from ..functions.selector import select_codec

            arr64 = pa.array(np.ascontiguousarray(lo).view(np.int64), type=pa.int64())
            sub = select_codec(arr64, compression=compression)
            sub_col = encode_array("v", arr64, sub, compression=compression)
            body = b"\x01" + sub_col.payload
            meta["dec_sub"] = sub
        else:
            body = b"\x00" + raw.tobytes()
        return EncodedColumn(
            name=name, codec="decimal", arrow_type=type_to_str(t),
            num_values=n, payload=bytes(head) + body, meta=meta,
        )

    if codec == "bitmap":
        vals = dense.to_numpy(zero_copy_only=False).astype(bool)
        body = uleb_encode(len(vals)) + np.packbits(vals, bitorder="little").tobytes()
    elif codec in _NUMERIC_ENC:
        v = _numeric_np(dense)
        body = _NUMERIC_ENC[codec](v)
    elif codec in FLBA_CODECS:
        data, k = _flba_np(dense)
        body = (fixed_len.plain_encode(data, k) if codec == "plain_flba"
                else fixed_len.dict_encode(data, k))
    elif codec in _BINARY_ENC:
        offsets, data = _binary_np(dense)
        body = _BINARY_ENC[codec](offsets, data)
    else:
        raise ValueError(f"unknown codec {codec!r}")
    return EncodedColumn(
        name=name,
        codec=codec,
        arrow_type=type_to_str(t),
        num_values=n,
        payload=bytes(head) + body,
        meta={},
    )


def _scatter_validity(values: pa.Array, valid: np.ndarray) -> pa.Array:
    """Rebuild a nullable array from dense non-null values + validity mask.

    A single ``take`` with null indices: a null index yields a null
    output slot — works uniformly for primitives, strings and lists.
    """
    if len(values) == 0:
        return pa.nulls(len(valid), type=values.type)
    idx = np.cumsum(valid) - 1
    idx[~valid] = 0
    return values.take(pa.array(idx, type=pa.int64(), mask=~valid))


def decode_array(col: EncodedColumn) -> pa.Array:
    """Decode an EncodedColumn back to a pyarrow array (bit-identical)."""
    t = str_to_type(col.arrow_type)
    buf = col.payload
    n, pos = uleb_decode(buf, 0)
    null_count, pos = uleb_decode(buf, pos)
    valid = None
    if null_count:
        vb = np.frombuffer(buf, dtype=np.uint8, count=_ceil8(n), offset=pos)
        pos += _ceil8(n)
        valid = np.unpackbits(vb, bitorder="little", count=n).astype(bool)
    body = buf[pos:]
    n_dense = n - null_count

    if col.codec == "list":
        p, q = uleb_decode(body, 0)
        lens, _ = delta.decode(body[q : q + p])
        q += p
        clen, q = uleb_decode(body, q)
        child_col = EncodedColumn(
            name="values",
            codec=col.meta["child_codec"],
            arrow_type=col.meta["child_type"],
            num_values=0,
            payload=body[q : q + clen],
            meta=col.meta.get("child_meta", {}),
        )
        child = decode_array(child_col)
        offsets = np.zeros(n_dense + 1, dtype=np.int64)
        if n_dense:
            np.cumsum(lens, out=offsets[1:])
        dense = pa.LargeListArray.from_arrays(pa.array(offsets, type=pa.int64()), child)
        dense = dense.cast(t)
    elif col.codec == "map":
        sub = EncodedColumn(
            name=col.name, codec="list",
            arrow_type=col.meta["entries_type"], num_values=0,
            payload=body, meta=col.meta.get("list_meta", {}),
        )
        lst = decode_array(sub)              # list<struct<key, value>>
        ent = lst.values
        dense = pa.MapArray.from_arrays(
            lst.offsets, ent.field("key"), ent.field("value")).cast(t)
    elif col.codec == "struct":
        children, names, q = [], [], 0
        for fname, ftype, fcodec, fmeta in col.meta["fields"]:
            clen, q = uleb_decode(body, q)
            ccol = EncodedColumn(
                name=fname, codec=fcodec, arrow_type=ftype,
                num_values=0, payload=body[q : q + clen], meta=fmeta or {},
            )
            children.append(decode_array(ccol))
            names.append(fname)
            q += clen
        if children:
            dense = pa.StructArray.from_arrays(children, names=names)
        else:
            dense = pa.nulls(n_dense, type=t).fill_null({})
        dense = dense.cast(t)
    elif col.codec == "decimal":
        if body[:1] == b"\x01":
            sub = EncodedColumn(
                name="v", codec=col.meta["dec_sub"], arrow_type="int64",
                num_values=0, payload=body[1:], meta={},
            )
            ints = decode_array(sub).to_numpy(zero_copy_only=False).astype(np.int64)
            raw = np.empty((len(ints), 2), dtype=np.uint64)
            raw[:, 0] = ints.view(np.uint64)
            raw[:, 1] = np.where(ints < 0, np.uint64(0xFFFFFFFFFFFFFFFF), np.uint64(0))
            data = raw.tobytes()
        else:
            data = body[1:]
        dense = pa.Array.from_buffers(t, n_dense, [None, pa.py_buffer(data)])
    elif col.codec == "bitmap":
        m, q = uleb_decode(body, 0)
        bits = np.frombuffer(body, dtype=np.uint8, count=_ceil8(m), offset=q)
        dense = pa.array(np.unpackbits(bits, bitorder="little", count=m).astype(bool))
    elif col.codec in _NUMERIC_DEC:
        v = _NUMERIC_DEC[col.codec](body, col.arrow_type, n_dense)
        storage = _storage_type(t)
        dense = pa.array(np.asarray(v).astype(storage.to_pandas_dtype(), copy=False), type=storage).cast(t)
    elif col.codec in FLBA_CODECS:
        if col.codec == "plain_flba":
            k, data = fixed_len.plain_decode(body)
        else:
            k, data = fixed_len.dict_decode(body)
        dense = pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(k), n_dense, [None, pa.py_buffer(data.tobytes())]
        ).cast(t)
    elif col.codec in _BINARY_DEC:
        offsets, data = _BINARY_DEC[col.codec](body, n_dense)
        dense = pa.LargeBinaryArray.from_buffers(
            pa.large_binary(), n_dense,
            [None, pa.py_buffer(offsets.astype(np.int64).tobytes()), pa.py_buffer(data.tobytes())],
        ).cast(t)
    else:
        raise ValueError(f"unknown codec {col.codec!r}")

    if valid is None:
        return dense
    return _scatter_validity(dense, valid).cast(t)


def _storage_type(t: pa.DataType) -> pa.DataType:
    if pa.types.is_temporal(t):
        return pa.int32() if pa.types.is_date32(t) else pa.int64()
    return t
