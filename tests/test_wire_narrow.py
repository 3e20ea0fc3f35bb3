"""Exchange wire narrowing: shards ship integers at the smallest width
their values fit; the reduce side widens back before encoding, so
container bytes and fingerprints are unchanged (verified out-of-band by
an on/off subprocess A/B — data files byte-identical; here the
narrow/widen pair is pinned in-process)."""

import numpy as np
import pyarrow as pa

from parquet2_ray.pipelines.encode_pipeline import (
    _narrow_for_wire,
    _widen_from_wire,
)
from parquet2_ray.state.manifest import canonical_fingerprint


def _zoo() -> pa.Table:
    return pa.table({
        "tokens": pa.array([[1, 50256, None], [], None, [7]],
                           pa.list_(pa.int32())),
        "n_tok": pa.array([3, 0, None, 1], pa.int32()),
        "mid": pa.array([0, 2**20, 5, None], pa.int64()),
        "big": pa.array([0, 2**33, 5, None], pa.int64()),
        "neg": pa.array([-5, 3, None, 2**20], pa.int64()),
        "verybig": pa.array([-2**40, 0, 1, 2], pa.int64()),
        "s": pa.array(["a", "b", None, "d"]),
        "f": pa.array([1.5, None, 0.0, -2.0]),
        "ltok": pa.array([[300], [70000 % 300], [], None],
                         pa.large_list(pa.int32())),
    })


def test_narrow_widen_type_zoo():
    t = _zoo()
    n = _narrow_for_wire(t)
    got = {f.name: str(f.type) for f in n.schema}
    assert got["tokens"] == "list<item: uint16>"
    assert got["n_tok"] == "uint8"
    assert got["mid"] == "uint32"      # int64 fitting 32 unsigned bits
    assert got["big"] == "int64"       # 2^33 exceeds uint32
    assert got["neg"] == "int32"       # negative min, fits signed 32
    assert got["verybig"] == "int64"   # exceeds signed 32
    assert got["s"] == "string" and got["f"] == "double"
    assert got["ltok"] == "large_list<item: uint16>"
    w = _widen_from_wire(n)
    want = pa.schema([pa.field(f.name, f.type) for f in t.schema])
    assert w.schema.equals(want)
    assert w.equals(t.replace_schema_metadata(None).cast(w.schema))


def test_narrow_marker_survives_ipc_and_fingerprint_is_stable():
    t = _zoo()
    n = _narrow_for_wire(t)
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, n.schema) as w:
        w.write_table(n)
    back = _widen_from_wire(pa.ipc.open_stream(sink.getvalue()).read_all())
    assert canonical_fingerprint(back) == canonical_fingerprint(t)


def test_narrow_noops_cheaply():
    # nothing narrowable → the SAME table object comes back (no copy)
    t = pa.table({"s": pa.array(["x", "y"]),
                  "big": pa.array([2**40, -2**40], pa.int64())})
    assert _narrow_for_wire(t) is t
    assert _widen_from_wire(t) is t
    empty = pa.table({"a": pa.array([], pa.int32())})
    assert _narrow_for_wire(empty) is empty


def test_non_nullable_fields_survive_mixed_width_concat():
    # a REQUIRED int column narrowed in one shard but not another must
    # still concat after widening — nullability (and field metadata)
    # ride through narrow/widen unchanged
    sch = pa.schema([pa.field("v", pa.int32(), nullable=False,
                              metadata={b"k": b"orig"})])
    a = pa.table([pa.array([1, 200], pa.int32())], schema=sch)   # uint8
    b = pa.table([pa.array([1, 70000], pa.int32())], schema=sch)  # stays
    wa, wb = _widen_from_wire(_narrow_for_wire(a)), \
        _widen_from_wire(_narrow_for_wire(b))
    merged = pa.concat_tables([wa, wb])
    f = merged.schema.field("v")
    assert not f.nullable and f.metadata == {b"k": b"orig"}
    assert merged["v"].to_pylist() == [1, 200, 1, 70000]


def test_shards_of_different_widths_concat_after_widen():
    # two shards of one partition narrowed independently to DIFFERENT
    # widths must land on one schema after widening
    a = pa.table({"v": pa.array([1, 200], pa.int32())})        # → uint8
    b = pa.table({"v": pa.array([1, 70000], pa.int32())})      # → int32 stays? 70000 < 2^16? no: 70000 ≥ 2^16 → stays int32
    na, nb = _narrow_for_wire(a), _narrow_for_wire(b)
    assert str(na["v"].type) == "uint8" and str(nb["v"].type) == "int32"
    merged = pa.concat_tables([_widen_from_wire(na), _widen_from_wire(nb)])
    assert merged["v"].type == pa.int32()
    assert merged["v"].to_pylist() == [1, 200, 1, 70000]


def test_fingerprint_is_physical_layout_invariant():
    """A zero-copy slice (what the exchange hands a reduce task for a
    1-row group) and an IPC-roundtripped slice must fingerprint the
    same as a freshly built table with the same rows — found live: the
    encode-side fp of exchange-sliced 1-row partitions disagreed with
    the decode-verify fp of the identical content."""
    t = _zoo()
    for i in range(t.num_rows):
        rebuilt = pa.Table.from_pylist(t.slice(i, 1).to_pylist(),
                                       schema=t.schema)
        want = canonical_fingerprint(rebuilt)
        assert canonical_fingerprint(t.slice(i, 1)) == want
        sink = pa.BufferOutputStream()
        with pa.ipc.new_stream(sink, t.schema) as w:
            w.write_table(t)
        rt = pa.ipc.open_stream(sink.getvalue()).read_all()
        assert canonical_fingerprint(rt.slice(i, 1)) == want
    # multi-row unsorted: slice-of-middle vs rebuilt
    mid = t.slice(1, 2)
    rebuilt = pa.Table.from_pylist(mid.to_pylist(), schema=t.schema)
    assert canonical_fingerprint(mid) == canonical_fingerprint(rebuilt)
    # and the sorted path still agrees with itself across layouts
    assert (canonical_fingerprint(t.slice(0, 3), "s")
            == canonical_fingerprint(
                pa.Table.from_pylist(t.slice(0, 3).to_pylist(),
                                     schema=t.schema), "s"))
