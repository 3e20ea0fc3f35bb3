"""Model-based property test for manifest visibility resolution.

``resolve_active`` is a pure function of (raw records, committed
families, as_of), so it can be checked exhaustively against a
sequential SIMULATION: build a random commit history op by op (appends,
single-record rewrites, family rewrites, abandoned families), track the
ground-truth active set after every transaction, then assert the
resolver reconstructs every snapshot from the raw pile alone."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from parquet2_ray.state.manifest import resolve_active

_SETTINGS = dict(max_examples=120, deadline=None)

# one op per draw: kind + how many new records + how many victims
_OP = st.tuples(st.sampled_from(["append", "rewrite", "family",
                                 "abandoned"]),
                st.integers(1, 3), st.integers(1, 3))


def _build(ops):
    """Replay ops into (raw, committed_families, truth) where
    ``truth[txn]`` is the ground-truth active id set at that txn."""
    raw: dict[str, dict] = {}
    fams: set[str] = set()
    active: set[str] = set()
    nid = 0
    txn = 0
    truth = {0: set()}

    def new_rec(t, replaces=(), family=None):
        nonlocal nid
        pid = f"p{nid:06d}"
        nid += 1
        r = {"part_id": pid, "n_rows": 1,
             "replaces": sorted(replaces)}
        if t:
            r["txn"] = t
        if family:
            r["family"] = family
        raw[pid] = r
        return pid

    first = True
    for kind, n_new, n_old in ops:
        if first:
            # the base encode: unstamped records (txn 0)
            for _ in range(n_new + 1):
                active.add(new_rec(0))
            truth[0] = set(active)
            first = False
            continue
        txn += 1
        victims = sorted(active)[:min(n_old, len(active))]
        if kind == "append":
            for _ in range(n_new):
                active.add(new_rec(txn))
        elif kind == "rewrite" and victims:
            # delete/compact shape: each new record replaces a disjoint
            # victim slice (transitive carry like the real ops)
            for i, v in enumerate(victims):
                carried = set(raw[v]["replaces"]) | {v}
                active.add(new_rec(txn, carried))
                active.discard(v)
        elif kind == "family" and victims:
            fid = f"f{txn}"
            carried = set(victims)
            for v in victims:
                carried |= set(raw[v]["replaces"])
            for _ in range(n_new):
                active.add(new_rec(txn, carried, family=fid))
            fams.add(fid)
            active -= set(victims)
        elif kind == "abandoned" and victims:
            # staged family whose marker never lands: invisible forever
            fid = f"a{txn}"
            carried = set(victims) | {
                x for v in victims for x in raw[v]["replaces"]}
            for _ in range(n_new):
                new_rec(txn, carried, family=fid)
            # active set unchanged
        truth[txn] = set(active)
    return raw, fams, truth


@given(st.lists(_OP, min_size=1, max_size=12))
@settings(**_SETTINGS)
def test_resolver_reconstructs_every_snapshot(ops):
    raw, fams, truth = _build(ops)
    max_txn = max(truth)
    # current == as_of at the latest stamp == as_of far in the future
    assert set(resolve_active(raw, fams)) == truth[max_txn]
    assert set(resolve_active(raw, fams, as_of=max_txn + 5)) \
        == truth[max_txn]
    for t, want in truth.items():
        got = set(resolve_active(raw, fams, as_of=t))
        assert got == want, f"snapshot {t}: {got ^ want}"


@given(st.lists(_OP, min_size=1, max_size=12))
@settings(**_SETTINGS)
def test_resolver_invariants(ops):
    raw, fams, truth = _build(ops)
    for t in truth:
        act = resolve_active(raw, fams, as_of=t)
        hidden = {pid for r in act.values()
                  for pid in (r.get("replaces") or ())}
        # an id is never both active and hidden by an active record
        assert not (set(act) & hidden)
        # family all-or-none: every committed family with a member
        # included has ALL its ≤t members included
        for fid in fams:
            members = {pid for pid, r in raw.items()
                       if r.get("family") == fid}
            inc = members & set(act)
            if inc:
                live = members - hidden
                assert inc == live
        # uncommitted families never appear
        assert not any(r.get("family") and r["family"] not in fams
                       for r in act.values())
