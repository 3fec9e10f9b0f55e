"""Property-based conformance (hypothesis): the vectorized kernels must
agree with a straightforward dict-replay oracle on arbitrary event
streams — all key collisions, op mixes, and policies.

Goes beyond the reference's example-based Spock fixtures (SURVEY.md §5:
'no property-based tests' there).
"""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from aqueduct_core_ray.schema import CHANGE_EVENT
from aqueduct_core_ray.stages.compact import ConflictPolicy, compact_lww
from aqueduct_core_ray.stages.merge_apply import merge_partition
from aqueduct_core_ray.pipelines.replay import default_lake_schema

KEYS = ["a", "b", "c", "d", "e"]
US = 1_000_000


@st.composite
def event_streams(draw, max_events=40):
    n = draw(st.integers(0, max_events))
    rows = []
    lsns = draw(st.permutations(list(range(1, max_events + 1))))
    for i in range(n):
        key = draw(st.sampled_from(KEYS))
        op = draw(st.integers(0, 1))
        ts = draw(st.integers(0, 5)) * US      # deliberately collides
        tok = None if op else [draw(st.integers(0, 100))]
        rows.append({"lsn": lsns[i], "op": op, "doc_id": key,
                     "tokens": tok, "n_tok": None if op else len(tok),
                     "source": "web", "ts": ts})
    return rows


def oracle_compact(rows, policy: ConflictPolicy):
    """Winner per key: best (order, lsn) under the policy."""
    best = {}
    for r in rows:
        orderv = (r["lsn"] if policy.order_col == "lsn"
                  else r["ts"] // 1)
        rank = (orderv, r["lsn"])
        cur = best.get(r["doc_id"])
        better = (cur is None
                  or (rank > cur[0] if policy.keep == "latest"
                      else rank < cur[0]))
        if better:
            best[r["doc_id"]] = (rank, r)
    return {k: v[1] for k, v in best.items()}


def to_table(rows):
    return pa.Table.from_pylist(rows, schema=CHANGE_EVENT)


POLICIES = [ConflictPolicy(), ConflictPolicy(keep="earliest"),
            ConflictPolicy(order_col="ts"),
            ConflictPolicy(order_col="ts", keep="earliest")]


@settings(max_examples=60, deadline=None)
@given(rows=event_streams(), pidx=st.integers(0, 3))
def test_compact_matches_oracle(rows, pidx):
    policy = POLICIES[pidx]
    out = compact_lww(to_table(rows), policy=policy)
    want = oracle_compact(rows, policy)
    got = {r["doc_id"]: r for r in out.to_pylist()}
    assert set(got) == set(want)
    for k in want:
        assert got[k]["lsn"] == want[k]["lsn"], (k, got[k], want[k])


@settings(max_examples=40, deadline=None)
@given(old_rows=event_streams(max_events=20),
       new_rows=event_streams(max_events=20))
def test_merge_partition_matches_oracle(old_rows, new_rows):
    """Split any stream at any point: compact(all) must equal
    merge(materialize(compact(first)), compact(second)) — the
    wave-boundary associativity the engine's correctness rests on."""
    # disjoint, increasing lsn ranges (the wave contract)
    for r in new_rows:
        r["lsn"] += 100
    lake_schema = default_lake_schema()
    old_compact = compact_lww(to_table(old_rows))
    old_ups = old_compact.filter(
        pa.compute.equal(old_compact.column("op"), 0))
    from aqueduct_core_ray.stages.merge_apply import delta_to_lake_rows
    old_lake = delta_to_lake_rows(old_ups, lake_schema)
    delta = compact_lww(to_table(new_rows))
    merged, _, _ = merge_partition(old_lake, delta, lake_schema)

    want = oracle_compact(old_rows + new_rows, ConflictPolicy())
    want_live = {k: r for k, r in want.items() if r["op"] == 0}
    got = {r["doc_id"]: r for r in merged.to_pylist()}
    assert set(got) == set(want_live)
    for k in want_live:
        assert got[k]["last_lsn"] == want_live[k]["lsn"]
        assert got[k]["tokens"] == want_live[k]["tokens"]


@settings(max_examples=40, deadline=None)
@given(base_rows=event_streams(max_events=15),
       d1=event_streams(max_events=12),
       d2=event_streams(max_events=12),
       pidx=st.integers(0, 3))
def test_sidecar_read_equals_sequential_folds(base_rows, d1, d2, pidx):
    """The sidecar read contract: merging base against the CONCAT of two
    wave deltas must equal folding them sequentially through full
    rewrites — for every ConflictPolicy. This is exactly what
    load_partition_table relies on when a partition carries a sidecar
    chain instead of per-wave rewritten bases."""
    policy = POLICIES[pidx]
    for r in d1:
        r["lsn"] += 100
    for r in d2:
        r["lsn"] += 200
    extra = []
    if policy.lake_order_field:
        extra.append(pa.field(policy.lake_order_field, pa.timestamp("us")))
    if policy.retains_tombstones:
        # fence rows keep deletes blocking across materializations —
        # without them sequential folds resurrect docs under FWW /
        # event-time ordering (the bug this test originally caught)
        extra.append(pa.field("last_op", pa.int8()))
    lake_schema = pa.schema(list(default_lake_schema()) + extra)
    from aqueduct_core_ray.stages.merge_apply import (
        delta_to_lake_rows,
        live_rows,
    )
    base_c = compact_lww(to_table(base_rows), policy=policy)
    keep = base_c if policy.retains_tombstones else base_c.filter(
        pa.compute.equal(base_c.column("op"), 0))
    base = delta_to_lake_rows(keep, lake_schema, policy)

    # path A: sequential full rewrites (wave-by-wave)
    s1, _, _ = merge_partition(
        base, compact_lww(to_table(d1), policy=policy), lake_schema, policy)
    s2, _, _ = merge_partition(
        s1, compact_lww(to_table(d2), policy=policy), lake_schema, policy)

    # path B: base + sidecar chain merged once at read time
    side = pa.concat_tables([compact_lww(to_table(d1), policy=policy),
                             compact_lww(to_table(d2), policy=policy)])
    got, _, _ = merge_partition(base, side, lake_schema, policy)

    assert live_rows(got).sort_by("doc_id").equals(
        live_rows(s2).sort_by("doc_id"))


@settings(max_examples=8, deadline=None)
@given(rows=event_streams(max_events=30),
       cuts=st.lists(st.integers(1, 29), max_size=3),
       frac=st.sampled_from([0.6, 1.0]),
       md=st.integers(2, 4))
def test_lazy_accounting_matches_full_engine(rows, cuts, frac, md):
    """Engine-level property: for ANY event stream, wave split, sidecar
    threshold and chain cap, the sidecar engine's lake, lazily-computed
    exact rows, and derived tables must equal a sidecar-free engine's —
    the contract of the O(delta) staging + lazy accounting design."""
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    from aqueduct_core_ray.pipelines.replay import CDCEngine

    if not rows:
        return
    rows = sorted(rows, key=lambda r: r["lsn"])
    hi = max(r["lsn"] for r in rows)
    edges = sorted({c for c in cuts if c < hi}) + [hi]
    bounds, lo = [], 0
    for e in edges:
        if e > lo:
            bounds.append((lo, e))
            lo = e
    d = tempfile.mkdtemp(prefix="aqr_prop_")
    try:
        import os
        log = os.path.join(d, "log")
        os.makedirs(log)
        pq.write_table(to_table(rows), os.path.join(log, "seg.parquet"))
        side = CDCEngine(os.path.join(d, "side"), num_partitions=2,
                         sidecar_frac=frac, max_deltas=md)
        side.replay(log, bounds)
        full = CDCEngine(os.path.join(d, "full"), num_partitions=2,
                         sidecar_frac=0.0)
        full.replay(log, bounds)
        assert side.lake_table().equals(full.lake_table())
        # BACKGROUND absorbs: same stream/split/thresholds with the
        # async absorb path (adoption, basis discards, settle) must
        # also converge to the identical lake
        bg = CDCEngine(os.path.join(d, "bg"), num_partitions=2,
                       sidecar_frac=frac, max_deltas=md, bg_absorb=True)
        bg.replay(log, bounds)
        bg.drain_absorbs()
        assert bg.lake_table().equals(full.lake_table())
        assert bg.logical_rows() == full.logical_rows()
        want_rows = sum(int(p["rows"])
                        for p in full.manifest.partitions.values())
        assert side.logical_rows() == want_rows
        fresh = side.exact_partition_stats()
        assert set(fresh) == set(side.dirty_pids())
        for name in ("source_stats", "corpus_rollup"):
            assert side.derived_table(name).equals(full.derived_table(name))

        # time-travel diff property: diff(gen 0 -> CURRENT) must equal
        # the dict-oracle diff of the two prefix-LWW live states, for
        # ANY stream / wave split / sidecar configuration
        def live(upto):
            best = {}
            for r in rows:
                if r["lsn"] <= upto:
                    cur = best.get(r["doc_id"])
                    if cur is None or r["lsn"] > cur["lsn"]:
                        best[r["doc_id"]] = r
            return {k: v["lsn"] for k, v in best.items() if v["op"] == 0}

        a, b = live(bounds[0][1]), live(hi)
        exp = {}
        for k in set(a) | set(b):
            if k not in a:
                exp[k] = ("added", None, b[k])
            elif k not in b:
                exp[k] = ("deleted", a[k], None)
            elif a[k] != b[k]:
                exp[k] = ("updated", a[k], b[k])
        got = {r["doc_id"]: (r["change"], r["lsn_old"], r["lsn_new"])
               for r in side.diff_generations(0).take_all()}
        assert got == exp
    finally:
        shutil.rmtree(d, ignore_errors=True)
