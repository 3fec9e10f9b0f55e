"""Pluggable conflict resolution (SURVEY.md §2.10 'Ours': default LWW by
lsn, alternatives injectable).

The unified-compaction merge means a policy applies identically within a
wave and across waves: committed rows re-enter the arena as pseudo-events
carrying their stored order value (last_lsn / last_<order>).
"""

import pyarrow as pa
import pytest

from aqueduct_core_ray.pipelines.replay import CDCEngine
from aqueduct_core_ray.schema import CHANGE_EVENT
from aqueduct_core_ray.stages.compact import LWW, ConflictPolicy, compact_lww

US = 1_000_000


def ev(lsn, doc, op=0, tok=None, ts=None, source="web"):
    return {"lsn": lsn, "op": op, "doc_id": doc,
            "tokens": tok, "n_tok": len(tok) if tok else None,
            "source": source, "ts": ts if ts is not None else lsn * US}


def table(rows):
    return pa.Table.from_pylist(rows, schema=CHANGE_EVENT)


def write_log(tmp_path, rows, name="log"):
    import pyarrow.parquet as pq
    d = tmp_path / name
    d.mkdir(exist_ok=True)
    pq.write_table(table(rows), str(d / "chunk-00000.parquet"))
    return str(d)


def lake(eng):
    return {r["doc_id"]: r for r in eng.lake_table().to_pylist()}


# --------------------------------------------------------------------- #
def test_policy_validation():
    with pytest.raises(ValueError):
        ConflictPolicy(keep="newest")
    assert LWW.direction == "descending" and LWW.lake_order_field is None
    assert ConflictPolicy("ts").lake_order_field == "last_ts"


def test_compact_first_writer_wins():
    t = table([ev(1, "a", tok=[1]), ev(2, "a", tok=[2]),
               ev(3, "b", tok=[3])])
    out = compact_lww(t, policy=ConflictPolicy(keep="earliest"))
    got = {r["doc_id"]: r["lsn"] for r in out.to_pylist()}
    assert got == {"a": 1, "b": 3}


def test_fww_across_waves(tmp_path):
    """First-writer-wins must hold across wave boundaries: a later wave's
    update loses to the committed first write."""
    log = write_log(tmp_path, [
        ev(1, "a", tok=[10]), ev(2, "b", tok=[20]),   # wave 1
        ev(3, "a", tok=[99]), ev(4, "c", tok=[30]),   # wave 2
    ])
    eng = CDCEngine(str(tmp_path / "lake"), num_partitions=2,
                    derivations=(),
                    conflict=ConflictPolicy(keep="earliest"))
    eng.replay(log, [(0, 2), (2, 4)])
    got = lake(eng)
    assert got["a"]["tokens"] == [10] and got["a"]["last_lsn"] == 1
    assert got["b"]["tokens"] == [20] and got["c"]["tokens"] == [30]


def test_event_time_policy_out_of_order(tmp_path):
    """Order by event time (ts): a LATER log entry carrying an EARLIER
    event time must lose — the case where 'delta is newer' is false and
    lsn-LWW would give the wrong answer."""
    log = write_log(tmp_path, [
        ev(1, "a", tok=[1], ts=100 * US),             # wave 1
        ev(2, "a", tok=[2], ts=50 * US),              # wave 2: older ts!
        ev(3, "b", tok=[3], ts=10 * US),
        ev(4, "b", tok=[4], ts=20 * US),
    ])
    pol = ConflictPolicy(order_col="ts")
    eng = CDCEngine(str(tmp_path / "lake"), num_partitions=2,
                    derivations=(), conflict=pol)
    eng.replay(log, [(0, 1), (1, 4)])
    got = lake(eng)
    assert got["a"]["tokens"] == [1]       # ts=100 beats ts=50
    assert got["b"]["tokens"] == [4]       # ts=20 beats ts=10
    # the lake carries the policy's order column for future waves
    assert got["a"]["last_ts"] is not None

    # same log under default LWW-by-lsn: lsn 2 wins for doc a
    eng2 = CDCEngine(str(tmp_path / "lake2"), num_partitions=2,
                     derivations=())
    eng2.replay(log, [(0, 4)])
    assert lake(eng2)["a"]["tokens"] == [2]


def test_ts_policy_tombstone(tmp_path):
    """An out-of-order delete (older ts than the committed row) must NOT
    remove the row under the ts policy."""
    log = write_log(tmp_path, [
        ev(1, "a", tok=[1], ts=100 * US),
        ev(2, "a", op=1, ts=50 * US),                 # stale delete
        ev(3, "b", tok=[3], ts=10 * US),
        ev(4, "b", op=1, ts=90 * US),                 # fresh delete
    ])
    eng = CDCEngine(str(tmp_path / "lake"), num_partitions=2,
                    derivations=(), conflict=ConflictPolicy(order_col="ts"))
    eng.replay(log, [(0, 2), (2, 4)])
    got = lake(eng)
    assert got["a"]["tokens"] == [1]       # survived the stale delete
    assert "b" not in got                  # fresh delete applied


def test_fww_tombstone_blocks_reinsert_across_waves(tmp_path):
    """Fence regression: under first-writer-wins, an early tombstone
    must keep blocking a LATER wave's re-insert even after the wave
    boundary materialized it — requires the last_op fence rows."""
    log = write_log(tmp_path, [
        ev(1, "a", op=1),                           # wave 1: delete first
        ev(2, "b", tok=[7]),
        ev(3, "a", tok=[99]),                       # wave 2: re-insert
    ])
    eng = CDCEngine(str(tmp_path / "lake"), num_partitions=2,
                    derivations=(),
                    conflict=ConflictPolicy(keep="earliest"))
    eng.replay(log, [(0, 2), (2, 3)])
    got = lake(eng)
    assert "a" not in got                           # tombstone fence held
    assert got["b"]["tokens"] == [7]


def test_event_time_tombstone_blocks_older_update(tmp_path):
    """Event-time ordering: a tombstone at ts=100 must beat an update
    at ts=50 arriving in a LATER wave (out-of-order event time)."""
    log = write_log(tmp_path, [
        ev(1, "a", op=1, ts=100 * US),              # wave 1
        ev(2, "a", tok=[5], ts=50 * US),            # wave 2: older ts
        ev(3, "b", tok=[6], ts=10 * US),
    ])
    eng = CDCEngine(str(tmp_path / "lake"), num_partitions=2,
                    derivations=(),
                    conflict=ConflictPolicy(order_col="ts"))
    eng.replay(log, [(0, 1), (1, 3)])
    got = lake(eng)
    assert "a" not in got
    assert got["b"]["tokens"] == [6]


def test_fww_fence_survives_sidecar_and_compaction(tmp_path):
    """Fences + sidecars + maintenance compaction together: under FWW a
    tombstone staged as a SIDECAR must still block a later re-insert,
    and compact_partitions must carry the fence into the absorbed
    base."""
    inserts = [ev(i + 1, f"d{i:03d}", tok=[i]) for i in range(100)]
    log = write_log(tmp_path, inserts + [
        ev(101, "d000", op=1),                    # delete (loses: later)
        ev(102, "x", op=1),                       # delete unseen doc
        ev(103, "x", tok=[1]),                    # re-insert -> must lose
    ])
    eng = CDCEngine(str(tmp_path / "lake"), num_partitions=2,
                    derivations=(), sidecar_frac=0.5,
                    conflict=ConflictPolicy(keep="earliest"))
    eng.replay(log, [(0, 100), (100, 102), (102, 103)])
    assert any(p.get("deltas") for p in
               eng.manifest.partitions.values()), "sidecars never engaged"
    got = lake(eng)
    assert "x" not in got                         # fence held via sidecar
    assert got["d000"]["tokens"] == [0]           # FWW: delete lost
    assert len(got) == 100

    eng.compact_partitions()
    got2 = lake(eng)
    assert got2 == got                            # fence survived absorb


def test_reshard_carries_fww_fences(tmp_path):
    """Reshard between the delete wave and the re-insert wave: under
    first-writer-wins the tombstone fence must survive the partition-
    layout rewrite and keep blocking the later re-insert."""
    log = write_log(tmp_path, [
        ev(1, "a", op=1),                    # wave 1: delete first
        ev(2, "b", tok=[7]),
        ev(3, "a", tok=[99]),                # wave 2: re-insert
    ])
    eng = CDCEngine(str(tmp_path / "lake2p"), num_partitions=2,
                    derivations=(),
                    conflict=ConflictPolicy(keep="earliest"))
    eng.replay(log, [(0, 2)])
    dst = eng.reshard_lake(str(tmp_path / "lake3p"), num_partitions=3)
    assert dst.manifest.num_partitions == 3
    assert dst.consistency_sum() == eng.consistency_sum()
    dst.replay(log, [(0, 2), (2, 3)])        # first wave skips
    got = lake(dst)
    assert "a" not in got                    # fence held across reshard
    assert got["b"]["tokens"] == [7]
    # uninterrupted 3-partition reference agrees exactly
    ref = CDCEngine(str(tmp_path / "ref3p"), num_partitions=3,
                    derivations=(),
                    conflict=ConflictPolicy(keep="earliest"))
    ref.replay(log, [(0, 2), (2, 3)])
    assert lake(dst) == lake(ref)
    assert dst.consistency_sum() == ref.consistency_sum()


def test_reshard_event_time_policy(tmp_path):
    """Reshard under the event-time policy (order_col='ts'): the order
    column IS the ts column, so the pseudo-event re-emission must not
    duplicate it; out-of-order tombstones keep their blocking power."""
    log = write_log(tmp_path, [
        ev(1, "a", op=1, ts=100 * US),       # wave 1: future-dated delete
        ev(2, "b", tok=[6], ts=10 * US),
        ev(3, "a", tok=[5], ts=50 * US),     # wave 2: older ts -> loses
    ])
    pol = ConflictPolicy(order_col="ts")
    eng = CDCEngine(str(tmp_path / "lake2p"), num_partitions=2,
                    derivations=(), conflict=pol)
    eng.replay(log, [(0, 2)])
    dst = eng.reshard_lake(str(tmp_path / "lake3p"), num_partitions=3)
    assert dst.consistency_sum() == eng.consistency_sum()
    dst.replay(log, [(0, 2), (2, 3)])
    got = lake(dst)
    assert "a" not in got                    # fence held across reshard
    assert got["b"]["tokens"] == [6]
    import pytest as _pytest
    with _pytest.raises(ValueError):
        eng.reshard_lake(str(tmp_path / "zero"), num_partitions=0)
