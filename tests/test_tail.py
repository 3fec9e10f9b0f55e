"""Continuous-tail mode: the reference's till poll loop (§3.2) — apply
whatever the publisher has made visible, sleep when caught up, resume
from the manifest watermark after a kill."""

import threading
import time

import pyarrow.parquet as pq

from aqueduct_core_ray.pipelines.replay import CDCEngine
from aqueduct_core_ray.sources.changelog import (
    ChangelogSpec,
    changelog_chunk,
    changelog_table,
    seed_lake,
    write_seed_lake,
)

from oracle_replay import oracle_table, replay_oracle

SPEC = ChangelogSpec(n_docs=200, n_events=2_000, seed=3, chunk_size=500,
                     n_waves=4)
COLS = ["doc_id", "tokens", "n_tok", "source", "last_lsn"]
N_CHUNKS = 4


def publish(log_dir, upto_chunk):
    """Simulate the external publisher appending lsn-ordered segments.
    Write-then-rename: segments become visible atomically (the binlog
    contract tail() relies on — a reader must never see a torn file)."""
    for i in range(upto_chunk):
        p = log_dir / f"chunk-{i:05d}.parquet"
        if not p.exists():
            tmp = log_dir / f".chunk-{i:05d}.tmp"
            pq.write_table(changelog_chunk(SPEC, i), str(tmp))
            tmp.rename(p)


def oracle():
    return oracle_table(
        replay_oracle(changelog_table(SPEC),
                      seed=seed_lake(SPEC.n_docs, seed=SPEC.seed)), COLS)


def test_discover_watermark(tmp_path):
    log = tmp_path / "log"
    log.mkdir()
    eng = CDCEngine(str(tmp_path / "lake"), num_partitions=4)
    assert eng.discover_watermark(str(log)) == -1
    publish(log, 2)
    assert eng.discover_watermark(str(log)) == 2 * SPEC.chunk_size


def test_tail_catches_up_incrementally(tmp_path):
    log = tmp_path / "log"
    log.mkdir()
    seed = write_seed_lake(SPEC, str(tmp_path / "seed.parquet"))
    eng = CDCEngine(str(tmp_path / "lake"), num_partitions=4)
    eng.bootstrap(seed)

    publish(log, 2)
    waves = eng.tail(str(log), wave_size=600, poll_interval_s=0.05,
                     max_idle_polls=1)
    assert eng.watermark == 2 * SPEC.chunk_size
    assert len([w for w in waves if not w.get("skipped")]) >= 2

    publish(log, N_CHUNKS)                 # publisher appends more
    eng.tail(str(log), wave_size=600, poll_interval_s=0.05,
             max_idle_polls=1)
    assert eng.watermark == SPEC.n_events
    assert eng.lake_table().select(COLS).to_pylist() == oracle()


def test_tail_with_concurrent_publisher(tmp_path):
    """Publisher appends segments while tail runs; tail must converge to
    the full oracle state with no dup/loss."""
    log = tmp_path / "log"
    log.mkdir()
    seed = write_seed_lake(SPEC, str(tmp_path / "seed.parquet"))
    eng = CDCEngine(str(tmp_path / "lake"), num_partitions=4)
    eng.bootstrap(seed)
    publish(log, 1)

    def writer():
        for i in range(2, N_CHUNKS + 1):
            time.sleep(0.3)
            publish(log, i)

    t = threading.Thread(target=writer)
    t.start()
    eng.tail(str(log), wave_size=500, poll_interval_s=0.1,
             max_idle_polls=8)
    t.join()
    eng.tail(str(log), wave_size=500, poll_interval_s=0.05,
             max_idle_polls=1)              # drain any final segment
    assert eng.watermark == SPEC.n_events
    assert eng.lake_table().select(COLS).to_pylist() == oracle()


def test_prune_outbox_guard(tmp_path):
    from aqueduct_core_ray.pipelines.replay import CDCEngine
    from aqueduct_core_ray.sources.changelog import write_seed_lake
    import pytest as _pytest

    log = tmp_path / "log"
    log.mkdir()
    publish(log, N_CHUNKS)
    seed = write_seed_lake(SPEC, str(tmp_path / "seed.parquet"))
    eng = CDCEngine(str(tmp_path / "lake"), num_partitions=4,
                    emit_changelog=True)
    eng.bootstrap(seed)
    eng.replay(str(log), SPEC.wave_bounds)

    with _pytest.raises(ValueError):
        eng.prune_outbox(below_lsn=SPEC.n_events,
                         min_child_hwm=SPEC.n_events // 2)
    removed = eng.prune_outbox(below_lsn=SPEC.n_events // 2,
                               min_child_hwm=SPEC.n_events // 2)
    assert removed > 0
    # remaining segments still cover (min_child_hwm, n_events]
    assert eng.discover_watermark(eng.outbox_dir) == SPEC.n_events


def test_adaptive_backoff_schedule(tmp_path, monkeypatch):
    """Idle polls back off exponentially from poll_interval_s to the
    poll_max_s cap; catching-up polls never sleep. Pin the schedule by
    intercepting time.sleep."""
    import json

    from aqueduct_core_ray.pipelines import replay as replay_mod

    log = tmp_path / "log"
    log.mkdir()
    publish(log, 1)
    eng = CDCEngine(str(tmp_path / "lake"), num_partitions=4)
    delays = []
    monkeypatch.setattr(replay_mod.time, "sleep",
                        lambda s: delays.append(round(s, 4)))
    eng.tail(str(log), wave_size=200, poll_interval_s=0.1,
             max_idle_polls=5, poll_max_s=0.4)
    assert eng.watermark == SPEC.chunk_size
    # caught up after the catch-up waves, then 5 idle polls: 0.1, 0.2,
    # 0.4, capped at 0.4 thereafter — pinned from the engine's own
    # per-poll metrics (authoritative: the patched time.sleep is the
    # STDLIB sleep, so `delays` may also catch sleeps from unrelated
    # libraries running in-process)
    recs = [json.loads(line) for line in
            open(tmp_path / "lake" / "metrics.jsonl")]
    polls = [r for r in recs if r.get("poll")]
    idle_sleeps = [r["sleep_s"] for r in polls if r["idle_polls"]]
    assert idle_sleeps == [0.1, 0.2, 0.4, 0.4, 0.4]
    assert any(r["lag_events"] > 0 and r["sleep_s"] == 0 for r in polls)
    # every scheduled idle sleep was actually requested, in order
    # (subsequence test tolerates interleaved foreign sleeps)
    it = iter(delays)
    assert all(any(d == s for d in it) for s in idle_sleeps)


def test_follower_failover_three_level_chain(tmp_path):
    """Kill the middle till of a 3-level chain mid-stream: the leaf,
    tailing the ordered follow list [mid outbox, root outbox], must
    detect the dead parent via the stale _STATE heartbeat, re-point to
    the root (the reference's requestedToFollow walk, cloud default)
    and converge to the root's exact state."""
    import json

    log = tmp_path / "log"
    log.mkdir()
    publish(log, 2)                              # first half of the stream

    root = CDCEngine(str(tmp_path / "root"), num_partitions=4,
                     emit_changelog=True, derivations=())
    root.tail(str(log), wave_size=400, poll_interval_s=0.01,
              max_idle_polls=1)
    mid = CDCEngine(str(tmp_path / "mid"), num_partitions=3,
                    emit_changelog=True, derivations=())
    mid.tail(root.outbox_dir, wave_size=400, poll_interval_s=0.01,
             max_idle_polls=1, consumer_id="mid")
    leaf = CDCEngine(str(tmp_path / "leaf"), num_partitions=2,
                     derivations=())
    follow = [mid.outbox_dir, root.outbox_dir]
    leaf.tail(follow, wave_size=400, poll_interval_s=0.01,
              max_idle_polls=1, consumer_id="leaf")
    assert leaf.watermark == 2 * SPEC.chunk_size
    assert leaf.consistency_sum() == mid.consistency_sum()

    # stream continues; the MID TILL IS DEAD (its tail loop never runs
    # again, so its outbox heartbeat goes stale) while root keeps up
    publish(log, N_CHUNKS)
    root.tail(str(log), wave_size=400, poll_interval_s=0.01,
              max_idle_polls=1)
    assert root.watermark == SPEC.n_events
    time.sleep(0.35)                             # heartbeat goes stale

    # max_idle_polls sized so the observed-staleness window (the
    # elapsed-time gate on heartbeat-stale failover) can elapse
    leaf.tail(follow, wave_size=400, poll_interval_s=0.02,
              max_idle_polls=6, consumer_id="leaf",
              dead_after_s=0.3, failover_after=2)
    assert leaf.watermark == SPEC.n_events
    assert leaf.consistency_sum() == root.consistency_sum()
    cols = ["doc_id", "last_lsn", "n_tok"]
    assert leaf.lake_table().select(cols).equals(
        root.lake_table().select(cols))
    # the failover event is on record
    recs = [json.loads(line) for line in
            open(tmp_path / "leaf" / "metrics.jsonl")]
    fo = [r for r in recs if "failover_from" in r]
    assert fo and fo[0]["failover_from"] == mid.outbox_dir
    assert fo[0]["failover_to"] == root.outbox_dir


def test_failover_skips_vanished_parent_dir(tmp_path):
    """A parent whose outbox directory disappears entirely (machine
    gone) is immediately eligible for failover; a single-parent tail
    still surfaces the error."""
    import pytest as _pytest
    import shutil

    log = tmp_path / "log"
    log.mkdir()
    publish(log, 2)
    root = CDCEngine(str(tmp_path / "root"), num_partitions=4,
                     emit_changelog=True, derivations=())
    root.tail(str(log), wave_size=500, poll_interval_s=0.01,
              max_idle_polls=1)
    gone = str(tmp_path / "vanished_outbox")
    leaf = CDCEngine(str(tmp_path / "leaf"), num_partitions=2,
                     derivations=())
    leaf.tail([gone, root.outbox_dir], wave_size=500,
              poll_interval_s=0.01, max_idle_polls=2,
              dead_after_s=0.1, failover_after=1)
    assert leaf.watermark == root.watermark
    solo = CDCEngine(str(tmp_path / "solo"), num_partitions=2,
                     derivations=())
    with _pytest.raises(OSError):
        solo.tail(gone, poll_interval_s=0.01, max_idle_polls=1)


def test_failover_with_consumer_id_never_resurrects_parent(tmp_path):
    """Regression: with consumer_id set, the consumer-HWM write used to
    recreate a vanished parent's directory BEFORE the liveness probe,
    which then classified the resurrected empty dir as a live plain log
    and defeated failover forever."""
    import os

    log = tmp_path / "log"
    log.mkdir()
    publish(log, 2)
    root = CDCEngine(str(tmp_path / "root"), num_partitions=4,
                     emit_changelog=True, derivations=())
    root.tail(str(log), wave_size=500, poll_interval_s=0.01,
              max_idle_polls=1)
    gone = str(tmp_path / "vanished_outbox")
    leaf = CDCEngine(str(tmp_path / "leaf"), num_partitions=2,
                     derivations=())
    leaf.tail([gone, root.outbox_dir], wave_size=500,
              poll_interval_s=0.01, max_idle_polls=2,
              dead_after_s=0.1, failover_after=1, consumer_id="leaf")
    assert leaf.watermark == root.watermark
    # the dead machine's directory was NOT recreated on disk
    assert not os.path.exists(gone)
    # the consumer registered against the parent it actually follows
    assert "leaf" in root.consumer_hwms()
