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
