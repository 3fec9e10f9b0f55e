"""Background absorbs (bg_absorb=True): waves never pay the O(base)
rewrite inline — over-threshold partitions keep staging sidecars and
the absorbing rewrite runs as an async task adopted by a later wave's
commit. State must equal the synchronous engine's on any schedule;
discarded/orphaned absorbs must never corrupt anything."""

import pyarrow as pa
import pytest

from aqueduct_core_ray.pipelines.replay import CDCEngine
from aqueduct_core_ray.sources.changelog import (
    ChangelogSpec,
    write_changelog,
    write_seed_lake,
)

SPEC = ChangelogSpec(n_docs=400, n_events=4_000, seed=21, chunk_size=500,
                     n_waves=8)


@pytest.fixture(scope="module")
def inputs(tmp_path_factory):
    log = write_changelog(SPEC, str(tmp_path_factory.mktemp("log")))
    seed = write_seed_lake(
        SPEC, str(tmp_path_factory.mktemp("s") / "seed.parquet"))
    return log, seed


def _table(eng):
    return eng.lake_table().sort_by("doc_id")


def test_bg_absorb_state_equals_sync_engine(tmp_path):
    # deferral-regime fixture: per-partition wave deltas stay well
    # under the base size (12k docs vs <=4k touched), so bg mode must
    # NEVER absorb inline — sidecar_frac=0.1 guarantees waves do cross
    # the absorb threshold (the sync engine absorbs; bg defers)
    spec = ChangelogSpec(n_docs=12_000, n_events=4_000, seed=21,
                         chunk_size=500, n_waves=8)
    log = write_changelog(spec, str(tmp_path / "log"))
    seed = write_seed_lake(spec, str(tmp_path / "seed" / "seed.parquet"))
    sync = CDCEngine(str(tmp_path / "sync"), num_partitions=6,
                     sidecar_frac=0.1, bg_absorb=False)
    sync.bootstrap(seed)
    sync.replay(log, spec.wave_bounds)

    bg = CDCEngine(str(tmp_path / "bg"), num_partitions=6,
                   sidecar_frac=0.1, bg_absorb=True)
    bg.bootstrap(seed)
    bg.replay(log, spec.wave_bounds)
    # logical state identical regardless of adoption timing
    assert _table(bg).equals(_table(sync))
    assert bg.consistency_sum() == sync.consistency_sum()
    # waves never paid an inline absorb: no full rewrites after
    # bootstrap (bootstraps and empty-base merges are the only 'full')
    import json
    import os
    fulls = 0
    with open(os.path.join(bg.store.root, "metrics.jsonl")) as f:
        for line in f:
            r = json.loads(line)
            if r.get("generation", 0) > 0:
                fulls += r.get("full_parts", 0)
    assert fulls == 0
    # settle: adopt whatever is still in flight; state unchanged,
    # chains shortened where adopted
    before = _table(bg)
    n = bg.settle_absorbs()
    assert _table(bg).equals(before)
    assert bg._bg == {} or n >= 0
    # lazy accounting still agrees with the sync engine
    assert bg.logical_rows() == sync.logical_rows()


def test_bg_absorb_convergence_wave_merges_inline(inputs, tmp_path):
    """The deferral exception: once a wave's pending delta reaches the
    base's own size, the sidecar write is already O(base)-sized and a
    background absorb would rewrite everything AGAIN — so a
    convergence-style wave (all 4k events in one wave over a 400-doc
    base) merges inline even under bg_absorb=True, and state still
    equals the sync engine's."""
    log, seed = inputs
    bg = CDCEngine(str(tmp_path / "bgconv"), num_partitions=6,
                   sidecar_frac=0.4, bg_absorb=True)
    bg.bootstrap(seed)
    bg.replay(log, [(0, SPEC.n_events)])      # one giant wave
    import json
    import os
    fulls = 0
    with open(os.path.join(bg.store.root, "metrics.jsonl")) as f:
        for line in f:
            r = json.loads(line)
            if r.get("generation", 0) > 0:
                fulls += r.get("full_parts", 0)
    assert fulls > 0                  # paid the inline merge, by design
    sync = CDCEngine(str(tmp_path / "syncconv"), num_partitions=6,
                     sidecar_frac=0.4, bg_absorb=False)
    sync.bootstrap(seed)
    sync.replay(log, [(0, SPEC.n_events)])
    assert _table(bg).equals(_table(sync))


def test_bg_absorb_adoption_happens(inputs, tmp_path):
    """With waves well above the absorb threshold, at least one absorb
    must launch and at least one must be adopted across the replay (or
    by settle) — the mode must not silently degrade to sidecars-only
    with ever-growing chains."""
    import json
    import os

    log, seed = inputs
    bg = CDCEngine(str(tmp_path / "bg2"), num_partitions=4,
                   sidecar_frac=0.2, max_deltas=64, bg_absorb=True)
    bg.bootstrap(seed)
    bg.replay(log, SPEC.wave_bounds)
    launched = absorbed = 0
    with open(os.path.join(bg.store.root, "metrics.jsonl")) as f:
        for line in f:
            r = json.loads(line)
            launched += r.get("bg_launched", 0)
            absorbed += r.get("bg_absorbed", 0)
    # settle may re-launch for partitions still over threshold after
    # adoption (new sidecars landed post-basis): drain to quiescence
    absorbed += bg.drain_absorbs()
    assert launched > 0
    assert absorbed > 0
    # at quiescence some partition's chain was fully absorbed and its
    # entry carries exact as-of-absorb accounting
    m = bg.manifest
    assert any(not p.get("deltas") and int(p["rows"]) >= 0
               for p in m.partitions.values())


def test_bg_absorb_crash_discards_async_work(inputs, tmp_path):
    """A crash between waves loses the in-memory absorb handles: the
    resumed engine must replay to the exact same state (orphaned staged
    absorb files are inert)."""
    log, seed = inputs
    root = str(tmp_path / "bgc")
    eng = CDCEngine(root, num_partitions=4, sidecar_frac=0.3,
                    bg_absorb=True)
    eng.bootstrap(seed)
    eng.replay(log, SPEC.wave_bounds[:4])     # stop mid-schedule
    # simulate crash: new engine instance, empty _bg
    eng2 = CDCEngine(root, num_partitions=4, sidecar_frac=0.3,
                     bg_absorb=True)
    assert eng2._bg == {}
    eng2.replay(log, SPEC.wave_bounds)        # resume: skips + continues
    sync = CDCEngine(str(tmp_path / "syncc"), num_partitions=4,
                     sidecar_frac=0.0)
    sync.bootstrap(seed)
    sync.replay(log, SPEC.wave_bounds)
    assert _table(eng2).equals(_table(sync))
    assert eng2.consistency_sum() == sync.consistency_sum()


def test_bg_absorb_chain_fold_conflict_discards(inputs, tmp_path):
    """A tiny max_deltas forces chain folds WHILE absorbs are in
    flight: the fold rewrites the chain, so the absorb's basis check
    fails and it must be discarded — never double-applied."""
    log, seed = inputs
    bg = CDCEngine(str(tmp_path / "bg3"), num_partitions=4,
                   sidecar_frac=0.2, max_deltas=2, bg_absorb=True)
    bg.bootstrap(seed)
    bg.replay(log, SPEC.wave_bounds)
    bg.settle_absorbs()
    sync = CDCEngine(str(tmp_path / "sync3"), num_partitions=4,
                     sidecar_frac=0.0)
    sync.bootstrap(seed)
    sync.replay(log, SPEC.wave_bounds)
    assert _table(bg).equals(_table(sync))
    assert bg.consistency_sum() == sync.consistency_sum()


def test_bg_absorb_with_outbox_children_converge(inputs, tmp_path):
    """Absorbs emit NO change events: a child tailing the parent's
    outbox must converge to the same LWW state whether the parent
    absorbs inline or in the background."""
    log, _ = inputs
    parent = CDCEngine(str(tmp_path / "parent"), num_partitions=4,
                       sidecar_frac=0.3, bg_absorb=True,
                       emit_changelog=True, derivations=())
    parent.replay(log, SPEC.wave_bounds)          # no seed: log-only
    child = CDCEngine(str(tmp_path / "child"), num_partitions=2,
                      derivations=())
    child.tail(parent.outbox_dir,
               wave_size=max(1, SPEC.n_events // 4),
               poll_interval_s=0.05, max_idle_polls=1)
    cols = ["doc_id", "last_lsn", "n_tok"]
    a = parent.lake_table().select(cols).sort_by("doc_id")
    b = child.lake_table().select(cols).sort_by("doc_id")
    assert a.equals(b)
    assert parent.consistency_sum() == child.consistency_sum()


def test_failed_absorb_task_never_fails_the_wave(inputs, tmp_path):
    """A crashed absorb task (vacuumed inputs, transient I/O) must be
    discarded by the adopting wave, not crash it."""
    import os

    import ray as _ray

    log, seed = inputs
    eng = CDCEngine(str(tmp_path / "bgf"), num_partitions=4,
                    sidecar_frac=0.3, bg_absorb=True)
    eng.bootstrap(seed)
    eng.replay(log, SPEC.wave_bounds[:2])

    @_ray.remote(num_cpus=1)
    def boom():
        raise RuntimeError("absorb input vanished")

    # inject a poisoned in-flight absorb handle for a real partition
    eng._bg[0] = {"wid": "absorb-poison", "ref": boom.remote()}
    os.makedirs(os.path.join(eng.store.root, "_staged", "absorb-poison"),
                exist_ok=True)
    eng.replay(log, SPEC.wave_bounds)          # must not raise
    eng.drain_absorbs()
    sync = CDCEngine(str(tmp_path / "syncf"), num_partitions=4,
                     sidecar_frac=0.0)
    sync.bootstrap(seed)
    sync.replay(log, SPEC.wave_bounds)
    assert _table(eng).equals(_table(sync))
    # poisoned staged dir was reclaimed
    assert not os.path.exists(
        os.path.join(eng.store.root, "_staged", "absorb-poison"))


def test_bg_chain_folds(inputs, tmp_path):
    """Background chain folds: in bg mode a chain-over-cap partition
    keeps staging sidecars (no inline fold on the wave critical path)
    while fold_chain_partition compacts the chain asynchronously; a
    later commit adopts the folded prefix. Base paths stay frozen, no
    inline fulls after bootstrap, post-drain chains are short, and the
    state equals a sidecar-free replay."""
    import json
    import os
    log, seed = inputs
    # sidecar_frac=5.0: absorbs never trigger — folds are the only
    # background maintenance; max_deltas=2 makes chains cross the cap
    # every other wave
    bg = CDCEngine(str(tmp_path / "bgf"), num_partitions=4,
                   sidecar_frac=5.0, max_deltas=2, bg_absorb=True)
    bg.bootstrap(seed)
    bg.replay(log, SPEC.wave_bounds[:1])
    bases = {k: p["path"] for k, p in bg.manifest.partitions.items()}
    bg.replay(log, SPEC.wave_bounds[1:])
    launched = inline_fulls = 0
    with open(os.path.join(bg.store.root, "metrics.jsonl")) as f:
        for line in f:
            m = json.loads(line)
            if m.get("wave_id") == "bootstrap":
                continue
            launched += m.get("bg_launched", 0)
            inline_fulls += m.get("full_parts", 0)
    assert launched > 0          # folds actually ran in the background
    assert inline_fulls == 0     # base never rewritten inline
    bg.drain_absorbs()
    # folds never touch the base
    assert {k: p["path"]
            for k, p in bg.manifest.partitions.items()} == bases
    # post-drain every chain is folded down to a single segment
    for p in bg.manifest.partitions.values():
        assert len(p.get("deltas") or []) <= 1
    sync = CDCEngine(str(tmp_path / "syncf"), num_partitions=4,
                     sidecar_frac=0.0)
    sync.bootstrap(seed)
    sync.replay(log, SPEC.wave_bounds)
    assert _table(bg).equals(_table(sync))
    assert bg.consistency_sum() == sync.consistency_sum()
    # lazy accounting converges to exact values
    fresh = bg.exact_partition_stats()
    for pid, p in sync.manifest.partitions.items():
        got = (fresh[int(pid)]["rows"] if int(pid) in fresh
               else bg.manifest.partitions[pid]["rows"])
        assert got == p["rows"]
    # vacuum collects superseded chain segments, live files survive
    before = bg.lake_table()
    bg.store.vacuum(keep_generations=1)
    live = set()
    for p in bg.manifest.partitions.values():
        live.add(p["path"])
        for d in p.get("deltas") or []:
            live.add(d["path"])
    for rel in live:
        assert os.path.exists(os.path.join(bg.store.root, rel)), rel
    assert bg.lake_table().equals(before)


def test_bg_fold_crash_orphans_are_harmless(inputs, tmp_path):
    """Crash with background folds in flight: a fresh engine resumes
    the replay against the same lake, completed-but-unadopted fold
    results are invisible orphans under _staged/ (never half-applied),
    the final state equals a sidecar-free replay, and vacuum collects
    the orphaned staging dirs."""
    import os
    import ray as _ray
    log, seed = inputs
    root = str(tmp_path / "lake")
    eng1 = CDCEngine(root, num_partitions=4, sidecar_frac=5.0,
                     max_deltas=2, bg_absorb=True)
    eng1.bootstrap(seed)
    eng1.replay(log, SPEC.wave_bounds[:4])
    # worst case for a crash: the fold tasks FINISH (staged files land)
    # but the engine dies before any commit adopts them
    refs = [v["ref"] for v in eng1._bg.values()]
    if refs:
        _ray.wait(refs, num_returns=len(refs))
    del eng1                                   # crash analog: no drain

    eng2 = CDCEngine(root, num_partitions=4, sidecar_frac=5.0,
                     max_deltas=2, bg_absorb=True)
    eng2.replay(log, SPEC.wave_bounds)         # resumes past watermark
    eng2.drain_absorbs()
    sync = CDCEngine(str(tmp_path / "sync"), num_partitions=4,
                     sidecar_frac=0.0)
    sync.bootstrap(seed)
    sync.replay(log, SPEC.wave_bounds)
    assert _table(eng2).equals(_table(sync))
    assert eng2.consistency_sum() == sync.consistency_sum()
    # the ENGINE vacuum knows its in-flight set and may sweep staging
    # orphans (store.vacuum alone must not touch _staged)
    eng2.vacuum(keep_generations=1)
    staged = os.path.join(root, "_staged")
    assert not os.path.isdir(staged) or os.listdir(staged) == []
