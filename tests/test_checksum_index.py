"""Before-image changefeed (Debezium envelope) + the O(delta)-maintained
checksum index: delta-refreshed signatures must equal a full rescan."""

import pandas as pd
import pytest

from aqueduct_core_ray.pipelines.replay import CDCEngine
from aqueduct_core_ray.sources.changelog import (
    ChangelogSpec,
    write_changelog,
    write_seed_lake,
)
from aqueduct_core_ray.state.checksums import LakeChecksumIndex

SPEC = ChangelogSpec(n_docs=250, n_events=2_000, seed=11, chunk_size=500,
                     n_waves=4)
COLS = ["doc_id", "tokens", "n_tok", "source", "last_lsn"]


@pytest.fixture(scope="module")
def parts(tmp_path_factory):
    log = write_changelog(SPEC, str(tmp_path_factory.mktemp("log")))
    seed = write_seed_lake(
        SPEC, str(tmp_path_factory.mktemp("s") / "seed.parquet"))
    return log, seed


def test_before_image_changefeed(parts, tmp_path):
    """diff_generations(before_image=True): <col>_old carries the OLD
    generation's value for updated/deleted docs, null for added; <col>
    keeps the after-image contract."""
    log, seed = parts
    eng = CDCEngine(str(tmp_path / "lake"), num_partitions=6)
    eng.bootstrap(seed)
    eng.replay(log, SPEC.wave_bounds)
    g = eng.manifest.generation
    old = (eng.read_lake(columns=["doc_id", "n_tok"], generation=0)
           .to_pandas().set_index("doc_id"))
    new = (eng.read_lake(columns=["doc_id", "n_tok"])
           .to_pandas().set_index("doc_id"))
    diff = eng.diff_generations(
        0, g, payload_columns=["n_tok"], before_image=True).to_pandas()
    assert "n_tok_old" in diff.columns
    assert (diff.change == "updated").any()
    assert (diff.change == "deleted").any()
    for r in diff.itertuples():
        if r.change == "added":
            assert pd.isna(r.n_tok_old)
            assert r.n_tok == new.loc[r.doc_id, "n_tok"]
        elif r.change == "deleted":
            assert pd.isna(r.n_tok)
            assert r.n_tok_old == old.loc[r.doc_id, "n_tok"]
        else:
            assert r.n_tok_old == old.loc[r.doc_id, "n_tok"]
            assert r.n_tok == new.loc[r.doc_id, "n_tok"]


def test_checksum_index_matches_full_scan(parts, tmp_path):
    """Delta-maintained signatures == CDCEngine.checksum's full rescan
    after waves carrying updates and deletes; refresh is idempotent; a
    fresh bootstrap at the same generation agrees."""
    log, seed = parts
    eng = CDCEngine(str(tmp_path / "lake"), num_partitions=6)
    eng.bootstrap(seed)
    bounds = SPEC.wave_bounds
    eng.replay(log, bounds[:1])
    idx = LakeChecksumIndex(eng, str(tmp_path / "cks"), columns=COLS)
    assert idx.refresh()["mode"] == "full"
    assert idx.signatures().equals(eng.checksum(columns=COLS))

    eng.replay(log, bounds[1:])
    assert idx.refresh()["mode"] == "delta"
    assert idx.signatures().equals(eng.checksum(columns=COLS))
    assert idx.refresh()["mode"] == "noop"

    idx2 = LakeChecksumIndex(eng, str(tmp_path / "cks2"), columns=COLS)
    idx2.refresh()
    assert idx2.signatures().equals(idx.signatures())


def test_post_commit_hook_maintains_index_in_stream(parts, tmp_path):
    """CDCEngine(post_commit=...): the checksum index refreshes after
    EVERY wave commit (bootstrap included) with no manual calls — the
    in-process CDC-consumer hook. Final maintained signatures equal a
    full rescan, and the hook saw every generation."""
    log, seed = parts
    seen = []
    holder = {}

    def keep_fresh(eng, rec):
        holder.setdefault(
            "idx", LakeChecksumIndex(eng, str(tmp_path / "cks"),
                                     columns=COLS))
        holder["idx"].refresh()
        seen.append(rec["generation"])

    eng = CDCEngine(str(tmp_path / "lake"), num_partitions=6,
                    post_commit=(keep_fresh,))
    eng.bootstrap(seed)
    eng.replay(log, SPEC.wave_bounds)
    assert seen == sorted(seen) and len(seen) >= 1 + SPEC.n_waves
    assert holder["idx"].signatures().equals(eng.checksum(columns=COLS))


def test_checksum_index_random_schedules(tmp_path):
    """Seeded-random churn specs, partition counts and wave schedules:
    after EVERY wave the delta-maintained signatures equal a full
    rescan — the XOR algebra holds under arbitrary interleavings of
    inserts, updates and tombstones."""
    import numpy as np
    rng = np.random.default_rng(5)
    for trial in range(3):
        spec = ChangelogSpec(n_docs=int(rng.integers(20, 60)),
                             n_events=int(rng.integers(100, 300)),
                             seed=int(rng.integers(1, 1000)),
                             chunk_size=50, n_waves=1)
        log = write_changelog(spec, str(tmp_path / f"log{trial}"))
        seedp = write_seed_lake(spec,
                                str(tmp_path / f"s{trial}.parquet"))
        eng = CDCEngine(str(tmp_path / f"lake{trial}"),
                        num_partitions=int(rng.integers(2, 7)))
        eng.bootstrap(seedp)
        idx = LakeChecksumIndex(eng, str(tmp_path / f"cks{trial}"),
                                columns=COLS)
        idx.refresh()
        cuts = sorted(set(rng.integers(
            1, spec.n_events, size=3).tolist()) | {spec.n_events})
        lo = 0
        for hi in cuts:
            eng.replay(log, [(lo, hi)])
            idx.refresh()
            assert idx.signatures().equals(
                eng.checksum(columns=COLS)), (trial, lo, hi)
            lo = hi


def test_checksum_index_rebuilds_after_vacuum(parts, tmp_path):
    """Review-finding regression: if vacuum collected the indexed
    generation's files, refresh() falls back to a FULL rebuild instead
    of crashing in the diff."""
    log, seed = parts
    eng = CDCEngine(str(tmp_path / "lake"), num_partitions=4)
    eng.bootstrap(seed)
    bounds = SPEC.wave_bounds
    eng.replay(log, bounds[:1])
    idx = LakeChecksumIndex(eng, str(tmp_path / "cks"), columns=COLS)
    assert idx.refresh()["mode"] == "full"
    eng.replay(log, bounds[1:])
    eng.optimize(keep_generations=1)         # vacuums the indexed gen
    r = idx.refresh()
    assert r["mode"] in ("rebuild", "delta")
    assert idx.signatures().equals(eng.checksum(columns=COLS))


def test_post_commit_hook_failure_never_loses_the_commit(parts, tmp_path):
    """A hook exception aborts the wave loop AFTER the durable commit;
    a resumed engine (no hook) skips the committed waves and finishes
    to the exact same state as an uninterrupted run."""
    log, seed = parts
    calls = []

    def boom(eng, rec):
        calls.append(rec["generation"])
        if len(calls) == 2:                   # fail on the 2nd commit
            raise RuntimeError("hook down")

    eng = CDCEngine(str(tmp_path / "lake"), num_partitions=4,
                    post_commit=(boom,))
    eng.bootstrap(seed)
    import pytest as _pytest
    with _pytest.raises(RuntimeError):
        eng.replay(log, SPEC.wave_bounds)
    committed = eng.manifest.watermark
    assert committed == SPEC.wave_bounds[0][1]   # wave 1 IS durable

    res = CDCEngine(str(tmp_path / "lake"), num_partitions=4)
    out = res.replay(log, SPEC.wave_bounds)
    assert any(r.get("skipped") for r in out)    # committed wave skipped
    ref = CDCEngine(str(tmp_path / "ref"), num_partitions=4)
    ref.bootstrap(seed)
    ref.replay(log, SPEC.wave_bounds)
    assert res.checksum(columns=COLS).equals(ref.checksum(columns=COLS))
