"""Hot-key skew conformance (north_rule: explicit handling of high-churn
doc_ids).

The engine's skew defenses, exercised here:
1. per-block LWW pre-compaction (the combiner): a block contributes at
   most ONE row per doc_id to the exchange, so a doc receiving half the
   wave's churn adds O(blocks) rows to its partition's delta, not
   O(events);
2. for the groupby strategy, optional salting splits a hot partition's
   pre-combined traffic into sub-groups merged in-partition.

Both strategies must produce the oracle state bit-for-bit under a
pathological workload (hot_set=1: ~half of all updates/deletes hit a
single doc).
"""

import pyarrow.parquet as pq
import pytest

from aqueduct_core_ray.pipelines.replay import CDCEngine
from aqueduct_core_ray.sources.changelog import (
    ChangelogSpec,
    changelog_table,
    seed_lake,
    write_changelog,
    write_seed_lake,
)

from oracle_replay import oracle_table, replay_oracle

SPEC = ChangelogSpec(n_docs=400, n_events=8_000, seed=11, chunk_size=1_000,
                     n_waves=2, hot_set=1, zipf_s=2.0)
COLS = ["doc_id", "tokens", "n_tok", "source", "last_lsn"]


@pytest.fixture(scope="module")
def inputs(tmp_path_factory):
    log = write_changelog(SPEC, str(tmp_path_factory.mktemp("log")))
    seed = write_seed_lake(
        SPEC, str(tmp_path_factory.mktemp("s") / "seed.parquet"))
    return log, seed


def oracle():
    return oracle_table(
        replay_oracle(changelog_table(SPEC),
                      seed=seed_lake(SPEC.n_docs, seed=SPEC.seed)), COLS)


@pytest.mark.parametrize("strategy,salt", [
    ("exchange", 0), ("groupby", 0), ("groupby", 4),
])
def test_hot_key_replay_matches_oracle(inputs, tmp_path, strategy, salt):
    log, seed = inputs
    eng = CDCEngine(str(tmp_path / f"lake-{strategy}-{salt}"),
                    num_partitions=8, merge_strategy=strategy, salt=salt)
    eng.bootstrap(seed)
    eng.replay(log, SPEC.wave_bounds)
    assert eng.lake_table().select(COLS).to_pylist() == oracle()


def test_combiner_bounds_hot_key_delta(inputs, tmp_path):
    """The exchange must carry at most one row per (block, doc_id): with
    hot_set=1, the hot doc's partition delta is bounded by the block
    count, not the event count."""
    log, seed = inputs
    eng = CDCEngine(str(tmp_path / "lake"), num_partitions=8)
    eng.bootstrap(seed)

    from aqueduct_core_ray.stages.merge_apply import prep_wave_batch
    ds = eng.wave_dataset(log, 0, SPEC.n_events)
    prepped = ds.map_batches(
        prep_wave_batch, batch_format="pyarrow", batch_size=None,
        fn_kwargs={"num_partitions": 8, "salt": 0})
    n_blocks = 0
    max_per_doc_per_block = 0
    import pyarrow.compute as pc
    for b in prepped.iter_batches(batch_size=None, batch_format="pyarrow"):
        n_blocks += 1
        counts = b.group_by("doc_id").aggregate([("doc_id", "count")])
        max_per_doc_per_block = max(
            max_per_doc_per_block,
            pc.max(counts.column("doc_id_count")).as_py())
    assert max_per_doc_per_block == 1
    # sanity: the workload IS skewed — the hot doc got a large share
    t = changelog_table(SPEC)
    hot_count = (t.group_by("doc_id").aggregate([("lsn", "count")])
                 .sort_by([("lsn_count", "descending")]))
    assert hot_count.column("lsn_count")[0].as_py() > SPEC.n_events // 10


def test_detect_hot_keys(inputs, tmp_path):
    """The per-wave heavy-hitter sketch must surface the planted hot doc
    (hot_set=1: ~half of churn hits one key) and not flood with cold
    keys."""
    from aqueduct_core_ray.partitioning import detect_hot_keys
    from aqueduct_core_ray.pipelines.replay import CDCEngine

    log, _ = inputs
    eng = CDCEngine(str(tmp_path / "lake"), num_partitions=8)
    ds = eng.wave_dataset(log, 0, SPEC.n_events)
    hot = detect_hot_keys(ds, min_frac=0.05)
    assert len(hot) >= 1
    # the planted hot doc is the single most frequent key in the stream
    t = changelog_table(SPEC)
    counts = t.group_by("doc_id").aggregate([("lsn", "count")])
    top = counts.sort_by([("lsn_count", "descending")])
    assert top.column("doc_id")[0].as_py() in hot
    assert len(hot) <= 10
