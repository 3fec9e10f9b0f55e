"""Time travel + generation diff: historical reads are byte-stable,
diffs match an independent pandas comparison of the two snapshots, and
unchanged partitions are skipped (entry-identity fast path)."""

import pandas as pd
import pyarrow as pa
import pytest

from aqueduct_core_ray.pipelines.replay import CDCEngine
from aqueduct_core_ray.sources.changelog import (
    ChangelogSpec,
    write_changelog,
    write_seed_lake,
)

SPEC = ChangelogSpec(n_docs=300, n_events=2_400, seed=7, chunk_size=600,
                     n_waves=4)


@pytest.fixture(scope="module")
def lake(tmp_path_factory):
    log = write_changelog(SPEC, str(tmp_path_factory.mktemp("log")))
    seed = write_seed_lake(SPEC,
                           str(tmp_path_factory.mktemp("seed") / "s.parquet"))
    eng = CDCEngine(str(tmp_path_factory.mktemp("lake") / "lake"),
                    num_partitions=8, sidecar_frac=0.5)
    eng.bootstrap(seed)
    eng.replay(log, SPEC.wave_bounds)
    return eng


def _snap(eng: CDCEngine, gen: int) -> pd.DataFrame:
    df = (eng.read_lake(columns=["doc_id", "last_lsn"], generation=gen)
          .to_pandas())
    return df.sort_values("doc_id").reset_index(drop=True)


def test_time_travel_read_matches_manifest_watermark(lake):
    g_cur = lake.manifest.generation
    assert g_cur >= 4                      # bootstrap + 4 waves
    # generation 0 = the bootstrap snapshot: every doc present, lsn 0
    df0 = _snap(lake, 0)
    assert len(df0) == SPEC.n_docs
    assert (df0["last_lsn"] == 0).all()
    # historical watermarks are monotone in generation
    wms = [lake.manifest_at(g).watermark for g in range(g_cur + 1)]
    assert wms == sorted(wms)
    # the generation-less read IS the current generation's read
    cur = lake.read_lake(columns=["doc_id", "last_lsn"]).to_pandas()
    cur = cur.sort_values("doc_id").reset_index(drop=True)
    assert cur.equals(_snap(lake, g_cur))


def test_diff_generations_matches_pandas(lake):
    g_cur = lake.manifest.generation
    for g_old in (0, g_cur - 2):
        a, b = _snap(lake, g_old), _snap(lake, g_cur)
        m = a.merge(b, on="doc_id", how="outer",
                    suffixes=("_old", "_new"), indicator=True)
        exp = m[(m["_merge"] != "both")
                | (m["last_lsn_old"] != m["last_lsn_new"])]
        got = (lake.diff_generations(g_old, g_cur).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        assert len(got) == len(exp)
        exp = exp.sort_values("doc_id").reset_index(drop=True)
        assert list(got["doc_id"]) == list(exp["doc_id"])
        want_change = exp["_merge"].map(
            {"right_only": "added", "left_only": "deleted",
             "both": "updated"}).to_numpy()
        assert (got["change"].to_numpy() == want_change).all()
        upd = got[got["change"] == "updated"]
        assert (upd["lsn_new"] > upd["lsn_old"]).all()
        # lsn_old is null exactly for added docs, lsn_new for deleted
        assert got["lsn_old"].isna().equals(got["change"] == "added")
        assert got["lsn_new"].isna().equals(got["change"] == "deleted")


def test_diff_same_generation_is_empty_and_skips_all(lake):
    g = lake.manifest.generation
    out = lake.diff_generations(g, g)
    assert out.count() == 0
    assert out.schema().names == ["doc_id", "change", "lsn_old", "lsn_new"]


def test_diff_defaults_to_current(lake):
    g_cur = lake.manifest.generation
    a = (lake.diff_generations(g_cur - 1).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (lake.diff_generations(g_cur - 1, g_cur).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    assert a.equals(b)
    # a single wave touches a subset: the diff is O(touched), non-empty
    assert 0 < len(a) <= SPEC.n_events


def test_unknown_generation_raises(lake):
    with pytest.raises(ValueError):
        lake.manifest_at(9999)
    with pytest.raises(ValueError):
        lake.diff_generations(9999)


def _table(eng, gen=None):
    df = (eng.read_lake(columns=["doc_id", "last_lsn"], generation=gen)
          .to_pandas().sort_values("doc_id").reset_index(drop=True))
    return df


def test_clone_historical_generation(lake, tmp_path):
    snap = _table(lake, gen=1)
    clone = lake.clone_lake(str(tmp_path / "hist"), generation=1)
    assert clone.watermark == lake.manifest_at(1).watermark
    assert _table(clone).equals(snap)


def test_clone_refuses_existing_lake(lake, tmp_path):
    lake.clone_lake(str(tmp_path / "c1"))
    with pytest.raises(ValueError):
        lake.clone_lake(str(tmp_path / "c1"))

def test_clone_lake_branches_independently(lake, tmp_path):
    import os

    src_state = _table(lake)
    g_src = lake.manifest.generation
    clone = lake.clone_lake(str(tmp_path / "branch"))
    assert clone.manifest.generation == 0
    assert clone.watermark == lake.watermark
    assert _table(clone).equals(src_state)
    # branch is writable: replay one more synthetic wave into the CLONE
    from aqueduct_core_ray.sources.changelog import (
        ChangelogSpec, write_changelog)
    more = ChangelogSpec(n_docs=SPEC.n_docs,
                         n_events=SPEC.n_events + 600, seed=7,
                         chunk_size=600, n_waves=5)
    log2 = write_changelog(more, str(tmp_path / "log2"))
    clone.replay(log2, [more.wave_bounds[-1]])
    assert clone.watermark > lake.watermark
    # ...the SOURCE is untouched...
    assert lake.manifest.generation == g_src
    assert _table(lake).equals(src_state)
    # ...and vacuuming the source does not break the clone (hardlinks:
    # each branch owns its directory entries)
    lake.store.vacuum(keep_generations=1)
    diff = clone.diff_generations(0)
    assert diff.count() > 0                 # the extra wave changed docs
    assert _table(clone, gen=0).equals(src_state)
    assert os.path.exists(os.path.join(str(tmp_path / "branch"), "CURRENT"))


def test_time_travel_past_vacuum_window_fails_loudly(tmp_path):
    from aqueduct_core_ray.sources.changelog import (
        ChangelogSpec, write_changelog, write_seed_lake)

    spec = ChangelogSpec(n_docs=120, n_events=600, seed=3,
                         chunk_size=300, n_waves=2)
    log = write_changelog(spec, str(tmp_path / "log"))
    seed = write_seed_lake(spec, str(tmp_path / "seed" / "s.parquet"))
    eng = CDCEngine(str(tmp_path / "lake"), num_partitions=4,
                    sidecar_frac=0.0)
    eng.bootstrap(seed)
    eng.replay(log, spec.wave_bounds)
    eng.store.vacuum(keep_generations=1)
    # the manifest itself is still loadable (tiny JSON, never vacuumed)
    assert eng.manifest_at(0).generation == 0
    # ...but reading generation 0's data fails loudly, not silently
    with pytest.raises(Exception):
        eng.read_lake(generation=0).to_pandas()
    # CURRENT stays fully readable
    assert eng.read_lake().count() > 0


@pytest.fixture(scope="module")
def feed_lake(tmp_path_factory):
    """Own lake for the changefeed tests: the shared ``lake`` fixture is
    vacuumed by the clone test above, dropping its generation-0 files."""
    log = write_changelog(SPEC, str(tmp_path_factory.mktemp("flog")))
    seed = write_seed_lake(
        SPEC, str(tmp_path_factory.mktemp("fseed") / "s.parquet"))
    eng = CDCEngine(str(tmp_path_factory.mktemp("flake") / "lake"),
                    num_partitions=8, sidecar_frac=0.5)
    eng.bootstrap(seed)
    eng.replay(log, SPEC.wave_bounds)
    return eng


def test_diff_payload_columns_changefeed(feed_lake):
    """payload_columns upgrades the diff to a changefeed: added/updated
    rows carry the NEW generation's values, deleted rows carry null."""
    import ray as _ray
    lake = feed_lake
    g_cur = lake.manifest.generation
    # consume as Arrow: Ray's pandas block build would try (and fail)
    # to tensor-cast the ragged tokens lists with nulls
    tabs = [t for t in _ray.get(
        lake.diff_generations(0, payload_columns=["tokens", "n_tok",
                                                  "source"])
        .to_arrow_refs()) if t.num_rows]
    feed = pa.concat_tables(tabs, promote_options="default").to_pandas()
    plain = lake.diff_generations(0).to_pandas()
    # same change set as the narrow diff, plus the payload columns
    key = ["doc_id", "change", "lsn_old", "lsn_new"]
    assert (feed[key].sort_values("doc_id").reset_index(drop=True)
            .equals(plain[key].sort_values("doc_id")
                    .reset_index(drop=True)))
    cur = (lake.read_lake(columns=["doc_id", "tokens", "n_tok", "source"],
                          generation=g_cur)
           .to_pandas().set_index("doc_id"))
    feed = feed.set_index("doc_id")
    live = feed[feed["change"] != "deleted"]
    assert len(live) > 0 and (feed["change"] == "deleted").any()
    for did, row in live.iterrows():
        assert list(row["tokens"]) == list(cur.loc[did, "tokens"])
        assert int(row["n_tok"]) == int(cur.loc[did, "n_tok"])
        assert row["source"] == cur.loc[did, "source"]
    dead = feed[feed["change"] == "deleted"]
    assert dead["tokens"].isna().all()
    assert dead["n_tok"].isna().all()
    assert dead["source"].isna().all()


def test_diff_payload_unknown_column_ignored_and_empty_diff_schema(
        feed_lake):
    lake = feed_lake
    g_cur = lake.manifest.generation
    # unknown columns are dropped, not an error
    d = lake.diff_generations(0, payload_columns=["nope", "n_tok"])
    assert "nope" not in d.schema().names and "n_tok" in d.schema().names
    # g -> g empty diff still carries the payload columns in its schema
    e = lake.diff_generations(g_cur, g_cur, payload_columns=["n_tok"])
    assert e.count() == 0 and "n_tok" in e.schema().names


def _sorted_df(t: pa.Table) -> pd.DataFrame:
    return (t.to_pandas().sort_values("doc_id").reset_index(drop=True))


def test_restore_rolls_back_and_reconverges(tmp_path):
    """restore(g): the lake equals generation g's view, the watermark
    moves back with it, a re-replay of the same log re-converges to the
    pre-restore final state, and restoring an unknown generation
    raises."""
    log = write_changelog(SPEC, str(tmp_path / "log"))
    seed = write_seed_lake(SPEC, str(tmp_path / "s.parquet"))
    eng = CDCEngine(str(tmp_path / "lake"), num_partitions=8)
    eng.bootstrap(seed)
    eng.replay(log, SPEC.wave_bounds)
    final = _sorted_df(eng.lake_table())
    final_cs = eng.checksum()
    g_cur = eng.manifest.generation

    g_mid = 2
    want_mid = (eng.read_lake(generation=g_mid).to_pandas()
                .sort_values("doc_id").reset_index(drop=True))
    r = eng.restore(g_mid)
    assert r["generation"] == g_cur + 1
    assert eng.watermark == eng.manifest_at(g_mid).watermark
    got_mid = _sorted_df(eng.lake_table())
    pd.testing.assert_frame_equal(got_mid[want_mid.columns], want_mid)
    # rolled-back history is still readable (restore never deletes)
    assert eng.read_lake(generation=g_cur).count() == len(final)

    # re-replay the SAME schedule: skipped waves skip, the rest
    # re-apply deterministically -> identical final state + signatures
    eng.replay(log, SPEC.wave_bounds)
    pd.testing.assert_frame_equal(_sorted_df(eng.lake_table()), final)
    assert eng.checksum().equals(final_cs)

    with pytest.raises(ValueError):
        eng.restore(eng.manifest.generation + 5)


def test_restore_refuses_vacuumed_generation(tmp_path):
    """After vacuum shrinks the keep window, restore to a collected
    generation fails loudly (never a silent partial rollback)."""
    log = write_changelog(SPEC, str(tmp_path / "log"))
    seed = write_seed_lake(SPEC, str(tmp_path / "s.parquet"))
    eng = CDCEngine(str(tmp_path / "lake"), num_partitions=4)
    eng.bootstrap(seed)
    eng.replay(log, SPEC.wave_bounds)
    eng.vacuum(keep_generations=1)
    with pytest.raises(ValueError, match="vacuumed|generation"):
        eng.restore(0)
    # CURRENT remains intact and readable
    assert eng.read_lake().count() > 0
