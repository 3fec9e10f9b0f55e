"""Generator determinism + contract (FIXTURES.md §1.2; ordering contract
from the reference: Writer.java:5-9 — offsets strictly increasing, unique)."""

import numpy as np
import pyarrow.compute as pc

from aqueduct_core_ray.sources.changelog import (
    ChangelogSpec,
    changelog_chunk,
    changelog_table,
    seed_lake,
)

SPEC = ChangelogSpec(n_docs=500, n_events=4_000, seed=42, chunk_size=1_000)


def test_deterministic():
    a = changelog_table(SPEC)
    b = changelog_table(SPEC)
    assert a.equals(b)


def test_chunks_independent():
    full = changelog_table(SPEC)
    c2 = changelog_chunk(SPEC, 2)
    assert full.slice(2_000, 1_000).equals(c2)


def test_lsn_strictly_increasing_unique():
    t = changelog_table(SPEC)
    lsn = t.column("lsn").to_numpy()
    assert (np.diff(lsn) > 0).all()
    assert lsn[0] == 1 and lsn[-1] == SPEC.n_events


def test_mix_and_tombstones():
    t = changelog_table(SPEC)
    op = t.column("op").to_numpy()
    frac_del = (op == 1).mean()
    assert 0.05 < frac_del < 0.15
    dels = t.filter(pc.equal(t.column("op"), 1))
    assert dels.column("tokens").null_count == dels.num_rows
    assert dels.column("n_tok").null_count == dels.num_rows
    # tombstones keep their source (type-filtered subscriptions see deletes)
    assert dels.column("source").null_count == 0


def test_ts_monotone_with_lsn():
    t = changelog_table(SPEC)
    ts = t.column("ts").to_numpy()
    assert (np.diff(ts.astype("int64")) >= 0).all()


def test_seed_lake_deterministic():
    a = seed_lake(200, seed=42)
    b = seed_lake(200, seed=42)
    assert a.equals(b)
    assert a.num_rows == 200
    assert a.column("doc_id").to_pylist()[0] == "doc00000000"
    n_tok = a.column("n_tok").to_numpy()
    lens = pc.list_value_length(a.column("tokens")).to_numpy()
    assert (n_tok == lens).all()


def test_hot_key_skew_present():
    t = changelog_table(ChangelogSpec(n_docs=2_000, n_events=20_000,
                                      chunk_size=20_000))
    upd = t.filter(pc.equal(t.column("op"), 0))
    counts = np.unique(upd.column("doc_id").to_numpy(zero_copy_only=False),
                       return_counts=True)[1]
    # the Zipf head must be visibly hotter than the median doc
    assert counts.max() > 20 * np.median(counts)
