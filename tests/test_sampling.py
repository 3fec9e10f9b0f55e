"""Deterministic sampling: reproducibility, nesting, per-source rates,
mixture rebalancing toward target weights."""

import numpy as np
import pytest

from aqueduct_core_ray.functions.sampling import (
    mixture_resample,
    stratified_sample,
)

SF = "/root/testdata/sf0.01"          # 500+ docs, 4 sources


def ids(ds):
    return sorted(r["doc_id"] for r in
                  ds.select_columns(["doc_id"]).take_all())


def test_deterministic_and_nested():
    a1 = ids(stratified_sample(SF, default_frac=0.3))
    a2 = ids(stratified_sample(SF, default_frac=0.3))
    assert a1 == a2                           # reproducible
    big = set(ids(stratified_sample(SF, default_frac=0.6)))
    assert set(a1) <= big                     # nested: 30% ⊂ 60%


def test_per_source_rates():
    full = stratified_sample(SF, default_frac=1.0)
    by_src = {}
    for r in full.select_columns(["source"]).take_all():
        by_src[r["source"]] = by_src.get(r["source"], 0) + 1
    some = sorted(by_src)[0]
    kept = stratified_sample(SF, fracs={some: 0.0}, default_frac=1.0)
    got = {r["source"] for r in kept.select_columns(["source"]).take_all()}
    assert some not in got and len(got) == len(by_src) - 1

    half = stratified_sample(SF, default_frac=0.5)
    n = half.count()
    total = sum(by_src.values())
    assert 0.35 * total <= n <= 0.65 * total  # ~50% within tolerance


def test_mixture_resample_targets_weights():
    # 2:1 target between two real sources; others dropped
    out = mixture_resample(SF, {"src0": 2.0, "src1": 1.0})
    by_src = {}
    for r in out.select_columns(["source"]).take_all():
        by_src[r["source"]] = by_src.get(r["source"], 0) + 1
    assert set(by_src) <= {"src0", "src1"}    # unweighted sources dropped
    a, b = by_src.get("src0", 0), by_src.get("src1", 0)
    assert a and b
    # src0 is the constrained source (higher weight, equal counts):
    # it keeps everything; src1 downsamples to ~half
    assert a == 25
    assert 6 <= b <= 20                       # ~12.5 expected, hash noise


def test_mixture_unknown_source_rejected():
    with pytest.raises(ValueError):
        mixture_resample(SF, {"nope": 1.0, "src0": 1.0})


def test_export_training_shards(tmp_path):
    import json
    import os

    import pyarrow.dataset as pads

    from aqueduct_core_ray.functions.sampling import export_training_shards

    corpus = SF
    out = str(tmp_path / "shards")
    st = export_training_shards(corpus, out, n_shards=4, seed=9)
    assert st["skipped"] == 0 and st["shards"] == 4
    assert os.path.exists(os.path.join(out, "_EXPORTED"))
    d = pads.dataset(out, partitioning="hive")
    t = d.to_table()
    ids = sorted(t.column("doc_id").to_pylist())
    import pyarrow.parquet as pq
    want = sorted(pq.read_table(f"{corpus}/documents.parquet",
                                columns=["doc_id"])
                  .column("doc_id").to_pylist())
    assert ids == want                        # every doc exactly once
    shards = set(t.column("shard").to_pylist())
    assert len(shards) > 1                    # actually spread
    # deterministic: a second export to a fresh dir is content-identical
    out2 = str(tmp_path / "shards2")
    export_training_shards(corpus, out2, n_shards=4, seed=9)
    t2 = pads.dataset(out2, partitioning="hive").to_table()
    key = lambda tab: sorted(zip(tab.column("doc_id").to_pylist(),
                                 tab.column("shard").to_pylist()))
    assert key(t) == key(t2)
    # resumable: marker short-circuits the rerun
    again = export_training_shards(corpus, out, n_shards=4, seed=9)
    assert again["skipped"] == 1 and again["docs"] == st["docs"]
    # crashed half-export (no marker) is rewritten cleanly
    os.remove(os.path.join(out, "_EXPORTED"))
    redo = export_training_shards(corpus, out, n_shards=4, seed=9)
    assert redo["skipped"] == 0
    t3 = pads.dataset(out, partitioning="hive").to_table()
    assert key(t3) == key(t2)
