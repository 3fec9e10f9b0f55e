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
