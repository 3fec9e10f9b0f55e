"""Trained quality-classifier filter — the CCNet / GPT-3-style data
curation step: fit a logistic regression over hashed unigram+bigram
features (the DSIR representation, shared with ``text.dsir_weights``)
against a labeled seed (here: ``source == positive_source``), then
score EVERY document with the trained model. Downstream, the logits
feed the existing threshold / weighted-sampling operators exactly like
the reference pipelines feed fastText quality scores.

Distributed-exact training: full-batch gradient descent where each
document's residual ``sigmoid(w·x) - y`` is QUANTIZED to integer
micro-units before the feature scatter — every cross-block reduction
is an order-insensitive integer sum (floats only ever accumulate
integers < 2^53, which is exact), so the trained weights and all
scores are bit-identical under any partitioning / block order / CPU
count: the same trick as ``ann.kmeans_embeddings``. Features are
extracted ONCE per block and pinned in the object store; each
iteration is one fan of raw per-block tasks folding a ``(dim+1,)``
int64 gradient (a map_batches pass would cost ~1 s of plan overhead
PER ITERATION — measured on the k-means twin).

No reference analog (aqueduct-core moves opaque payloads); this is a
§"beyond the reference" training-data operator. Iterative => no SQL
oracle (rows-only driver check; pinned bit-exactly against a
single-process numpy replica in tests/test_functions.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .text import _dsir_features, read_documents

_MICRO = 1e6


@ray.remote
def _lr_prep(block: pa.Table, dim: int, positive_source: str):
    """Featurize one block once: (feature ids, owning doc index, label,
    doc_id). Pinned in the object store for the whole training loop."""
    if block.num_rows == 0:
        return None
    feats, fdoc = _dsir_features(block, dim)
    y = pc.equal(block.column("source"), positive_source) \
        .fill_null(False).to_numpy(zero_copy_only=False)
    return (feats, fdoc, y.astype(np.int8),
            block.column("doc_id").to_numpy(zero_copy_only=False))


def _doc_logits(prep, w: np.ndarray, dim: int) -> np.ndarray:
    """Per-doc raw logit ``bias + Σ w[f]`` — the per-doc float
    accumulation order is fixed by _dsir_features' deterministic
    per-doc feature order, so logits are partitioning-invariant."""
    feats, fdoc, y, _ = prep
    z = np.bincount(fdoc, weights=w[feats], minlength=len(y))
    return z + w[dim]


@ray.remote
def _lr_iter(prep, w: np.ndarray, dim: int):
    """One block's gradient partial: integer micro-unit residuals
    scattered onto features. bincount's float accumulation only ever
    adds integers (|Σ| ≤ 1e6·occurrences < 2^53) — exact, therefore
    order-insensitive."""
    if prep is None:
        return None
    feats, fdoc, y, _ = prep
    z = _doc_logits(prep, w, dim)
    p = 1.0 / (1.0 + np.exp(-np.clip(z, -30.0, 30.0)))
    rq = np.floor((p - y) * _MICRO + 0.5).astype(np.int64)
    g = np.bincount(feats, weights=rq[fdoc].astype(np.float64),
                    minlength=dim).astype(np.int64)
    return np.concatenate([g, [int(rq.sum())]]), len(y)


@ray.remote
def _lr_score(prep, w: np.ndarray, dim: int) -> pa.Table:
    if prep is None:
        return _empty_scores()
    _, _, y, did = prep
    z = _doc_logits(prep, w, dim)
    return pa.table({
        "doc_id": pa.array(did.astype(np.int64)),
        "label": pa.array(y.astype(np.int64)),
        "logit_micro": pa.array(np.floor(z * _MICRO + 0.5)
                                .astype(np.int64)),
    })


def _empty_scores() -> pa.Table:
    return pa.table({"doc_id": pa.array([], pa.int64()),
                     "label": pa.array([], pa.int64()),
                     "logit_micro": pa.array([], pa.int64())})


def _lr_fit(prep_refs, dim: int, iters: int, lr: float
            ) -> "np.ndarray | None":
    """Full-batch quantized GD over pinned block features. The fold
    ``np.sum([int64 partials])`` is order-insensitive, so the weight
    trajectory is bit-identical under any block layout."""
    w = np.zeros(dim + 1, np.float64)
    n_total = None
    for _ in range(iters):
        wref = ray.put(w)
        outs = [o for o in ray.get(
            [_lr_iter.remote(p, wref, dim) for p in prep_refs])
            if o is not None]
        if not outs:
            return None
        if n_total is None:
            n_total = sum(o[1] for o in outs)
        g = np.sum([o[0] for o in outs], axis=0)
        w = w - lr * (g / _MICRO) / n_total
    return w


def quality_classifier_score(sf_dir: str, positive_source: str = "src0",
                             dim: int = 1 << 16, iters: int = 25,
                             lr: float = 2.0) -> ray.data.Dataset:
    """Train the hashed-feature logistic quality classifier on the
    corpus (label = ``source == positive_source``) and score every
    document. Returns (doc_id, label, logit_micro) — logit in integer
    micro-units (floor(z*1e6+0.5)); positive logits read as
    "looks like the positive source"."""
    blocks = read_documents(
        sf_dir, columns=["doc_id", "text", "source"]).to_arrow_refs()
    prep_refs = [_lr_prep.remote(b, dim, positive_source)
                 for b in blocks]
    w = _lr_fit(prep_refs, dim, iters, lr)
    if w is None:
        return ray.data.from_arrow(_empty_scores())
    wref = ray.put(w)
    return ray.data.from_arrow_refs(
        [_lr_score.remote(p, wref, dim) for p in prep_refs])
