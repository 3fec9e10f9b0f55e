"""Deterministic sampling operators for training-data curation:
per-source stratified sampling and mixture rebalancing.

Sampling is keyed-hash thresholding on ``doc_id`` (pandas siphash —
stable across processes, nodes and runs): a doc is IN a sample iff
``hash(doc_id, seed) / 2^64 < frac``. This makes samples reproducible,
cheaply recomputable on any worker (pure filter, no shuffle, no state),
and NESTED: the 1%% sample is a subset of the 10%% sample — the property
scaling-law runs rely on.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from .text import read_documents


def _accept(ids: np.ndarray, frac: float, seed: int) -> np.ndarray:
    h = pd.util.hash_array(ids + np.int64(seed), categorize=False)
    return h.astype(np.float64) < float(frac) * float(2**64)


def stratified_sample(sf_dir: str,
                      fracs: "dict[str, float] | None" = None,
                      default_frac: float = 0.5,
                      seed: int = 91) -> ray.data.Dataset:
    """Per-source sampling rates: keep each doc with its source's
    fraction (sources absent from ``fracs`` use ``default_frac``).
    Pure per-batch filter — streams at read speed."""
    fracs = fracs or {}

    def pick(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        src = t.column("source").to_numpy(zero_copy_only=False)
        keep = np.zeros(t.num_rows, dtype=bool)
        for s in np.unique(src):
            m = src == s
            keep[m] = _accept(ids[m], fracs.get(s, default_frac), seed)
        return t.filter(pa.array(keep))

    ds = read_documents(sf_dir)
    return ds.map_batches(pick, batch_format="pyarrow")


def mixture_resample(sf_dir: str,
                     weights: "dict[str, float]",
                     seed: int = 91) -> ray.data.Dataset:
    """Downsample sources toward a TARGET MIXTURE: given desired
    relative weights per source, compute per-source acceptance
    fractions (≤1 — downsampling only, the largest-feasible mixture)
    from the actual counts, then stratified-sample. Two passes: a tiny
    native count aggregate, then the streaming filter — the classic
    mixture-rebalancing step before tokenizer/packing."""
    counts = {r["source"]: r["count()"] for r in
              read_documents(sf_dir, columns=["source"])
              .groupby("source").count().take_all()}
    missing = set(weights) - set(counts)
    if missing:
        raise ValueError(f"weights name unknown sources: {sorted(missing)}")
    # scale so the most-constrained source keeps 100% of its docs
    scale = min(counts[s] / w for s, w in weights.items() if w > 0)
    fracs = {s: min(1.0, (w * scale) / counts[s])
             for s, w in weights.items()}
    # sources without a weight are dropped
    for s in counts:
        fracs.setdefault(s, 0.0)
    return stratified_sample(sf_dir, fracs, default_frac=0.0, seed=seed)


# --------------------------------------------------------------------- #
# sharded training export
# --------------------------------------------------------------------- #
def write_shards(ds: "ray.data.Dataset", out_dir: str,
                 n_shards: int, seed: int,
                 marker_payload: dict) -> dict:
    """Shared sharded-writer contract: keyed-hash shard tags in one
    streaming pass, hive-partitioned parquet, atomic ``_EXPORTED``
    marker written only after every file lands. A present marker whose
    payload matches short-circuits; a half-written attempt (no marker)
    is cleared and rewritten idempotently. Used by
    ``export_training_shards`` and the curation pipeline."""
    import json
    import os
    import shutil

    marker = os.path.join(out_dir, "_EXPORTED")
    if os.path.exists(marker):
        with open(marker) as f:
            st = json.load(f)
        if st.get("src") == marker_payload:
            return {**st, "skipped": 1}
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)

    def tag(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        h = pd.util.hash_array(ids + np.int64(seed), categorize=False)
        return t.append_column(
            "shard", pa.array((h % np.uint64(n_shards)).astype(np.int32)))

    tagged = ds.map_batches(tag, batch_format="pyarrow")
    tagged.write_parquet(out_dir, partition_cols=["shard"])
    # count from the WRITTEN files (metadata only) — no second pass
    # over the input chain
    import pyarrow.parquet as pq
    n = 0
    for dirpath, _, files in os.walk(out_dir):
        for fn in files:
            if fn.endswith(".parquet"):
                n += pq.read_metadata(os.path.join(dirpath, fn)).num_rows
    st = {"docs": int(n), "shards": int(n_shards), "src": marker_payload}
    tmp = marker + ".tmp"
    with open(tmp, "w") as f:
        json.dump(st, f)
    os.replace(tmp, marker)
    return {**st, "skipped": 0}


def export_training_shards(sf_dir: str, out_dir: str, n_shards: int = 16,
                           seed: int = 17,
                           columns: "list[str] | None" = None
                           ) -> dict[str, int]:
    """Write the corpus as ``n_shards`` hive-partitioned parquet shard
    directories (``shard=<k>/``) under ``out_dir`` — the training-export
    step: shard membership is a keyed hash of (doc_id, seed), so the
    global order is decorrelated from ingest order (inter-shard
    randomization; trainers shuffle within a shard via their own buffer)
    while remaining DETERMINISTIC across runs, nodes and cluster sizes.

    One streaming pass: a map_batches tags shards, ``write_parquet``
    partitions on the column — no driver materialization, no all-to-all
    (hive partitioning splits at the writer). RESUMABLE contract: the
    export publishes an ``_EXPORTED`` marker (write-then-rename) only
    after every file lands; a rerun with the marker present is a no-op,
    a crashed half-export has no marker and is rewritten into the same
    directory idempotently (deterministic content). Returns
    {"docs": N, "shards": n_shards, "skipped": 0|1}.

    Scale note: the hive writer emits one file per (input block, shard),
    so keep ``n_shards`` modest (≤ ~1k) or repartition first — B×S tiny
    files is the failure mode at extreme shard counts."""
    import os

    src = os.path.join(sf_dir, "documents.parquet")
    stat = os.stat(src)
    cols = columns or ["doc_id", "text", "source"]
    # the marker payload fingerprints the SOURCE + export params; a
    # regenerated corpus or changed config invalidates it instead of
    # silently serving stale shards
    fp = {"size": stat.st_size, "mtime_ns": stat.st_mtime_ns,
          "n_shards": int(n_shards), "seed": int(seed),
          "columns": sorted(cols)}
    return write_shards(read_documents(sf_dir, columns=cols), out_dir,
                        n_shards, seed, fp)
