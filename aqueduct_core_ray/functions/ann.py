"""Similarity search over the ``embeddings`` table.

- ``knn_bruteforce``: exact cosine top-k. The (small) query matrix is
  broadcast once via ``ray.put``; every batch does one double-precision
  matmul and emits only its local top-k per query (nq*k tiny rows), and a
  final per-query groupby folds the partials — the classic partial-top-k
  combine, so the shuffle moves O(batches * nq * k) rows, never scores.
- ``knn_ivf``: the scale path — coarse k-means centroids (trained once,
  driver-side, on a bounded sample), vectors pruned to the query's
  ``nprobe`` nearest cells before the same batch matmul. Approximate:
  checked rows-only (no SQL oracle).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data


def _load_queries(sf_dir: str, nq: int) -> tuple[np.ndarray, np.ndarray]:
    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"],
                      filters=[("vec_id", "<", nq)])
    qids = t.column("vec_id").to_numpy(zero_copy_only=False)
    Q = np.vstack(t.column("embedding").to_numpy(
        zero_copy_only=False)).astype(np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    return qids, Qn


def _read_embeddings(sf_dir: str) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                 columns=["vec_id", "embedding"])


_EMPTY_TOPK = pa.schema([("query_id", pa.int64()), ("vec_id", pa.int64()),
                         ("score", pa.float64())])


def _topk_emit(qids: np.ndarray, Qn: np.ndarray, ids: np.ndarray,
               Bn: np.ndarray, k: int) -> pa.Table:
    """Shared batch-local top-k: matmul + argpartition + partial emit."""
    if len(ids) == 0:
        return _EMPTY_TOPK.empty_table()
    S = Bn @ Qn.T                                   # (n, nq)
    kk = min(k, len(ids))
    top = np.argpartition(-S, kk - 1, axis=0)[:kk]  # (kk, nq)
    nq = len(qids)
    return pa.table({
        "query_id": pa.array(np.repeat(qids, kk)),
        "vec_id": pa.array(ids[top.T.reshape(-1)]),
        "score": pa.array(S[top.T.reshape(-1),
                            np.repeat(np.arange(nq), kk)]),
    })


def _normalized(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = t.column("vec_id").to_numpy(zero_copy_only=False)
    B = np.vstack(t.column("embedding").to_numpy(
        zero_copy_only=False)).astype(np.float64)
    return ids, B / np.linalg.norm(B, axis=1, keepdims=True)


def _batch_topk_fn(ref, k: int):
    def batch_topk(t: pa.Table) -> pa.Table:
        qids, Qn = ray.get(ref)
        ids, Bn = _normalized(t)
        return _topk_emit(qids, Qn, ids, Bn, k)
    return batch_topk


def _final_topk_fn(k: int):
    def final_topk(t: pa.Table) -> pa.Table:
        s = t.column("score").to_numpy(zero_copy_only=False)
        v = t.column("vec_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((v, -s))[:k]                 # score desc, id asc
        return pa.table({
            "query_id": t.column("query_id").take(pa.array(order)),
            "vec_id": pa.array(v[order]),
            "knn_rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
        })
    return final_topk


def knn_bruteforce(sf_dir: str, nq: int = 3, k: int = 5) -> ray.data.Dataset:
    """Exact cosine top-k for the first ``nq`` vectors as queries.
    Returns (query_id, vec_id, rank) — ties broken by vec_id asc."""
    ref = ray.put(_load_queries(sf_dir, nq))
    partial = _read_embeddings(sf_dir).map_batches(
        _batch_topk_fn(ref, k), batch_format="pyarrow")
    return partial.groupby("query_id").map_groups(
        _final_topk_fn(k), batch_format="pyarrow")


# --------------------------------------------------------------------- #
def _train_centroids(sf_dir: str, n_cells: int, sample: int = 2048,
                     iters: int = 8, seed: int = 7) -> np.ndarray:
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
    X = np.vstack(t.column("embedding").to_numpy(
        zero_copy_only=False)[:sample]).astype(np.float64)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    rng = np.random.default_rng(np.random.PCG64(seed))
    C = Xn[rng.choice(len(Xn), size=n_cells, replace=False)]
    for _ in range(iters):
        assign = np.argmax(Xn @ C.T, axis=1)
        for c in range(n_cells):
            m = assign == c
            if m.any():
                v = Xn[m].mean(axis=0)
                C[c] = v / np.linalg.norm(v)
    return C


def knn_ivf(sf_dir: str, nq: int = 3, k: int = 5, n_cells: int = 16,
            nprobe: int = 4) -> ray.data.Dataset:
    """IVF-pruned ANN: per batch, keep only vectors whose cell is among
    any query's ``nprobe`` closest cells, then the same partial-top-k
    pipeline as brute force. At 100 TB the assignment is precomputed as a
    lake column and cells map to parquet partitions (pruned at the read)."""
    C = _train_centroids(sf_dir, n_cells)
    qids, Qn = _load_queries(sf_dir, nq)
    probes = np.argsort(-(Qn @ C.T), axis=1)[:, :nprobe]     # (nq, nprobe)
    probed = np.unique(probes)
    ref = ray.put((qids, Qn, C, probed))
    kk = k

    def batch_topk(t: pa.Table) -> pa.Table:
        qids, Qn, C, probed = ray.get(ref)
        ids, Bn = _normalized(t)
        cell = np.argmax(Bn @ C.T, axis=1)
        m = np.isin(cell, probed)
        return _topk_emit(qids, Qn, ids[m], Bn[m], kk)

    partial = _read_embeddings(sf_dir).map_batches(batch_topk,
                                                   batch_format="pyarrow")
    return partial.groupby("query_id").map_groups(
        _final_topk_fn(k), batch_format="pyarrow")
