"""Content-defined chunking (rolling polynomial hash) + chunk-level
dedup over the ``documents`` table — sub-document deduplication for
training corpora: two documents sharing a boilerplate paragraph get the
same chunk fingerprint for it even when the surrounding text shifts the
byte offsets (the property fixed-size blocks lack).

Vectorized rolling hash: for an odd base B, the polynomial window hash
over bytes b is

    W[i] = hash(b[i .. i+w)) = B^{i+w-1} * (S[i+w] - S[i])   (mod 2^64)
    S[k] = Σ_{j<k} b[j] * Binv^j,   Binv = B^{-1} mod 2^64

Both S and the power tables are wraparound-uint64 ``np.cumprod`` /
``cumsum`` arrays, so the WHOLE sliding-window hash sequence of a batch
is computed with no Python loop; chunk boundaries are the positions
where ``W & mask == 0`` (expected chunk length 2^k bytes). Only the
final per-chunk substring slicing is row-level — O(#chunks), not
O(bytes).

Scale shape of ``chunk_dedup``: documents stream through the chunker in
batches; only (chunk_fp, doc_id, chunk_idx, n_bytes) rows — never the
text — reach the shuffle; a native count aggregate finds fingerprints
shared across documents.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from .text import read_documents

_B = np.uint64(1000003)            # odd ⇒ invertible mod 2^64
_W = 16                            # rolling window bytes


def _modinv_pow2_64(a: int) -> int:
    """Inverse of odd ``a`` mod 2^64 (Newton iteration doubles bits)."""
    x = a                          # 3-bit seed: a*a ≡ 1 (mod 8) for odd a
    for _ in range(6):
        x = (x * (2 - a * x)) % (1 << 64)
    return x


_BINV = np.uint64(_modinv_pow2_64(int(_B)))


def chunk_boundaries(data: bytes, k_bits: int = 8,
                     max_chunk: int = 4096) -> list[int]:
    """End offsets of content-defined chunks (expected length 2^k_bits,
    hard max ``max_chunk``); always ends with len(data)."""
    n = len(data)
    if n <= _W:
        return [n] if n else []
    b = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    idx = np.arange(n + 1, dtype=np.uint64)
    powB = np.empty(n + 1, dtype=np.uint64)
    powB[0] = 1
    np.cumprod(np.full(n, _B, dtype=np.uint64), out=powB[1:])
    powBinv = np.empty(n, dtype=np.uint64)
    powBinv[0] = 1
    if n > 1:
        np.cumprod(np.full(n - 1, _BINV, dtype=np.uint64),
                   out=powBinv[1:])
    S = np.zeros(n + 1, dtype=np.uint64)
    np.cumsum(b * powBinv, out=S[1:])
    # W[i] covers bytes [i, i+W): defined for i in [0, n-W]
    i = np.arange(0, n - _W + 1)
    Wh = (S[i + _W] - S[i]) * powB[i + _W - 1]
    mask = np.uint64((1 << k_bits) - 1)
    cut = np.flatnonzero((Wh & mask) == 0) + _W     # boundary AFTER window
    out: list[int] = []
    prev = 0
    for c in cut.tolist():
        while c - prev > max_chunk:                 # hard cap
            prev += max_chunk
            out.append(prev)
        if c - prev > 0:
            out.append(c)
            prev = c
    while n - prev > max_chunk:
        prev += max_chunk
        out.append(prev)
    if prev < n:
        out.append(n)
    return out


def chunk_batch(t: pa.Table, text_col: str = "text", k_bits: int = 8,
                max_chunk: int = 4096) -> pa.Table:
    """(doc_id, chunk_idx, chunk_fp, n_bytes) rows for one batch. The
    boundary detection is fully vectorized per doc; the per-chunk slice
    loop is O(#chunks)."""
    doc_ids, idxs, fps, sizes = [], [], [], []
    ids = t.column("doc_id").to_pylist()
    for did, s in zip(ids, t.column(text_col).to_pylist()):
        data = s.encode("utf-8")
        prev = 0
        pieces = []
        for ci, end in enumerate(chunk_boundaries(data, k_bits, max_chunk)):
            pieces.append(data[prev:end])
            doc_ids.append(did)
            idxs.append(ci)
            sizes.append(end - prev)
            prev = end
        if pieces:
            fps.extend(pd.util.hash_array(
                np.asarray(pieces, dtype=object), categorize=False)
                .astype(np.int64).tolist())
    return pa.table({
        "doc_id": pa.array(doc_ids, pa.int64()),
        "chunk_idx": pa.array(idxs, pa.int64()),
        "chunk_fp": pa.array(fps, pa.int64()),
        "n_bytes": pa.array(sizes, pa.int64()),
    })


def chunk_dedup(sf_dir: str, k_bits: int = 8, max_chunk: int = 4096,
                min_docs: int = 2) -> ray.data.Dataset:
    """Chunk fingerprints appearing in at least ``min_docs`` DISTINCT
    documents: (chunk_fp, n_docs, n_occurrences) — the shared-boilerplate
    detector. Shuffle moves fingerprints only, and both aggregation
    stages are NATIVE (distinct-doc counting = a (fp, doc) groupby
    feeding a per-fp Count/Sum — no per-fingerprint Python call; group
    count here is unbounded at corpus scale)."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Count, Sum

    ds = read_documents(sf_dir, columns=["doc_id", "text"])
    chunks = ds.map_batches(chunk_batch, batch_format="pyarrow",
                            fn_kwargs={"k_bits": k_bits,
                                       "max_chunk": max_chunk})
    pair_occ = chunks.groupby(["chunk_fp", "doc_id"]).count()
    per_fp = pair_occ.groupby("chunk_fp").aggregate(
        Count(), Sum("count()"))

    def rename(t: pa.Table) -> pa.Table:
        out = pa.table({
            "chunk_fp": t.column("chunk_fp"),
            "n_docs": t.column("count()").cast(pa.int64()),
            "n_occurrences": t.column("sum(count())").cast(pa.int64()),
        })
        return out.filter(pc.greater_equal(out.column("n_docs"),
                                           min_docs))

    return per_fp.map_batches(rename, batch_format="pyarrow")
