"""Deduplication operators over the ``documents`` / ``embeddings``
tables: exact (hash-partitioned), MinHash+LSH, SimHash, exact n-gram
Jaccard verification, and embedding-cosine near-dup.

Scale design (100 TB framing):

- exact dedup: md5(text) computed per batch -> hash shuffle on the
  16-byte digest (never on the full text) -> per-group min(doc_id).
- MinHash/SimHash: signatures are computed fully vectorized per batch
  (numpy ``minimum.reduceat`` over flattened shingle hashes — no Python
  row loop); LSH banding emits (bucket, doc_id, sig) rows — the compact
  sketch travels WITH the banding row (duplication factor = #bands), so
  bucket-local verification needs no second join; candidate pairs are
  deduped by a tiny groupby on the pair key.
- embedding near-dup / brute-force search: the comparison side is
  broadcast once via ``ray.put`` and read zero-copy in every map task —
  O(N·M) matmul per batch, never an N×N shuffle join. The IVF variant in
  functions/ann.py is the scale path when M grows.

Determinism: every hash is pandas' keyed siphash or fixed odd-multiplier
mixing — stable across processes/nodes/runs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .text import fingerprint_batch, read_documents

# fixed odd 64-bit mixing constants (splitmix64-flavored)
_P1, _P2, _P3 = (0x9E3779B97F4A7C15, 0xBF58476D1CE4E5B9, 0x94D049BB133111EB)
_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


# --------------------------------------------------------------------- #
# exact dedup
# --------------------------------------------------------------------- #
def exact_dedup(sf_dir: str) -> ray.data.Dataset:
    """First-writer-wins exact dedup: one surviving doc_id (the minimum)
    per distinct text, keyed by md5 so the shuffle moves digests, not
    documents. Returns (doc_id, fp)."""
    ds = read_documents(sf_dir, columns=["doc_id", "text"])
    fps = ds.map_batches(fingerprint_batch, batch_format="pyarrow")

    def keep_min(t: pa.Table) -> pa.Table:
        i = pc.sort_indices(t, sort_keys=[("doc_id", "ascending")])[:1]
        return t.take(i)

    return fps.groupby("fp").map_groups(keep_min, batch_format="pyarrow")


# --------------------------------------------------------------------- #
# shingling + MinHash signatures (vectorized)
# --------------------------------------------------------------------- #
def _hash_str_array(arr: pa.Array) -> np.ndarray:
    return pd.util.hash_array(
        np.asarray(arr.to_numpy(zero_copy_only=False), dtype=object),
        categorize=False)


def _shingle_hashes(t: pa.Table, text_col: str, shingle: int
                    ) -> tuple[np.ndarray, np.ndarray]:
    """Word-``shingle``-gram hashes for a batch.

    Returns (sh, sdoc): flat shingle-hash array and the row index of each
    shingle. Rows with fewer than ``shingle`` words contribute their
    whole-text hash as a single shingle. Fully vectorized."""
    txt = pc.utf8_trim_whitespace(t.column(text_col))
    words = pc.split_pattern_regex(txt, r"\s+").combine_chunks()
    h = _hash_str_array(words.flatten())
    counts = pc.list_value_length(words).to_numpy(zero_copy_only=False)
    docidx = np.repeat(np.arange(len(counts)), counts)
    if len(h) >= shingle:
        sh = h[: len(h) - shingle + 1] * np.uint64(_P1)
        for j in range(1, shingle):
            sh = sh ^ (h[j: len(h) - shingle + 1 + j] * np.uint64(_P2 + 2 * j))
        valid = docidx[: len(h) - shingle + 1] == docidx[shingle - 1:]
        sh, sdoc = sh[valid], docidx[: len(h) - shingle + 1][valid]
    else:
        sh = np.empty(0, np.uint64)
        sdoc = np.empty(0, np.int64)
    # fallback: short docs get one whole-text shingle
    have = np.bincount(sdoc, minlength=t.num_rows) > 0
    if not have.all():
        missing = np.flatnonzero(~have)
        fh = _hash_str_array(txt.combine_chunks())[missing]
        sh = np.concatenate([sh, fh])
        sdoc = np.concatenate([sdoc, missing])
        order = np.argsort(sdoc, kind="stable")
        sh, sdoc = sh[order], sdoc[order]
    return sh, sdoc


def minhash_sigs(t: pa.Table, text_col: str = "text", k: int = 64,
                 shingle: int = 3, seed: int = 1337) -> np.ndarray:
    """(n_rows, k) uint64 MinHash signature matrix for one batch."""
    sh, sdoc = _shingle_hashes(t, text_col, shingle)
    counts = np.bincount(sdoc, minlength=t.num_rows)
    starts = np.zeros(t.num_rows, dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    rng = np.random.default_rng(np.random.PCG64(seed))
    a = rng.integers(1, 1 << 63, size=k, dtype=np.uint64) * np.uint64(2) + np.uint64(1)
    b = rng.integers(0, 1 << 63, size=k, dtype=np.uint64)
    sig = np.empty((t.num_rows, k), dtype=np.uint64)
    for i in range(k):                      # k kernels, each fully vectorized
        sig[:, i] = np.minimum.reduceat((sh * a[i] + b[i]) & _MASK, starts)
    return sig


def _band_rows(doc_ids: np.ndarray, sig: np.ndarray, bands: int
               ) -> pa.Table:
    """(bucket, doc_id, sig) rows — one per (doc, band); bucket is a mixed
    hash of the band's signature slice, salted by band index."""
    n, k = sig.shape
    r = k // bands
    out_bucket = np.empty(n * bands, dtype=np.uint64)
    for b in range(bands):
        bh = np.full(n, np.uint64((_P3 * (b + 1)) & 0xFFFFFFFFFFFFFFFF),
                     dtype=np.uint64)
        for j in range(r):
            bh = (bh ^ sig[:, b * r + j]) * np.uint64(_P1) & _MASK
        out_bucket[b * n:(b + 1) * n] = bh
    flat_sig = pa.FixedSizeListArray.from_arrays(
        pa.array(np.tile(sig, (bands, 1)).reshape(-1).view(np.int64)), k)
    return pa.table({
        "bucket": pa.array(out_bucket.view(np.int64)),
        "doc_id": pa.array(np.tile(doc_ids, bands)),
        "sig": flat_sig,
    })


def _bucket_pairs_fn(min_est_pct: int):
    def pairs(t: pa.Table) -> pa.Table:
        n = t.num_rows
        empty = pa.table({"doc_id_a": pa.array([], pa.int64()),
                          "doc_id_b": pa.array([], pa.int64()),
                          "est_jaccard_pct": pa.array([], pa.int64())})
        if n < 2:
            return empty
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        sig = np.stack(t.column("sig").to_numpy(zero_copy_only=False))[order]
        ii, jj = np.triu_indices(n, k=1)
        est = (sig[ii] == sig[jj]).mean(axis=1)
        pct = np.floor(est * 100).astype(np.int64)
        keep = pct >= min_est_pct
        if not keep.any():
            return empty
        return pa.table({"doc_id_a": pa.array(ids[ii[keep]]),
                         "doc_id_b": pa.array(ids[jj[keep]]),
                         "est_jaccard_pct": pa.array(pct[keep])})
    return pairs


def _dedupe_pairs(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Same pair can surface from several buckets — keep one, via a tiny
    multi-key groupby (no packed key: int packing collides once ids pass
    2^31, silently dropping candidate pairs)."""

    def first(t: pa.Table) -> pa.Table:
        return t.slice(0, 1)

    return (ds.groupby(["doc_id_a", "doc_id_b"])
            .map_groups(first, batch_format="pyarrow"))


def minhash_lsh_dedup(sf_dir: str, k: int = 64, bands: int = 16,
                      shingle: int = 3, min_est_pct: int = 50
                      ) -> ray.data.Dataset:
    """MinHash+LSH near-dup candidate pairs: shingle -> minhash -> band ->
    bucket groupby -> bucket-local pair verification (signature-estimated
    Jaccard >= threshold) -> global pair dedupe."""

    def to_bands(t: pa.Table) -> pa.Table:
        sig = minhash_sigs(t, k=k, shingle=shingle)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return _band_rows(ids, sig, bands)

    ds = read_documents(sf_dir, columns=["doc_id", "text"])
    banded = ds.map_batches(to_bands, batch_format="pyarrow")
    cand = banded.groupby("bucket").map_groups(
        _bucket_pairs_fn(min_est_pct), batch_format="pyarrow")
    return _dedupe_pairs(cand)


# --------------------------------------------------------------------- #
# exact n-gram Jaccard verification of LSH candidates
# --------------------------------------------------------------------- #
def ngram_jaccard_dedup(sf_dir: str, shingle: int = 3,
                        min_jaccard_pct: int = 80, k: int = 64,
                        bands: int = 16) -> ray.data.Dataset:
    """LSH candidates re-verified with EXACT word-``shingle``-gram Jaccard.

    The shingle-set side is broadcast once via ``ray.put`` (test scale);
    the scale path replaces the broadcast with a hash-join of pairs
    against the shingle table on doc_id (two key-local passes)."""
    cand = minhash_lsh_dedup(sf_dir, k=k, bands=bands, shingle=shingle,
                             min_est_pct=40)

    docs = read_documents(sf_dir, columns=["doc_id", "text"])

    def shingle_sets(t: pa.Table) -> dict[int, frozenset]:
        sh, sdoc = _shingle_hashes(t, "text", shingle)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        out = {}
        for i in range(t.num_rows):
            out[int(ids[i])] = frozenset(sh[sdoc == i].tolist())
        return out

    sets: dict[int, frozenset] = {}
    for b in docs.iter_batches(batch_format="pyarrow"):
        sets.update(shingle_sets(b))
    ref = ray.put(sets)

    def verify(t: pa.Table, *, ref=ref) -> pa.Table:
        s = ray.get(ref) if not isinstance(ref, dict) else ref
        a = t.column("doc_id_a").to_pylist()
        b = t.column("doc_id_b").to_pylist()
        pct = []
        for x, y in zip(a, b):
            sa, sb = s[x], s[y]
            u = len(sa | sb)
            pct.append(int(100 * len(sa & sb) / u) if u else 0)
        out = t.drop_columns(["est_jaccard_pct"]).append_column(
            "jaccard_pct", pa.array(pct, pa.int64()))
        return out.filter(pc.greater_equal(out.column("jaccard_pct"),
                                           min_jaccard_pct))

    return cand.map_batches(verify, batch_format="pyarrow")


# --------------------------------------------------------------------- #
# SimHash
# --------------------------------------------------------------------- #
def simhash_batch(t: pa.Table, text_col: str = "text") -> np.ndarray:
    """64-bit SimHash per row: sign of per-bit ±1 sums over word hashes
    (vectorized bit expansion + ``add.reduceat``)."""
    txt = pc.utf8_trim_whitespace(t.column(text_col))
    words = pc.split_pattern_regex(txt, r"\s+").combine_chunks()
    h = _hash_str_array(words.flatten())
    counts = pc.list_value_length(words).to_numpy(zero_copy_only=False)
    starts = np.zeros(t.num_rows, dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
            ).astype(np.int32) * 2 - 1                      # (m, 64) ±1
    if len(h) == 0:
        return np.zeros(t.num_rows, dtype=np.uint64)
    # reduceat only over non-empty rows (an index-clamp would corrupt the
    # row before a trailing zero-word row), scatter back into place
    nonempty = counts > 0
    sums = np.zeros((t.num_rows, 64), dtype=bits.dtype)
    sums[nonempty] = np.add.reduceat(bits, starts[nonempty], axis=0)
    return ((sums > 0).astype(np.uint64)
            << np.arange(64, dtype=np.uint64)).sum(axis=1, dtype=np.uint64)


def _popcount64(x: np.ndarray) -> np.ndarray:
    return np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)


def simhash_dedup(sf_dir: str, max_hamming: int = 3) -> ray.data.Dataset:
    """Near-dup pairs with SimHash Hamming distance <= ``max_hamming``,
    candidate generation by 16-bit band pigeonhole (4 bands: any pair
    within distance 3 shares at least one exact band)."""

    def to_bands(t: pa.Table) -> pa.Table:
        sh = simhash_batch(t)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        n = len(ids)
        buckets = np.empty(4 * n, dtype=np.int64)
        for b in range(4):
            band = (sh >> np.uint64(16 * b)) & np.uint64(0xFFFF)
            buckets[b * n:(b + 1) * n] = (band.astype(np.int64)
                                          | (np.int64(b) << 32))
        return pa.table({"bucket": pa.array(buckets),
                         "doc_id": pa.array(np.tile(ids, 4)),
                         "simhash": pa.array(np.tile(sh, 4).view(np.int64))})

    def pairs(t: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id_a": pa.array([], pa.int64()),
                          "doc_id_b": pa.array([], pa.int64()),
                          "hamming": pa.array([], pa.int64())})
        if t.num_rows < 2:
            return empty
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        sh = t.column("simhash").to_numpy(zero_copy_only=False).astype(
            np.int64).view(np.uint64)[order]
        ii, jj = np.triu_indices(len(ids), k=1)
        ham = _popcount64(sh[ii] ^ sh[jj]).astype(np.int64)
        keep = ham <= max_hamming
        if not keep.any():
            return empty
        return pa.table({"doc_id_a": pa.array(ids[ii[keep]]),
                         "doc_id_b": pa.array(ids[jj[keep]]),
                         "hamming": pa.array(ham[keep])})

    ds = read_documents(sf_dir, columns=["doc_id", "text"])
    cand = (ds.map_batches(to_bands, batch_format="pyarrow")
            .groupby("bucket").map_groups(pairs, batch_format="pyarrow"))
    return _dedupe_pairs(cand)


# --------------------------------------------------------------------- #
# embedding-cosine near-dup
# --------------------------------------------------------------------- #
def embedding_cosine_dedup(sf_dir: str, threshold_pct: int = 35
                           ) -> ray.data.Dataset:
    """Pairs (a < b) with cosine similarity >= threshold_pct/100 over the
    ``embeddings`` table. Comparison matrix broadcast once via ray.put;
    per-batch double-precision matmul. Brute force O(N·M) — the IVF path
    (functions/ann.py) is the scale variant."""
    import pyarrow.parquet as pq

    full = pq.read_table(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    ids = full.column("vec_id").to_numpy(zero_copy_only=False)
    E = np.vstack(full.column("embedding").to_numpy(
        zero_copy_only=False)).astype(np.float64)
    En = E / np.linalg.norm(E, axis=1, keepdims=True)
    ref = ray.put((ids, En))
    thr = threshold_pct / 100.0

    def nearpairs(t: pa.Table) -> pa.Table:
        rids, rEn = ray.get(ref)
        bids = t.column("vec_id").to_numpy(zero_copy_only=False)
        B = np.vstack(t.column("embedding").to_numpy(
            zero_copy_only=False)).astype(np.float64)
        Bn = B / np.linalg.norm(B, axis=1, keepdims=True)
        S = Bn @ rEn.T
        ii, jj = np.nonzero((S >= thr) & (bids[:, None] < rids[None, :]))
        return pa.table({"vec_id_a": pa.array(bids[ii]),
                         "vec_id_b": pa.array(rids[jj])})

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    return ds.map_batches(nearpairs, batch_format="pyarrow")
