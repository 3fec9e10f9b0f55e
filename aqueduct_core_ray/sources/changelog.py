"""Deterministic synthetic CDC change-log + seed-lake generator.

Plays the role of the reference's (out-of-repo) publisher appending to the
Postgres EVENTS log (SURVEY.md §1.3: EVENTS(msg_offset BIGSERIAL, msg_key,
type, created_utc, data, ...)); the `lsn` here is the reference's
`msg_offset` (strictly increasing, unique — Writer.java:5-9 ordering
contract), `op=1` rows are the `data IS NULL` tombstones
(SQLiteQueries.java:54-55).

Everything is vectorized numpy/pyarrow and *chunked*: the event stream is a
pure function of (seed, n_docs, n_events, chunk_size, mix params), and each
chunk generates independently, so at real scale shards can be produced by
parallel Ray tasks without materializing the stream anywhere. Content is
deterministic for a fixed parameter set (chunk_size included).

Churn mix (FIXTURES.md §1.2 defaults): 70% update / 20% insert / 10%
delete; update & delete targets are Zipf-skewed (s=1.2) over a hot set to
exercise skew handling. `source` is a stable function of the doc index so
derived per-source tables are meaningful under churn.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..schema import CHANGE_EVENT, LAKE_ROW, OP_DELETE, OP_UPSERT

SOURCES = np.array(["web", "books", "code", "wiki"])
SOURCE_WEIGHTS = np.array([0.55, 0.20, 0.15, 0.10])
VOCAB = 50257
BASE_TS_US = 1_700_000_000_000_000  # 2023-11-14T22:13:20Z, arbitrary fixed epoch


def _doc_ids(idx: np.ndarray) -> pa.Array:
    """Vectorized f"doc{idx:08d}" via Arrow kernels (no Python loop)."""
    s = pc.ascii_lpad(pc.cast(pa.array(idx, type=pa.int64()), pa.string()), 8, "0")
    return pc.binary_join_element_wise(
        pa.array(np.repeat("doc", len(idx))), s, ""
    )


def _stable_source(idx: np.ndarray) -> pa.Array:
    """Deterministic weighted source per doc index (stable across updates)."""
    h = (idx.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(1 << 32)
    u = h.astype(np.float64) / float(1 << 32)
    bins = np.cumsum(SOURCE_WEIGHTS)
    return pa.array(SOURCES[np.searchsorted(bins, u, side="right").clip(0, 3)])


def _tokens_for(rng: np.random.Generator, n: int, mean_tok: int,
                max_tok: int) -> tuple[pa.Array, np.ndarray]:
    """n_tok ~ clipped lognormal; token values one flat randint array →
    zero-copy ListArray."""
    n_tok = np.clip(
        rng.lognormal(mean=np.log(mean_tok), sigma=0.6, size=n).astype(np.int64),
        1, max_tok,
    )
    total = int(n_tok.sum())
    if total > (1 << 31) - 1:
        raise ValueError(
            f"{total} tokens exceed int32 list offsets — generate in "
            "chunks (changelog_chunk) or lower n/mean_tok per call")
    flat = rng.integers(0, VOCAB, size=total, dtype=np.int32)
    offsets = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(n_tok, out=offsets[1:])
    toks = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()),
                                    pa.array(flat, type=pa.int32()))
    return toks, n_tok


@dataclass(frozen=True)
class ChangelogSpec:
    """Identity of a deterministic change stream."""

    n_docs: int = 1_000            # initial doc-id space [0, n_docs)
    n_events: int = 10_000
    seed: int = 42
    update_frac: float = 0.70
    insert_frac: float = 0.20      # delete_frac = 1 - update - insert
    zipf_s: float = 1.2
    hot_set: int = 100             # Zipf head size for update/delete targets
    mean_tok: int = 64
    max_tok: int = 2048
    chunk_size: int = 250_000      # part of stream identity (see module doc)
    n_waves: int = 4               # watermarked replay waves

    @property
    def wave_bounds(self) -> list[tuple[int, int]]:
        """[(lo_lsn_exclusive, hi_lsn_inclusive)] per wave; lsn = 1-based.

        The hi bound is the wave's publish watermark — the analog of the
        reference's `global_latest_offset` visibility gate
        (GlobalLatestOffsetCache.java:16, PostgresqlStorage.java:129-131).
        """
        edges = np.linspace(0, self.n_events, self.n_waves + 1).astype(int)
        return [(int(edges[i]), int(edges[i + 1])) for i in range(self.n_waves)]


def seed_lake(n_docs: int, seed: int = 42, mean_tok: int = 64,
              max_tok: int = 2048) -> pa.Table:
    """Initial materialized table (FIXTURES.md §1.1 lake_seed), last_lsn=0."""
    rng = np.random.default_rng(np.random.PCG64(seed))
    idx = np.arange(n_docs, dtype=np.int64)
    toks, n_tok = _tokens_for(rng, n_docs, mean_tok, max_tok)
    return pa.Table.from_arrays(
        [
            _doc_ids(idx),
            toks,
            pa.array(n_tok.astype(np.int32)),
            _stable_source(idx),
            pa.array(np.zeros(n_docs, dtype=np.int64)),
        ],
        schema=LAKE_ROW,
    )


def changelog_chunk(spec: ChangelogSpec, chunk_id: int) -> pa.Table:
    """Generate events [chunk_id*chunk_size, ...) as a CHANGE_EVENT table.

    Pure function of (spec, chunk_id): chunks can be generated by parallel
    Ray tasks in any order and always agree.
    """
    start = chunk_id * spec.chunk_size
    count = min(spec.chunk_size, spec.n_events - start)
    if count <= 0:
        return CHANGE_EVENT.empty_table()
    rng = np.random.default_rng(np.random.PCG64((spec.seed, 7919, chunk_id)))

    ev = np.arange(start, start + count, dtype=np.int64)
    lsn = ev + 1                                   # 1-based, strictly increasing
    u = rng.random(count)
    op = np.full(count, OP_UPSERT, dtype=np.int8)
    is_insert = u < spec.insert_frac
    is_delete = u >= spec.insert_frac + spec.update_frac
    op[is_delete] = OP_DELETE

    # Zipf-over-ranks target for updates/deletes: rank r w.p. ∝ r^-s over
    # [1, hot_set], else uniform tail. Keeps a configurable hot head.
    ranks = np.arange(1, spec.hot_set + 1, dtype=np.float64) ** (-spec.zipf_s)
    ranks /= ranks.sum()
    hot = rng.random(count) < 0.5                  # half the churn hits the head
    tgt = rng.integers(0, spec.n_docs, size=count, dtype=np.int64)
    n_hot = int(hot.sum())
    if n_hot:
        # map rank -> a stable pseudo-random doc index so the hot set is
        # spread over the id space (not just doc0000000{0..k})
        hot_ranks = rng.choice(spec.hot_set, size=n_hot, p=ranks)
        hot_docs = (np.arange(spec.hot_set, dtype=np.int64) * 48271) % spec.n_docs
        tgt[hot] = hot_docs[hot_ranks]
    # inserts allocate fresh ids above the seed space, unique per event
    tgt[is_insert] = spec.n_docs + ev[is_insert]

    toks, n_tok = _tokens_for(rng, count, spec.mean_tok, spec.max_tok)
    # null-out payload on deletes (tombstone: reference `data IS NULL`);
    # `source` stays set — reference tombstones keep their `type`, which is
    # what makes type-filtered subscriptions see deletes (Message.java:14-34)
    del_mask = pa.array(is_delete)
    toks = pc.if_else(del_mask, pa.nulls(count, toks.type), toks)
    n_tok_arr = pc.if_else(del_mask, pa.nulls(count, pa.int32()),
                           pa.array(n_tok.astype(np.int32)))
    src = _stable_source(tgt)

    ts = pa.array(BASE_TS_US + ev * 1_000, type=pa.timestamp("us"))
    return pa.Table.from_arrays(
        [pa.array(lsn), pa.array(op), _doc_ids(tgt), toks, n_tok_arr, src, ts],
        schema=CHANGE_EVENT,
    )


def changelog_table(spec: ChangelogSpec) -> pa.Table:
    """Whole stream as one table (tests / small scale only)."""
    n_chunks = -(-spec.n_events // spec.chunk_size)
    return pa.concat_tables(changelog_chunk(spec, i) for i in range(n_chunks))


def write_changelog(spec: ChangelogSpec, out_dir: str,
                    force: bool = False) -> str:
    """Materialize the stream as lsn-ordered parquet shards (one per chunk)
    under out_dir. Idempotent: skipped when a matching _SPEC marker exists.

    At real scale this is the binlog already sitting in object storage; here
    it is pre-generated so benchmarks measure apply throughput, not
    generation (SURVEY.md §7.5 item 5).
    """
    marker = os.path.join(out_dir, "_SPEC")
    ident = repr(spec)
    if not force and os.path.exists(marker):
        with open(marker) as f:
            if f.read() == ident:
                return out_dir
    os.makedirs(out_dir, exist_ok=True)
    n_chunks = -(-spec.n_events // spec.chunk_size)
    # regeneration under a different spec: drop stale chunks beyond the
    # new chunk count (and half-written temps) or two streams would mix
    for fn in os.listdir(out_dir):
        if fn.endswith(".tmp") or (fn.startswith("chunk-")
                                   and fn.endswith(".parquet")
                                   and int(fn[len("chunk-"):-len(".parquet")])
                                   >= n_chunks):
            os.remove(os.path.join(out_dir, fn))
    for i in range(n_chunks):
        # write-then-rename: a concurrent tail() must never see a torn
        # footer (the binlog visibility contract)
        path = os.path.join(out_dir, f"chunk-{i:05d}.parquet")
        pq.write_table(changelog_chunk(spec, i), path + ".tmp",
                       compression="zstd")
        os.replace(path + ".tmp", path)
    tmp = marker + ".tmp"
    with open(tmp, "w") as f:
        f.write(ident)
    os.replace(tmp, marker)
    return out_dir


def write_seed_lake(spec: ChangelogSpec, out_path: str,
                    force: bool = False) -> str:
    if force or not os.path.exists(out_path):
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        pq.write_table(seed_lake(spec.n_docs, spec.seed, spec.mean_tok,
                                 spec.max_tok), out_path, compression="zstd")
    return out_path
