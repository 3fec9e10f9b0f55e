"""Last-writer-wins compaction kernels (vectorized Arrow, no row loops).

Reference semantics (the conformance anchor): among a set of change events,
keep only the max-offset row per key — SQLiteQueries.java:51-52
(`GROUP BY msg_key, type` max-offset anti-join) with golden survivor
fixtures in SQLiteStorageIntegrationSpec.groovy:710-921. `lsn` is unique by
generator contract (reference relies on BIGSERIAL uniqueness), so LWW has
no ties.

`compact_lww` doubles as the *combiner*: applied per batch inside
map_batches it emits at most one row per (batch, doc_id), which is what
defuses hot-key skew before the per-partition shuffle (SURVEY.md §7.2
milestone 5) — the classic partial-aggregate pattern.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def compact_lww(t: pa.Table, key: str = "doc_id",
                order_col: str = "lsn") -> pa.Table:
    """Keep only the max-`order_col` row per `key`. Stable & vectorized:
    sort indices by (key asc, lsn desc), keep the first index per key run.
    """
    if t.num_rows <= 1:
        return t
    t = t.combine_chunks()
    idx = pc.sort_indices(
        t, sort_keys=[(key, "ascending"), (order_col, "descending")]
    )
    keys_sorted = pc.take(t.column(key), idx).combine_chunks()
    n = len(keys_sorted)
    # first row of each equal-key run
    neq = pc.not_equal(keys_sorted.slice(1, n - 1), keys_sorted.slice(0, n - 1))
    mask = np.ones(n, dtype=bool)
    mask[1:] = neq.to_numpy(zero_copy_only=False)
    return t.take(idx.filter(pa.array(mask)))


def split_tombstones(delta: pa.Table) -> tuple[pa.Table, pa.Table]:
    """(upserts, deletes) from a compacted delta (`op` column: 0/1)."""
    is_del = pc.equal(delta.column("op"), pa.scalar(1, pa.int8()))
    return delta.filter(pc.invert(is_del)), delta.filter(is_del)
