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


def compact_lww(t: pa.Table, key: str | list[str] = "doc_id",
                order_col: str = "lsn") -> pa.Table:
    """Keep only the max-`order_col` row per `key` (a column name or a
    composite key list). Stable & vectorized: sort indices by (keys asc,
    lsn desc), keep the first index per equal-key run."""
    keys = [key] if isinstance(key, str) else list(key)
    if t.num_rows <= 1:
        return t
    t = t.combine_chunks()
    idx = pc.sort_indices(
        t, sort_keys=[(k, "ascending") for k in keys]
        + [(order_col, "descending")]
    )
    n = len(idx)
    mask = np.zeros(n, dtype=bool)
    mask[0] = True
    for k in keys:
        ks = pc.take(t.column(k), idx).combine_chunks()
        a, b = ks.slice(1, n - 1), ks.slice(0, n - 1)
        neq = pc.not_equal(a, b)
        # null-safe grouping (SQL GROUP BY): null==null, null!=value
        va = pc.is_valid(a).to_numpy(zero_copy_only=False)
        vb = pc.is_valid(b).to_numpy(zero_copy_only=False)
        neq_np = neq.to_numpy(zero_copy_only=False)
        new_run = np.where(va & vb, neq_np.astype(bool), va != vb)
        mask[1:] |= new_run
    return t.take(idx.filter(pa.array(mask)))


def split_tombstones(delta: pa.Table) -> tuple[pa.Table, pa.Table]:
    """(upserts, deletes) from a compacted delta (`op` column: 0/1)."""
    is_del = pc.equal(delta.column("op"), pa.scalar(1, pa.int8()))
    return delta.filter(pc.invert(is_del)), delta.filter(is_del)
