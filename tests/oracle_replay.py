"""Pure-Python dict-replay oracle (FIXTURES.md §3).

Iterates change events in lsn order over a plain dict — the simplest
possible correct implementation of the reference's sync semantics
(LWW by offset, `data IS NULL` tombstones). Engine output at any
parallelism / partition count / resume schedule must equal this
row-by-row with token-array equality.
"""

from __future__ import annotations

import pyarrow as pa


def replay_oracle(events: pa.Table, seed: pa.Table | None = None,
                  watermark: int | None = None,
                  sources: set[str] | None = None) -> dict[str, dict]:
    state: dict[str, dict] = {}
    if seed is not None:
        for row in seed.to_pylist():
            state[row["doc_id"]] = dict(row)
    rows = sorted(events.to_pylist(), key=lambda r: r["lsn"])
    for r in rows:
        if watermark is not None and r["lsn"] > watermark:
            continue
        if sources is not None and r.get("source") not in sources:
            continue
        if r["op"] == 1:
            state.pop(r["doc_id"], None)
        else:
            row = {k: v for k, v in r.items()
                   if k not in ("lsn", "op", "ts")}
            row["last_lsn"] = r["lsn"]
            state[r["doc_id"]] = row
    return state


def oracle_table(state: dict[str, dict], columns: list[str]) -> list[dict]:
    """Sorted rows restricted to `columns` for comparison."""
    out = []
    for doc_id in sorted(state):
        r = state[doc_id]
        out.append({c: r.get(c) for c in columns})
    return out


def consistency_sum_oracle(state: dict[str, dict]) -> int:
    return sum(r.get("last_lsn", 0) for r in state.values())
