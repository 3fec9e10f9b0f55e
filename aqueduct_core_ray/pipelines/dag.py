"""Topologically-ordered DAG of source -> derived table syncs.

Reference analog: hierarchical propagation — each till subscribes to a set
of `type`s and re-materializes from its parent's change batches
(SubNodeGroup.java:53-65 tree shaping, SQLiteQueries.java:105-112 type
filter). Here the hierarchy is a static DAG: the lake is the root; each
`Derivation` re-derives via groupby-aggregate over the upstream's change
batches.

Scale design: derivations are computed as *partial aggregates per lake
partition inside the merge task* (the combiner), stored in the manifest,
and folded into the final table with a driver-side reduce over at most
P × distinct-keys tiny records — so a wave's derived-table refresh touches
only the partitions the wave touched and NEVER re-shuffles the lake
(SURVEY.md A6/§7.4).
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd
import pyarrow as pa

_MERGE_FN = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
_GLOBAL_KEY = "__all__"


@dataclass(frozen=True)
class Derivation:
    """One derived table: groupby(key) -> aggregates over the upstream.

    aggs: tuple of (column, fn) with fn in {sum, count, min, max}; the
    output column is named f"{fn}_{column}" ("n_rows" for count of "*").
    key=None means a global (single-row) aggregate. upstream="lake"
    derives from the materialized lake; any other value names an earlier
    derivation in the DAG, re-derived driver-side from its (small) output.
    """

    name: str
    key: str | None
    aggs: tuple[tuple[str, str], ...]
    upstream: str = "lake"

    def out_col(self, col: str, fn: str) -> str:
        return "n_rows" if (fn == "count") else f"{fn}_{col}"

    def _group_agg(self, df: pd.DataFrame) -> pd.DataFrame:
        key = self.key or _GLOBAL_KEY
        if self.key is None:
            df = df.assign(**{_GLOBAL_KEY: 0})
        gb = df.groupby(key, sort=True)
        out = pd.DataFrame(index=gb.size().index)
        for col, fn in self.aggs:
            if fn == "count":
                out[self.out_col(col, fn)] = gb.size()
            else:
                out[self.out_col(col, fn)] = getattr(gb[col], fn)()
        out = out.reset_index()
        if self.key is None:
            out = out.drop(columns=[_GLOBAL_KEY])
        return out

    # -- partials over one lake partition (runs inside the merge task) ----
    def partial_records(self, part_table: pa.Table) -> list[dict]:
        if part_table.num_rows == 0:
            return []
        cols = sorted({c for c, f in self.aggs if f != "count"}
                      | ({self.key} if self.key else set()))
        df = part_table.select(
            [c for c in cols if c in part_table.column_names]).to_pandas()
        return self._group_agg(df).to_dict("records")

    # -- fold partials from all partitions into the final table -----------
    def finalize(self, partials_by_pid: dict[str, list[dict]]) -> pa.Table:
        records = [r for recs in partials_by_pid.values() for r in recs]
        if not records:
            cols = {self.key: pa.array([], pa.string())} if self.key else {}
            cols.update({self.out_col(c, f): pa.array([], pa.int64())
                         for c, f in self.aggs})
            return pa.table(cols)
        df = pd.DataFrame.from_records(records)
        key = self.key or _GLOBAL_KEY
        if self.key is None:
            df = df.assign(**{_GLOBAL_KEY: 0})
        agg = {self.out_col(c, f): _MERGE_FN[f] for c, f in self.aggs}
        res = df.groupby(key, sort=True).agg(agg).reset_index()
        if self.key is None:
            res = res.drop(columns=[_GLOBAL_KEY])
        return pa.Table.from_pandas(res, preserve_index=False)

    # -- derive from another derivation's finalized table (tiny) ----------
    def derive_from_table(self, upstream: pa.Table) -> pa.Table:
        return pa.Table.from_pandas(self._group_agg(upstream.to_pandas()),
                                    preserve_index=False)


# The default DAG shipped with the engine: per-source corpus stats, and a
# second-level global rollup proving multi-hop propagation.
DEFAULT_DAG: tuple[Derivation, ...] = (
    Derivation("source_stats", key="source",
               aggs=(("*", "count"), ("n_tok", "sum"), ("last_lsn", "max"))),
    Derivation("corpus_rollup", key=None,
               aggs=(("n_rows", "sum"), ("sum_n_tok", "sum"),
                     ("max_last_lsn", "max")),
               upstream="source_stats"),
)


def topo_check(dag: tuple[Derivation, ...]) -> None:
    """Derivations must reference 'lake' or an earlier derivation."""
    seen = {"lake"}
    for d in dag:
        if d.upstream not in seen:
            raise ValueError(f"derivation {d.name!r} references unknown "
                             f"upstream {d.upstream!r} (DAG must be "
                             f"topologically ordered)")
        seen.add(d.name)
