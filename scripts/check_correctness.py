"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry and its ``oracle_sql()`` twin at a given sf, compare
row count, column names, and order-insensitive values.

Usage: python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    import ray.data

    if isinstance(res, ray.data.Dataset):
        # NOT res.to_pandas(): Ray's to_pandas drops the schema of a
        # zero-row dataset (column-less frame), which would fail the
        # schema compare for legitimately-empty results
        import ray
        tabs = ray.get(res.to_arrow_refs())
        if tabs:
            return pa.concat_tables(
                tabs, promote_options="default").to_pandas()
        return pd.DataFrame()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(name: str, ours: pd.DataFrame, theirs: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(ours.columns) != sorted(theirs.columns):
        problems.append(f"columns {sorted(ours.columns)} != "
                        f"{sorted(theirs.columns)}")
        return problems
    if len(ours) != len(theirs):
        problems.append(f"rows {len(ours)} != {len(theirs)}")
        return problems
    a, b = canon(ours), canon(theirs)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(av.dtype, np.floating):
            ok = np.allclose(av.astype(float), bv.astype(float),
                             rtol=0, atol=0, equal_nan=True)
        else:
            ok = (av == bv).all()
        if not ok:
            bad = np.flatnonzero(~(av == bv)) if av.dtype == bv.dtype else []
            problems.append(f"col {c} mismatch "
                            f"(first rows: {av[:3]} vs {bv[:3]}; "
                            f"n_bad={len(bad) if len(bad) else '?'})")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True)

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entry

    qs, oracles = entry.queries(), entry.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            ours = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        dt = time.perf_counter() - t0
        if name not in oracles:
            print(f"ok   {name}: rows-only, {len(ours)} rows ({dt:.1f}s)")
            continue
        theirs = con.execute(oracles[name]).df()
        problems = compare(name, ours, theirs)
        if problems:
            failures += 1
            print(f"FAIL {name} ({dt:.1f}s): " + "; ".join(problems))
        else:
            print(f"PASS {name}: {len(ours)} rows ({dt:.1f}s)")
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
