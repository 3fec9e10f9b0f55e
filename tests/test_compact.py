"""LWW compaction survivor fixtures (FIXTURES.md §2.1; reference golden
cases SQLiteStorageIntegrationSpec.groovy:710-921)."""

import pyarrow as pa

from aqueduct_core_ray.stages.compact import compact_lww, split_tombstones


def ev(lsn, doc, op=0):
    return {"lsn": lsn, "op": op, "doc_id": doc}


def tbl(rows):
    return pa.Table.from_pylist(
        rows, schema=pa.schema([pa.field("lsn", pa.int64()),
                                pa.field("op", pa.int8()),
                                pa.field("doc_id", pa.string())]))


def survivors(rows):
    return sorted(compact_lww(tbl(rows)).column("lsn").to_pylist())


def test_duplicate_key_keeps_max_lsn():
    # reference :710-732 — keys A,B with dup A ⇒ survivors {2,3}
    assert survivors([ev(1, "A"), ev(2, "B"), ev(3, "A")]) == [2, 3]


def test_single_rows_untouched():
    assert survivors([ev(1, "A"), ev(2, "B")]) == [1, 2]


def test_delete_is_latest_survives_as_tombstone():
    out = compact_lww(tbl([ev(1, "A"), ev(2, "A", op=1)]))
    assert out.column("lsn").to_pylist() == [2]
    ups, dels = split_tombstones(out)
    assert ups.num_rows == 0 and dels.num_rows == 1


def test_reinsert_after_delete_wins():
    out = compact_lww(tbl([ev(1, "A"), ev(2, "A", op=1), ev(3, "A")]))
    assert out.column("lsn").to_pylist() == [3]
    assert out.column("op").to_pylist() == [0]


def test_interleaved_many_keys():
    rows = [ev(1, "A"), ev(2, "B"), ev(3, "C"), ev(4, "B"), ev(5, "A"),
            ev(6, "C", op=1), ev(7, "D")]
    assert survivors(rows) == [4, 5, 6, 7]


def test_empty_and_singleton():
    assert compact_lww(tbl([])).num_rows == 0
    assert survivors([ev(9, "Z")]) == [9]


def test_unsorted_input():
    rows = [ev(5, "A"), ev(1, "A"), ev(3, "B"), ev(2, "B"), ev(4, "A")]
    assert survivors(rows) == [3, 5]
