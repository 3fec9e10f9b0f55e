"""Schema-evolution reconciler cases (FIXTURES.md §2.5)."""

import pyarrow as pa
import pytest

from aqueduct_core_ray.schema import (
    CHANGE_EVENT,
    LAKE_ROW,
    evolve_schema,
    reconcile_batch,
)


def test_evolve_identity():
    assert evolve_schema(LAKE_ROW, LAKE_ROW).equals(LAKE_ROW)


def test_evolve_widens_n_tok():
    incoming = pa.schema([pa.field("n_tok", pa.int64())])
    out = evolve_schema(LAKE_ROW, incoming)
    assert out.field("n_tok").type == pa.int64()
    assert out.names == LAKE_ROW.names  # order preserved


def test_evolve_adds_new_column():
    incoming = pa.schema([pa.field("lang", pa.string())])
    out = evolve_schema(LAKE_ROW, incoming)
    assert out.names == LAKE_ROW.names + ["lang"]


def test_evolve_incompatible_raises():
    incoming = pa.schema([pa.field("n_tok", pa.string())])
    with pytest.raises(TypeError):
        evolve_schema(LAKE_ROW, incoming)


def test_reconcile_missing_column_filled_null():
    t = pa.table({"doc_id": ["a"], "n_tok": pa.array([3], pa.int32())})
    target = pa.schema([pa.field("doc_id", pa.string()),
                        pa.field("n_tok", pa.int32()),
                        pa.field("source", pa.string())])
    out = reconcile_batch(t, target)
    assert out.schema.equals(target)
    assert out.column("source").null_count == 1


def test_reconcile_drops_extra_and_widens():
    t = pa.table({"doc_id": ["a"], "n_tok": pa.array([3], pa.int32()),
                  "junk": [1]})
    target = pa.schema([pa.field("doc_id", pa.string()),
                        pa.field("n_tok", pa.int64())])
    out = reconcile_batch(t, target)
    assert out.schema.equals(target)
    assert out.column("n_tok").to_pylist() == [3]
    assert "junk" not in out.column_names


def test_change_event_shape():
    assert CHANGE_EVENT.field("tokens").type == pa.list_(pa.int32())
    assert CHANGE_EVENT.field("lsn").type == pa.int64()
