"""Per-operator timing telemetry (reference TimedDistributedStorage
.java:10-31 / MetricsInterceptor.java:12-36 analog): library entry
points record (op, wall_s, rows) per call into the in-process ring
buffer and, when $AQR_METRICS_PATH is set, into a jsonl file."""

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from aqueduct_core_ray import metrics


def _mk_docs(tmp_path):
    t = pa.table({
        "doc_id": pa.array(range(40), pa.int64()),
        "text": pa.array([f"alpha beta gamma {i % 5}" for i in range(40)]),
        "source": pa.array([f"src{i % 3}" for i in range(40)]),
        "n_chars": pa.array([20] * 40, pa.int64()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_timed_op_records_wall_and_rows():
    @metrics.timed_op("probe_op")
    def op(n):
        return pa.table({"x": pa.array(np.arange(n))})

    metrics.drain()
    out = op(7)
    assert out.num_rows == 7
    recs = metrics.recent("probe_op")
    assert len(recs) == 1
    r = recs[0]
    assert r["ok"] and r["rows"] == 7 and r["wall_s"] >= 0.0


def test_timed_op_records_failures():
    @metrics.timed_op
    def boom():
        raise RuntimeError("x")

    metrics.drain()
    try:
        boom()
        assert False
    except RuntimeError:
        pass
    r = metrics.recent("boom")[0]
    assert r["ok"] is False and r["rows"] is None


def test_library_entry_points_are_instrumented(tmp_path, ray_session,
                                               monkeypatch):
    """Calling real operators must append telemetry rows — and mirror
    them to $AQR_METRICS_PATH as jsonl."""
    sf = _mk_docs(tmp_path)
    path = str(tmp_path / "metrics.jsonl")
    monkeypatch.setenv("AQR_METRICS_PATH", path)
    metrics.drain()

    from aqueduct_core_ray.functions.dedup import exact_dedup
    from aqueduct_core_ray.functions.text import token_count
    assert getattr(token_count, "__aqr_timed__", False)
    token_count(sf).materialize()
    exact_dedup(sf).materialize()

    ops = [r["op"] for r in metrics.recent()]
    assert "token_count" in ops and "exact_dedup" in ops
    with open(path) as f:
        lines = [json.loads(x) for x in f if x.strip()]
    assert {l["op"] for l in lines} >= {"token_count", "exact_dedup"}
    for l in lines:
        assert l["ok"] and l["wall_s"] >= 0.0
