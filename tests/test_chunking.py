"""Content-defined chunking: boundary determinism, shift-resilience
(the property fixed blocks lack), and chunk-level dedup end-to-end."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from aqueduct_core_ray.functions.chunking import (
    chunk_batch,
    chunk_boundaries,
    chunk_dedup,
)

RNG = np.random.default_rng(17)
WORDS = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
         "golf", "hotel", "india", "juliet"]


def para(n=120):
    return " ".join(RNG.choice(WORDS, size=n).tolist())


def _mk(tmp_path, texts):
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
    })
    d = tmp_path / "sf"
    d.mkdir(parents=True, exist_ok=True)
    pq.write_table(t, str(d / "documents.parquet"))
    return str(d)


def test_boundaries_deterministic_and_cover():
    data = para(500).encode()
    b1 = chunk_boundaries(data)
    b2 = chunk_boundaries(data)
    assert b1 == b2
    assert b1[-1] == len(data)
    assert all(0 < b1[i] - (b1[i - 1] if i else 0) <= 4096
               for i in range(len(b1)))


def test_boundaries_shift_resilient():
    """Prepending a prefix must leave most of the ORIGINAL content's
    chunk set intact — the content-defined property. Compare interior
    chunk payloads by content, ignoring the first resynchronization
    chunk."""
    body = para(800).encode()
    shifted = ("PREFIX-" * 3).encode() + body

    def pieces(data):
        prev, out = 0, []
        for end in chunk_boundaries(data):
            out.append(data[prev:end])
            prev = end
        return out

    a = set(pieces(body)[1:])
    b = set(pieces(shifted)[1:])
    assert len(a & b) >= len(a) * 0.5


def test_chunk_batch_rows():
    t = pa.table({"doc_id": pa.array([7], pa.int64()),
                  "text": pa.array([para(400)])})
    out = chunk_batch(t)
    assert out.num_rows >= 1
    assert set(out.column("doc_id").to_pylist()) == {7}
    assert out.column("chunk_idx").to_pylist() == list(
        range(out.num_rows))
    total = sum(out.column("n_bytes").to_pylist())
    assert total == len(t.column("text")[0].as_py().encode())


def test_chunk_batch_matches_per_doc_boundaries():
    """The whole-batch vectorized pass must produce EXACTLY the same
    chunk layout as the per-doc reference kernel — including edge
    lengths around the window size, empty docs, and max_chunk caps."""
    texts = ["", "x", "y" * 15, "z" * 16, "w" * 17, para(3),
             para(400), para(2000), "PREFIX-" * 3 + para(400)]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    out = chunk_batch(t, max_chunk=512)
    got: dict[int, list[int]] = {}
    for did, nb in zip(out.column("doc_id").to_pylist(),
                       out.column("n_bytes").to_pylist()):
        ends = got.setdefault(did, [])
        ends.append((ends[-1] if ends else 0) + nb)
    for did, s in enumerate(texts):
        want = chunk_boundaries(s.encode(), max_chunk=512)
        assert got.get(did, []) == want, f"doc {did}"
    # fingerprints: equal content -> equal fp, across different docs
    t2 = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                   "text": pa.array([texts[6], "pad. " + texts[6]])})
    f = chunk_batch(t2)
    by_doc = {0: set(), 1: set()}
    for did, fp in zip(f.column("doc_id").to_pylist(),
                       f.column("chunk_fp").to_pylist()):
        by_doc[did].add(fp)
    assert len(by_doc[0] & by_doc[1]) >= len(by_doc[0]) * 0.5


def test_chunk_dedup_finds_shared_boilerplate(tmp_path):
    shared = para(600)
    texts = [shared + " " + para(200),
             para(250) + " " + shared,
             para(300)]
    sf = _mk(tmp_path, texts)
    rows = chunk_dedup(sf).take_all()
    assert rows, "no shared chunks found across docs sharing a paragraph"
    assert all(r["n_docs"] >= 2 for r in rows)

    # unrelated corpus: no cross-doc chunks
    sf2 = _mk(tmp_path / "b", [para(300), para(300)])
    assert chunk_dedup(sf2).count() == 0
