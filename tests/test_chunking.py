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


# --------------------------------------------------------------------- #
# Winnowing (MOSS) fingerprints

def _naive_winnow(data: bytes, k: int, w: int) -> set:
    """Independent per-doc winnowing: explicit window loop, rightmost
    min per window (paper rule). Shares only the gram-hash kernel with
    the batch implementation."""
    from aqueduct_core_ray.functions.chunking import _gram_hashes
    h = _gram_hashes(data, k)
    m = len(h)
    if m == 0:
        return set()
    sels = set()
    if m < w:
        bi, best = 0, h[0]
        for i in range(1, m):
            if h[i] <= best:
                best, bi = h[i], i
        sels.add((bi, int(h[bi])))
        return sels
    for p in range(m - w + 1):
        bi, best = p, h[p]
        for i in range(p + 1, p + w):
            if h[i] <= best:
                best, bi = h[i], i
        sels.add((bi, int(h[bi])))
    return sels


def _as_i64(u):
    """uint64 -> the int64 with the same bits (Arrow stores fp as
    int64)."""
    u = int(u)
    return u - (1 << 64) if u >= 1 << 63 else u


def _batch_winnow_rows(texts, k=16, w=8):
    from aqueduct_core_ray.functions.chunking import winnow_batch
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
    })
    out = winnow_batch(t, k=k, w=w)
    rows = {}
    for d, p, f in zip(out.column("doc_id").to_pylist(),
                       out.column("pos").to_pylist(),
                       out.column("fp").to_pylist()):
        rows.setdefault(d, set()).add((p, f))
    return rows, out


def test_winnow_batch_matches_naive():
    texts = [para(80), para(3), "xy", "", para(200),
             " ".join(["alpha"] * 40)]          # incl. repetitive doc
    rows, out = _batch_winnow_rows(texts, k=16, w=8)
    for i, txt in enumerate(texts):
        data = txt.encode()
        exp = {(p, _as_i64(f)) for p, f in
               _naive_winnow(data, 16, 8)}
        got = rows.get(i, set())
        if len(data) == 0:
            assert i not in rows
        elif len(data) < 16:
            assert len(rows[i]) == 1 and next(iter(rows[i]))[0] == 0
        else:
            assert got == exp, f"doc {i}"


def test_winnow_shared_substring_guarantee():
    # any shared substring of length >= w + k - 1 shares a fingerprint
    k, w = 16, 8
    shared = para(20)                           # ~ >= 23 bytes
    assert len(shared.encode()) >= w + k - 1
    a = para(50) + " " + shared + " " + para(50)
    b = para(60) + " " + shared + " " + para(40)
    rows, _ = _batch_winnow_rows([a, b], k=k, w=w)
    fps_a = {f for _, f in rows[0]}
    fps_b = {f for _, f in rows[1]}
    assert fps_a & fps_b
    # docs over DISJOINT alphabets share nothing (the 10-word vocab
    # legitimately shares 16-byte substrings between "unrelated" docs)
    d1 = " ".join(RNG.choice(["qqq", "www", "rrr"], 100).tolist())
    d2 = " ".join(RNG.choice(["zzz", "xxx", "vvv"], 100).tolist())
    rows2, _ = _batch_winnow_rows([d1, d2], k=k, w=w)
    assert not ({f for _, f in rows2[0]} & {f for _, f in rows2[1]})


def test_winnow_batch_equals_per_doc():
    texts = [para(60), para(5), "tiny", para(150)]
    rows_all, _ = _batch_winnow_rows(texts)
    for i, txt in enumerate(texts):
        rows_one, _ = _batch_winnow_rows([txt])
        assert rows_all.get(i, set()) == rows_one.get(0, set()), i


def test_winnow_dedup_end_to_end(tmp_path):
    from aqueduct_core_ray.functions.chunking import winnow_dedup
    def dpara(words, n):
        return " ".join(RNG.choice(words, n).tolist())
    shared = dpara(["ooo", "ppp", "lll"], 40)
    sf = _mk(tmp_path, [dpara(["qqq", "www", "rrr"], 100) + " " + shared,
                        shared + " " + dpara(["zzz", "xxx", "vvv"], 100),
                        dpara(["mmm", "nnn", "kkk"], 100)])
    out = winnow_dedup(sf).to_pandas()
    assert len(out) > 0
    assert (out["n_docs"] >= 2).all()
    sf2 = _mk(tmp_path / "b", [dpara(["qqq", "www", "rrr"], 200),
                               dpara(["zzz", "xxx", "vvv"], 200)])
    assert winnow_dedup(sf2).count() == 0
