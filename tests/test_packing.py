"""Sequence packing: token conservation, fixed lengths, determinism."""

from aqueduct_core_ray.functions.packing import pack_sequences
from aqueduct_core_ray.pipelines.events_replay import tokenize_documents

SF = "/root/testdata/sf0.001"
L = 256


def test_pack_conserves_tokens_and_lengths():
    packs = pack_sequences(SF, context_len=L).take_all()
    total_in = sum(r["n_tok"] for r in
                   tokenize_documents(SF)
                   .select_columns(["n_tok"]).take_all())
    total_out = sum(r["n_tok"] for r in packs)
    assert total_out == total_in               # nothing lost or invented
    assert all(len(r["tokens"]) == r["n_tok"] for r in packs)
    # at most one partial pack per partition
    partial_per_part = {}
    for r in packs:
        part = r["pack_id"].split("-")[0]
        if r["n_tok"] != L:
            partial_per_part[part] = partial_per_part.get(part, 0) + 1
    assert all(v == 1 for v in partial_per_part.values())
    full = [r for r in packs if r["n_tok"] == L]
    assert len(full) >= len(packs) - len(partial_per_part)
    assert sum(r["n_docs"] for r in packs) == 500   # every doc attributed


def test_pack_deterministic():
    a = sorted((r["pack_id"], tuple(r["tokens"]))
               for r in pack_sequences(SF, context_len=L).take_all())
    b = sorted((r["pack_id"], tuple(r["tokens"]))
               for r in pack_sequences(SF, context_len=L).take_all())
    assert a == b


def test_pack_documents_preserves_docs():
    from aqueduct_core_ray.functions.packing import pack_documents
    packs = pack_documents(SF, context_len=L).take_all()
    lens = {r["doc_id"]: r["n_tok"] for r in
            tokenize_documents(SF)
            .select_columns(["doc_id", "n_tok"]).take_all()}
    # every doc appears in exactly one pack, whole
    seen = [d for r in packs for d in r["doc_ids"]]
    assert sorted(seen) == sorted(lens)
    for r in packs:
        assert r["n_docs"] == len(r["doc_ids"])
        assert r["n_tok"] == sum(lens[d] for d in r["doc_ids"])
        if r["oversize"]:
            assert r["n_docs"] == 1 and r["n_tok"] > L
            assert r["waste"] == 0
        else:
            assert r["n_tok"] <= L
            assert r["waste"] == L - r["n_tok"]
    # token conservation
    assert sum(r["n_tok"] for r in packs) == sum(lens.values())


def test_pack_documents_next_fit_reference():
    """Per-partition next-fit must equal the obvious sequential loop."""
    from aqueduct_core_ray.functions.packing import pack_documents
    import numpy as np
    import pandas as pd
    packs = (pack_documents(SF, context_len=L, num_partitions=4)
             .to_pandas())
    docs = (tokenize_documents(SF)
            .select_columns(["doc_id", "n_tok"]).to_pandas())
    part = (pd.util.hash_array(
        np.asarray(docs["doc_id"].to_numpy(), dtype=object),
        categorize=False) % np.uint64(4)).astype(int)
    for p in range(4):
        sub = docs[part == p].sort_values("doc_id")
        exp_packs, cur, cur_n = [], [], 0
        for d, n in zip(sub["doc_id"], sub["n_tok"]):
            if cur and cur_n + n > L:
                exp_packs.append(cur)
                cur, cur_n = [], 0
            cur.append(d)
            cur_n += n
            if cur_n > L:             # oversize singleton
                exp_packs.append(cur)
                cur, cur_n = [], 0
        if cur:
            exp_packs.append(cur)
        got = [list(r) for r in
               packs[packs["pack_id"].str.startswith(f"p{p:04d}-")]
               .sort_values("pack_id")["doc_ids"]]
        assert got == exp_packs, p


def test_pack_documents_oversize_and_empty(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from aqueduct_core_ray.functions.packing import pack_documents
    texts = ["short doc", " ".join(["w"] * 900), "tiny"]
    t = pa.table({
        "doc_id": pa.array(range(3), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * 3),
        "source": pa.array(["s"] * 3),
        "n_chars": pa.array([len(s) for s in texts], pa.int64()),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))
    packs = pack_documents(str(d), context_len=64).take_all()
    over = [r for r in packs if r["oversize"]]
    assert len(over) == 1 and over[0]["n_docs"] == 1
    assert over[0]["n_tok"] == 900
