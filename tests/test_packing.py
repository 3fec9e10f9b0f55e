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
