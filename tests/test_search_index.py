"""CDC-maintained trigram search index (functions/search.py
LakeTrigramIndex): O(delta) refresh from the engine changefeed,
verify-at-query correctness under updates and deletes, crash-idempotent
state, compaction."""

import json

import pytest

from aqueduct_core_ray.functions.search import LakeTrigramIndex
from aqueduct_core_ray.pipelines.replay import CDCEngine
from aqueduct_core_ray.sources.jsonl import stage_jsonl_to_log


def _write_jsonl(path, recs):
    with open(path, "w") as f:
        for r in recs:
            f.write(json.dumps(r) + "\n")
    return str(path)


def _msg(off, key, data):
    return {"msg_offset": off, "msg_key": key, "type": "t",
            "created_utc": f"2024-01-01T00:00:{off:02d}Z", "data": data}


@pytest.fixture()
def lake_with_index(tmp_path):
    recs = [
        _msg(1, "a", "alpha beta gamma"),
        _msg(2, "b", "hello world text"),
        _msg(3, "c", "needle haystack here"),
        _msg(4, "d", "plain filler words"),
    ]
    log1 = stage_jsonl_to_log(
        _write_jsonl(tmp_path / "w1.jsonl", recs),
        str(tmp_path / "log1"))
    eng = CDCEngine(str(tmp_path / "lake"), num_partitions=4)
    eng.replay(log1, [(0, 4)])
    eng.drain_absorbs()
    idx = LakeTrigramIndex(eng, str(tmp_path / "idx"), column="data")
    return eng, idx, tmp_path


def _matches(idx, needle):
    t = idx.search((needle,))
    return sorted(t.column("doc_id").to_pylist())


def test_full_build_and_search(lake_with_index):
    eng, idx, _ = lake_with_index
    r = idx.refresh()
    assert r["mode"] == "full" and r["postings"] > 0
    assert _matches(idx, "alpha beta") == ["a"]
    assert _matches(idx, "needle hay") == ["c"]
    assert _matches(idx, "zzz-absent") == []
    # idempotent: same generation -> noop
    assert idx.refresh()["mode"] == "noop"


def test_delta_refresh_tracks_updates_and_deletes(lake_with_index):
    eng, idx, tmp_path = lake_with_index
    full = idx.refresh()
    recs = [
        _msg(5, "a", "gamma delta only now"),     # update: loses needle
        _msg(6, "c", None),                       # tombstone: delete
        _msg(7, "e", "alpha beta again"),         # insert: gains needle
    ]
    log2 = stage_jsonl_to_log(
        _write_jsonl(tmp_path / "w2.jsonl", recs),
        str(tmp_path / "log2"))
    eng.replay(log2, [(4, 7)])
    eng.drain_absorbs()
    r = idx.refresh()
    assert r["mode"] == "delta"
    # O(delta): the delta segment indexes 2 changed live docs, not 5
    assert 0 < r["postings"] < full["postings"]
    # the updated doc no longer matches (stale posting dies at verify);
    # the new doc does; the deleted doc is gone
    assert _matches(idx, "alpha beta") == ["e"]
    assert _matches(idx, "needle hay") == []
    assert _matches(idx, "gamma delta") == ["a"]
    # untouched doc still found through the original segment
    assert _matches(idx, "hello world") == ["b"]


def test_compact_drops_stale_segments(lake_with_index):
    eng, idx, tmp_path = lake_with_index
    idx.refresh()
    log2 = stage_jsonl_to_log(
        _write_jsonl(tmp_path / "w2.jsonl",
                     [_msg(5, "a", "totally different"),
                      _msg(6, "e", "alpha beta fresh")]),
        str(tmp_path / "log2"))
    eng.replay(log2, [(4, 6)])
    eng.drain_absorbs()
    idx.refresh()
    before = _matches(idx, "alpha beta")
    c = idx.compact()
    assert c["mode"] == "compacted" and c["dropped_segments"] >= 1
    st = json.load(open(f"{idx.index_dir}/_STATE.json"))
    assert len(st["segments"]) == 1
    assert _matches(idx, "alpha beta") == before == ["e"]


def test_refresh_rerun_after_simulated_crash(lake_with_index):
    """A refresh that died between segment publish and state write must
    re-run to the identical result (deterministic segment name)."""
    eng, idx, tmp_path = lake_with_index
    idx.refresh()
    log2 = stage_jsonl_to_log(
        _write_jsonl(tmp_path / "w2.jsonl",
                     [_msg(5, "e", "alpha beta new doc")]),
        str(tmp_path / "log2"))
    eng.replay(log2, [(4, 5)])
    eng.drain_absorbs()
    st_before = json.load(open(f"{idx.index_dir}/_STATE.json"))
    r1 = idx.refresh()
    # simulate the crash: roll the state file back (segment stays)
    with open(f"{idx.index_dir}/_STATE.json", "w") as f:
        json.dump(st_before, f)
    r2 = idx.refresh()
    assert r2["mode"] == "delta" and r2["postings"] == r1["postings"]
    assert _matches(idx, "alpha beta") == ["a", "e"]


def test_post_commit_hook_maintains_search_index_during_tail(tmp_path):
    """Streaming composition: a child tail()s a parent outbox with a
    post_commit hook refreshing the trigram index — a doc published in
    the LAST wave is immediately searchable, with zero manual refresh
    calls."""
    recs = [_msg(i, f"k{i}", f"filler text {i}") for i in range(1, 5)]
    recs.append(_msg(5, "k5", "zebra quartz unique"))
    log = stage_jsonl_to_log(
        _write_jsonl(tmp_path / "w.jsonl", recs),
        str(tmp_path / "log"))
    parent = CDCEngine(str(tmp_path / "cloud"), num_partitions=2,
                       emit_changelog=True)
    parent.replay(log, [(0, 3), (3, 5)])

    holder = {}

    def keep_indexed(eng, rec):
        holder.setdefault("idx", LakeTrigramIndex(
            eng, str(tmp_path / "idx"), column="data")).refresh()

    child = CDCEngine(str(tmp_path / "till"), num_partitions=2,
                      post_commit=(keep_indexed,))
    child.tail(parent.outbox_dir, wave_size=2, poll_interval_s=0.05,
               max_idle_polls=1)
    assert child.watermark == 5
    hits = holder["idx"].search(("zebra quartz",)).to_pylist()
    assert [h["doc_id"] for h in hits] == ["k5"]
