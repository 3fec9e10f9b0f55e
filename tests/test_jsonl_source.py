"""JSONL ingress adapter: reference-style Message lines -> CHANGE_EVENT
-> full engine replay, LWW + tombstone semantics preserved end-to-end
(Message.java:14-34 field contract; data IS NULL tombstones,
SQLiteQueries.java:54-55)."""

import json

import pytest

from aqueduct_core_ray.pipelines.replay import CDCEngine
from aqueduct_core_ray.sources.jsonl import (
    read_jsonl_changelog,
    stage_jsonl_to_log,
)

LINES = [
    {"msg_offset": 1, "msg_key": "a", "type": "t1",
     "created_utc": "2024-01-01T00:00:01Z", "data": "v1"},
    {"msg_offset": 2, "msg_key": "b", "type": "t1",
     "created_utc": "2024-01-01T00:00:02Z", "data": "v2"},
    {"msg_offset": 3, "msg_key": "a", "type": "t1",
     "created_utc": "2024-01-01T00:00:03Z", "data": "v3"},
    {"msg_offset": 4, "msg_key": "b", "type": "t1",
     "created_utc": "2024-01-01T00:00:04Z", "data": None},   # tombstone
    {"msg_offset": 5, "msg_key": "c", "type": "t2",
     "created_utc": "2024-01-01T00:00:05Z", "data": "v5"},
]


@pytest.fixture()
def jsonl_path(tmp_path):
    p = tmp_path / "messages.jsonl"
    with open(p, "w") as f:
        for rec in LINES:
            f.write(json.dumps(rec) + "\n")
    return str(p)


def test_conform_fields_and_tombstones(jsonl_path):
    rows = sorted(read_jsonl_changelog(jsonl_path).take_all(),
                  key=lambda r: r["lsn"])
    assert [r["lsn"] for r in rows] == [1, 2, 3, 4, 5]
    assert [r["op"] for r in rows] == [0, 0, 0, 1, 0]
    assert rows[0]["doc_id"] == "a" and rows[0]["source"] == "t1"
    assert rows[0]["data"] == "v1"
    assert str(rows[0]["ts"]).startswith("2024-01-01")


def test_jsonl_replay_through_engine(jsonl_path, tmp_path):
    log = stage_jsonl_to_log(jsonl_path, str(tmp_path / "log"))
    eng = CDCEngine(str(tmp_path / "lake"), num_partitions=2)
    eng.replay(log, [(0, 5)])
    lake = {r["doc_id"]: r for r in eng.lake_table().to_pylist()}
    # LWW: a -> v3 (offset 3 beats 1); b tombstoned away; c -> v5
    assert set(lake) == {"a", "c"}
    assert lake["a"]["data"] == "v3" and lake["a"]["last_lsn"] == 3
    assert lake["c"]["data"] == "v5"


def test_missing_required_field(tmp_path):
    p = tmp_path / "bad.jsonl"
    with open(p, "w") as f:
        f.write(json.dumps({"msg_offset": 1, "type": "t"}) + "\n")
    with pytest.raises(Exception):
        read_jsonl_changelog(str(p)).take_all()


@pytest.mark.parametrize("codec,ext", [("gzip", ".gz"),
                                       ("brotli", ".br")])
def test_compressed_wire_codecs(tmp_path, jsonl_path, codec, ext):
    """T5 wire-codec analog: gzip/brotli-compressed JSONL segments
    stream through the same ingress and conform identically."""
    import pyarrow as pa
    raw = open(jsonl_path, "rb").read()
    comp = tmp_path / ("messages.jsonl" + ext)
    with pa.output_stream(str(comp), compression=codec) as f:
        f.write(raw)
    plain = sorted(read_jsonl_changelog(jsonl_path).take_all(),
                   key=lambda r: r["lsn"])
    for mode in (codec, "detect"):
        got = sorted(read_jsonl_changelog(str(comp),
                                          compression=mode).take_all(),
                     key=lambda r: r["lsn"])
        assert got == plain


def test_quarantine_dead_letter_path(tmp_path):
    """Broken JSON, null key, and garbage timestamps quarantine with
    reasons; good rows (including an omitted-data tombstone) stream on
    as CHANGE_EVENTs."""
    from aqueduct_core_ray.sources.jsonl import (
        read_dead_letters,
        read_jsonl_changelog_quarantine,
    )
    lines = [
        '{"msg_offset": 1, "msg_key": "a", "type": "t",'
        ' "created_utc": "2024-01-01T00:00:00Z", "data": "x"}',
        'THIS IS NOT JSON {{{',
        '{"msg_offset": 2, "msg_key": null, "type": "t",'
        ' "created_utc": "2024-01-01T00:00:01Z", "data": "y"}',
        '{"msg_offset": 3, "msg_key": "c", "type": "t",'
        ' "created_utc": "NOT A TIME", "data": null}',
        '{"msg_offset": 4, "msg_key": "d", "type": "t",'
        ' "created_utc": "2024-01-01T00:00:02Z"}',
    ]
    src = tmp_path / "in.jsonl"
    src.write_text("\n".join(lines))
    dl_dir = str(tmp_path / "dl")
    good = (read_jsonl_changelog_quarantine(str(src), dl_dir)
            .to_pandas().sort_values("lsn"))
    assert good.lsn.tolist() == [1, 4]
    assert good.op.tolist() == [0, 1]      # omitted data key == null
    dl = read_dead_letters(dl_dir).to_pandas()
    assert len(dl) == 3
    reasons = " | ".join(dl.reason)
    assert "json" in reasons and "null msg_key" in reasons \
        and "bad created_utc" in reasons
    # quarantined lines are preserved verbatim for replay-after-fix
    assert any("NOT JSON" in l for l in dl.line)


def test_quarantine_clean_input_writes_nothing(tmp_path):
    from aqueduct_core_ray.sources.jsonl import (
        read_dead_letters,
        read_jsonl_changelog_quarantine,
    )
    src = tmp_path / "in.jsonl"
    src.write_text('{"msg_offset": 1, "msg_key": "a", "type": "t",'
                   ' "created_utc": "2024-01-01T00:00:00Z",'
                   ' "data": "x"}')
    dl_dir = str(tmp_path / "dl")
    good = read_jsonl_changelog_quarantine(str(src), dl_dir).to_pandas()
    assert len(good) == 1 and read_dead_letters(dl_dir).num_rows == 0


def test_csv_changelog_ingress(tmp_path):
    """CSV Message export replays identically: unquoted-empty data is
    the tombstone, quoted-empty is a real payload."""
    from aqueduct_core_ray.sources.jsonl import read_csv_changelog
    csv = (
        "msg_offset,msg_key,type,created_utc,data\n"
        '1,a,t1,2024-01-01T00:00:01Z,v1\n'
        '2,b,t1,2024-01-01T00:00:02Z,""\n'      # quoted empty: payload
        "3,a,t1,2024-01-01T00:00:03Z,\n"        # unquoted: tombstone
    )
    p = tmp_path / "log.csv"
    p.write_text(csv)
    rows = sorted(read_csv_changelog(str(p)).take_all(),
                  key=lambda r: r["lsn"])
    assert [r["op"] for r in rows] == [0, 0, 1]
    assert rows[0]["data"] == "v1" and rows[1]["data"] == ""
    assert rows[2]["doc_id"] == "a"
    assert str(rows[0]["ts"]).startswith("2024-01-01")


def test_message_jsonl_roundtrip(tmp_path):
    """write_message_jsonl is the exact inverse of the ingress: a
    parquet change log exported as Message JSONL reads back with
    identical envelope fields, microsecond timestamps, tombstones,
    and payload columns."""
    import glob

    import numpy as np
    import pyarrow as pa

    from aqueduct_core_ray.sources.changelog import (
        ChangelogSpec,
        write_changelog,
    )
    from aqueduct_core_ray.sources.jsonl import (
        read_jsonl_changelog,
        write_message_jsonl,
    )

    spec = ChangelogSpec(n_docs=80, n_events=400, seed=3,
                         chunk_size=200, n_waves=1)
    log = write_changelog(spec, str(tmp_path / "log"))
    out = write_message_jsonl(log, str(tmp_path / "jsonl"))
    files = sorted(glob.glob(f"{out}/*.jsonl"))
    assert files
    import ray
    back = pa.concat_tables(
        ray.get(read_jsonl_changelog(files).to_arrow_refs()),
        promote_options="default").sort_by("lsn")
    import ray.data as rd
    orig = pa.concat_tables(
        ray.get(rd.read_parquet(log).to_arrow_refs()),
        promote_options="default").sort_by("lsn")
    for c in ("lsn", "doc_id", "source"):
        assert back.column(c).to_pylist() == orig.column(c).to_pylist()
    assert back.column("op").to_pylist() == \
        orig.column("op").to_pylist()
    assert (back.column("ts").cast(pa.timestamp("us")).to_pylist()
            == orig.column("ts").to_pylist())
    live = [i for i, o in enumerate(orig.column("op").to_pylist())
            if o == 0]
    bt = back.column("tokens").to_pylist()
    ot = orig.column("tokens").to_pylist()
    assert all(bt[i] == ot[i] for i in live)
    assert any(o == 1 for o in orig.column("op").to_pylist())


def test_message_jsonl_gzip_segment(tmp_path):
    import glob

    from aqueduct_core_ray.sources.changelog import (
        ChangelogSpec,
        write_changelog,
    )
    from aqueduct_core_ray.sources.jsonl import (
        read_jsonl_changelog,
        write_message_jsonl,
    )
    spec = ChangelogSpec(n_docs=40, n_events=150, seed=4,
                         chunk_size=150, n_waves=1)
    log = write_changelog(spec, str(tmp_path / "log"))
    out = write_message_jsonl(log, str(tmp_path / "gz"),
                              compression="gzip")
    files = sorted(glob.glob(f"{out}/*.jsonl.gz"))
    assert files
    n = read_jsonl_changelog(files, compression="detect").count()
    assert n == 150
