"""JSONL changelog ingress — the reference's wire format as a source.

The reference's pipe protocol moves newline-JSON `Message`s
(pipe-api .../Message.java:14-34: msg_offset, msg_key, type,
created_utc, data; `data == null` is the tombstone,
SQLiteQueries.java:54-55). Round 1 mapped JSON away at the storage
layer (S6: Arrow/Parquet everywhere internally); this module is the
INGRESS adapter, so a publisher still emitting reference-style JSONL
can feed this engine directly: `ray.data.read_json` streams the lines,
one vectorized projection conforms them to the CHANGE_EVENT envelope,
and the result replays through the normal wave machinery (the opaque
`data` string stays a payload column; schema evolution handles whatever
else the publisher adds).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

# Message.java field names -> engine envelope
_FIELD_MAP = {
    "msg_offset": "lsn",
    "msg_key": "doc_id",
    "type": "source",
    "created_utc": "ts",
}


def conform_messages(t: pa.Table) -> pa.Table:
    """One reference-JSON batch -> CHANGE_EVENT-shaped batch.

    op derives from `data IS NULL` (the reference's tombstone contract);
    every column that is not part of the envelope rides along as
    payload, so publishers may add fields freely (schema evolution
    reconciles them lake-side)."""
    n = t.num_rows
    cols: dict[str, pa.ChunkedArray | pa.Array] = {}
    for src, dst in _FIELD_MAP.items():
        if src not in t.column_names:
            raise ValueError(f"JSONL changelog is missing required "
                             f"Message field {src!r}")
        cols[dst] = t.column(src)
    cols["lsn"] = cols["lsn"].cast(pa.int64())
    ts = cols["ts"]
    if pa.types.is_string(ts.type):
        ts = pc.strptime(ts, format="%Y-%m-%dT%H:%M:%SZ", unit="us")
    cols["ts"] = ts.cast(pa.timestamp("us"))
    if "data" in t.column_names:
        data = t.column("data")
        op = pc.if_else(pc.is_null(data), pa.scalar(1, pa.int8()),
                        pa.scalar(0, pa.int8()))
        cols["data"] = data
    else:
        op = pa.array(np.zeros(n, np.int8))
    cols["op"] = op
    for name in t.column_names:
        if name not in _FIELD_MAP and name != "data":
            cols[name] = t.column(name)
    order = ["lsn", "op", "doc_id"]
    rest = [c for c in cols if c not in order + ["source", "ts"]]
    return pa.table({k: cols[k] for k in order + rest + ["source", "ts"]})


def read_jsonl_changelog(path: str | list[str],
                         compression: str | None = None
                         ) -> ray.data.Dataset:
    """Reference-style JSONL message log as a CHANGE_EVENT Dataset —
    feed it to `CDCEngine.bootstrap`/`_apply` via parquet staging or
    `replay_jsonl` below.

    ``compression``: the reference's wire codecs (T5,
    PipeReadController's brotli/gzip content negotiation) map to
    compressed JSONL segments at this ingress: 'gzip' | 'brotli' |
    None, or 'detect' to infer from the file extension
    (.gz/.gzip -> gzip, .br -> brotli). Decompression streams through
    Arrow's codec layer inside each read task — no whole-file driver
    inflate."""
    kwargs = {}
    if compression == "detect":
        p0 = path[0] if isinstance(path, list) else path
        if p0.endswith((".gz", ".gzip")):
            compression = "gzip"
        elif p0.endswith(".br"):
            compression = "brotli"
        else:
            compression = None
    if compression:
        kwargs["arrow_open_stream_args"] = {"compression": compression}
    return ray.data.read_json(path, **kwargs) \
        .map_batches(conform_messages, batch_format="pyarrow")


def stage_jsonl_to_log(path: str | list[str], out_dir: str) -> str:
    """Materialize a JSONL message stream as an lsn-ordered parquet log
    directory the engine can tail/replay (the staging step a real
    deployment runs once at the ingest edge; segment footers then give
    the engine its lsn index for free)."""
    read_jsonl_changelog(path).write_parquet(out_dir)
    return out_dir
