"""Exactly-once idempotent commit: staged files + manifest + watermarks.

Reference analog: `PipeEntity` — messages, named offsets and pipe state
written in ONE transaction (SQLiteStorage.java:133-171), with the primary
key on msg_offset as the idempotence fence (SQLiteQueries.java:22,
SQLiteStorageIntegrationSpec.groovy:250-282). Here the "transaction" is an
atomic rename chain and the fence is the manifest watermark:

  lake_root/
    parts/p=000123/g000007.parquet      one current file per partition
    _staged/<wave_id>/p=000123.parquet  deterministic staging paths
    manifests/manifest-000007.json      immutable, monotone generation
    CURRENT                             name of the live manifest (atomic)
    metrics.jsonl                       per-wave lineage/metrics append log

Commit protocol per wave:
  1. merge tasks write staged partition files (deterministic names —
     a retried/replayed task simply overwrites its own output);
  2. the driver promotes staged -> parts/p=<pid>/g<gen>.parquet;
  3. the driver writes manifest-<gen>.json then atomically repoints
     CURRENT.

A crash anywhere before step 3 leaves CURRENT on the previous manifest;
re-running the wave regenerates identical staged files from identical
committed inputs and re-promotes them (same generation number), so replays
are no-ops in effect — no duplicate or lost applies. A wave whose
watermark is <= CURRENT's is skipped outright (the fence).

Old generations' part files are retained for time-travel/debug until
`vacuum()` (the D2 retention analog: PostgresqlStorage.java:365-436's
compaction under an advisory lock; our single-flight guard is the monotone
generation number).
"""

from __future__ import annotations

import base64
import json
import os
import shutil
from dataclasses import dataclass, field
from typing import Any

import pyarrow as pa


def schema_to_b64(schema: pa.Schema) -> str:
    return base64.b64encode(schema.serialize().to_pybytes()).decode()


def schema_from_b64(s: str) -> pa.Schema:
    return pa.ipc.read_schema(pa.BufferReader(base64.b64decode(s)))


@dataclass
class Manifest:
    generation: int
    watermark: int                      # global HWM: max lsn applied anywhere
    wave_id: str
    schema_b64: str                     # current lake-wide Arrow schema
    num_partitions: int
    # pid(str) -> {path, rows, bytes, hwm, n_applied, n_deleted}
    partitions: dict[str, dict[str, Any]] = field(default_factory=dict)
    # derivation name -> pid(str) -> list of partial-aggregate records
    partials: dict[str, dict[str, list[dict[str, Any]]]] = field(default_factory=dict)
    lineage: list[dict[str, Any]] = field(default_factory=list)
    # maintained named offsets (reference OffsetName.java:3-5): updated
    # every commit from per-wave scan stats, never recomputed by a scan
    named_offsets: dict[str, int] = field(default_factory=dict)
    # hour_epoch (str) -> max lsn seen in that hour; the bounded working
    # state behind MAX_OFFSET_PREVIOUS_HOUR (pruned to a recent window —
    # older hours are already folded into the named offset)
    hour_max: dict[str, int] = field(default_factory=dict)

    @property
    def schema(self) -> pa.Schema:
        return schema_from_b64(self.schema_b64)

    def to_json(self) -> str:
        return json.dumps(self.__dict__, sort_keys=True)

    @staticmethod
    def from_json(s: str) -> "Manifest":
        return Manifest(**json.loads(s))


class LakeStore:
    """Filesystem layout + atomic commit for one lake table."""

    def __init__(self, root: str):
        self.root = root
        self.parts_dir = os.path.join(root, "parts")
        self.staged_dir = os.path.join(root, "_staged")
        self.manifests_dir = os.path.join(root, "manifests")
        self.current_path = os.path.join(root, "CURRENT")
        for d in (self.parts_dir, self.staged_dir, self.manifests_dir):
            os.makedirs(d, exist_ok=True)

    # -- paths ------------------------------------------------------------
    def staged_path(self, wave_id: str, pid: int) -> str:
        d = os.path.join(self.staged_dir, wave_id)
        os.makedirs(d, exist_ok=True)
        return os.path.join(d, f"p={pid:06d}.parquet")

    def part_path(self, pid: int, generation: int,
                  wave_id: str = "") -> str:
        """Committed location. The wave_id is part of the filename so two
        racers that derived the same generation from the same CURRENT but
        are applying DIFFERENT waves write disjoint files — the loser's
        promotion can never overwrite the winner's committed data (its
        orphan files are vacuumed later). A re-run of the SAME wave
        (resume) still overwrites its own path idempotently."""
        d = os.path.join(self.parts_dir, f"p={pid:06d}")
        os.makedirs(d, exist_ok=True)
        tag = f"-{wave_id}" if wave_id else ""
        return os.path.join(d, f"g{generation:06d}{tag}.parquet")

    def rel(self, path: str) -> str:
        return os.path.relpath(path, self.root)

    def abs(self, rel: str) -> str:
        return os.path.join(self.root, rel)

    # -- manifest ---------------------------------------------------------
    def current_manifest(self) -> Manifest | None:
        if not os.path.exists(self.current_path):
            return None
        with open(self.current_path) as f:
            name = f.read().strip()
        with open(os.path.join(self.manifests_dir, name)) as f:
            return Manifest.from_json(f.read())

    @staticmethod
    def _fsync_dir(path: str) -> None:
        """Persist a directory's entries (the rename itself) — without
        this, a power loss can leave CURRENT naming a manifest whose
        directory entry never hit disk (found in review). Best-effort on
        filesystems that reject directory fsync."""
        try:
            fd = os.open(path, os.O_RDONLY)
            try:
                os.fsync(fd)
            finally:
                os.close(fd)
        except OSError:
            pass

    def _atomic_write(self, path: str, data: str) -> None:
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
        self._fsync_dir(os.path.dirname(path))

    def commit(self, manifest: Manifest) -> None:
        """Step 3: publish the manifest, then repoint CURRENT (both atomic).

        Single-flight guard (reference analog: the compactor's advisory
        `SELECT ... FOR UPDATE NOWAIT` lock, PostgresqlStorage.java:
        416-427): the incoming generation must be exactly CURRENT+1.
        Two engines racing on one lake root both derive gen from the same
        CURRENT; the loser's commit lands on a generation that no longer
        follows and is rejected rather than silently clobbering history.
        (Best-effort, like the reference's lock — a filesystem has no
        compare-and-swap rename; the deployment contract is one committer
        per lake root.)"""
        cur = self.current_manifest()
        expect = (cur.generation + 1) if cur else 0
        if manifest.generation != expect:
            raise RuntimeError(
                f"stale commit: manifest generation {manifest.generation} "
                f"but CURRENT is at {expect - 1} (another committer won); "
                "re-read CURRENT and retry the wave")
        name = f"manifest-{manifest.generation:06d}.json"
        self._atomic_write(os.path.join(self.manifests_dir, name),
                           manifest.to_json())
        self._atomic_write(self.current_path, name)

    def manifest_at(self, generation: int) -> Manifest | None:
        """TIME TRAVEL: load a historical manifest by generation.
        Manifests are immutable and never vacuumed (tiny JSON); the
        PART FILES a historical manifest references are only guaranteed
        present within ``vacuum(keep_generations=...)``'s keep window —
        reading past it raises FileNotFoundError at scan time."""
        mp = os.path.join(self.manifests_dir,
                          f"manifest-{generation:06d}.json")
        if not os.path.exists(mp):
            return None
        with open(mp) as f:
            return Manifest.from_json(f.read())

    def promote_staged(self, wave_id: str, pid: int, generation: int) -> str:
        """Step 2: move a staged partition file to its committed location.
        `os.replace` = atomic overwrite, so re-promotion after a crash is
        idempotent."""
        dst = self.part_path(pid, generation, wave_id)
        os.replace(self.staged_path(wave_id, pid), dst)
        self._fsync_dir(os.path.dirname(dst))
        return dst

    def drop_staged(self, wave_id: str) -> None:
        shutil.rmtree(os.path.join(self.staged_dir, wave_id),
                      ignore_errors=True)

    # -- maintenance ------------------------------------------------------
    def vacuum(self, keep_generations: int = 1,
               staged_keep: "set[str] | None" = None) -> int:
        """Delete part files not referenced by any of the newest
        `keep_generations` manifests (time-travel retention: those
        manifests stay fully readable — untouched partitions carry old
        files forward, so the live set must be the UNION over the keep
        window, not just CURRENT's paths; found in review). Returns
        files removed. Reference analog: TTL-based cloud compaction +
        VACUUM (PostgresqlStorage.java:365-436, 490-497).

        ``staged_keep``: when not None, also sweep ``_staged/`` staging
        dirs whose wave id is NOT in the set — collects absorb/wave
        staging orphaned by a process that exited with work in flight
        (every live writer's in-flight ids must be in the set; the
        default None leaves _staged/ untouched, safe under any
        concurrency)."""
        cur = self.current_manifest()
        if cur is None:
            return 0
        floor_gen = max(0, cur.generation - keep_generations + 1)
        live: set[str] = set()
        for gen in range(floor_gen, cur.generation + 1):
            mp = os.path.join(self.manifests_dir,
                              f"manifest-{gen:06d}.json")
            if not os.path.exists(mp):
                continue
            with open(mp) as f:
                m = Manifest.from_json(f.read())
            for p in m.partitions.values():
                live.add(os.path.normpath(self.abs(p["path"])))
                for d in (p.get("deltas") or []):
                    live.add(os.path.normpath(self.abs(d["path"])))
        removed = 0
        for pdir in os.listdir(self.parts_dir):
            full = os.path.join(self.parts_dir, pdir)
            for fn in os.listdir(full):
                fp = os.path.normpath(os.path.join(full, fn))
                if fp in live:
                    continue
                # generation-floor guard: a file promoted for an IN-FLIGHT
                # wave (generation CURRENT+1, not yet in any manifest)
                # must survive a concurrent vacuum or the subsequent
                # commit would reference missing files. Filename is
                # g<gen>[-<wave tag>].parquet.
                try:
                    gen_str = fn[1:].split("-", 1)[0].split(".", 1)[0]
                    gen = int(gen_str)
                except ValueError:
                    gen = -1
                if gen > cur.generation:
                    continue
                os.remove(fp)
                removed += 1
        if staged_keep is not None and os.path.isdir(self.staged_dir):
            for wid in os.listdir(self.staged_dir):
                if wid not in staged_keep:
                    self.drop_staged(wid)
                    removed += 1
        return removed

    def append_metrics(self, record: dict[str, Any]) -> None:
        with open(os.path.join(self.root, "metrics.jsonl"), "a") as f:
            f.write(json.dumps(record, sort_keys=True) + "\n")
