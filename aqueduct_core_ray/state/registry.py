"""Dynamic node registry + hierarchy balancer — the reference's
NodeRegistry / PipeLoadBalancer surface (registry/src/.../NodeRegistry,
PipeLoadBalancer.java:28-40): tills register themselves (J5 upsert),
the registry sorts them deterministically (O3) and hands each node the
ordered ``requestedToFollow`` list it should tail, ending at the root
(cloud) outbox (ServiceList.java:151-153's cloud default).

File-backed and lock-free: each node upserts ONE private record file
(``_registry/<node_id>.json``, atomic tmp+rename), so concurrent
registrations never race a shared file; the tree is derived on read
from the live records. Liveness is the same wall-clock heartbeat
contract as the outbox ``_STATE`` (replay.py `_parent_alive`): a record
older than ``dead_after_s`` drops out of the tree and its children are
re-pointed on their next ``follow_list`` refresh — composing with
``tail()``'s follow-list failover (ST5), which handles the window
between a parent dying and the registry noticing.

Tree shape: live nodes sorted by (location, node_id) fill a balanced
``fanout``-ary tree breadth-first under the root outbox — node i's
parent is the root for i < fanout, else node (i - fanout) // fanout.
Deterministic: same registrations => same tree on every node.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

_SUBDIR = "_registry"


class NodeRegistry:
    """Registry rooted at the top-level (cloud) engine's directory.

    ``root_outbox`` is the follow-list terminator every node can fall
    back to (the reference's cloud default)."""

    def __init__(self, root_dir: str, root_outbox: str,
                 fanout: int = 2, dead_after_s: float = 30.0):
        if fanout < 1:
            raise ValueError("fanout must be >= 1")
        self.dir = os.path.join(root_dir, _SUBDIR)
        self.root_outbox = root_outbox
        self.fanout = fanout
        self.dead_after_s = dead_after_s
        os.makedirs(self.dir, exist_ok=True)

    # -------------------------------------------------------------- #
    def register(self, node_id: str, outbox_path: str,
                 location: str = "") -> list[str]:
        """Upsert this node's record (J5) and return its current follow
        list. Re-registering refreshes the heartbeat; callers should
        re-register on their poll cadence."""
        if "/" in node_id or node_id.startswith("."):
            raise ValueError(f"invalid node_id {node_id!r}")
        rec = {"node_id": node_id, "outbox": outbox_path,
               "location": location, "wall_ts": time.time()}
        p = os.path.join(self.dir, f"{node_id}.json")
        tmp = p + ".tmp"
        with open(tmp, "w") as f:
            json.dump(rec, f)
        os.replace(tmp, p)
        return self.follow_list(node_id)

    def deregister(self, node_id: str) -> None:
        try:
            os.remove(os.path.join(self.dir, f"{node_id}.json"))
        except FileNotFoundError:
            pass

    # -------------------------------------------------------------- #
    def nodes(self, live_only: bool = True) -> list[dict[str, Any]]:
        """All records, sorted by (location, node_id) — the O3 registry
        sort; ``live_only`` drops stale-heartbeat nodes."""
        out = []
        now = time.time()
        for fn in os.listdir(self.dir):
            if not fn.endswith(".json"):
                continue
            try:
                with open(os.path.join(self.dir, fn)) as f:
                    rec = json.load(f)
            except (OSError, ValueError):
                continue                   # racing writer: skip this scan
            if live_only and (now - float(rec.get("wall_ts", 0))
                              >= self.dead_after_s):
                continue
            out.append(rec)
        out.sort(key=lambda r: (r["location"], r["node_id"]))
        return out

    def tree(self) -> dict[str, "str | None"]:
        """node_id -> parent node_id (None = follows the root outbox)
        over the LIVE nodes: balanced fanout-ary BFS fill in sorted
        order."""
        live = self.nodes()
        f = self.fanout
        out: dict[str, str | None] = {}
        for i, rec in enumerate(live):
            out[rec["node_id"]] = (None if i < f
                                   else live[(i - f) // f]["node_id"])
        return out

    def follow_list(self, node_id: str) -> list[str]:
        """The ordered outbox paths this node should ``tail()`` —
        parent first, ancestors after, the root outbox always last. A
        node the registry does not know (or a dead one) follows the
        root directly."""
        live = self.nodes()
        by_id = {r["node_id"]: r for r in live}
        idx = {r["node_id"]: i for i, r in enumerate(live)}
        chain: list[str] = []
        f = self.fanout
        i = idx.get(node_id)
        seen = {node_id}
        while i is not None and i >= f:
            parent = live[(i - f) // f]
            if parent["node_id"] in seen:      # corrupt/cyclic: stop
                break
            seen.add(parent["node_id"])
            chain.append(by_id[parent["node_id"]]["outbox"])
            i = idx[parent["node_id"]]
        chain.append(self.root_outbox)
        return chain
