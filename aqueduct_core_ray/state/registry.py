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

Tree shape: live nodes sorted by the reference's triple tier —
offline-last, then generation (strategic before legacy), then status
rank (OK < FOLLOWING < INITIALISING < PENDING < OFFLINE), then
(location, node_id) for determinism (SubNodeGroup.java:118-135's three
stable sorts with Status.java / Generation.java enum order; the
(location, node_id) tail is this registry's deterministic stand-in for
the reference's insertion-order stability) — fill a balanced
``fanout``-ary tree breadth-first under the root outbox: node i's
parent is the root for i < fanout, else node (i - fanout) // fanout.
Deterministic: same registrations => same tree on every node. A node
REPORTING a degraded status keeps its record but sinks toward leaf
positions (Node.java:119-126's isOffline leaves); a node whose
HEARTBEAT lapses drops out of the tree entirely (liveness eviction).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

_SUBDIR = "_registry"

# Status.java:3-9 enum order == sort rank (OK best, OFFLINE worst)
_STATUS_RANK = {"ok": 0, "following": 1, "initialising": 2,
                "pending": 3, "offline": 4}
# Generation.java:3-6 (STRATEGIC sorts before LEGACY)
_GEN_RANK = {"strategic": 0, "legacy": 1}


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
                 location: str = "", status: str = "ok",
                 generation: str = "strategic") -> list[str]:
        """Upsert this node's record (J5) and return its current follow
        list. Re-registering refreshes the heartbeat; callers should
        re-register on their poll cadence. ``status`` / ``generation``
        feed the tree sort tiers (see module docstring): re-registering
        with a degraded status demotes the node toward leaf positions
        on every reader's next refresh — the reference's
        reorder-on-status-change behavior (NodeGroupSpec's "sorted
        based on provider status")."""
        if "/" in node_id or node_id.startswith("."):
            raise ValueError(f"invalid node_id {node_id!r}")
        if status not in _STATUS_RANK:
            raise ValueError(f"unknown status {status!r} "
                             f"(one of {sorted(_STATUS_RANK)})")
        if generation not in _GEN_RANK:
            raise ValueError(f"unknown generation {generation!r} "
                             f"(one of {sorted(_GEN_RANK)})")
        rec = {"node_id": node_id, "outbox": outbox_path,
               "location": location, "status": status,
               "generation": generation, "wall_ts": time.time()}
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
        """All records in tree order — the O3 registry sort with the
        reference's tiers: offline last, strategic before legacy,
        healthier status first, (location, node_id) as the
        deterministic tail; ``live_only`` drops stale-heartbeat
        nodes (records missing the tier fields read as ok/strategic —
        pre-round-5 records keep their old positions)."""
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
        out.sort(key=lambda r: (
            r.get("status", "ok") == "offline",
            _GEN_RANK.get(r.get("generation", "strategic"), 0),
            _STATUS_RANK.get(r.get("status", "ok"), 0),
            r["location"], r["node_id"]))
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
