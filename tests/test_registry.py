"""Node registry / hierarchy balancer (J5 upsert + O3 sort +
PipeLoadBalancer tree): deterministic balanced trees, heartbeat-based
rebalance, follow lists always terminating at the root outbox, and an
end-to-end replay through a registry-assigned parent."""

import json
import os
import time

from aqueduct_core_ray.state.registry import NodeRegistry

ROOT = "/fake/root/outbox"


def mk(tmp_path, fanout=2, dead_after_s=30.0):
    return NodeRegistry(str(tmp_path), ROOT, fanout=fanout,
                        dead_after_s=dead_after_s)


def test_balanced_tree_and_sort(tmp_path):
    reg = mk(tmp_path, fanout=2)
    for i in [3, 1, 5, 0, 6, 2, 4]:        # shuffled registration order
        reg.register(f"n{i}", f"/out/n{i}")
    # O3: sorted by (location, node_id) regardless of arrival order
    assert [r["node_id"] for r in reg.nodes()] == [
        f"n{i}" for i in range(7)]
    # balanced binary BFS fill: n0,n1 under root; n2,n3 under n0; ...
    assert reg.tree() == {"n0": None, "n1": None, "n2": "n0",
                          "n3": "n0", "n4": "n1", "n5": "n1",
                          "n6": "n2"}
    # follow list walks ancestors then the root outbox
    assert reg.follow_list("n6") == ["/out/n2", "/out/n0", ROOT]
    assert reg.follow_list("n3") == ["/out/n0", ROOT]
    assert reg.follow_list("n0") == [ROOT]
    # an unknown node follows the root directly
    assert reg.follow_list("stranger") == [ROOT]


def test_upsert_idempotent_and_location_sort(tmp_path):
    reg = mk(tmp_path)
    reg.register("a", "/out/a1", location="zz")
    reg.register("a", "/out/a2", location="zz")   # J5 re-upsert
    reg.register("b", "/out/b", location="aa")
    ns = reg.nodes()
    assert len(ns) == 2
    # locations sort before ids; the upsert kept the latest outbox
    assert [r["node_id"] for r in ns] == ["b", "a"]
    assert ns[1]["outbox"] == "/out/a2"


def test_dead_node_rebalances(tmp_path):
    reg = mk(tmp_path, fanout=1, dead_after_s=5.0)
    reg.register("a", "/out/a")
    reg.register("b", "/out/b")
    reg.register("c", "/out/c")
    # fanout 1 chain: a <- b <- c
    assert reg.follow_list("c") == ["/out/b", "/out/a", ROOT]
    # age b's heartbeat past dead_after_s: chain heals to a <- c
    p = os.path.join(reg.dir, "b.json")
    rec = json.load(open(p))
    rec["wall_ts"] = time.time() - 60
    json.dump(rec, open(p, "w"))
    assert reg.tree() == {"a": None, "c": "a"}
    assert reg.follow_list("c") == ["/out/a", ROOT]
    # the dead node itself falls back to the root
    assert reg.follow_list("b") == [ROOT]
    # deregister the last child: only the root remains for it
    reg.deregister("c")
    assert reg.follow_list("c") == [ROOT]


def test_registry_assigned_tail_end_to_end(tmp_path, ray_session):
    """Root engine publishes an outbox; a child registers, tails its
    ASSIGNED follow list, and converges to the root's state."""
    from aqueduct_core_ray.pipelines.replay import CDCEngine
    from aqueduct_core_ray.sources.changelog import (
        ChangelogSpec,
        write_changelog,
        write_seed_lake,
    )
    spec = ChangelogSpec(n_docs=300, n_events=2000, chunk_size=1000,
                         n_waves=2)
    log = write_changelog(spec, str(tmp_path / "log"))
    seed = write_seed_lake(spec, str(tmp_path / "seed/seed.parquet"))
    root = CDCEngine(str(tmp_path / "root"), num_partitions=4,
                     emit_changelog=True)
    root.bootstrap(seed)
    root.replay(log, spec.wave_bounds)

    reg = NodeRegistry(str(tmp_path / "root"), root.outbox_dir,
                       fanout=2)
    follow = reg.register("till-1", str(tmp_path / "child/outbox"))
    assert follow == [root.outbox_dir]     # first child follows root
    child = CDCEngine(str(tmp_path / "child"), num_partitions=4)
    child.tail(follow, wave_size=1000, poll_interval_s=0.01,
               max_idle_polls=2)
    assert child.consistency_sum() == root.consistency_sum()
    assert child.read_lake().count() == root.read_lake().count()


def test_registry_cli(tmp_path):
    import json as _json
    import subprocess
    import sys

    def run(*argv):
        out = subprocess.run(
            [sys.executable, "-m", "aqueduct_core_ray.cli", *argv],
            capture_output=True, text=True, cwd="/root/repo")
        assert out.returncode == 0, out.stderr
        return _json.loads(out.stdout)

    root = str(tmp_path / "root")
    r1 = run("register", "--root", root, "--node-id", "a",
             "--outbox", "/o/a", "--fanout", "1")
    assert r1["follow"] == [root + "/outbox"]
    r2 = run("register", "--root", root, "--node-id", "b",
             "--outbox", "/o/b", "--fanout", "1")
    assert r2["follow"] == ["/o/a", root + "/outbox"]
    t = run("registry-tree", "--root", root, "--fanout", "1")
    assert t["tree"] == {"a": None, "b": "a"}


def test_status_tiers_sink_impaired_nodes(tmp_path):
    """Mirror of NodeGroupSpec "Nodes are sorted based on provider
    status" (SubNodeGroup.java:118-135): statuses n1=offline,
    n2=offline, n3=following, n4=pending, n5=initialising, n6=offline
    must sort [n3, n5, n4, n1, n2, n6] — healthy toward the interior,
    offline to the leaves — and the tree/follow lists must reflect it."""
    reg = mk(tmp_path, fanout=1)
    reg.register("n1", "/out/n1", status="offline")
    reg.register("n2", "/out/n2", status="offline")
    reg.register("n3", "/out/n3", status="following")
    reg.register("n4", "/out/n4", status="pending")
    reg.register("n5", "/out/n5", status="initialising")
    reg.register("n6", "/out/n6", status="offline")
    assert [r["node_id"] for r in reg.nodes()] == [
        "n3", "n5", "n4", "n1", "n2", "n6"]
    # fanout-1 chain: healthiest at the root, offline at the leaves
    assert reg.follow_list("n3") == [ROOT]
    assert reg.follow_list("n5") == ["/out/n3", ROOT]
    assert reg.follow_list("n6") == ["/out/n2", "/out/n1", "/out/n4",
                                     "/out/n5", "/out/n3", ROOT]


def test_status_change_reorders_tree(tmp_path):
    """The reorder-on-status-change case: a node re-registering with a
    degraded status is demoted from an interior position on the next
    read; recovering restores it."""
    reg = mk(tmp_path, fanout=2)
    for i in range(5):
        reg.register(f"n{i}", f"/out/n{i}")
    assert reg.tree()["n2"] == "n0"          # n0 interior
    reg.register("n0", "/out/n0", status="offline")   # degrade n0
    order = [r["node_id"] for r in reg.nodes()]
    assert order == ["n1", "n2", "n3", "n4", "n0"]    # sank to leaf
    assert reg.tree()["n0"] == "n2"          # now a leaf (under n2)
    reg.register("n0", "/out/n0", status="ok")        # recover
    assert [r["node_id"] for r in reg.nodes()][0] == "n0"


def test_generation_tier_strategic_before_legacy(tmp_path):
    """Generation primary over status within the online tier
    (NodeGroupSpec "sorted based on generation primarily"): strategic
    nodes precede legacy at any status; offline still sinks below
    both (Generation.java:3-6)."""
    reg = mk(tmp_path, fanout=2)
    reg.register("s_off", "/out/s0", status="offline")
    reg.register("leg_f", "/out/l1", status="following",
                 generation="legacy")
    reg.register("s_pen", "/out/s2", status="pending")
    reg.register("leg_p", "/out/l3", status="pending",
                 generation="legacy")
    reg.register("s_fol", "/out/s4", status="following")
    assert [r["node_id"] for r in reg.nodes()] == [
        "s_fol", "s_pen", "leg_f", "leg_p", "s_off"]


def test_register_rejects_unknown_tiers(tmp_path):
    reg = mk(tmp_path)
    try:
        reg.register("x", "/out/x", status="weird")
        assert False
    except ValueError:
        pass
    try:
        reg.register("x", "/out/x", generation="v2")
        assert False
    except ValueError:
        pass
