"""A/B: 32x500k-event steady-state waves with synchronous absorbs
(bg_absorb=False) vs BACKGROUND absorbs (bg_absorb=True — the engine
default since round 4). Interleaved best-of-2
per mode (VM noise); reports replay wall, settle tail, per-wave
merge_s, and cross-checks the consistency sum between modes.

Usage: python scripts/bg_absorb_bench.py [n_waves]
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import bench  # noqa: E402  (repo root on path)


def run(n_waves: int, bg: bool) -> dict:
    import numpy as np

    from aqueduct_core_ray.pipelines.replay import CDCEngine
    edges = np.linspace(0, bench.N_EVENTS, n_waves + 1).astype(int)
    bounds = [(int(edges[i]), int(edges[i + 1])) for i in range(n_waves)]
    shutil.rmtree(bench.LAKE_ROOT, ignore_errors=True)
    eng = CDCEngine(bench.LAKE_ROOT, num_partitions=bench.P, bg_absorb=bg)
    eng.bootstrap(bench.SEED_PATH)
    t0 = time.perf_counter()
    eng.replay(bench.LOG_DIR, bounds)
    replay_s = time.perf_counter() - t0
    t1 = time.perf_counter()
    settled = eng.drain_absorbs()    # quiesce the async tail
    settle_s = time.perf_counter() - t1
    merge_s = []
    bg_abs = bg_l = 0
    with open(os.path.join(bench.LAKE_ROOT, "metrics.jsonl")) as f:
        for line in f:
            r = json.loads(line)
            if "merge_s" in r:
                merge_s.append(r["merge_s"])
            bg_abs += r.get("bg_absorbed", 0)
            bg_l += r.get("bg_launched", 0)
    csum = eng.consistency_sum()
    shutil.rmtree(bench.LAKE_ROOT, ignore_errors=True)
    return {"mode": "bg" if bg else "sync",
            "replay_s": round(replay_s, 2),
            "events_per_s": round(bench.N_EVENTS / replay_s),
            "settle_s": round(settle_s, 2), "settled_parts": settled,
            "total_s": round(replay_s + settle_s, 2),
            "mean_merge_s": round(sum(merge_s) / max(len(merge_s), 1), 3),
            "bg_absorbed": bg_abs, "bg_launched": bg_l,
            "consistency_sum": csum}


def main() -> None:
    n_waves = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    bench._init_ray(int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    bench.ensure_input()
    best: dict[str, dict] = {}
    for trial in range(2):           # interleaved best-of-2
        for bg in (False, True):
            r = run(n_waves, bg)
            k = r["mode"]
            if k not in best or r["replay_s"] < best[k]["replay_s"]:
                best[k] = r
            print(json.dumps({"trial": trial, **r}))
    assert best["bg"]["consistency_sum"] == best["sync"]["consistency_sum"]
    speedup = best["sync"]["replay_s"] / best["bg"]["replay_s"]
    print(json.dumps({"summary": True, "n_waves": n_waves,
                      "sync": best["sync"], "bg": best["bg"],
                      "replay_speedup": round(speedup, 3)}))
    import ray
    ray.shutdown()


if __name__ == "__main__":
    main()
