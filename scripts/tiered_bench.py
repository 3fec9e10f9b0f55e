#!/usr/bin/env python
"""A/B microbench: tiered chain compaction vs absorb-on-chain-full.

The true 100-TB steady-state regime is waves that touch a small
fraction of the lake. There the sidecar chain hits ``max_deltas`` long
before pending rows reach the ``sidecar_frac`` absorb threshold, and
pre-tiering behavior forced an O(base) absorbing rewrite at that point
(~2% pending with 16-delta chains and 2%-waves; ~1.6% with 0.1%-waves)
— a ~30x write overpayment. Tiered compaction folds the chain into ONE
sidecar for O(pending) instead. This script measures both modes on the
same pre-generated input: 1M-doc lake (the bench seed), N tiny waves.

Usage: python scripts/tiered_bench.py [--waves 64] [--wave-events 20000]
Prints one JSON line per mode plus a summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LAKE = ("/dev/shm/aqr_tiered_lake" if os.path.isdir("/dev/shm")
        else "/tmp/aqr_tiered_lake")


def run_mode(chain_compact: bool, waves: int, wave_events: int,
             log_dir: str, seed_path: str, num_partitions: int) -> dict:
    from aqueduct_core_ray.pipelines.replay import CDCEngine
    shutil.rmtree(LAKE, ignore_errors=True)
    eng = CDCEngine(LAKE, num_partitions=num_partitions,
                    chain_compact=chain_compact)
    eng.bootstrap(seed_path)
    bounds = [(i * wave_events, (i + 1) * wave_events)
              for i in range(waves)]
    t0 = time.perf_counter()
    eng.replay(log_dir, bounds)
    wall = time.perf_counter() - t0
    modes = {"full": 0, "chain": 0, "delta": 0}
    with open(os.path.join(LAKE, "metrics.jsonl")) as f:
        for line in f:
            m = json.loads(line)
            if m["wave_id"] == "bootstrap":
                continue
            modes["full"] += m.get("full_parts", 0)
            modes["chain"] += m.get("chain_parts", 0)
            modes["delta"] += m.get("sidecar_parts", 0)
    csum = eng.consistency_sum()
    # write amplification: old generations are retained until vacuum, so
    # total on-disk bytes under parts/ = total bytes ever staged — the
    # quantity that scales with lake size (wall at this miniature scale
    # is dominated by fixed per-wave costs; a real partition is GBs,
    # not ~500 KB)
    written = 0
    for dirpath, _, files in os.walk(os.path.join(LAKE, "parts")):
        for fn in files:
            written += os.path.getsize(os.path.join(dirpath, fn))
    shutil.rmtree(LAKE, ignore_errors=True)
    n_events = waves * wave_events
    return {"chain_compact": chain_compact, "waves": waves,
            "wave_events": wave_events, "wall_s": round(wall, 2),
            "s_per_wave": round(wall / waves, 3),
            "events_per_s": round(n_events / wall),
            "bytes_written_mb": round(written / 1e6, 1),
            "part_modes": modes, "consistency_sum": csum}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--waves", type=int, default=64)
    ap.add_argument("--wave-events", type=int, default=20_000)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    import bench
    bench._init_ray(args.cpus)
    bench.ensure_input()          # reuses /tmp/aqr_bench log16m + seed16m

    results = {}
    # interleaved trials: a noisy-VM phase degrades both modes, not one
    for trial in range(2):
        for mode in (False, True):
            r = run_mode(mode, args.waves, args.wave_events,
                         bench.LOG_DIR, bench.SEED_PATH, bench.P)
            key = "tiered" if mode else "absorb_on_full_chain"
            if key not in results or r["wall_s"] < results[key]["wall_s"]:
                results[key] = r
            print(json.dumps({"trial": trial, "mode": key, **r}))
    a, b = results["absorb_on_full_chain"], results["tiered"]
    assert a["consistency_sum"] == b["consistency_sum"], "state diverged!"
    print(json.dumps({
        "metric": "tiered_chain_compaction_write_amp_reduction",
        "value": round(a["bytes_written_mb"] / b["bytes_written_mb"], 3),
        "unit": "ratio",
        "wall_speedup": round(a["wall_s"] / b["wall_s"], 3),
        "absorb_on_full_chain": a, "tiered": b,
    }))
    import ray
    ray.shutdown()


if __name__ == "__main__":
    main()
