#!/usr/bin/env python
"""Headline benchmarks for the Ray-Data CDC engine.

Default mode (driver contract): ``ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS or 32)``, run the headline synthetic CDC replay
plus a set of operator pipelines over ``$GRAFT_SF_DIR`` (default
/root/testdata/sf0.1), print ONE JSON line::

  {"metric": "...", "value": N, "unit": "sec", "queries": {...},
   "sf": ..., "num_cpus": N, "events_per_s": ...}

``--scaling``: run the headline replay at num_cpus=8 and 32 in FRESH
subprocesses over the identical pre-generated input and report
throughput at both plus scaling efficiency ((T32/T8)/4) — the sandbox
proxy for the north rule's N vs 4N cluster-size criterion.

Headline workload: 16M-event changelog over 1M docs (~76-token rows),
single replay-to-convergence wave, 128 hash partitions. The log is
PRE-generated (steady-state measurement excludes generation,
SURVEY.md §7.5) and page-cache warmed; the lake + exchange staging live
on /dev/shm — the single-box proxy for a real deployment's parallel
object store (a lone virtio disk serializes 32 writers; a cluster's
store does not).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

N_DOCS, N_EVENTS, CHUNK, MEAN_TOK, P = 1_000_000, 16_000_000, 125_000, 64, 128
LOG_DIR = "/tmp/aqr_bench/log16m"
SEED_PATH = "/tmp/aqr_bench/seed16m/seed.parquet"
LAKE_ROOT = ("/dev/shm/aqr_bench_lake" if os.path.isdir("/dev/shm")
             else "/tmp/aqr_bench/lake")

BENCH_QUERIES = [
    "cdc_replay_events", "lww_compaction", "byte_cap_prefix",
    "token_count", "dedup_exact", "minhash_lsh_dedup",
    "knn_bruteforce", "media_features", "sessionize",
    "chunk_dedup", "pack_sequences", "redact_pii", "decontaminate",
    "pricing_summary", "revenue_by_nation", "running_total",
    "remove_boilerplate_lines", "ngram_jaccard_dedup",
    "top_customers_by_return_revenue", "customers_without_orders",
    "inter_event_gaps", "small_quantity_revenue", "exact_quantiles",
    "user_type_sets", "pricing_rollup", "generation_diff_events",
    "bpe_token_count", "weighted_sample", "resize_media", "bpe_vocab",
    "volume_shipping", "large_orders", "doc_frequency", "tfidf_top_terms",
    "dominant_supplier_parts", "parts_bought_together",
    "quantile_band_docs", "kmeans_embeddings",
    "min_cost_supplier", "dup_gram_coverage", "semdedup",
    "remove_dup_spans", "value_stats_by_type", "rolling_window_sum",
    "incremental_dedup", "online_dedup_feed", "dsir_weights", "lead_lag_values",
    "mode_value_by_type", "props_key_stats", "interval_join_pairs",
    "mad_by_type",
    "event_type_pivot", "orders_weekly_gapfill",
    "train_val_split", "token_budget_sample", "bm25_topk",
    "quality_classifier", "winnow_dedup", "pack_documents", "rank_auc",
    "spearman_chars_tokens", "stratified_topk_sample",
    "pmi_bigrams", "substring_search", "embedding_covariance",
    "pca_project", "late_events", "fuzzy_match_pairs",
    "source_divergence", "skyline_docs", "session_paths",
    "lake_checksum", "restore_lake", "value_outliers",
    "profile_documents", "bigram_logprob_score", "zipf_fit",
    "order_lines_join", "train_pipeline", "parts_unsold_in_window", "active_customers_in_window",
    "orders_region0_left", "split_leakage",
]


def _init_ray(num_cpus: int):
    import ray
    # worker-side ray.data log config (driver setLevel can't reach
    # workers): console at ERROR, full detail still in ray-data.log
    os.environ.setdefault(
        "RAY_DATA_LOGGING_CONFIG",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "scripts", "ray_data_logging.yaml"))
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    import logging

    from ray.data.context import DataContext
    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)


def _spec():
    from aqueduct_core_ray.sources.changelog import ChangelogSpec
    return ChangelogSpec(n_docs=N_DOCS, n_events=N_EVENTS, chunk_size=CHUNK,
                         n_waves=1, mean_tok=MEAN_TOK)


def ensure_input() -> None:
    """Parallel, idempotent pre-generation of log + seed (not timed)."""
    import pyarrow.parquet as pq

    import ray
    spec = _spec()
    os.makedirs(LOG_DIR, exist_ok=True)
    marker = os.path.join(LOG_DIR, "_SPEC")
    ident = repr(spec)
    if not (os.path.exists(marker) and open(marker).read() == ident):
        @ray.remote
        def gen(i):
            from aqueduct_core_ray.sources.changelog import changelog_chunk
            p = os.path.join(LOG_DIR, f"chunk-{i:05d}.parquet")
            pq.write_table(changelog_chunk(spec, i), p + ".tmp",
                           compression="snappy", row_group_size=31250)
            os.replace(p + ".tmp", p)
        n = -(-spec.n_events // spec.chunk_size)
        ray.get([gen.remote(i) for i in range(n)])
        with open(marker + ".tmp", "w") as f:
            f.write(ident)
        os.replace(marker + ".tmp", marker)
    if not os.path.exists(SEED_PATH):
        os.makedirs(os.path.dirname(SEED_PATH), exist_ok=True)

        @ray.remote
        def genseed():
            from aqueduct_core_ray.sources.changelog import seed_lake
            pq.write_table(
                seed_lake(spec.n_docs, spec.seed, spec.mean_tok,
                          spec.max_tok),
                SEED_PATH + ".tmp", compression="snappy")
            os.replace(SEED_PATH + ".tmp", SEED_PATH)
        ray.get(genseed.remote())
    # warm the page cache so trial 1 != a 9 GB disk read
    for fn in os.listdir(LOG_DIR):
        with open(os.path.join(LOG_DIR, fn), "rb") as f:
            while f.read(1 << 24):
                pass


def run_replay(trials: int = 2, n_waves: int = 1,
               bg_absorb: "bool | None" = None) -> dict:
    """Headline: replay-to-convergence of the 16M-event log.

    n_waves=1 = max-throughput convergence; n_waves>1 = incremental-
    ingest steady state (each wave pays the watermark/commit round).
    bg_absorb=None is the ENGINE DEFAULT (background absorbs ON since
    round 4 — O(base) absorbing rewrites run off the wave critical
    path, LSM background compaction); the wall always INCLUDES a final
    settle drain, so the rate is conservative. bg_absorb=False is the
    strictly-synchronous A/B."""
    from aqueduct_core_ray.pipelines.replay import CDCEngine
    import numpy as np
    edges = np.linspace(0, N_EVENTS, n_waves + 1).astype(int)
    bounds = [(int(edges[i]), int(edges[i + 1])) for i in range(n_waves)]
    best = None
    for _ in range(trials):
        shutil.rmtree(LAKE_ROOT, ignore_errors=True)
        eng = CDCEngine(LAKE_ROOT, num_partitions=P, bg_absorb=bg_absorb)
        eng.bootstrap(SEED_PATH)
        t0 = time.perf_counter()
        eng.replay(LOG_DIR, bounds)
        if eng.bg_absorb:
            eng.drain_absorbs()             # quiesce the async tail
        dt = time.perf_counter() - t0
        rows = (eng.logical_rows() if eng.bg_absorb else
                sum(int(v["rows"]) for v in eng.manifest.partitions.values()))
        if best is None or dt < best["replay_wall_s"]:
            best = {"replay_wall_s": round(dt, 2),
                    "events_per_s": round(N_EVENTS / dt),
                    "lake_rows": rows}
    shutil.rmtree(LAKE_ROOT, ignore_errors=True)
    return best


def run_queries() -> dict[str, float]:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __ray_entry__ as entry
    qs = entry.queries()
    out = {}
    for name in BENCH_QUERIES:
        t0 = time.perf_counter()
        res = qs[name](SF_DIR)
        # consume lazily-built Datasets so we time execution, not planning
        import ray.data
        if isinstance(res, ray.data.Dataset):
            res.count()
        out[name] = round(time.perf_counter() - t0, 2)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--pair", type=int, nargs=2, default=(8, 32),
                    metavar=("N", "4N"),
                    help="CPU counts for --scaling (default 8 32)")
    ap.add_argument("--replay-only", action="store_true")
    ap.add_argument("--rounds", type=int, default=2,
                    help="interleaved measurement rounds per level "
                         "(--scaling)")
    ap.add_argument("--cpus", type=int, default=CPUS)
    ap.add_argument("--skip-gen", action="store_true")
    args = ap.parse_args()

    if args.scaling:
        # parent generates once (32 CPUs), children only replay.
        # Levels run INTERLEAVED (lo, hi, lo, hi): a slow system phase
        # (noisy-neighbor burst, kernel reclaim) then degrades both
        # levels instead of silently biasing one side of the ratio;
        # best-of per level across rounds.
        _init_ray(CPUS)
        ensure_input()
        import ray
        ray.shutdown()
        lo, hi = args.pair
        res: dict[int, dict] = {}
        history: dict[int, list[int]] = {lo: [], hi: []}
        for _ in range(args.rounds):
            for n in (lo, hi):
                env = dict(os.environ)
                env.pop("RAY_ADDRESS", None)
                out = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     "--replay-only", "--skip-gen", "--cpus", str(n)],
                    capture_output=True, text=True, env=env, check=True)
                r = json.loads(out.stdout.strip().splitlines()[-1])
                history[n].append(r["events_per_s"])
                if n not in res or r["events_per_s"] > res[n]["events_per_s"]:
                    res[n] = r
        for n in (lo, hi):
            res[n]["all_events_per_s"] = history[n]
        tlo, thi = res[lo]["events_per_s"], res[hi]["events_per_s"]
        eff = (thi / tlo) / (hi / lo)
        print(json.dumps({
            "metric": f"scaling_efficiency_{lo}_to_{hi}_cpus",
            "value": round(eff, 3), "unit": "ratio",
            f"events_per_s_{lo}cpu": tlo, f"events_per_s_{hi}cpu": thi,
            "speedup": round(thi / tlo, 2),
            "n_events": N_EVENTS, "detail": res,
        }))
        return

    _init_ray(args.cpus)
    if not args.skip_gen:
        ensure_input()
    rep = run_replay(trials=3 if args.replay_only else 2)
    if args.replay_only:
        print(json.dumps({"num_cpus": args.cpus, **rep}))
        import ray
        ray.shutdown()
        return
    # best-of-2 for the wave modes too: whole-box throughput swings ~2x
    # between noisy-neighbor periods (BASELINE.md), and a single trial
    # regularly lands in one
    rep8 = run_replay(trials=2, n_waves=8)     # incremental-ingest mode
    # steady-state CDC: 32 small waves over a converged-size lake —
    # the regime where delta sidecars replace O(partition) rewrites.
    # DEFAULT engine mode (background absorbs ON since round 4 —
    # BENCH-HISTORY DISCONTINUITY: this key measured the synchronous
    # engine through round 3; the sync A/B is the _sync key below)
    rep32 = run_replay(trials=2, n_waves=32)
    rep32sync = run_replay(trials=2, n_waves=32, bg_absorb=False)
    queries = run_queries()
    print(json.dumps({
        "metric": "cdc_replay_16M_events_wall",
        "value": rep["replay_wall_s"], "unit": "sec",
        "queries": queries,
        "sf": SF_DIR, "num_cpus": args.cpus,
        "events_per_s": rep["events_per_s"],
        "events_per_s_8waves": rep8["events_per_s"],
        "events_per_s_32waves": rep32["events_per_s"],
        "events_per_s_32waves_sync": rep32sync["events_per_s"],
        "lake_rows": rep["lake_rows"],
        "n_events": N_EVENTS,
    }))
    # FINAL line: short headline-only summary. The full line above
    # carries 70+ per-query timings and can exceed a log tail window
    # mid-line (round 4's record had parsed=null for exactly that
    # reason); harvesters that take the last stdout line get a
    # complete, parseable record either way.
    print(json.dumps({
        "metric": "cdc_replay_16M_events_wall",
        "value": rep["replay_wall_s"], "unit": "sec",
        "sf": SF_DIR, "num_cpus": args.cpus,
        "events_per_s": rep["events_per_s"],
        "events_per_s_8waves": rep8["events_per_s"],
        "events_per_s_32waves": rep32["events_per_s"],
        "events_per_s_32waves_sync": rep32sync["events_per_s"],
        "lake_rows": rep["lake_rows"],
        "queries_total_s": round(sum(queries.values()), 2),
        "n_queries": len(queries),
    }))
    import ray
    ray.shutdown()


if __name__ == "__main__":
    main()
