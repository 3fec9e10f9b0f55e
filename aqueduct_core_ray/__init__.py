"""aqueduct_core_ray — a Ray-Data-native CDC / incremental-ingest engine.

A from-scratch reimagining of the capabilities of agustin-mrtz/aqueduct-core
(a hierarchical one-way data-sync system: append-only offset-ordered change
log -> per-node materialized replicas, last-writer-wins compaction,
tombstone deletes, named-offset checkpoints) as an idiomatic Ray Data
engine:

    change-log tail (lsn-watermarked waves)
      -> hash-partitioned LWW merge-apply (vectorized Arrow compaction)
      -> exactly-once idempotent commit into a partitioned Parquet lake
      -> topologically-ordered DAG of derived tables (groupby-aggregate)

plus the large-scale training-data operators a 100 TB pipeline needs
(dedup family, similarity search, text analysis, multimodal plumbing).

Nothing here calls ray.init()/ray.shutdown(); sessions are owned by the
caller (tests' conftest fixture, bench.py, or the driver).
"""

__version__ = "0.1.0"
