"""Physical layout plan for the 100 TB deployment — executable, not prose.

The reference's only layout decisions are "one NATS subject per format" and
"track shard 0" (make.sh:64, .borealis-indexer/mainnet/config.json). At
100 TB the layout IS the query plan: partition keys decide which scans prune,
bucket keys decide which joins skip their shuffle. This module encodes those
decisions as data + writer helpers, and tests assert every normalized table
has one.

Key choices (and why):
- **Partition by height_bucket (100k blocks ≈ 1 day)** everywhere: every
  replay/backfill/incremental query is height-ranged (sync modes S2/T4), so
  pruning on the sequence dimension is the dominant win.
- **Sub-partition facts by shard_id**: the reference's tracked-shards
  filter (T11) becomes directory pruning instead of row filtering.
- **Bucket the correlation keys** (receipt_id for outcomes/receipts,
  account-ish keys for state changes) so the as-of tx→outcome join and
  per-account rollups co-locate without a shuffle (bucketed sort-merge).
- **zstd parquet** at rest (the reference compresses its wire payloads with
  zstd; at rest the columnar codec subsumes it).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame

HEIGHT_BUCKET_BLOCKS = 100_000
DEFAULT_N_BUCKETS = 512  # ~100 TB / 512 buckets ≈ 200 GB per bucket-family


@dataclass(frozen=True)
class TableLayout:
    name: str
    partition_by: tuple[str, ...]
    bucket_by: tuple[str, ...] = ()
    sort_by: tuple[str, ...] = ()
    n_buckets: int = DEFAULT_N_BUCKETS
    why: str = ""


LAYOUTS: dict[str, TableLayout] = {
    t.name: t
    for t in (
        TableLayout(
            "blocks",
            ("height_bucket",),
            sort_by=("height",),
            why="pure sequence scans; range replay prunes to day directories",
        ),
        TableLayout(
            "chunks",
            ("height_bucket", "shard_id"),
            sort_by=("height",),
            why="shard filter (T11) becomes directory pruning",
        ),
        TableLayout(
            "transactions",
            ("height_bucket", "shard_id"),
            bucket_by=("tx_hash",),
            sort_by=("tx_hash",),
            why="tx lookups and tx→outcome correlation co-locate on hash",
        ),
        TableLayout(
            "receipts",
            ("height_bucket", "shard_id"),
            bucket_by=("receipt_id",),
            sort_by=("receipt_id",),
            why="as-of join side A: bucketed on the join key",
        ),
        TableLayout(
            "execution_outcomes",
            ("height_bucket", "shard_id"),
            bucket_by=("receipt_id",),
            sort_by=("receipt_id",),
            why="as-of join side B: same bucketing as receipts → shuffle-free "
            "sort-merge join (the main.rs:121-125 correlation)",
        ),
        TableLayout(
            "actions",
            ("height_bucket", "shard_id"),
            bucket_by=("tx_hash",),
            sort_by=("tx_hash",),
            why="actions join back to their transaction on tx_hash",
        ),
        TableLayout(
            "state_changes",
            ("height_bucket", "shard_id"),
            bucket_by=("account_id",),
            sort_by=("account_id",),
            why="per-account balance rollups aggregate within buckets",
        ),
        TableLayout(
            "envelope_log",
            ("height_bucket",),
            sort_by=("sequence_id",),
            why="the durable JetStream analog (K2): ranged replay is "
            "metadata-only; per-file sort keeps height order on read",
        ),
        TableLayout(
            "documents",
            ("lang",),
            bucket_by=("doc_id",),
            sort_by=("doc_id",),
            why="dedup/text ops group by doc; language is the natural "
            "corpus partition",
        ),
        TableLayout(
            "embeddings",
            ("cluster_id",),
            bucket_by=("vec_id",),
            why="IVF cells as partitions: ANN probes read NPROBE/K of data",
        ),
    )
}


def apply_layout(df: DataFrame, layout: TableLayout, path_or_table: str, *, as_table: bool = False):
    """Writer configured per the layout. Bucketing requires saveAsTable
    (Spark bucket metadata lives in the catalog); plain partitioned parquet
    otherwise. In the plain path a ``sort_by`` still applies WITHIN each
    task's output file via sortWithinPartitions — e.g. envelope_log's
    per-file height order (its layout's documented read contract; before
    round 7 the plain path silently dropped sort_by, so the written files
    carried arrival order while the layout claimed sorted)."""
    if layout.sort_by and not (layout.bucket_by and as_table):
        # partition columns FIRST: FileFormatWriter requires each task's
        # rows sorted by the partition columns and inserts its own
        # (non-stable) sort on just those columns when they are not —
        # which would scramble the sort_by order within each file
        df = df.sortWithinPartitions(*layout.partition_by, *layout.sort_by)
    w = df.write.mode("overwrite").format("parquet")
    if layout.partition_by:
        w = w.partitionBy(*layout.partition_by)
    if layout.bucket_by and as_table:
        w = w.bucketBy(layout.n_buckets, *layout.bucket_by)
        if layout.sort_by:
            w = w.sortBy(*layout.sort_by)
        return w.saveAsTable(path_or_table)
    return w.save(path_or_table)
