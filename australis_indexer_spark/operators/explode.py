"""Explode / normalization family (SURVEY.md §2.2 P5-P11).

Two forms:

1. **Driver-table form** (oracle-checked): explode word arrays out of
   `documents` — same operator shape (array column → one row per element,
   parent keys carried along).
2. **Fixture form** (rows-only): the real thing — normalize the nested
   `StreamerMessage` fixture into the reference's child entities: chunks,
   shards, transactions, receipts, execution outcomes, state changes
   (borealis-indexer/src/main.rs:499-569). These also power the pytest
   invariants (sum of child array sizes == exploded row counts).

u128 balance columns (tokens_burnt / amount / deposit) are emitted as their
LOSSLESS DIGIT STRINGS (SURVEY.md §1.3 fallback convention): DECIMAL(38,0)
survives Spark exactly but pandas/arrow bridges coerce it to float64 with
engine-specific last-ulp rounding, which would poison value-hash comparison;
the string form is exact everywhere and still castable by any consumer.

Scale note: `explode` is a narrow transformation — it never shuffles; output
partitioning follows the parent scan. `explode_outer` preserves parents with
empty/NULL children (the reference's `Option<chunk>` None branch,
main.rs:509,538-546).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..fixtures import FIXTURE_BLOCKS as _FIXTURE_BLOCKS, blocks_df
from . import fixture_oracles as FO
from ..registry import op
from ..sources.batch import load_table as lt


@op(
    "explode_tokens",
    tags=("parity", "explode"),
    oracle="""
SELECT doc_id, unnest(string_split(text, ' ')) AS token
FROM documents
""",
)
def explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5-P10 operator shape on driver data: array → rows, parent key kept."""
    return lt(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    )


# ---------------------------------------------------------------------------
# fixture-backed normalization of the real nested schema (rows-only checks;
# exercised precisely in tests/test_explode.py)

def _fixture(spark: SparkSession) -> DataFrame:
    return blocks_df(spark, _FIXTURE_BLOCKS)


@op("explode_chunks", tags=("parity", "explode", "fixture"), oracle=FO.chunks_oracle)
def explode_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5: one row per chunk header (main.rs:499-505), keyed by height.
    u128 balances as lossless strings; the validator_proposals array rides
    as its JSON encoding (same cross-engine-exact trick)."""
    df = _fixture(spark)
    flat = df.select(
        F.col("block.header.height").alias("block_height"),
        F.explode("block.chunks").alias("chunk"),
    ).select("block_height", "chunk.*")
    return flat.select(
        "block_height", "chunk_hash", "prev_block_hash", "height_created",
        "height_included", "shard_id", "gas_used", "gas_limit",
        F.col("validator_reward").cast("string").alias("validator_reward"),
        F.col("balance_burnt").cast("string").alias("balance_burnt"),
        "outgoing_receipts_root", "tx_root",
        F.to_json("validator_proposals").alias("validator_proposals"),
        "signature",
    )


@op("explode_shards", tags=("parity", "explode", "fixture"), oracle=FO.shards_oracle)
def explode_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 + P11: one row per shard, chunk may be NULL (Option<chunk>)."""
    df = _fixture(spark)
    return df.select(
        F.col("block.header.height").alias("block_height"),
        F.explode("shards").alias("shard"),
    ).select(
        "block_height",
        "shard.shard_id",
        F.col("shard.chunk").isNotNull().alias("has_chunk"),
        F.size(F.coalesce(F.col("shard.chunk.transactions"), F.array())).alias("n_transactions"),
        F.size("shard.receipt_execution_outcomes").alias("n_outcomes"),
        F.size("shard.state_changes").alias("n_state_changes"),
    )


@op("explode_transactions", tags=("parity", "explode", "fixture"), oracle=FO.transactions_oracle)
def explode_transactions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7: normalized transactions table (main.rs:519-527): block_height,
    shard_id, tx hash/signer/receiver/nonce + action count."""
    df = _fixture(spark)
    shards = df.select(
        F.col("block.header.height").alias("block_height"),
        F.explode("shards").alias("shard"),
    )
    return shards.select(
        "block_height",
        "shard.shard_id",
        F.explode("shard.chunk.transactions").alias("t"),
    ).select(
        "block_height",
        "shard_id",
        F.col("t.transaction.hash").alias("tx_hash"),
        F.col("t.transaction.signer_id").alias("signer_id"),
        F.col("t.transaction.receiver_id").alias("receiver_id"),
        F.col("t.transaction.nonce").alias("nonce"),
        F.size("t.transaction.actions").alias("n_actions"),
        F.col("t.outcome.execution_outcome.outcome.gas_burnt").alias("gas_burnt"),
        F.col("t.outcome.execution_outcome.outcome.tokens_burnt").cast("string").alias("tokens_burnt"),
    )


@op("explode_receipts", tags=("parity", "explode", "fixture"), oracle=FO.receipts_oracle)
def explode_receipts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8: normalized receipts (main.rs:529-537)."""
    df = _fixture(spark)
    return (
        df.select(
            F.col("block.header.height").alias("block_height"),
            F.explode("shards").alias("shard"),
        )
        .select("block_height", "shard.shard_id", F.explode("shard.chunk.receipts").alias("r"))
        .select(
            "block_height",
            "shard_id",
            F.col("r.receipt_id").alias("receipt_id"),
            F.col("r.predecessor_id").alias("predecessor_id"),
            F.col("r.receiver_id").alias("receiver_id"),
            F.col("r.receipt_kind").alias("receipt_kind"),
            F.size("r.actions").alias("n_actions"),
        )
    )


@op("explode_outcomes", tags=("parity", "explode", "fixture"), oracle=FO.outcomes_oracle)
def explode_outcomes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9: normalized execution outcomes (main.rs:548-559) — note these are
    keyed by the *receipt* id and land one block after their transaction
    (main.rs:121-125), which tests/test_asof.py verifies end-to-end."""
    df = _fixture(spark)
    return (
        df.select(
            F.col("block.header.height").alias("block_height"),
            F.explode("shards").alias("shard"),
        )
        .select(
            "block_height",
            "shard.shard_id",
            F.explode("shard.receipt_execution_outcomes").alias("o"),
        )
        .select(
            "block_height",
            "shard_id",
            F.col("o.execution_outcome.id").alias("receipt_id"),
            F.col("o.execution_outcome.outcome.executor_id").alias("executor_id"),
            F.col("o.execution_outcome.outcome.gas_burnt").alias("gas_burnt"),
            F.col("o.execution_outcome.outcome.tokens_burnt").cast("string").alias("tokens_burnt"),
            F.col("o.execution_outcome.outcome.status.variant").alias("status_variant"),
        )
    )


@op("explode_state_changes", tags=("parity", "explode", "fixture"), oracle=FO.state_changes_oracle)
def explode_state_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10: normalized state changes (main.rs:561-568) with the two nested
    sum types flattened to discriminator columns."""
    df = _fixture(spark)
    return (
        df.select(
            F.col("block.header.height").alias("block_height"),
            F.explode("shards").alias("shard"),
        )
        .select("block_height", "shard.shard_id", F.explode("shard.state_changes").alias("sc"))
        .select(
            "block_height",
            "shard_id",
            F.col("sc.type").alias("change_type"),
            F.col("sc.cause.variant").alias("cause_variant"),
            F.col("sc.change.account_id").alias("account_id"),
            F.col("sc.change.amount").cast("string").alias("amount"),
            F.col("sc.change.storage_usage").alias("storage_usage"),
        )
    )


@op("explode_actions", tags=("parity", "explode", "fixture"), oracle=FO.actions_oracle)
def explode_actions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-level explode: transactions[] → actions[] (tagged-union
    variants flattened; main.rs:222-234)."""
    df = _fixture(spark)
    return (
        df.select(
            F.col("block.header.height").alias("block_height"),
            F.explode("shards").alias("shard"),
        )
        .select("block_height", F.explode("shard.chunk.transactions").alias("t"))
        .select(
            "block_height",
            F.col("t.transaction.hash").alias("tx_hash"),
            F.explode("t.transaction.actions").alias("a"),
        )
        .select(
            "block_height",
            "tx_hash",
            F.col("a.variant").alias("action_variant"),
            F.col("a.deposit").cast("string").alias("deposit"),
            F.col("a.method_name").alias("method_name"),
            F.col("a.gas").alias("gas"),
        )
    )
