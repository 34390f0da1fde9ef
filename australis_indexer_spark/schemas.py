"""Explicit schema contracts (SURVEY.md §1, Phase 0).

The reference's schema is fixed at compile time by ``near-primitives`` Rust
types; the single best schema document is the 230-line worked example at
``/root/reference/borealis-indexer/src/main.rs:118-349``. We mirror it as
explicit ``StructType`` constants — never ``inferSchema`` — so Catalyst can
prune nested fields and the streaming reader needs no sampling pass.

Type-mapping decisions (SURVEY.md §1.3):
- u64 heights/nonces/gas  -> LongType (guarded: observed values < 2^63)
- u128 yoctoNEAR balances -> DecimalType(38, 0) (observed max 34 digits,
  main.rs:152) with the raw decimal string kept where losslessness matters
- nanosecond timestamps   -> LongType ``*_ns`` + derived TimestampType
- base58 hashes / account ids / keys / signatures -> StringType
- Rust sum types (Action, ExecutionStatus, StateChange*) -> a discriminator
  ``variant`` StringType + nullable per-variant fields + lossless ``raw_json``
  (Spark has no native union type)
"""

from __future__ import annotations

from pyspark.sql import types as T

# --------------------------------------------------------------------------
# yoctoNEAR u128 -> Decimal(38,0)
BALANCE = T.DecimalType(38, 0)


def _f(name: str, dtype: T.DataType, nullable: bool = True) -> T.StructField:
    return T.StructField(name, dtype, nullable)


# --------------------------------------------------------------------------
# Action sum type (main.rs:222-234): CreateAccount | Transfer{deposit} |
# AddKey{public_key, access_key} | ... — discriminator + variant fields + raw.
ACCESS_KEY_SCHEMA = T.StructType(
    [
        _f("nonce", T.LongType()),
        _f("permission", T.StringType()),  # "FullAccess" | raw JSON of FunctionCall perm
    ]
)

ACTION_SCHEMA = T.StructType(
    [
        _f("variant", T.StringType(), False),  # CreateAccount|Transfer|AddKey|FunctionCall|...
        _f("deposit", BALANCE),                # Transfer / FunctionCall
        _f("public_key", T.StringType()),      # AddKey/DeleteKey
        _f("access_key", ACCESS_KEY_SCHEMA),   # AddKey
        _f("method_name", T.StringType()),     # FunctionCall
        _f("args_base64", T.StringType()),     # FunctionCall
        _f("gas", T.LongType()),               # FunctionCall
        _f("beneficiary_id", T.StringType()),  # DeleteAccount
        _f("raw_json", T.StringType()),        # lossless round-trip of the variant
    ]
)

# ExecutionStatus sum type (main.rs:251,301): SuccessReceiptId(hash) |
# SuccessValue(bytes) | Failure | Unknown.
EXECUTION_STATUS_SCHEMA = T.StructType(
    [
        _f("variant", T.StringType(), False),
        _f("success_receipt_id", T.StringType()),
        _f("success_value", T.StringType()),
        _f("raw_json", T.StringType()),
    ]
)

# --------------------------------------------------------------------------
# BlockHeaderView (main.rs:129-165) — analytics-relevant subset, faithful types
BLOCK_HEADER_SCHEMA = T.StructType(
    [
        _f("height", T.LongType(), False),
        _f("prev_height", T.LongType()),
        _f("hash", T.StringType(), False),
        _f("prev_hash", T.StringType()),
        _f("epoch_id", T.StringType()),
        _f("next_epoch_id", T.StringType()),
        _f("chunks_included", T.LongType()),
        _f("timestamp", T.LongType()),           # ns (main.rs:142)
        _f("timestamp_nanosec", T.StringType()),  # string twin (main.rs:143)
        _f("total_supply", BALANCE),
        _f("gas_price", BALANCE),
        _f("validator_reward", BALANCE),
        _f("chunk_mask", T.ArrayType(T.BooleanType())),
        _f("approvals", T.ArrayType(T.StringType(), containsNull=True)),
        _f("signature", T.StringType()),
        _f("latest_protocol_version", T.IntegerType()),
    ]
)

# ChunkHeaderView (main.rs:166-187 / 195-214)
CHUNK_HEADER_SCHEMA = T.StructType(
    [
        _f("chunk_hash", T.StringType(), False),
        _f("prev_block_hash", T.StringType()),
        _f("height_created", T.LongType()),
        _f("height_included", T.LongType()),
        _f("shard_id", T.LongType()),
        _f("gas_used", T.LongType()),
        _f("gas_limit", T.LongType()),
        _f("validator_reward", BALANCE),
        _f("balance_burnt", BALANCE),
        _f("outgoing_receipts_root", T.StringType()),
        _f("tx_root", T.StringType()),
        _f("validator_proposals", T.ArrayType(T.StringType())),
        _f("signature", T.StringType()),
    ]
)

# SignedTransactionView (main.rs:217-237)
TRANSACTION_SCHEMA = T.StructType(
    [
        _f("hash", T.StringType(), False),
        _f("signer_id", T.StringType()),
        _f("public_key", T.StringType()),
        _f("nonce", T.LongType()),
        _f("receiver_id", T.StringType()),
        _f("actions", T.ArrayType(ACTION_SCHEMA)),
        _f("signature", T.StringType()),
        _f("priority_fee", T.LongType()),
    ]
)

# ExecutionOutcomeView (main.rs:240-255, 290-310)
EXECUTION_OUTCOME_SCHEMA = T.StructType(
    [
        _f("id", T.StringType(), False),        # tx or receipt hash the outcome is for
        _f("block_hash", T.StringType()),
        _f("executor_id", T.StringType()),
        _f("gas_burnt", T.LongType()),
        _f("tokens_burnt", BALANCE),
        _f("logs", T.ArrayType(T.StringType())),
        _f("receipt_ids", T.ArrayType(T.StringType())),
        _f("status", EXECUTION_STATUS_SCHEMA),
    ]
)

# ReceiptView (main.rs:258-284) — receipt.Action{...} variant flattened
RECEIPT_SCHEMA = T.StructType(
    [
        _f("receipt_id", T.StringType(), False),
        _f("predecessor_id", T.StringType()),
        _f("receiver_id", T.StringType()),
        _f("receipt_kind", T.StringType()),      # "Action" | "Data"
        _f("signer_id", T.StringType()),
        _f("signer_public_key", T.StringType()),
        _f("gas_price", BALANCE),
        _f("actions", T.ArrayType(ACTION_SCHEMA)),
        _f("input_data_ids", T.ArrayType(T.StringType())),
        _f("output_data_receivers", T.ArrayType(T.StringType())),
    ]
)

# IndexerExecutionOutcomeWithReceipt (main.rs:238-255, 287-330)
OUTCOME_WITH_RECEIPT_SCHEMA = T.StructType(
    [
        _f("execution_outcome", T.StructType(
            [
                _f("block_hash", T.StringType()),
                _f("id", T.StringType(), False),
                _f("outcome", EXECUTION_OUTCOME_SCHEMA),
            ]
        )),
        _f("receipt", RECEIPT_SCHEMA),  # nullable: "receipt: None" main.rs:254
    ]
)

# IndexerTransactionWithOutcome (main.rs:215-257)
TX_WITH_OUTCOME_SCHEMA = T.StructType(
    [
        _f("transaction", TRANSACTION_SCHEMA),
        _f("outcome", OUTCOME_WITH_RECEIPT_SCHEMA),
    ]
)

# StateChangeWithCauseView (main.rs:331-345) — two nested sum types
STATE_CHANGE_SCHEMA = T.StructType(
    [
        _f("cause", T.StructType(
            [
                _f("variant", T.StringType(), False),  # ValidatorAccountsUpdate|TransactionProcessing|...
                _f("tx_hash", T.StringType()),
                _f("receipt_hash", T.StringType()),
                _f("raw_json", T.StringType()),
            ]
        )),
        _f("type", T.StringType()),  # account_update | access_key_update | data_update | ...
        _f("change", T.StructType(
            [
                _f("account_id", T.StringType()),
                _f("amount", BALANCE),
                _f("locked", BALANCE),
                _f("storage_usage", T.LongType()),
                _f("raw_json", T.StringType()),
            ]
        )),
    ]
)

# IndexerChunkView (main.rs:192-286)
INDEXER_CHUNK_SCHEMA = T.StructType(
    [
        _f("author", T.StringType()),
        _f("header", CHUNK_HEADER_SCHEMA),
        _f("transactions", T.ArrayType(TX_WITH_OUTCOME_SCHEMA)),
        _f("receipts", T.ArrayType(RECEIPT_SCHEMA)),
    ]
)

# IndexerShard (main.rs:189-347)
SHARD_SCHEMA = T.StructType(
    [
        _f("shard_id", T.LongType(), False),
        _f("chunk", INDEXER_CHUNK_SCHEMA),  # Option<chunk> -> nullable struct
        _f("receipt_execution_outcomes", T.ArrayType(OUTCOME_WITH_RECEIPT_SCHEMA)),
        _f("state_changes", T.ArrayType(STATE_CHANGE_SCHEMA)),
    ]
)

# The top-level unit of data: one message = one block (main.rs:106,126-348)
STREAMER_SCHEMA = T.StructType(
    [
        _f("block", T.StructType(
            [
                _f("author", T.StringType()),
                _f("header", BLOCK_HEADER_SCHEMA),
                _f("chunks", T.ArrayType(CHUNK_HEADER_SCHEMA)),
            ]
        ), False),
        _f("shards", T.ArrayType(SHARD_SCHEMA), False),
    ]
)

# --------------------------------------------------------------------------
# Envelope (BorealisMessage, main.rs:365-377,424; SURVEY.md §1.4).
# sequence_id = block height = the stream's event-order key.
ENVELOPE_SCHEMA = T.StructType(
    [
        _f("sequence_id", T.LongType(), False),
        _f("subject", T.StringType(), False),
        _f("msg_format", T.StringType(), False),   # CBOR | JSON
        _f("compression", T.StringType()),          # None | LZ4F | ZSTD | ZLIB
        _f("payload", T.BinaryType(), False),
    ]
)

# --------------------------------------------------------------------------
# Normalized child tables produced by the explode family (SURVEY.md §1.5);
# used by fixtures and by tests asserting explode-count invariants.
NORMALIZED_TABLES = (
    "blocks",
    "chunks",
    "transactions",
    "receipts",
    "execution_outcomes",
    "state_changes",
    "actions",
)
