"""Deterministic synthetic block-stream fixtures.

The reference ships no tests; its de facto golden fixture is the 230-line
``StreamerMessage`` example embedded as a doc comment at
``/root/reference/borealis-indexer/src/main.rs:118-349``. This module
generates an arbitrary number of schema-faithful blocks shaped like that
example (seeded, fully deterministic) so operator/codec/streaming tests have
real nested data.

Key semantic reproduced (main.rs:121-125): the execution outcome for a
transaction/receipt lands in a *later* block than the transaction itself —
usually the next block. ``gen_blocks`` therefore emits each transaction's
receipt outcome in block ``height + outcome_lag`` so the as-of tx→outcome
join (SURVEY.md §2.6 join_asof) is genuinely cross-block.
"""

from __future__ import annotations

import random
from decimal import Decimal
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from .schemas import STREAMER_SCHEMA

# The canonical fixture geometry — re-exported from the pyspark-free
# constants module (ADVICE r7: cli.py reads them for argparse defaults
# and must not pay the pyspark import for --help); every pyspark-side
# consumer keeps importing them from here.
from .constants import FIXTURE_BLOCKS, FIXTURE_START_HEIGHT  # noqa: F401

_ACCOUNTS = [
    "test.near", "alice.near", "bob.near", "relay.aurora", "dex.ref-finance.near",
    "oracle.near", "market.near", "staking.pool.near", "bridge.near", "nft.mintbase.near",
]
_METHODS = ["ft_transfer", "swap", "mint", "stake", "claim", "set_value"]
_B58 = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"

GENESIS_TS_NS = 1_618_558_205_803_345_000  # example value, main.rs:142
BLOCK_INTERVAL_NS = 1_000_000_000          # ~1 block/s NEAR cadence (BASELINE.md §2)


def _hash(rng: random.Random) -> str:
    return "".join(rng.choice(_B58) for _ in range(44))


def _pubkey(rng: random.Random) -> str:
    return "ed25519:" + _hash(rng)


def _action(rng: random.Random) -> dict[str, Any]:
    variant = rng.choice(["CreateAccount", "Transfer", "AddKey", "FunctionCall"])
    act: dict[str, Any] = {
        "variant": variant, "deposit": None, "public_key": None, "access_key": None,
        "method_name": None, "args_base64": None, "gas": None, "beneficiary_id": None,
        "raw_json": None,
    }
    if variant == "Transfer":
        # u128 yoctoNEAR deposit, e.g. "1000000000000000" (main.rs:225)
        act["deposit"] = Decimal(rng.randrange(1, 10**30))
    elif variant == "AddKey":
        act["public_key"] = _pubkey(rng)
        act["access_key"] = {"nonce": rng.randrange(0, 10**6), "permission": "FullAccess"}
    elif variant == "FunctionCall":
        act["method_name"] = rng.choice(_METHODS)
        act["args_base64"] = "eyJrZXkiOiJ2YWx1ZSJ9"
        act["gas"] = rng.randrange(10**12, 3 * 10**14)
        act["deposit"] = Decimal(rng.randrange(0, 10**24))
    act["raw_json"] = f'{{"{variant}":{{}}}}'
    return act


def _chunk_header(rng: random.Random, height: int, shard_id: int) -> dict[str, Any]:
    return {
        "chunk_hash": _hash(rng),
        "prev_block_hash": _hash(rng),
        "height_created": height,
        "height_included": height,
        "shard_id": shard_id,
        "gas_used": rng.randrange(0, 10**9),
        "gas_limit": 1_000_000_000_000_000,
        "validator_reward": Decimal(0),
        "balance_burnt": Decimal(rng.randrange(0, 10**22)),
        "outgoing_receipts_root": _hash(rng),
        "tx_root": _hash(rng),
        "validator_proposals": [],
        "signature": _pubkey(rng),
    }


def _receipt(rng: random.Random, receipt_id: str) -> dict[str, Any]:
    return {
        "receipt_id": receipt_id,
        "predecessor_id": rng.choice(_ACCOUNTS),
        "receiver_id": rng.choice(_ACCOUNTS),
        "receipt_kind": "Action",
        "signer_id": rng.choice(_ACCOUNTS),
        "signer_public_key": _pubkey(rng),
        "gas_price": Decimal(rng.randrange(10**8, 10**10)),
        "actions": [_action(rng) for _ in range(rng.randrange(1, 3))],
        "input_data_ids": [],
        "output_data_receivers": [],
    }


def _outcome(rng: random.Random, for_id: str, block_hash: str,
             receipt: dict[str, Any] | None) -> dict[str, Any]:
    status_variant = rng.choice(["SuccessValue", "SuccessReceiptId"])
    return {
        "execution_outcome": {
            "block_hash": block_hash,
            "id": for_id,
            "outcome": {
                "id": for_id,
                "block_hash": block_hash,
                "executor_id": rng.choice(_ACCOUNTS),
                "gas_burnt": rng.randrange(10**11, 10**13),
                "tokens_burnt": Decimal(rng.randrange(10**18, 10**21)),
                "logs": [],
                "receipt_ids": [_hash(rng)],
                "status": {
                    "variant": status_variant,
                    "success_receipt_id": _hash(rng) if status_variant == "SuccessReceiptId" else None,
                    "success_value": "" if status_variant == "SuccessValue" else None,
                    "raw_json": f'{{"{status_variant}":""}}',
                },
            },
        },
        "receipt": receipt,
    }


def gen_blocks(
    n_blocks: int = 32,
    *,
    seed: int = 42,
    start_height: int = FIXTURE_START_HEIGHT,
    n_shards: int = 4,
    outcome_lag: int = 1,
) -> list[dict[str, Any]]:
    """Generate ``n_blocks`` StreamerMessage-shaped rows (plain Python dicts
    matching ``STREAMER_SCHEMA``), with receipt execution outcomes deferred
    ``outcome_lag`` blocks after their transaction (main.rs:121-125)."""
    if outcome_lag < 1:
        # lag<=0 would silently DROP every outcome: the due-list pop for a
        # height runs before that height's own transactions register
        # theirs (verified: lag=0 yields 49 receipts, 0 outcomes). Same-
        # block outcomes aren't a shape the reference emits (main.rs:
        # 121-125 defers by >=1 block), so reject the contract violation
        # loudly instead of generating a vacuously-empty outcome side.
        raise ValueError("gen_blocks: outcome_lag must be >= 1")
    rng = random.Random(seed)
    pending_outcomes: dict[int, list[tuple[str, dict[str, Any]]]] = {}
    blocks: list[dict[str, Any]] = []
    for i in range(n_blocks):
        height = start_height + i
        block_hash = _hash(rng)
        ts_ns = GENESIS_TS_NS + i * BLOCK_INTERVAL_NS
        chunk_headers = [_chunk_header(rng, height, s) for s in range(n_shards)]
        shards = []
        due = pending_outcomes.pop(height, [])
        for shard_id in range(n_shards):
            has_chunk = rng.random() > 0.1  # Option<chunk> None branch (main.rs:192)
            txs = []
            receipts = []
            if has_chunk:
                for _ in range(rng.randrange(0, 4)):
                    tx_hash = _hash(rng)
                    receipt_id = _hash(rng)
                    receipt = _receipt(rng, receipt_id)
                    txs.append({
                        "transaction": {
                            "hash": tx_hash,
                            "signer_id": rng.choice(_ACCOUNTS),
                            "public_key": _pubkey(rng),
                            "nonce": rng.randrange(1, 10**7),
                            "receiver_id": rng.choice(_ACCOUNTS),
                            "actions": [_action(rng) for _ in range(rng.randrange(1, 3))],
                            "signature": _pubkey(rng),
                            "priority_fee": 0,
                        },
                        # tx-level outcome is immediate; its receipt outcome
                        # lands outcome_lag blocks later (main.rs:121-125)
                        "outcome": _outcome(rng, tx_hash, block_hash, None),
                    })
                    receipts.append(receipt)
                    pending_outcomes.setdefault(height + outcome_lag, []).append(
                        (receipt_id, receipt)
                    )
            shard_due = [d for j, d in enumerate(due) if j % n_shards == shard_id]
            shards.append({
                "shard_id": shard_id,
                "chunk": {
                    "author": rng.choice(_ACCOUNTS),
                    "header": chunk_headers[shard_id],
                    "transactions": txs,
                    "receipts": receipts,
                } if has_chunk else None,
                "receipt_execution_outcomes": [
                    _outcome(rng, rid, block_hash, rcpt) for rid, rcpt in shard_due
                ],
                "state_changes": [
                    {
                        "cause": {
                            "variant": "TransactionProcessing",
                            "tx_hash": _hash(rng),
                            "receipt_hash": None,
                            "raw_json": None,
                        },
                        "type": "account_update",
                        "change": {
                            "account_id": rng.choice(_ACCOUNTS),
                            "amount": Decimal(rng.randrange(10**20, 10**28)),
                            "locked": Decimal(0),
                            "storage_usage": rng.randrange(100, 10**6),
                            "raw_json": None,
                        },
                    }
                    for _ in range(rng.randrange(0, 3))
                ],
            })
        blocks.append({
            "block": {
                "author": rng.choice(_ACCOUNTS),
                "header": {
                    "height": height,
                    "prev_height": height - 1,
                    "hash": block_hash,
                    "prev_hash": blocks[-1]["block"]["header"]["hash"] if blocks else _hash(rng),
                    "epoch_id": "11111111111111111111111111111111",
                    "next_epoch_id": _hash(rng),
                    "chunks_included": n_shards,
                    "timestamp": ts_ns,
                    "timestamp_nanosec": str(ts_ns),
                    "total_supply": Decimal("2050206401403887985811862247311434"),  # main.rs:152
                    "gas_price": Decimal("1000000000"),
                    "validator_reward": Decimal(0),
                    "chunk_mask": [True] * n_shards,
                    "approvals": [(_pubkey(rng) if rng.random() > 0.2 else None)
                                  for _ in range(3)],
                    "signature": _pubkey(rng),
                    "latest_protocol_version": 43,
                },
                "chunks": chunk_headers,
            },
            "shards": shards,
        })
    return blocks


# The per-session fixture cache lives as an attribute ON the SparkSession
# object itself, so it shares the session's lifetime exactly: when the
# session object is collected, its cached DataFrames go with it. The r6
# module-global cache keyed by id(spark) pinned frames and dead sessions
# for process life (VERDICT r6 What's-wrong #2) — and a WeakKeyDictionary
# cannot fix that here, because the cached DataFrames strongly reference
# their session (df._session), keeping the weak key reachable from the
# values forever (the documented WeakKeyDictionary caveat; round-7 review).
_CACHE_ATTR = "_aispark_fixture_df_cache"


def blocks_df(spark: SparkSession, n_blocks: int = 32, **kw: Any) -> DataFrame:
    """The fixture as a DataFrame with the exact ``STREAMER_SCHEMA``.

    Cached (and Spark-`.cache()`d) per (session, args): the generator is
    driver-side Python, so repeated fixture-backed ops would otherwise pay
    the createDataFrame serialization on every call."""
    per_session: dict[tuple, DataFrame] | None = getattr(spark, _CACHE_ATTR, None)
    if per_session is None:
        per_session = {}
        setattr(spark, _CACHE_ATTR, per_session)
    key = (n_blocks, tuple(sorted(kw.items())))
    df = per_session.get(key)
    if df is None:
        # a handful of partitions, not defaultParallelism: fixture frames are
        # tens of rows, and every extra partition costs a Python-worker spinup
        # in each downstream pandas-UDF stage
        df = (
            spark.createDataFrame(gen_blocks(n_blocks, **kw), schema=STREAMER_SCHEMA)
            .coalesce(max(2, min(8, n_blocks // 8)))
            .cache()
        )
        per_session[key] = df
    return df
