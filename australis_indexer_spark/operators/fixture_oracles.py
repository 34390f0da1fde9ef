"""Independent DuckDB oracles for the fixture-backed explode family.

The explode ops normalize the nested StreamerMessage fixture with Spark
`explode`/struct-path expressions. These oracles RE-DERIVE the expected flat
rows by walking the SAME deterministic `gen_blocks` dicts in plain Python —
a second, Spark-free implementation of the P5-P10 normalization spec
(borealis-indexer/src/main.rs:499-569) — and emit them as a typed VALUES
table DuckDB can execute without any registered view. A hash match therefore
proves the Spark explosion agrees with an independent flattener, upgrading
these ops from rows-only to full oracle checks.

Types are pinned with explicit CASTs so the driver's schema comparison sees
exactly what Spark produces (BIGINT heights, INTEGER array sizes,
u128 balances as lossless digit strings — see explode.py's convention
note).
"""

from __future__ import annotations

from decimal import Decimal
from functools import lru_cache
from typing import Any

from ..fixtures import FIXTURE_BLOCKS as _N_BLOCKS
from ..fixtures import FIXTURE_START_HEIGHT, gen_blocks


@lru_cache(maxsize=1)
def _blocks() -> tuple[dict[str, Any], ...]:
    return tuple(gen_blocks(_N_BLOCKS))


def _lit(v: Any) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):  # before int: bool is an int subclass
        return "TRUE" if v else "FALSE"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, Decimal):  # u128 balances travel as lossless strings
        return "'" + str(v) + "'"
    return "'" + str(v).replace("'", "''") + "'"


def _values_sql(rows: list[tuple], cols: list[tuple[str, str]]) -> str:
    assert rows, "fixture flattener produced no rows"
    body = ",\n".join("(" + ", ".join(_lit(v) for v in r) + ")" for r in rows)
    sel = ", ".join(f"CAST({n} AS {t}) AS {n}" for n, t in cols)
    names = ", ".join(n for n, _ in cols)
    return f"SELECT {sel} FROM (VALUES\n{body}\n) AS t({names})"


def transactions_oracle() -> str:
    rows = []
    for b in _blocks():
        h = b["block"]["header"]["height"]
        for sh in b["shards"]:
            if sh["chunk"] is None:
                continue
            for t in sh["chunk"]["transactions"]:
                tx = t["transaction"]
                out = t["outcome"]["execution_outcome"]["outcome"]
                rows.append((h, sh["shard_id"], tx["hash"], tx["signer_id"],
                             tx["receiver_id"], tx["nonce"], len(tx["actions"]),
                             out["gas_burnt"], out["tokens_burnt"]))
    return _values_sql(rows, [
        ("block_height", "BIGINT"), ("shard_id", "BIGINT"), ("tx_hash", "VARCHAR"),
        ("signer_id", "VARCHAR"), ("receiver_id", "VARCHAR"), ("nonce", "BIGINT"),
        ("n_actions", "INTEGER"), ("gas_burnt", "BIGINT"),
        ("tokens_burnt", "VARCHAR"),
    ])


def receipts_oracle() -> str:
    rows = []
    for b in _blocks():
        h = b["block"]["header"]["height"]
        for sh in b["shards"]:
            if sh["chunk"] is None:
                continue
            for r in sh["chunk"]["receipts"]:
                rows.append((h, sh["shard_id"], r["receipt_id"], r["predecessor_id"],
                             r["receiver_id"], r["receipt_kind"], len(r["actions"])))
    return _values_sql(rows, [
        ("block_height", "BIGINT"), ("shard_id", "BIGINT"), ("receipt_id", "VARCHAR"),
        ("predecessor_id", "VARCHAR"), ("receiver_id", "VARCHAR"),
        ("receipt_kind", "VARCHAR"), ("n_actions", "INTEGER"),
    ])


def outcomes_oracle() -> str:
    rows = []
    for b in _blocks():
        h = b["block"]["header"]["height"]
        for sh in b["shards"]:
            for o in sh["receipt_execution_outcomes"]:
                eo = o["execution_outcome"]
                rows.append((h, sh["shard_id"], eo["id"], eo["outcome"]["executor_id"],
                             eo["outcome"]["gas_burnt"], eo["outcome"]["tokens_burnt"],
                             eo["outcome"]["status"]["variant"]))
    return _values_sql(rows, [
        ("block_height", "BIGINT"), ("shard_id", "BIGINT"), ("receipt_id", "VARCHAR"),
        ("executor_id", "VARCHAR"), ("gas_burnt", "BIGINT"),
        ("tokens_burnt", "VARCHAR"), ("status_variant", "VARCHAR"),
    ])


def state_changes_oracle() -> str:
    rows = []
    for b in _blocks():
        h = b["block"]["header"]["height"]
        for sh in b["shards"]:
            for sc in sh["state_changes"]:
                rows.append((h, sh["shard_id"], sc["type"], sc["cause"]["variant"],
                             sc["change"]["account_id"], sc["change"]["amount"],
                             sc["change"]["storage_usage"]))
    return _values_sql(rows, [
        ("block_height", "BIGINT"), ("shard_id", "BIGINT"), ("change_type", "VARCHAR"),
        ("cause_variant", "VARCHAR"), ("account_id", "VARCHAR"),
        ("amount", "VARCHAR"), ("storage_usage", "BIGINT"),
    ])


def shards_oracle() -> str:
    rows = []
    for b in _blocks():
        h = b["block"]["header"]["height"]
        for sh in b["shards"]:
            chunk = sh["chunk"]
            rows.append((h, sh["shard_id"], chunk is not None,
                         len(chunk["transactions"]) if chunk else 0,
                         len(sh["receipt_execution_outcomes"]),
                         len(sh["state_changes"])))
    return _values_sql(rows, [
        ("block_height", "BIGINT"), ("shard_id", "BIGINT"), ("has_chunk", "BOOLEAN"),
        ("n_transactions", "INTEGER"), ("n_outcomes", "INTEGER"),
        ("n_state_changes", "INTEGER"),
    ])


def actions_oracle() -> str:
    rows = []
    for b in _blocks():
        h = b["block"]["header"]["height"]
        for sh in b["shards"]:
            if sh["chunk"] is None:
                continue
            for t in sh["chunk"]["transactions"]:
                tx = t["transaction"]
                for a in tx["actions"]:
                    rows.append((h, tx["hash"], a["variant"], a["deposit"],
                                 a["method_name"], a["gas"]))
    return _values_sql(rows, [
        ("block_height", "BIGINT"), ("tx_hash", "VARCHAR"),
        ("action_variant", "VARCHAR"), ("deposit", "VARCHAR"),
        ("method_name", "VARCHAR"), ("gas", "BIGINT"),
    ])


# ---------------------------------------------------------------------------
# streaming-contract oracles: the pipeline ops' outputs are exact functions
# of the deterministic fixture (heights, hashes, bucket math), so the
# expected tables are derived here in plain Python — the independent
# restatement of each op's delivery contract (dedup to one row per height,
# gap-free ordering, retention keeping the newest N buckets, ...).


def _heights(n: int = _N_BLOCKS) -> list[int]:
    return [b["block"]["header"]["height"] for b in _blocks()[:n]]


def project_envelope_oracle() -> str:
    """P1 contract: one envelope per block, keyed by height, subject carrying
    the `{subject}_{format}` suffix rule, and a payload that round-trips
    (decompress → parse → height matches the key). Subject/format/compression
    come from envelope's own defaults (import deferred: envelope.py imports
    this module at module level, but oracle builders run lazily on first
    .oracle access — same pattern as publish_oracle)."""
    from .envelope import DEFAULT_SUBJECT, wrap_envelope

    defaults = wrap_envelope.__kwdefaults__
    msg_format, compression = defaults["msg_format"], defaults["compression"]
    rows = [
        (
            b["block"]["header"]["height"],
            f"{DEFAULT_SUBJECT}_{msg_format}",
            msg_format,
            compression,
            True,
            True,
        )
        for b in _blocks()
    ]
    return _values_sql(rows, [
        ("sequence_id", "BIGINT"), ("subject", "VARCHAR"),
        ("msg_format", "VARCHAR"), ("compression", "VARCHAR"),
        ("payload_ok", "BOOLEAN"), ("payload_nonempty", "BOOLEAN"),
    ])


def console_oracle() -> str:
    rows = [(b["block"]["header"]["height"], b["block"]["header"]["hash"])
            for b in _blocks()]
    return _values_sql(rows, [("block_height", "BIGINT"), ("block_hash", "VARCHAR")])


def order_by_height_oracle() -> str:
    hs = sorted(_heights())
    rows = [(h, (h - p) if p is not None else 1)
            for p, h in zip([None] + hs[:-1], hs)]
    return _values_sql(rows, [("sequence_id", "BIGINT"), ("delta", "BIGINT")])


def subscribe_oracle() -> str:
    rows = [(h, 1) for h in _heights()]
    return _values_sql(rows, [("sequence_id", "BIGINT"), ("n_delivered", "BIGINT")])


def durable_consumer_oracle() -> str:
    rows = [(h, 1, 1, True) for h in _heights()]
    return _values_sql(rows, [
        ("sequence_id", "BIGINT"), ("n_first", "BIGINT"),
        ("n_replay", "BIGINT"), ("replayed_ok", "BOOLEAN"),
    ])


def backfill_oracle() -> str:
    hs = _heights()
    rows = [(len(hs), min(hs), max(hs), True)]
    return _values_sql(rows, [
        ("n_rows", "BIGINT"), ("min_height", "BIGINT"),
        ("max_height", "BIGINT"), ("backlog_fully_drained", "BOOLEAN"),
    ])


def publish_oracle() -> str:
    from .envelope import DEFAULT_SUBJECT

    n = _N_BLOCKS
    rows = [(f"{DEFAULT_SUBJECT}_JSON", n, n)]
    return _values_sql(rows, [
        ("subject", "VARCHAR"), ("n_published", "BIGINT"), ("n_unique", "BIGINT"),
    ])


def replay_oracle() -> str:
    hs = _heights()
    mid = min(hs) + 24
    ranged = [h for h in hs if h >= mid]
    rows = [(len(hs), len(ranged), min(ranged))]
    return _values_sql(rows, [
        ("n_full_replay", "INTEGER"), ("n_ranged_replay", "BIGINT"),
        ("ranged_start", "BIGINT"),
    ])


_SINK_BUCKET = 100_000  # streaming.pipeline.HEIGHT_BUCKET_BLOCKS


def durable_log_oracle() -> str:
    hs = _heights()
    by_bucket: dict[int, list[int]] = {}
    for h in hs:
        # mirrors write_batch_idempotent: bucket ORDINAL (h // size), not base
        by_bucket.setdefault(h // _SINK_BUCKET, []).append(h)
    rows = [(b, len(v), min(v), max(v)) for b, v in sorted(by_bucket.items())]
    # height_bucket is INTEGER: partition-column type is re-inferred from the
    # directory name on read, and the fixture values fit int32
    return _values_sql(rows, [
        ("height_bucket", "INTEGER"), ("n_messages", "BIGINT"),
        ("first_height", "BIGINT"), ("last_height", "BIGINT"),
    ])


def retention_oracle() -> str:
    hs = _heights()
    by_bucket: dict[int, list[int]] = {}
    for h in hs:
        by_bucket.setdefault(h // 16 * 16, []).append(h)
    kept = sorted(by_bucket)[-2:]  # keep_newest = 2
    rows = [(b, len(by_bucket[b]), min(by_bucket[b]), max(by_bucket[b])) for b in kept]
    return _values_sql(rows, [
        ("height_bucket", "INTEGER"), ("n_messages", "BIGINT"),
        ("first_height", "BIGINT"), ("last_height", "BIGINT"),
    ])


def dedup_window_oracle() -> str:
    rows = [(h, 1) for h in _heights(32)]  # dedup_window streams 32 blocks
    return _values_sql(rows, [("sequence_id", "BIGINT"), ("n_after_dedup", "BIGINT")])


def chunks_oracle() -> str:
    import json

    rows = []
    for b in _blocks():
        h = b["block"]["header"]["height"]
        for c in b["block"]["chunks"]:
            rows.append((h, c["chunk_hash"], c["prev_block_hash"],
                         c["height_created"], c["height_included"], c["shard_id"],
                         c["gas_used"], c["gas_limit"], c["validator_reward"],
                         c["balance_burnt"], c["outgoing_receipts_root"],
                         c["tx_root"], json.dumps(c["validator_proposals"],
                                                  separators=(",", ":")),
                         c["signature"]))
    return _values_sql(rows, [
        ("block_height", "BIGINT"), ("chunk_hash", "VARCHAR"),
        ("prev_block_hash", "VARCHAR"), ("height_created", "BIGINT"),
        ("height_included", "BIGINT"), ("shard_id", "BIGINT"),
        ("gas_used", "BIGINT"), ("gas_limit", "BIGINT"),
        ("validator_reward", "VARCHAR"), ("balance_burnt", "VARCHAR"),
        ("outgoing_receipts_root", "VARCHAR"), ("tx_root", "VARCHAR"),
        ("validator_proposals", "VARCHAR"), ("signature", "VARCHAR"),
    ])


def unwrap_oracle() -> str:
    rows = [(b["block"]["header"]["height"], b["block"]["header"]["hash"],
             b["block"]["author"], len(b["shards"])) for b in _blocks()]
    return _values_sql(rows, [
        ("sequence_id", "BIGINT"), ("block_hash", "VARCHAR"),
        ("author", "VARCHAR"), ("n_shards", "INTEGER"),
    ])


def _spark_json(v: Any, dtype: Any) -> str | None:
    """Mirror of Spark's ``to_json`` for the fixture's types, driven by the
    SAME StructType contract the op serializes against (schemas.py): struct
    fields in schema order with null fields OMITTED, array nulls kept as
    ``null``, compact separators, DECIMAL(38,0) as plain digits, booleans
    lowercase, standard JSON string escaping. An independent re-derivation —
    only the schema object is shared, not any Spark serialization code."""
    import json as _json

    from pyspark.sql import types as T

    if v is None:
        return None
    if isinstance(dtype, T.StructType):
        parts = []
        for f in dtype.fields:
            fv = v.get(f.name) if isinstance(v, dict) else getattr(v, f.name)
            s = _spark_json(fv, f.dataType)
            if s is not None:  # to_json drops null struct fields
                parts.append(f'"{f.name}":{s}')
        return "{" + ",".join(parts) + "}"
    if isinstance(dtype, T.ArrayType):
        elems = [
            _spark_json(e, dtype.elementType) if e is not None else "null"
            for e in v
        ]
        return "[" + ",".join(elems) + "]"
    if isinstance(dtype, T.BooleanType):
        return "true" if v else "false"
    if isinstance(dtype, T.DecimalType):
        return str(v)  # scale-0 fixture balances: plain digit string
    if isinstance(dtype, (T.LongType, T.IntegerType)):
        return str(int(v))
    if isinstance(dtype, T.StringType):
        # ensure_ascii=False: Spark's to_json (Jackson) emits non-ASCII
        # characters RAW, while Python's default escapes them as \\uXXXX —
        # six chars where Spark counts one. Identical output for the
        # all-ASCII fixture today; this keeps the mirror honest if a
        # non-ASCII account id or log line ever enters the fixture.
        return _json.dumps(v, ensure_ascii=False)
    raise TypeError(f"_spark_json: unhandled type {dtype}")


def reencode_oracle() -> str:
    """P14 contract: the derived JSON char counts and CBOR byte counts of
    each block's header/chunks are exact functions of the fixture. The JSON
    length comes from the ``_spark_json`` mirror; the CBOR length re-encodes
    that JSON with the engine's own pure-Python RFC 8949 codec (itself pinned
    by golden-byte tests, tests/test_codecs.py) — so a mismatch isolates the
    Spark-side plumbing (to_json field order/null handling, UDF wiring)."""
    import json as _json

    from pyspark.sql import types as T

    from ..functions.codecs import cbor_dumps
    from ..schemas import BLOCK_HEADER_SCHEMA, CHUNK_HEADER_SCHEMA

    chunks_t = T.ArrayType(CHUNK_HEADER_SCHEMA)
    rows = []
    for b in _blocks():
        hdr = b["block"]["header"]
        hj = _spark_json(hdr, BLOCK_HEADER_SCHEMA)
        cj = _spark_json(b["block"]["chunks"], chunks_t)
        rows.append((
            hdr["height"],
            len(hj),
            len(cbor_dumps(_json.loads(hj))),
            len(cj),
        ))
    return _values_sql(rows, [
        ("sequence_id", "BIGINT"), ("header_json_chars", "BIGINT"),
        ("header_cbor_bytes", "BIGINT"), ("chunks_json_chars", "BIGINT"),
    ])


def gap_tracker_oracle() -> str:
    """Per-bucket high-watermark contract: buckets are (height div 16)*16
    spans; the fixture is gap-free so every bucket is contiguous."""
    by_bucket: dict[int, list[int]] = {}
    for h in _heights():
        by_bucket.setdefault(h // 16 * 16, []).append(h)
    # same anchor constant the op's contiguity test uses (stateful.py)
    lo = FIXTURE_START_HEIGHT
    rows = [
        (b, max(v), len(v), len(v) == max(v) - max(b, lo) + 1)
        for b, v in sorted(by_bucket.items())
    ]
    return _values_sql(rows, [
        ("bucket", "BIGINT"), ("high_watermark", "BIGINT"),
        ("n_seen", "BIGINT"), ("contiguous", "BOOLEAN"),
    ])


def ssj_oracle() -> str:
    """Batch twin of the stream-stream tx→outcome join: re-derive every
    (receipt, outcome) pair from the fixture dicts — receipts from chunk
    shards, outcomes from receipt_execution_outcomes one block later — and
    keep pairs whose µs event times satisfy the 30 s join window. The
    streaming op must emit exactly these rows (watermarks only bound state;
    nothing in the fixture is late)."""
    blocks = _blocks()

    def us(b: dict[str, Any]) -> int:
        return b["block"]["header"]["timestamp"] // 1000

    rcpts: dict[str, tuple[int, int, str]] = {}
    for b in blocks:
        h = b["block"]["header"]["height"]
        for sh in b["shards"]:
            if sh["chunk"] is None:
                continue
            for r in sh["chunk"]["receipts"]:
                rcpts[r["receipt_id"]] = (h, us(b), r["receiver_id"])
    rows = []
    for b in blocks:
        h = b["block"]["header"]["height"]
        for sh in b["shards"]:
            for o in sh["receipt_execution_outcomes"]:
                rid = o["execution_outcome"]["id"]
                hit = rcpts.get(rid)
                if hit is None:
                    continue
                rh, rt, recv = hit
                if rt <= us(b) <= rt + 30_000_000:
                    rows.append((
                        rid, rh, h, recv,
                        o["execution_outcome"]["outcome"]["gas_burnt"], h - rh,
                    ))
    return _values_sql(rows, [
        ("receipt_id", "VARCHAR"), ("rcpt_height", "BIGINT"),
        ("out_height", "BIGINT"), ("receiver_id", "VARCHAR"),
        ("gas_burnt", "BIGINT"), ("lag_blocks", "BIGINT"),
    ])


def scan_stream_oracle() -> str:
    """End-to-end pipeline contract: one sink row per height, bucketed by
    (height div 100k), whose payload is the full StreamerMessage re-serialized
    as JSON — its exact char count re-derived by the ``_spark_json`` mirror
    over the ENTIRE 6-level nested schema (so any drift in the stream's
    write→read→re-encode path shows up as a one-char diff)."""
    from ..schemas import STREAMER_SCHEMA

    rows = []
    for b in _blocks():
        h = b["block"]["header"]["height"]
        rows.append((h, h // _SINK_BUCKET, len(_spark_json(b, STREAMER_SCHEMA))))
    return _values_sql(rows, [
        ("sequence_id", "BIGINT"), ("height_bucket", "INTEGER"),
        ("payload_chars", "INTEGER"),
    ])


def compaction_oracle() -> str:
    """Compaction contract: every message survives (row conservation), the
    height range is intact, and each closed bucket collapses to ONE file."""
    hs = _heights()
    by_bucket: dict[int, list[int]] = {}
    for h in hs:
        by_bucket.setdefault(h // _SINK_BUCKET, []).append(h)
    rows = [
        (b, len(v), min(v), max(v), True, True)
        for b, v in sorted(by_bucket.items())
    ]
    return _values_sql(rows, [
        ("height_bucket", "INTEGER"), ("n_messages", "BIGINT"),
        ("first_height", "BIGINT"), ("last_height", "BIGINT"),
        ("rows_conserved", "BOOLEAN"), ("one_file_per_bucket", "BOOLEAN"),
    ])


def envelope_roundtrip_oracle() -> str:
    rows = [(b["block"]["header"]["height"], b["block"]["header"]["hash"],
             len(b["shards"]), True) for b in _blocks()]
    return _values_sql(rows, [
        ("sequence_id", "BIGINT"), ("block_hash", "VARCHAR"),
        ("n_shards", "INTEGER"), ("roundtrip_ok", "BOOLEAN"),
    ])
