"""Golden-fixture wire round-trip (SURVEY.md §5.3): blocks → envelope(zlib
JSON) → CBOR wire → decode → decompress → from_json → blocks', byte-exact on
keys and structure (the encode/decode pair of borealis-indexer/src/
main.rs:357-451 and borealis-consumer/src/main.rs:260-286).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from australis_indexer_spark.fixtures import blocks_df
from australis_indexer_spark.operators.envelope import (
    from_wire,
    to_wire,
    unwrap_envelope,
    wrap_envelope,
)
from australis_indexer_spark.registry import ensure_executor_pyfiles


def test_envelope_schema_and_key(spark):
    ensure_executor_pyfiles(spark)
    blocks = blocks_df(spark, 8)
    env = wrap_envelope(blocks)
    assert [f for f in env.columns] == [
        "sequence_id", "subject", "msg_format", "compression", "payload"
    ]
    # sequence key == block height (main.rs:365)
    heights = sorted(r[0] for r in blocks.select("block.header.height").collect())
    seqs = sorted(r[0] for r in env.select("sequence_id").collect())
    assert heights == seqs
    # subject suffix rule `{subject}_{format}` (consumer configs.rs:93)
    assert env.select("subject").first()[0].endswith("_JSON")


def test_full_wire_roundtrip_identity(spark):
    ensure_executor_pyfiles(spark)
    blocks = blocks_df(spark, 8)
    back = unwrap_envelope(from_wire(to_wire(wrap_envelope(blocks))))

    def keyed(df):
        return {
            r["h"]: (r["hash"], r["n_shards"], r["n_chunks"], str(r["supply"]))
            for r in df.select(
                F.col("block.header.height").alias("h"),
                F.col("block.header.hash").alias("hash"),
                F.size("shards").alias("n_shards"),
                F.size("block.chunks").alias("n_chunks"),
                F.col("block.header.total_supply").alias("supply"),
            ).collect()
        }

    assert keyed(blocks) == keyed(back)


def test_roundtrip_op_all_ok(spark, ops):
    df = ops["envelope_roundtrip"].fn(spark, "")
    rows = df.collect()
    assert rows and all(r["roundtrip_ok"] for r in rows)


def test_gen_blocks_rejects_nonpositive_outcome_lag():
    """outcome_lag <= 0 used to silently drop EVERY receipt execution
    outcome (the due-list pop for a height runs before that height's own
    transactions register theirs), leaving callers a vacuously-empty
    outcome side; the generator now rejects the contract violation loudly
    (round-6 review). The reference defers outcomes by >= 1 block."""
    import pytest

    from australis_indexer_spark.fixtures import gen_blocks

    with pytest.raises(ValueError, match="outcome_lag"):
        gen_blocks(4, outcome_lag=0)
    # lag=1 (the default and the reference's shape) still yields outcomes
    blocks = gen_blocks(8, outcome_lag=1)
    n_out = sum(
        len(s.get("receipt_execution_outcomes") or [])
        for b in blocks
        for s in (b.get("shards") or [])
    )
    assert n_out > 0
