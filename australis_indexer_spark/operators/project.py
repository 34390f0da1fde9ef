"""Projection / filter / restructuring ops (SURVEY.md §2.2 P1-P14).

The reference's consumer flattens each `StreamerMessage` into keyed
projections, per-entity dumps and count columns
(borealis-consumer/src/main.rs:288-412). On the driver's tables the same
operators are exercised against the `events` stream table (the analog of the
block stream: `event_id` ≈ sequence key, `ts` ≈ block time, `props` ≈ nested
payload) and `documents` (nested/array-ish payloads). The fixture-backed
twins over the real nested StreamerMessage schema live in
``operators.explode`` and the tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import op
from ..sources.batch import load_table as lt


@op(
    "project_keys",
    tags=("parity", "project"),
    oracle="SELECT event_id AS sequence_id, ts FROM events",
)
def project_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4: key/metadata projection — (sequence key, event time) per message,
    the reference's per-message log line (block_height, block_hash)
    (borealis-indexer/src/main.rs:456-461). Column-pruned scan: only 2 of 6
    columns are read."""
    return lt(spark, sf_dir, "events").select(
        F.col("event_id").alias("sequence_id"), "ts"
    )


@op(
    "project_paths_canonical",
    tags=("parity", "project"),
    oracle=r"""
SELECT event_id AS sequence_id, ts AS block_time, event_type,
       CASE WHEN json_valid(props) THEN
         CASE WHEN regexp_matches(json_extract_string(props, '$.k'),
                                  '\A-?[0-9]+\z')
              THEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
         END
       END AS prop_k
FROM events
""",
)
def project_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3: the canonical 'jq-style' path projection
    (borealis-indexer/src/main.rs:453-454) — pick nested paths out of the
    payload document and rename to a flat canonical schema. `props` is the
    nested JSON here; `get_json_object` is Catalyst's JSON path op.

    Extraction contract (pinned on both engines, fuzz profile jsonrot):
    prop_k surfaces iff the raw path text is an optionally-negative
    decimal integer that fits int64 — so a string-typed "12" DOES parse
    (path text, not JSON type), while floats, booleans, exponent forms,
    overflow, non-numeric strings, structured values, and malformed JSON
    are all NULL. A bare ANSI cast here crashed on the first string-typed
    float a real ingest served (CAST_INVALID_INPUT — jsonrot:240);
    try_cast alone would still disagree with the oracle's VARCHAR->BIGINT
    rounding ('1.5' -> 2 in DuckDB), hence the explicit integer-text
    regex on BOTH sides. The anchors are \\A..\\z, NOT ^..$: Java's $
    (unlike RE2's) matches BEFORE a final newline, so a "12\\n" payload
    would pass a $-anchored guard on Spark only — the regex-dialect
    sibling of the edge:250 \\s/\\x0B kill."""
    raw = F.get_json_object("props", "$.k")
    return lt(spark, sf_dir, "events").select(
        F.col("event_id").alias("sequence_id"),
        F.col("ts").alias("block_time"),
        "event_type",
        F.when(raw.rlike(r"\A-?[0-9]+\z"), raw.try_cast("long")).alias("prop_k"),
    )


@op(
    "project_counts",
    tags=("parity", "project"),
    oracle="""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       n_chars
FROM documents
""",
)
def project_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P12: per-row count projection — `.len()` of each child collection
    (borealis-indexer/src/main.rs:495-498,507). Array length is a per-row
    scalar (`size`), NOT a group-by — no shuffle at any scale."""
    return lt(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        "n_chars",
    )


@op(
    "filter_predicate",
    tags=("parity", "filter"),
    oracle="""
SELECT event_id, user_id, value
FROM events
WHERE event_type = 'purchase' AND value > 100.0
""",
)
def filter_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P13: predicate gate (the reference's verbosity-gated emit,
    borealis-indexer/src/main.rs:463-476). Both conjuncts push down into the
    parquet scan (visible as PushedFilters in .explain)."""
    return (
        lt(spark, sf_dir, "events")
        .filter((F.col("event_type") == "purchase") & (F.col("value") > 100.0))
        .select("event_id", "user_id", "value")
    )


@op(
    "filter_shard",
    tags=("parity", "filter"),
    oracle="""
SELECT event_id, user_id, event_type
FROM events
WHERE user_id % 4 = 0
""",
)
def filter_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T11: tracked-shard partition selection (`tracked_shards: [0]`,
    reference make.sh:64). Here the shard function is user_id mod 4; on a
    shard-partitioned layout this becomes partition pruning instead of a
    row filter."""
    return (
        lt(spark, sf_dir, "events")
        .filter(F.col("user_id") % 4 == 0)
        .select("event_id", "user_id", "event_type")
    )


@op(
    "project_reencode_json",
    tags=("parity", "project", "codec"),
    oracle="""
SELECT event_id,
       concat('{"event_id":', CAST(event_id AS VARCHAR),
              -- to_json (ignoreNullFields=true) OMITS a NULL event_type;
              -- a bare concat would instead render it as "" (DuckDB
              -- concat ignores NULL args) — the nullstorm:141 kill
              CASE WHEN event_type IS NULL THEN ''
                   ELSE concat(',"event_type":"', event_type, '"') END,
              ',"user_id":', CAST(user_id AS VARCHAR), '}') AS payload_json
FROM events
""",
)
def project_reencode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P14/C3: per-entity JSON re-encode (the reference re-serializes every
    sub-entity to JSON+CBOR, borealis-indexer/src/main.rs:477-493). Spark
    side uses the native `to_json(struct(...))`; the oracle reproduces the
    exact byte layout via concat (DuckDB's to_json formats identically for
    this shape, but concat keeps the comparison byte-deterministic)."""
    ev = lt(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.to_json(F.struct("event_id", "event_type", "user_id")).alias("payload_json"),
    )


@op(
    "scan_from_offset",
    tags=("parity", "scan"),
    oracle="""
SELECT event_id AS sequence_id, ts, event_type
FROM events
WHERE event_id >= 500
""",
)
def scan_from_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2/T4: replay from an explicit offset (`--sync-mode BlockHeight N`,
    reference configs.rs:139-159) = a pushed-down range predicate on the
    sequence key. On a height-bucketed layout this prunes whole partitions."""
    return (
        lt(spark, sf_dir, "events")
        .filter(F.col("event_id") >= 500)
        .select(F.col("event_id").alias("sequence_id"), "ts", "event_type")
    )


_PROPS_ORACLE = """
WITH j AS (
  -- strict mirror of Spark's from_json struct<k: bigint>: k surfaces iff
  -- props is well-formed JSON whose $.k is a JSON INTEGER fitting int64
  -- (string-typed numbers, floats, exponent forms, booleans, structured
  -- values, overflow, and malformed documents are all NULL)
  SELECT event_type,
         CASE WHEN json_valid(props) THEN
           CASE WHEN json_type(json_extract(props, '$.k'))
                     IN ('BIGINT', 'UBIGINT')
                THEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
           END
         END AS k
  FROM events
)
SELECT event_type,
       COUNT(*) AS n_events,
       COUNT(k) AS n_with_k,
       CAST(SUM(k) AS BIGINT) AS sum_k,
       MIN(k) AS min_k,
       MAX(k) AS max_k,
       COUNT(CASE WHEN k % 2 = 0 THEN 1 END) AS n_even_k
FROM j
GROUP BY event_type
"""


@op("project_props_json", tags=("project", "semistructured"), oracle=_PROPS_ORACLE)
def project_props_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured property extraction: the events table's free-form
    `props` JSON column parsed with an explicit typed schema (`from_json`,
    never schema inference — the same explicit-schema rule as the block
    model in schemas.py) and rolled up per event type. A malformed or
    missing key yields NULL, counted separately from the row count, so the
    op doubles as a props-quality profile.

    Strict-extraction contract (pinned, fuzz profile jsonrot): k surfaces
    iff props is well-formed JSON whose $.k is a JSON INTEGER fitting
    int64 — from_json coerces nothing (string-typed "12", floats, 1e3,
    booleans, overflow all NULL), and the oracle mirrors that via a
    json_type gate instead of a bare CAST over extracted text (which
    CRASHED DuckDB's parser on the first malformed document and coerced
    "12" where Spark does not — jsonrot:240).

    Scale shape: parsing is a narrow JVM map (Jackson inside codegen — no
    Python); the rollup map-side combines to |types| rows. At 100 TB you'd
    materialize hot JSON paths as real columns at ingest exactly so this
    parse doesn't run per query — this op IS that materialization statement
    (`events.props -> k`), and its oracle proves the typed extraction
    matches an independent JSON engine."""
    ev = lt(spark, sf_dir, "events")
    k = F.from_json("props", "struct<k: bigint>")["k"]
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.count(F.when(F.col("k") % 2 == 0, 1)).alias("n_even_k"),
        )
    )


_VARIANT_ORACLE = r"""
WITH v AS (
  -- mirror of Spark's try_variant_get(pv, '$.k', 'bigint') CAST LADDER:
  -- JSON integers pass through (overflow -> NULL), doubles TRUNCATE
  -- toward zero (1.5 -> 1; beyond-int64 -> NULL), booleans map to 1/0,
  -- strings coerce only when they are integer text ("12" -> 12,
  -- "1.5"/"abc" -> NULL), structured values and malformed JSON -> NULL
  SELECT event_type,
         CASE WHEN json_valid(props) THEN
           CASE json_type(json_extract(props, '$.k'))
             WHEN 'BIGINT'  THEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
             WHEN 'UBIGINT' THEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
             WHEN 'DOUBLE'  THEN TRY_CAST(TRUNC(
                 TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE)) AS BIGINT)
             WHEN 'BOOLEAN' THEN CASE json_extract_string(props, '$.k')
                                   WHEN 'true' THEN 1 ELSE 0 END
             -- string coercion mirrors Spark's cast EXACTLY: every char
             -- <= 0x20 is trimmed first (incl. NUL/controls — verified:
             -- Spark parses '\x0112' where DuckDB's TRY_CAST does not),
             -- then optionally-signed digit text; \\A..\\z anchors because
             -- Java's $ would pass a trailing newline that RE2's refuses
             WHEN 'VARCHAR' THEN CASE WHEN regexp_matches(
                 regexp_replace(json_extract_string(props, '$.k'),
                                '\A[\x00-\x20]+|[\x00-\x20]+\z', '', 'g'),
                 '\A[+-]?[0-9]+\z')
                 THEN TRY_CAST(regexp_replace(json_extract_string(props, '$.k'),
                                '\A[\x00-\x20]+|[\x00-\x20]+\z', '', 'g')
                               AS BIGINT) END
           END
         END AS k,
         CASE WHEN json_valid(props) THEN TRUE ELSE FALSE END AS ok
  FROM events
  WHERE TRUE
)
SELECT event_type,
       COUNT(*) AS n_events,
       COUNT(CASE WHEN ok THEN 1 END) AS n_valid_variant,
       CAST(MIN(k) AS BIGINT) AS min_k,
       CAST(MAX(k) AS BIGINT) AS max_k,
       COUNT(DISTINCT k) AS n_distinct_k
FROM v GROUP BY event_type
"""


@op("project_props_variant", tags=("project", "semistructured", "variant"), oracle=_VARIANT_ORACLE)
def project_props_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through the VARIANT type (Spark 4's
    binary-encoded JSON): `try_parse_json` ingests each props blob ONCE
    into a variant value (malformed input becomes NULL instead of an
    error), and every later path access is `variant_get` over the binary
    encoding — no re-parsing per path, which is the point of VARIANT over
    per-query `get_json_object` at 100 TB: parse cost is paid at ingest,
    path access is a typed offset walk. Typed extraction, validity
    accounting, and distinct-value profiling per event type; the oracle is
    DuckDB's native JSON engine — two different binary JSON encodings,
    identical answers.

    Extraction is `try_variant_get` (NOT `variant_get`): the strict form
    THROWS INVALID_VARIANT_CAST the moment $.k holds a non-castable value
    — a string-typed float killed it on fuzz jsonrot:240 — and a serving
    path that crashes on one bad document out of 10^11 is wrong by
    construction. The try-form's cast ladder (ints pass, doubles truncate
    toward zero, booleans map to 1/0, integer-text strings coerce,
    everything else NULL) is mirrored case-by-case in the oracle.

    Companion to project_props_json (typed from_json against a declared
    schema): schema-on-write there, schema-agnostic VARIANT here — the
    two semi-structured disciplines a warehouse offers."""
    ev = lt(spark, sf_dir, "events")
    v = ev.select(
        "event_type",
        F.expr("try_parse_json(props)").alias("pv"),
    ).select(
        "event_type",
        F.expr("try_variant_get(pv, '$.k', 'bigint')").alias("k"),
        F.col("pv").isNotNull().alias("ok"),
    )
    return v.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.count(F.when(F.col("ok"), 1)).alias("n_valid_variant"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
        F.countDistinct("k").alias("n_distinct_k"),
    )
