"""Deterministic sampling / split operators for training-data curation.

A 100 TB corpus pipeline needs *reproducible* selection: the train/val/test
membership of a document must be a pure function of its identity, never of
partitioning, task order, or an RNG seed's whims across retries. Every op
here derives selection from `md5(tag || doc_id)` — portable, uniform, and
bit-identical in Spark and the DuckDB oracle (same convention as the
minhash/simhash families in operators/dedup.py).

The reference has no sampling surface (it forwards every block); these are
north-star extensions per BASELINE.json, same first-class treatment as the
dedup family.

Scale notes: hash-split is a narrow map — no shuffle, no state, trivially
parallel at any scale factor; the balanced subsample is one shuffle on the
stratum key with a per-stratum top-k (ORDER BY hash LIMIT k per group), the
same shape as any windowed rank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..registry import op
from ..sources.batch import load_table as lt

# first-byte thresholds over md5's 256 first-byte values:
# train = 0x00..0xcb (204/256 = 79.7%), val = 0xcc..0xe5 (26/256 = 10.2%),
# test = 0xe6..0xff (26/256 = 10.2%). Fixed-width lowercase hex makes the
# lexicographic compare equal the numeric compare in both engines.
_TRAIN_HI = "cc"
_VAL_HI = "e6"


def _split_col() -> F.Column:
    b = F.substring(F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))), 1, 2)
    return (
        F.when(b < _TRAIN_HI, "train").when(b < _VAL_HI, "val").otherwise("test")
    )


_SQL_SPLIT = f"""
CASE WHEN substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 2) < '{_TRAIN_HI}' THEN 'train'
     WHEN substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 2) < '{_VAL_HI}' THEN 'val'
     ELSE 'test' END
"""


@op(
    "sample_split_hash",
    tags=("northstar", "sampling", "text"),
    oracle=f"""
SELECT {_SQL_SPLIT} AS split,
       lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY 1, 2
""",
)
def sample_split_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split (~80/10/10) by identity hash:
    membership is `md5('split:' || doc_id)` bucketed on the first byte, so
    it is stable under re-runs, repartitioning, task retries, and corpus
    growth (old docs never change split when new docs arrive — the property
    that prevents eval contamination across dataset versions)."""
    return (
        lt(spark, sf_dir, "documents")
        .select(_split_col().alias("split"), "lang", "n_chars")
        .groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


_BALANCE_K = 64


@op(
    "sample_balanced_strata",
    tags=("northstar", "sampling", "text"),
    oracle=f"""
WITH ranked AS (
  SELECT doc_id, lang, n_chars,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY md5('bal:' || CAST(doc_id AS VARCHAR)), doc_id)
           AS rk
  FROM documents
)
SELECT doc_id, lang, n_chars FROM ranked WHERE rk <= {_BALANCE_K}
""",
)
def sample_balanced_strata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balanced subsample: exactly K docs per language, chosen by
    hash order (a deterministic 'random' — uniform within each stratum,
    reproducible everywhere). The canonical fix for skewed language mixes
    before fine-tuning; one shuffle on the stratum key, per-group top-K.

    At 100 TB prefer the rank-free form: a per-stratum hash THRESHOLD
    (as in sample_split_hash) sized from approx counts — it avoids the
    window sort entirely; the exact-K windowed form here is for when the
    contract is a hard per-class budget."""
    w = W.partitionBy("lang").orderBy(
        F.md5(F.concat(F.lit("bal:"), F.col("doc_id").cast("string"))), "doc_id"
    )
    return (
        lt(spark, sf_dir, "documents")
        .select("doc_id", "lang", "n_chars")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _BALANCE_K)
        .drop("rk")
    )


@op(
    "sample_reservoir_uniform",
    tags=("northstar", "sampling"),
    oracle=f"""
WITH ranked AS (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (ORDER BY md5('res:' || CAST(doc_id AS VARCHAR)), doc_id) AS rk
  FROM documents
)
SELECT doc_id, lang FROM ranked WHERE rk <= 500
""",
)
def sample_reservoir_uniform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-N uniform corpus sample, the deterministic analog of a
    reservoir: global top-500 by identity hash. Spark executes this as
    TakeOrderedAndProject — per-partition top-N then a single driver-side
    merge of N-row heaps, NOT a global sort (the plan a naive
    `ORDER BY rand() LIMIT n` cannot achieve reproducibly)."""
    return (
        lt(spark, sf_dir, "documents")
        .select(
            "doc_id",
            "lang",
            F.md5(F.concat(F.lit("res:"), F.col("doc_id").cast("string"))).alias("h"),
        )
        .orderBy("h", "doc_id")
        .limit(500)
        .drop("h")
    )


# ---------------------------------------------------------------------------
# weighted interleave — deterministic dataset mixing

# Per-source mix factor in EIGHTHS, derived from the source name itself so
# the op needs no per-corpus config: k = 4 + (hexval(md5(source)[0]) mod 13)
# eighths -> factor 0.5x .. 2.0x. All-integer arithmetic: zero float-
# determinism risk between engines.
_HEXVAL = "(ascii({c}) - CASE WHEN {c} BETWEEN '0' AND '9' THEN 48 ELSE 87 END)"


def _sql_hexval(expr: str) -> str:
    c = f"substr(md5({expr}), 1, 1)"
    return _HEXVAL.format(c=c)


@op(
    "pipeline_interleave_mix",
    tags=("northstar", "sampling", "pipeline"),
    oracle=f"""
WITH weighted AS (
  SELECT doc_id, source, lang,
         4 + ({_sql_hexval("source")} % 13) AS k,
         {_sql_hexval("'mix:' || CAST(doc_id AS VARCHAR)")} % 8 AS hd
  FROM documents
),
copies AS (
  SELECT doc_id, source, lang,
         (k / 8) + (CASE WHEN hd < (k % 8) THEN 1 ELSE 0 END) AS n_copies
  FROM weighted
)
SELECT c.doc_id, c.source, c.lang, g.copy_no
FROM copies c JOIN (VALUES (1),(2),(3)) g(copy_no) ON g.copy_no <= c.n_copies
""",
)
def pipeline_interleave_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted interleave: each source gets a mix factor in
    [0.5x, 2.0x] derived from its name hash; each doc materializes
    floor(f) copies plus one more for the hash-selected fractional share.
    The standard epoch-mixture primitive (upsample rare high-quality
    sources, downsample bulk crawl) — reproducible because both the factor
    and the fractional membership are pure identity hashes, and shuffle-free
    because copy expansion is a narrow explode."""
    hexval = lambda c: (  # noqa: E731
        F.ascii(c)
        - F.when(c.between("0", "9"), F.lit(48)).otherwise(F.lit(87))
    )
    src_k = (hexval(F.substring(F.md5(F.col("source")), 1, 1)) % 13) + 4
    doc_h = hexval(
        F.substring(F.md5(F.concat(F.lit("mix:"), F.col("doc_id").cast("string"))), 1, 1)
    ) % 8
    n_copies = (src_k / 8).cast("int") + F.when(doc_h < src_k % 8, 1).otherwise(0)
    return (
        lt(spark, sf_dir, "documents")
        .select("doc_id", "source", "lang", n_copies.alias("n_copies"))
        # sequence(1, 0) is DESCENDING [1, 0] in Spark, not empty — a
        # zero-copy doc must be dropped before the explode
        .filter(F.col("n_copies") >= 1)
        .select(
            "doc_id",
            "source",
            "lang",
            F.explode(F.sequence(F.lit(1), F.col("n_copies"))).alias("copy_no"),
        )
    )


_SHARD_ORACLE = """
SELECT substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 1) AS shard,
       COUNT(*) AS n_docs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
       CAST(SUM(LENGTH(text)) AS BIGINT) AS n_chars,
       MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
FROM documents
GROUP BY 1
"""


@op("pipeline_shard_manifest", tags=("northstar", "pipeline"), oracle=_SHARD_ORACLE)
def pipeline_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trainer-side output sharding manifest: every document is assigned to
    one of 16 shards by the first hex nibble of `md5('shard:' || doc_id)` —
    the same identity-hash convention as sample_split_hash, kept AS a hex
    character so no engine-specific hex->int conversion exists to diverge —
    and the manifest reports per-shard docs / whitespace tokens / chars and
    the doc-id range a data loader needs to plan epoch reads.

    Scale shape: assignment is a narrow map (no shuffle, no state, no
    coordination — shard membership is recomputable from the id alone, so a
    re-run or a backfill lands every doc in the same shard); the manifest is
    ONE map-side-combined aggregate to 16 rows. Writing the actual shard
    files would be `df.write.partitionBy('shard')` over the same column —
    the layout sink_partitioned_prune demonstrates.
    """
    docs = lt(spark, sf_dir, "documents")
    shard = F.substring(
        F.md5(F.concat(F.lit("shard:"), F.col("doc_id").cast("string"))), 1, 1
    )
    return (
        docs.select(
            shard.alias("shard"),
            "doc_id",
            F.size(F.split("text", " ")).cast("long").alias("toks"),
            F.length("text").cast("long").alias("chars"),
        )
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("toks").alias("n_tokens"),
            F.sum("chars").alias("n_chars"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
    )


_CARD_ORACLE = """
SELECT source,
       COUNT(*) AS n_docs,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       COUNT(*) - COUNT(DISTINCT text) AS n_exact_dup_docs,
       COUNT(CASE WHEN n_chars < 100 THEN 1 END) AS n_short_docs,
       CAST((SUM(len(string_split(text, ' '))) * 100) // COUNT(*) AS BIGINT)
         AS tokens_per_doc_x100
FROM documents
GROUP BY source
"""


@op("pipeline_dataset_card", tags=("northstar", "pipeline", "profiling"), oracle=_CARD_ORACLE)
def pipeline_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset card — the one-look summary a training-data consumer reads
    before anything else, per source: document and language counts, token
    and character volume, exact-duplicate count (docs minus distinct
    texts — the headline dedup number), short-doc count (the quality-gate
    casualty estimate), and mean tokens-per-doc in exact x100 fixed point.
    Everything the curation family computes in detail, reduced to the
    per-source manifest row.

    Scale shape: ONE pass — every stat is an algebraic or distinct
    aggregate over the same (source) key, so Catalyst plans a single
    Expand + partial aggregation exactly as profile_columns does; the
    distinct-text count is the only wide term and it shuffles hashes, not
    documents, if you pre-hash (at 100 TB swap text for its sha2 — same
    answer, 64-byte shuffle rows)."""
    docs = lt(spark, sf_dir, "documents")
    toks = F.size(F.split("text", " ")).cast("long")
    return docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.sum(toks).alias("total_tokens"),
        F.sum("n_chars").alias("total_chars"),
        (F.count("*") - F.countDistinct("text")).alias("n_exact_dup_docs"),
        F.count(F.when(F.col("n_chars") < 100, 1)).alias("n_short_docs"),
        F.expr(
            "(SUM(CAST(size(split(text, ' ')) AS BIGINT)) * 100) div COUNT(*)"
        ).alias("tokens_per_doc_x100"),
    )


_TSPLIT_CUT = "TIMESTAMP '2024-01-24 00:00:00'"

_TSPLIT_ORACLE = f"""
SELECT CASE WHEN ts < {_TSPLIT_CUT} THEN 'train' ELSE 'test' END AS split,
       COUNT(*) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(MIN(ts) AS TIMESTAMP) AS min_ts,
       CAST(MAX(ts) AS TIMESTAMP) AS max_ts,
       COALESCE(
         (SELECT MAX(ts) FROM events WHERE ts < {_TSPLIT_CUT})
           < (SELECT MIN(ts) FROM events WHERE ts >= {_TSPLIT_CUT}),
         TRUE) AS no_time_leakage
FROM events
GROUP BY 1
"""


@op("sample_temporal_split", tags=("northstar", "sampling"), oracle=_TSPLIT_ORACLE)
def sample_temporal_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based train/test split — the split hash-splitting must NOT be
    used for: forecasting-style data leaks the future into training unless
    the cut is temporal, so membership is `ts < cutoff`, and the op emits
    the leakage CONTRACT alongside the split stats: max(train ts) strictly
    below min(test ts) — hash-checked by the oracle, so a timezone bug or
    an off-by-one at the boundary fails loudly rather than silently
    training on the future. Distinct-user counts per split quantify the
    (expected, user-level) overlap a modeler must handle downstream.

    Scale shape: the split column is a narrow map on a scan-pruned
    timestamp (on a date-partitioned layout the cut IS a partition
    boundary and each split reads only its directories); stats are one
    map-combined aggregate; the two boundary scalars are min/max
    aggregates Spark serves from the same scan. Companion to
    sample_split_hash (identity hash) and sample_balanced_strata
    (stratified) — three split disciplines, each with its contract."""
    ev = lt(spark, sf_dir, "events")
    cut = F.expr(_TSPLIT_CUT)
    tagged = ev.select(
        F.when(F.col("ts") < cut, "train").otherwise("test").alias("split"),
        "ts",
        "user_id",
    )
    bounds = tagged.groupBy().agg(
        F.max(F.when(F.col("split") == "train", F.col("ts"))).alias("tr_max"),
        F.min(F.when(F.col("split") == "test", F.col("ts"))).alias("te_min"),
    )
    return (
        tagged.groupBy("split")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.min("ts").alias("min_ts"),
            F.max("ts").alias("max_ts"),
        )
        .crossJoin(F.broadcast(bounds))
        .select(
            "split",
            "n_events",
            "n_users",
            "min_ts",
            "max_ts",
            # COALESCE TRUE: with one split empty (a cutoff outside the
            # data's range — fuzz timewarp) the comparison is NULL, which
            # is both semantically wrong (an empty split vacuously cannot
            # leak) and a dtype trap: a NULL boolean reaches the driver
            # hash as None from Spark but NaN-float from DuckDB's pandas
            # bridge.
            F.coalesce(F.col("tr_max") < F.col("te_min"), F.lit(True)).alias(
                "no_time_leakage"
            ),
        )
    )


# Length-band keep thresholds over md5's first four hex chars (65536
# buckets): short docs keep 1/4 ('4000'), medium keep 1/2 ('8000'), long
# keep all. Fixed-width lowercase hex: lexicographic compare == numeric.
_IW_BANDS = (
    ("short", "n_chars < 150", "4000"),
    ("medium", "n_chars >= 150 AND n_chars < 400", "8000"),
    ("long", "n_chars >= 400", "ffff~"),  # sentinel above any 4-hex string
)

_IW_BAND_SQL = (
    "CASE WHEN n_chars < 150 THEN 'short' "
    "WHEN n_chars < 400 THEN 'medium' ELSE 'long' END"
)
_IW_THRESH_SQL = (
    "CASE WHEN n_chars < 150 THEN '4000' "
    "WHEN n_chars < 400 THEN '8000' ELSE 'ffff~' END"
)
_IW_HASH_SQL = "substr(md5('iw:' || CAST(doc_id AS VARCHAR)), 1, 4)"

_IW_ORACLE = f"""
SELECT source,
       {_IW_BAND_SQL} AS band,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN {_IW_HASH_SQL} < {_IW_THRESH_SQL} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN {_IW_HASH_SQL} < {_IW_THRESH_SQL} THEN n_chars ELSE 0 END)
            AS BIGINT) AS kept_chars
FROM documents
GROUP BY source, band
"""


@op("sample_importance_weighted", tags=("sampling", "curation"), oracle=_IW_ORACLE)
def sample_importance_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance-weighted deterministic sampling: each document's keep
    probability depends on its quality band (here length bands at this corpus's 47-558 char scale — short
    docs keep 25%, medium 50%, long 100%, the up-weight-the-good-stuff
    move every data mix applies), but membership is still a pure function
    of identity — `md5('iw:' || doc_id)` compared against the band's
    fixed-width hex threshold. Re-running the pipeline, re-partitioning,
    or retrying a task can never change which documents survive, and the
    expected rate per band is exact by construction (16384/65536 etc.).
    Emits the per-(source, band) audit: total, kept, and surviving chars.

    Scale shape: a narrow map over the corpus followed by one map-side-
    combinable rollup to |sources×3| rows — no shuffle touches full rows.
    The kept-set itself (filter on the same predicate) stays a scan-time
    filter wherever it is consumed downstream."""
    docs = lt(spark, sf_dir, "documents")
    band = (
        F.when(F.col("n_chars") < 150, "short")
        .when(F.col("n_chars") < 400, "medium")
        .otherwise("long")
    )
    thresh = (
        F.when(F.col("n_chars") < 150, "4000")
        .when(F.col("n_chars") < 400, "8000")
        .otherwise("ffff~")
    )
    h = F.substring(
        F.md5(F.concat(F.lit("iw:"), F.col("doc_id").cast("string"))), 1, 4
    )
    kept = (h < thresh).cast("long")
    return (
        docs.select("source", band.alias("band"), kept.alias("k"), "n_chars")
        .groupBy("source", "band")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("k").alias("n_kept"),
            F.sum(F.col("k") * F.col("n_chars")).alias("kept_chars"),
        )
    )


# Target mixture shares (ppm) per language for the training-mix plan; the
# budget is a fixed fraction of the observed corpus so some targets are
# fillable and some are deficit — both branches exercised.
_MIX_TARGETS = (("en", 400_000), ("zh", 200_000), ("es", 150_000),
                ("de", 150_000), ("fr", 100_000))
_MIX_BUDGET_NUM, _MIX_BUDGET_DEN = 1, 2  # budget = total_chars // 2

_MIX_ORACLE = f"""
WITH src AS (
  SELECT lang, COUNT(*) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS src_chars
  FROM documents GROUP BY lang
),
tot AS (SELECT CAST(SUM(src_chars) * {_MIX_BUDGET_NUM} // {_MIX_BUDGET_DEN}
               AS BIGINT) AS budget FROM src),
tgt AS (
  SELECT lang, CAST(target_ppm AS BIGINT) AS target_ppm
  FROM (VALUES {", ".join(f"('{l}', {p})" for l, p in _MIX_TARGETS)})
    AS t(lang, target_ppm)
),
plan AS (
  SELECT s.lang, s.n_docs, s.src_chars, t.target_ppm,
         CAST((t.target_ppm * tot.budget) // 1000000 AS BIGINT) AS want_chars
  FROM src s JOIN tgt t USING (lang) CROSS JOIN tot
)
SELECT lang, n_docs, src_chars, target_ppm, want_chars,
       CASE WHEN want_chars <= src_chars THEN want_chars ELSE src_chars END
         AS planned_chars,
       CAST(CASE WHEN want_chars <= src_chars
                 THEN (want_chars * 1000000) // src_chars
                 ELSE 1000000 END AS BIGINT) AS sample_rate_ppm,
       CAST(CASE WHEN want_chars > src_chars THEN want_chars - src_chars
                 ELSE 0 END AS BIGINT) AS deficit_chars
FROM plan
"""


@op("pipeline_mixture_plan", tags=("sampling", "curation", "pipeline"), oracle=_MIX_ORACLE)
def pipeline_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix PLANNING: given target language shares (the
    Pile/LLaMA-style mixture spec) and a token budget, compute per source
    the chars wanted, the chars actually plannable, the deterministic
    sampling rate to apply, and the DEFICIT when a language can't fill
    its target (the number you then fix with more epochs over that slice
    or a spec change — silently under-filling is the classic mixture
    bug). All arithmetic is integer floor division so the plan is exact
    and reproducible; the rates feed sample_importance_weighted-style
    hash thresholds and pipeline_interleave_mix executes the result.

    Scale shape: one combine-friendly rollup to |langs| rows, the target
    spec joins as a literal VALUES table, the budget scalar broadcasts —
    planning cost is independent of corpus size, which is the point: you
    re-plan every mix iteration without touching 100 TB."""
    docs = lt(spark, sf_dir, "documents")
    src = docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("src_chars"),
    )
    tot = src.agg(
        F.expr(
            f"CAST(SUM(src_chars) * {_MIX_BUDGET_NUM} div {_MIX_BUDGET_DEN} AS BIGINT)"
        ).alias("budget")
    )
    tgt = spark.createDataFrame(list(_MIX_TARGETS), "lang string, target_ppm long")
    plan = (
        src.join(F.broadcast(tgt), "lang")
        .crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "n_docs",
            "src_chars",
            "target_ppm",
            F.expr("CAST((target_ppm * budget) div 1000000 AS BIGINT)").alias(
                "want_chars"
            ),
        )
    )
    fill = F.col("want_chars") <= F.col("src_chars")
    return plan.select(
        "lang",
        "n_docs",
        "src_chars",
        "target_ppm",
        "want_chars",
        F.when(fill, F.col("want_chars")).otherwise(F.col("src_chars")).alias(
            "planned_chars"
        ),
        F.when(fill, F.expr("(want_chars * 1000000) div src_chars"))
        .otherwise(F.lit(1_000_000))
        .cast("long")
        .alias("sample_rate_ppm"),
        F.when(~fill, F.col("want_chars") - F.col("src_chars"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("deficit_chars"),
    )


_EPOCH_K = 5
_EPOCHS = (0, 1, 2)

_ESHUF_ORACLE = f"""
SELECT epoch, doc_id, pos FROM (
  SELECT e.epoch, d.doc_id,
         ROW_NUMBER() OVER (
           PARTITION BY e.epoch
           ORDER BY md5('ep' || CAST(e.epoch AS VARCHAR) || ':'
                        || CAST(d.doc_id AS VARCHAR)), d.doc_id) AS pos
  FROM documents d
  CROSS JOIN (SELECT UNNEST(CAST([{", ".join(map(str, _EPOCHS))}] AS BIGINT[])) AS epoch) e
) WHERE pos <= {_EPOCH_K}
"""


@op("sample_epoch_shuffle", tags=("sampling", "curation"), oracle=_ESHUF_ORACLE)
def sample_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible per-epoch corpus shuffling: epoch e's training order
    is ORDER BY md5('ep' || e || ':' || doc_id) — every epoch sees a
    different permutation (decorrelating batch composition across
    epochs), yet any worker, any retry, any re-run reconstructs the
    identical order from nothing but the epoch number — no RNG state to
    checkpoint, no shuffle files to keep. Emits the first 5 positions of
    three epochs as the pinned contract (the full order is the same
    expression un-cut).

    Scale shape: the shuffle key is a narrow map; materializing an
    epoch's order is one range-partitioned sort by (hash) — in practice
    the loader sorts each shard independently and interleaves, so no
    global sort ever runs; the top-5 here is TakeOrderedAndProject per
    epoch, not a full sort."""
    docs = lt(spark, sf_dir, "documents").select("doc_id")
    ep = spark.createDataFrame([(e,) for e in _EPOCHS], "epoch long")
    keyed = docs.crossJoin(F.broadcast(ep)).select(
        "epoch",
        "doc_id",
        F.md5(
            F.concat(
                F.lit("ep"),
                F.col("epoch").cast("string"),
                F.lit(":"),
                F.col("doc_id").cast("string"),
            )
        ).alias("h"),
    )
    ranked = keyed.select(
        "epoch",
        "doc_id",
        F.row_number()
        .over(W.partitionBy("epoch").orderBy("h", "doc_id"))
        .cast("long")  # long: match the oracle's BIGINT ROW_NUMBER
        .alias("pos"),
    )
    return ranked.where(F.col("pos") <= _EPOCH_K)
