"""Batch scans (SURVEY.md §2.1 S6 `scan_batch`, S7 `init_config`).

The reference's bulk backfill is a 256-worker s5cmd copy from S3
(``/root/reference/.dl/mainnet/s5cmd.sh:12-15``); Spark's native parallel
object-store scan replaces it: ``spark.read.parquet`` plans one task per
~``maxPartitionBytes`` split, with Catalyst pushing filters and pruning
columns into the scan. At 100 TB the same call simply fans across executors —
no engine change.

Explicit schemas only: like the reference (compile-time ``near-primitives``
types), we never sample/infer.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: The driver's deterministic test tables (TESTDATA.md).
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

#: Attribute name of the per-session memo of the lazy scan DataFrame, keyed
#: by the file's identity (realpath + mtime + size). A DataFrame is an
#: immutable PLAN — reusing it costs nothing at execution (every action
#: still scans the parquet afresh; spark.catalog.clearCache() does not
#: invalidate plans) — but building one is ~0.1 s of driver work (py4j +
#: file listing + footer schema read), paid by EVERY operator call per
#: table. The mtime/size key drops the memo if a tool regenerates a dataset
#: in place. The memo hangs ON the session object (the fixtures.py shape)
#: so it dies exactly with the session: the r10 WeakKeyDictionary was a
#: no-op — its DataFrame values strongly reference their session
#: (df._session), keeping the weak key reachable from its own values
#: (VERDICT r10 What's-wrong #1; same caveat 7a4e8ff fixed in fixtures.py).
_MEMO_ATTR = "_aispark_scan_df_memo"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """`scan_batch`: parallel columnar scan of one table.

    Parquet supplies the schema (written by the driver); Catalyst prunes
    columns/filters at the scan, so callers should select/filter eagerly.

    ``events.ts`` is INT64 TIMESTAMP(NANOS) in the file — a type Spark does
    not support natively (PARQUET_TYPE_ILLEGAL). We read it via the
    ``nanosAsLong`` legacy flag and rebuild a TIMESTAMP_NTZ column; the data
    is µs-precision (ns % 1000 == 0 everywhere), so the conversion is
    lossless. Set here (not only in the session factory) because the driver's
    harness may hand us its own SparkSession.
    """
    memo_key = None
    try:
        st = os.stat(os.path.join(sf_dir, f"{name}.parquet"))
        memo_key = (
            os.path.realpath(os.path.join(sf_dir, f"{name}.parquet")),
            st.st_mtime_ns,
            st.st_size,
        )
        per_session = getattr(spark, _MEMO_ATTR, None)
        if per_session is None:
            per_session = {}
            setattr(spark, _MEMO_ATTR, per_session)
        cached = per_session.get(memo_key)
        if cached is not None:
            return cached
    except OSError:  # non-local path — no file identity to key on
        per_session = None
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # tz-INDEPENDENT rebuild: timestamp_micros() yields TIMESTAMP_LTZ
        # and CAST(... AS TIMESTAMP_NTZ) renders it in the SESSION timezone,
        # so on a harness-provided non-UTC session every events.ts would
        # shift by the offset (the same foreign-session hazard nanosAsLong
        # above defends against). Adding microseconds to an NTZ epoch base
        # is pure arithmetic — no timezone enters the expression.
        df = df.withColumn(
            "ts",
            F.expr(
                "timestampadd(MICROSECOND, ts div 1000, "
                "TIMESTAMP_NTZ '1970-01-01 00:00:00')"
            ),
        )
    # NOTE on layout: these tables are single-row-group parquet, so every
    # scan is one task (row groups are Spark's split unit — same constraint
    # as gzip). A blanket post-scan repartition does NOT help: its map side
    # still runs inside the single scan task, so shuffle-bound ops just pay
    # an extra full-row shuffle (measured regression). The redistribution is
    # instead applied explicitly ONLY where downstream per-row CPU dominates
    # the extra exchange (shingle hashing in operators/dedup.py, cosine
    # scoring in functions/vectors.py). At 100 TB the writer controls row
    # groups (~128 MB) and none of this applies.
    if per_session is not None:
        per_session[memo_key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """`init_config`: register every table as a temp view so operators can be
    written in either DataFrame or SQL form against one catalog (the Spark
    analog of the reference's `init` subcommand wiring config + schemas,
    borealis-indexer/src/main.rs:1252-1256)."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
