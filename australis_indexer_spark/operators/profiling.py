"""Data-quality / observability operators: the profiling jobs a warehouse
team runs over every ingested table before trusting it downstream.

Reference parity: the reference engine's health/metrics surface
(borealis-indexer exposes stream health, not table stats) stops at
transport; these ops are the table-level profiling layer a 100 TB corpus
needs on top — schema-wide column stats in one pass, and statistical
anomaly flags over time-bucketed volumes.

Determinism: ratios and thresholds stay in integer arithmetic for as long
as possible; the single float comparison in the anomaly op is the same
IEEE expression tree on both engines (functions/det.py philosophy), so the
oracle matches exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import op
from ..sources.batch import load_table as lt

# (column, min/max representation expression — SQL, shared verbatim by both
# engines so the string rendering can't diverge)
_PROFILE_COLS = (
    ("o_orderkey", "o_orderkey"),
    ("o_custkey", "o_custkey"),
    ("o_orderstatus", "o_orderstatus"),
    ("o_orderpriority", "o_orderpriority"),
    ("o_orderdate", "CAST(o_orderdate AS DATE)"),
    ("o_totalprice", "CAST(ROUND(o_totalprice * 100.0) AS BIGINT)"),
)

_PROFILE_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS col_name, COUNT(*) AS n_rows,
       COUNT(*) - COUNT({c}) AS n_nulls,
       COUNT(DISTINCT {c}) AS n_distinct,
       CAST(MIN({repr_}) AS VARCHAR) AS min_repr,
       CAST(MAX({repr_}) AS VARCHAR) AS max_repr
FROM orders"""
    for c, repr_ in _PROFILE_COLS
)


@op("profile_columns", tags=("profiling", "agg"), oracle=_PROFILE_ORACLE)
def profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-wide column profile of the orders table in ONE scan: per
    column the row count, null count, exact distinct count, and min/max
    rendered as strings (dates as DATE, money as integer cents so the text
    form is engine-independent).

    Scale shape: all stats are algebraic or distinct aggregates — Spark
    plans the multi-column COUNT(DISTINCT) via a single Expand + partial
    aggregation (rows multiply by #columns into the map-side combine, but
    the shuffle carries only the surviving distinct values), so the table
    is read once no matter how many columns are profiled. The long-form
    pivot at the end is a zero-shuffle projection of a one-row aggregate.
    The oracle reads the table once per column instead — same answer, and
    the difference IS the point of the one-pass design.
    """
    orders = lt(spark, sf_dir, "orders")
    aggs, total = [], F.count("*").alias("n_rows")
    for c, repr_ in _PROFILE_COLS:
        aggs += [
            F.count(F.col(c)).alias(f"nn_{c}"),
            F.count_distinct(F.col(c)).alias(f"nd_{c}"),
            F.expr(f"CAST(MIN({repr_}) AS STRING)").alias(f"mn_{c}"),
            F.expr(f"CAST(MAX({repr_}) AS STRING)").alias(f"mx_{c}"),
        ]
    one = orders.agg(total, *aggs)
    stack_args = ", ".join(
        f"'{c}', n_rows - nn_{c}, nd_{c}, mn_{c}, mx_{c}" for c, _ in _PROFILE_COLS
    )
    return one.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack_args}) "
            "AS (col_name, n_nulls, n_distinct, min_repr, max_repr)"
        ),
        "n_rows",
    ).select("col_name", "n_rows", "n_nulls", "n_distinct", "min_repr", "max_repr")


# |z| > 2 test without leaving integers until the last comparison:
# z^2 = (n*H - S)^2 / (H*SS - S^2)  for hourly counts n, S=Σn, SS=Σn²,
# H=#hours — so the flag is dev² > 4·(H·SS − S²) with dev = n·H − S.
# dev and (H·SS − S²) are exact BIGINTs; only the final squares/compare run
# in DOUBLE (dev can reach ~1e10 at large SF, whose square overflows
# BIGINT) — the same IEEE ops on the same exact inputs on both engines.
_ANOM_PRED = (
    "CAST(dev AS DOUBLE) * CAST(dev AS DOUBLE) "
    "> 4.0 * CAST(h_cnt * ss - s_sum * s_sum AS DOUBLE)"
)

_ANOM_ORACLE = f"""
WITH hourly AS (
  SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start,
         COUNT(*) AS n_events
  FROM events GROUP BY 1
),
stats AS (
  SELECT CAST(SUM(n_events) AS BIGINT) AS s_sum, COUNT(*) AS h_cnt,
         CAST(SUM(n_events * n_events) AS BIGINT) AS ss
  FROM hourly
),
scored AS (
  SELECT h.hour_start, h.n_events,
         h.n_events * t.h_cnt - t.s_sum AS dev, t.h_cnt, t.s_sum, t.ss
  FROM hourly h, stats t
)
SELECT hour_start, n_events, dev,
       CASE WHEN NOT ({_ANOM_PRED}) THEN 'normal'
            WHEN dev > 0 THEN 'spike' ELSE 'drop' END AS direction
FROM scored
"""


@op("agg_anomalous_hours", tags=("profiling", "agg", "time"), oracle=_ANOM_ORACLE)
def agg_anomalous_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly detection over hourly event counts: flag hours more
    than 2 standard deviations from the mean as 'spike' or 'drop'.

    Scale shape: one partial-agg shuffle to hourly counts (|hours|-sized,
    not |events|-sized), a one-row global moment aggregate (S, SS, H)
    broadcast back over the hours, and a map-only scoring pass. The z-test
    is algebraically rearranged to integer arithmetic — dev = n·H − S and
    variance numerator H·SS − S² are exact BIGINTs — so the only floats
    are one final identical-on-both-engines comparison. No window
    functions, no global sort; this is the shape that monitors a 100 TB
    event stream's ingest volume for free alongside the hourly rollup.
    """
    ev = lt(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").cast("timestamp_ntz").alias("hour_start")
    ).agg(F.count("*").alias("n_events"))
    stats = hourly.agg(
        F.sum("n_events").alias("s_sum"),
        F.count("*").alias("h_cnt"),
        F.sum(F.col("n_events") * F.col("n_events")).alias("ss"),
    )
    scored = hourly.join(F.broadcast(stats)).withColumn(
        "dev", F.col("n_events") * F.col("h_cnt") - F.col("s_sum")
    )
    return scored.select(
        "hour_start",
        "n_events",
        "dev",
        F.expr(
            f"CASE WHEN NOT ({_ANOM_PRED}) THEN 'normal' "
            "WHEN dev > 0 THEN 'spike' ELSE 'drop' END"
        ).alias("direction"),
    )


_CONSTRAINTS_ORACLE = """
SELECT 'orders_pk_dupes' AS check_name,
       CAST(COALESCE(SUM(n - 1), 0) AS BIGINT) AS n_violations
FROM (SELECT o_orderkey, COUNT(*) AS n FROM orders GROUP BY 1 HAVING COUNT(*) > 1)
UNION ALL
SELECT 'customer_pk_dupes',
       CAST(COALESCE(SUM(n - 1), 0) AS BIGINT)
FROM (SELECT c_custkey, COUNT(*) AS n FROM customer GROUP BY 1 HAVING COUNT(*) > 1)
UNION ALL
SELECT 'lineitem_fk_orphans',
       CAST(COUNT(*) AS BIGINT)
FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
UNION ALL
SELECT 'orders_fk_orphans',
       CAST(COUNT(*) AS BIGINT)
FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
UNION ALL
SELECT 'customer_fk_orphans',
       CAST(COUNT(*) AS BIGINT)
FROM customer WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation)
UNION ALL
SELECT 'orders_null_dates',
       CAST(COUNT(*) AS BIGINT)
FROM orders WHERE o_orderdate IS NULL
"""


@op("profile_constraints", tags=("profiling", "quality"), oracle=_CONSTRAINTS_ORACLE)
def profile_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint validation sweep — the checks a warehouse runs before
    promoting a snapshot: primary-key uniqueness (excess-copy counts),
    referential integrity along the lineitem→orders→customer→nation chain
    (orphan counts via LEFT ANTI joins — NOT IN on a nullable-free key
    column, so anti-join semantics are identical), and NOT NULL on the
    partition-driving date column. One row per check; all-zero means the
    snapshot is promotable.

    Scale shape: each PK check is a map-side-combined count on the key;
    each FK orphan check is a left-anti join where the parent side's keys
    broadcast when small (nation) and shuffle on the key otherwise — the
    same plans the engine's real joins use, so constraint checking costs
    one pass per edge, not a quadratic audit. At 100 TB you run this
    per-partition-increment, not per-snapshot; the plan is unchanged."""
    orders = lt(spark, sf_dir, "orders")
    cust = lt(spark, sf_dir, "customer")
    li = lt(spark, sf_dir, "lineitem")
    nation = lt(spark, sf_dir, "nation")

    def pk_dupes(name: str, df: DataFrame, key: str) -> DataFrame:
        dup = (
            df.groupBy(key).count().where(F.col("count") > 1)
            .agg(F.coalesce(F.sum(F.col("count") - 1), F.lit(0)).alias("n_violations"))
        )
        return dup.select(F.lit(name).alias("check_name"), "n_violations")

    def fk_orphans(name: str, child: DataFrame, ckey: str, parent: DataFrame, pkey: str) -> DataFrame:
        orphans = child.join(parent.select(pkey), child[ckey] == parent[pkey], "left_anti")
        return orphans.agg(F.count("*").alias("n_violations")).select(
            F.lit(name).alias("check_name"), "n_violations"
        )

    checks = [
        pk_dupes("orders_pk_dupes", orders, "o_orderkey"),
        pk_dupes("customer_pk_dupes", cust, "c_custkey"),
        fk_orphans("lineitem_fk_orphans", li, "l_orderkey", orders, "o_orderkey"),
        fk_orphans("orders_fk_orphans", orders, "o_custkey", cust, "c_custkey"),
        fk_orphans("customer_fk_orphans", cust, "c_nationkey", nation, "n_nationkey"),
    ]
    null_dates = orders.where(F.col("o_orderdate").isNull()).agg(
        F.count("*").alias("n_violations")
    ).select(F.lit("orders_null_dates").alias("check_name"), "n_violations")
    out = checks[0]
    for c in checks[1:] + [null_dates]:
        out = out.unionAll(c)
    return out


_HIST_BINS = 12
_HIST_WIDTH_CENTS = 5_000_000  # $50k bins over [0, $600k); last bin catches the tail

_HIST_ORACLE = f"""
WITH b AS (
  SELECT LEAST(CAST(FLOOR(CAST(ROUND(o_totalprice * 100.0) AS BIGINT)
                          / {_HIST_WIDTH_CENTS}.0) AS BIGINT),
               {_HIST_BINS - 1}) AS bucket
  FROM orders
),
n AS (SELECT COUNT(*) AS total FROM orders)
SELECT bucket,
       bucket * {_HIST_WIDTH_CENTS} AS lo_cents,
       (bucket + 1) * {_HIST_WIDTH_CENTS} AS hi_cents,
       COUNT(*) AS n_orders,
       CAST((COUNT(*) * 1000000) // total AS BIGINT) AS share_ppm
FROM b CROSS JOIN n
GROUP BY bucket, total
"""


@op("agg_histogram_fixed_bins", tags=("profiling", "agg"), oracle=_HIST_ORACLE)
def agg_histogram_fixed_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order value: 12 x $50k bins (closed-form
    integer-cents bucket arithmetic — FLOOR over exact cents, top bin
    clamps the tail — rather than width_bucket, which DuckDB lacks, so both
    engines share the identical expression) with per-bin counts and
    integer-ppm shares against a one-row broadcast total.

    Scale shape: bucketing is a narrow map; the rollup map-side combines
    to <= 12 rows; the total rides a broadcast nested-loop of one row. The
    equi-DEPTH companion is window_ntile_distributed — together they cover
    both histogram families without a single global sort."""
    orders = lt(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    bucket = F.least(
        F.floor(cents / float(_HIST_WIDTH_CENTS)).cast("long"),
        F.lit(_HIST_BINS - 1),
    )
    b = orders.select(bucket.alias("bucket"))
    total = orders.agg(F.count("*").alias("total"))
    return (
        b.crossJoin(F.broadcast(total))
        .groupBy("bucket", "total")
        .agg(F.count("*").alias("n_orders"))
        .select(
            "bucket",
            (F.col("bucket") * _HIST_WIDTH_CENTS).alias("lo_cents"),
            ((F.col("bucket") + 1) * _HIST_WIDTH_CENTS).alias("hi_cents"),
            "n_orders",
            F.expr("(n_orders * 1000000) div total").alias("share_ppm"),
        )
    )
