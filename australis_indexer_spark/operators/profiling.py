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
