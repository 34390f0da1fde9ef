"""The relational layer (SURVEY.md §2.6).

The reference implements *no* join/aggregate/sort/window — it explicitly
positions downstream consumers to do that work ("for other services (as
consumers/subscribers)", reference README.md:4; the `message_consumer` hook
"For custom filtering purposes", borealis-consumer/src/main.rs:288-289).
This module supplies that layer as pure Catalyst built-ins: every op is a
declarative DataFrame plan — predicate pushdown, column pruning, broadcast
selection and AQE come for free.

Scale notes are inline per op; the common rules:
- dimension tables (region/nation/supplier) are broadcast explicitly;
- fact-fact joins shuffle on their join key once, AQE handles skew;
- window ops partition by a key (never a global window without a key);
- top-k uses sort+limit (Spark's TakeOrderedAndProject — no full sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.det import cents, davg, dsum, sql_davg, sql_dsum
from ..registry import op
from ..sources.batch import load_table as lt

# ---------------------------------------------------------------------------
# agg_hash — the flagship TPC-H-Q1-style pricing summary (SURVEY.md §7 Phase 1)


@op(
    "agg_hash_pricing_summary",
    tags=("relational", "aggregate", "flagship"),
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {sql_dsum('l_quantity')}                                        AS sum_qty,
       {sql_dsum('l_extendedprice')}                                   AS sum_base_price,
       {sql_dsum('l_extendedprice * (1 - l_discount)')}                AS sum_disc_price,
       {sql_dsum('(l_extendedprice * (1 - l_discount)) * (1 + l_tax)')} AS sum_charge,
       {sql_davg('l_quantity')}                                        AS avg_qty,
       {sql_davg('l_extendedprice')}                                   AS avg_price,
       {sql_davg('l_discount')}                                        AS avg_disc,
       COUNT(*)                                                        AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def agg_hash_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash aggregate with map-side partial aggregation; the filter is pushed
    to the parquet scan and only 7 of 11 columns are read (column pruning).
    At 100 TB this is one shuffle of ~6 grouped rows per partition."""
    li = lt(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "1998-09-02")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty"),
        dsum("l_extendedprice").alias("sum_base_price"),
        dsum(disc_price).alias("sum_disc_price"),
        dsum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
        davg("l_quantity").alias("avg_qty"),
        davg("l_extendedprice").alias("avg_price"),
        davg("l_discount").alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


# ---------------------------------------------------------------------------
# joins


@op(
    "join_equi_revenue_by_nation",
    tags=("relational", "join"),
    oracle=f"""
SELECT r_name AS region_name, n_name AS nation_name,
       COUNT(*) AS n_orders,
       {sql_dsum('o_totalprice')} AS revenue
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
JOIN orders ON o_custkey = c_custkey
GROUP BY r_name, n_name
""",
)
def join_equi_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema equi-join: fact(orders) ⋈ dims. nation/region (25/5 rows)
    and customer (small vs orders) are broadcast — zero shuffle for the join
    itself at any scale; the only shuffle is the final group-by."""
    cust = lt(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = lt(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    reg = lt(spark, sf_dir, "region").select("r_regionkey", "r_name")
    orders = lt(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    dim = cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey).join(
        F.broadcast(reg), nat.n_regionkey == reg.r_regionkey
    )
    return (
        orders.join(F.broadcast(dim), orders.o_custkey == dim.c_custkey)
        .groupBy(F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name"))
        .agg(
            # each order row joins exactly one customer, so COUNT(*) counts
            # orders without the Expand + second exchange a COUNT(DISTINCT pk)
            # would plan (countDistinct is demonstrated in agg_distinct_*)
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("revenue"),
        )
    )


@op(
    "join_semi_customers_with_urgent_orders",
    tags=("relational", "join"),
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
""",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (EXISTS): emits each customer at most once; Spark
    builds only the distinct key set of the right side."""
    cust = lt(spark, sf_dir, "customer").select("c_custkey", "c_name")
    urgent = lt(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_semi")


@op(
    "join_anti_customers_without_orders",
    tags=("relational", "join"),
    oracle="""
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                        WHERE o_orderpriority = '1-URGENT' AND o_custkey IS NOT NULL)
""",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (NOT EXISTS) — receipts-without-outcomes pattern from
    SURVEY.md §2.6 mapped onto customers-without-urgent-orders."""
    cust = lt(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_mktsegment")
    orders = lt(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_custkey")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")


@op(
    "join_asof_purchase_attribution",
    tags=("relational", "join", "asof"),
    oracle="""
WITH tagged AS (
  SELECT user_id, ts, event_id, 0 AS kind, event_id AS click_id, ts AS click_ts
  FROM events WHERE event_type = 'click'
  UNION ALL
  SELECT user_id, ts, event_id, 1 AS kind, NULL AS click_id, NULL AS click_ts
  FROM events WHERE event_type = 'purchase'
),
attributed AS (
  SELECT user_id, ts, event_id, kind,
         LAST_VALUE(click_id IGNORE NULLS) OVER w AS attributed_click_id,
         LAST_VALUE(click_ts IGNORE NULLS) OVER w AS attributed_click_ts
  FROM tagged
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, kind, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_id AS purchase_id, user_id, ts AS purchase_ts,
       attributed_click_id, attributed_click_ts
FROM attributed WHERE kind = 1
""",
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join: attribute each purchase to the user's most recent click at
    or before it. This is the reference's one non-trivial query semantic —
    execution outcomes land in a LATER block than their transaction
    (borealis-indexer/src/main.rs:121-125) — expressed as the classic
    union-and-last-non-null plan: ONE shuffle on user_id, no range explosion,
    linear state. Scales to 100 TB where a naive range join would not.

    r11: the click/purchase tagging is ONE scan with CASE projections
    instead of a union of two filtered scans — the disjoint filters read
    the same columns of the same table twice for rows a single
    `event_type IN (click, purchase)` pass produces identically (kind and
    the click_* columns become WHEN-click expressions; a purchase row gets
    the same NULLs the union branch emitted). At 100 TB that is one corpus
    pass instead of two feeding the same exchange (guide §2.4 — the plan's
    two Scan nodes become one). Interleaved A/B at sf0.1 (9 reps): min
    0.374 → 0.297 s, median 0.457 → 0.360 s, rows identical (20 084);
    oracle exact at sf0.001/0.01/0.1."""
    ev = lt(spark, sf_dir, "events")
    is_click = F.col("event_type") == "click"
    tagged = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "user_id", "ts", "event_id",
        F.when(is_click, 0).otherwise(1).alias("kind"),
        F.when(is_click, F.col("event_id")).cast("long").alias("click_id"),
        F.when(is_click, F.col("ts")).cast("timestamp_ntz").alias("click_ts"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        tagged.withColumn("attributed_click_id", F.last("click_id", ignorenulls=True).over(w))
        .withColumn("attributed_click_ts", F.last("click_ts", ignorenulls=True).over(w))
        .filter(F.col("kind") == 1)
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
            "attributed_click_id",
            "attributed_click_ts",
        )
    )


@op(
    "join_range_ship_lag",
    tags=("relational", "join"),
    oracle="""
SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
       COUNT(*) AS n_late_lines
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
GROUP BY 1
""",
)
def join_range_ship_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-join with a range residual (shipped >60 days after order):
    Catalyst keeps the equi key for the shuffle and applies the range
    predicate post-join — no cross product."""
    li = lt(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    orders = lt(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY"))
        .groupBy(F.date_trunc("month", "o_orderdate").cast("timestamp_ntz").alias("order_month"))
        .agg(F.count("*").alias("n_late_lines"))
    )


# ---------------------------------------------------------------------------
# aggregates beyond plain hash


@op(
    "agg_distinct_active_users",
    tags=("relational", "aggregate"),
    oracle=f"""
SELECT event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       {sql_dsum('value')} AS total_value
FROM events
GROUP BY event_type
""",
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct (expands to a two-phase aggregate in Spark — partial
    dedup map-side, exact count reduce-side)."""
    return (
        lt(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            dsum("value").alias("total_value"),
        )
    )


@op(
    "agg_approx_distinct_users",
    tags=("relational", "aggregate", "approx"),
    # The sketch estimate itself is engine-specific, so the op emits the
    # *oracle-reproducible* facts: the exact count, and whether the sketch
    # landed within tolerance. DuckDB asserts the exact count and TRUE —
    # a hash match therefore proves Spark's HLL++ estimate was in-bound.
    oracle="""
SELECT event_type,
       COUNT(DISTINCT user_id) AS exact_users,
       TRUE AS approx_within_5pct
FROM events
GROUP BY event_type
""",
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++, rsd=1%) — the 100 TB path for
    cardinality where exact distinct would shuffle every key. Output pairs
    the exact count with an in-tolerance flag for the estimate (both
    deterministic: fixed data, fixed HLL hash), so the oracle hash-checks
    the approximation instead of skipping it."""
    return (
        lt(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact_users"),
            F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"),
        )
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                <= 0.05 * F.col("exact_users")
            ).alias("approx_within_5pct"),
        )
    )


@op(
    "agg_rollup_sales",
    tags=("relational", "aggregate"),
    oracle=f"""
SELECT r_name AS region_name, n_name AS nation_name,
       COUNT(*) AS n_customers, {sql_dsum('c_acctbal')} AS total_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
""",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (region → nation → grand total); NULL marks the
    rolled-up levels identically in Spark and DuckDB."""
    cust = lt(spark, sf_dir, "customer").select("c_custkey", "c_nationkey", "c_acctbal")
    nat = lt(spark, sf_dir, "nation")
    reg = lt(spark, sf_dir, "region")
    joined = cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey).join(
        F.broadcast(reg), nat.n_regionkey == reg.r_regionkey
    )
    return (
        joined.rollup(F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name"))
        .agg(F.count("*").alias("n_customers"), dsum("c_acctbal").alias("total_acctbal"))
    )


@op(
    "agg_cube_order_status",
    tags=("relational", "aggregate"),
    oracle=f"""
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n_orders, {sql_dsum('o_totalprice')} AS total_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over status × priority (all 4 grouping sets in one shuffle)."""
    return (
        lt(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice").alias("total_price"))
    )


@op(
    "agg_pivot_returnflag",
    tags=("relational", "aggregate"),
    oracle="""
SELECT l_returnflag,
       (SUM(CAST(ROUND((l_quantity) * 100) AS BIGINT)) FILTER (WHERE l_linestatus = 'O') / 100.0) AS qty_O,
       (SUM(CAST(ROUND((l_quantity) * 100) AS BIGINT)) FILTER (WHERE l_linestatus = 'F') / 100.0) AS qty_F
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT expressed as conditional aggregation (same plan Spark's
    .pivot() produces with explicit values — one pass, no extra shuffle)."""
    li = lt(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        dsum(F.when(F.col("l_linestatus") == "O", F.col("l_quantity"))).alias("qty_O"),
        dsum(F.when(F.col("l_linestatus") == "F", F.col("l_quantity"))).alias("qty_F"),
    )


# ---------------------------------------------------------------------------
# window functions


@op(
    "window_rank_top_customers",
    tags=("relational", "window"),
    oracle=f"""
WITH spend AS (
  SELECT n_name AS nation_name, c_custkey, c_name,
         {sql_dsum('o_totalprice')} AS spend
  FROM customer
  JOIN nation ON c_nationkey = n_nationkey
  JOIN orders ON o_custkey = c_custkey
  GROUP BY n_name, c_custkey, c_name
)
SELECT nation_name, c_custkey, c_name, spend, rnk FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY nation_name
                               ORDER BY spend DESC, c_custkey) AS rnk
  FROM spend
) WHERE rnk <= 3
""",
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers by spend per nation: ranking window over a pre-
    aggregated frame (ties broken by key for determinism). The window
    partitions by nation — parallel across partitions, no global sort.

    r11 (guide §2.3 "aggregate before you shuffle"): spend aggregates by
    o_custkey ALONE before the dimension joins — c_custkey is the customer
    PK, so the (nation, custkey, name) groups of the oracle are exactly
    the custkey groups, and attaching names/nations to the ~|customers|
    aggregate rows replaces a broadcast probe per ORDER row with one per
    customer (and the agg's exchange carries (custkey, cents) instead of
    two strings per row; the window's nation exchange is unchanged —
    collapsing it into the agg exchange would cap parallelism at 25
    nations, the §2.5 trap). Orders with no matching customer are dropped
    by the inner join in both shapes. Interleaved A/B at sf0.1 (9 reps):
    min 0.472 → 0.325 s, median 0.662 → 0.479 s, rows identical; oracle
    exact at sf0.001/0.01/0.1."""
    cust = lt(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    nat = lt(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = lt(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    per_cust = orders.groupBy("o_custkey").agg(dsum("o_totalprice").alias("spend"))
    spend = (
        per_cust.join(F.broadcast(cust), per_cust.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .select(F.col("n_name").alias("nation_name"), "c_custkey", "c_name", "spend")
    )
    w = W.partitionBy("nation_name").orderBy(F.col("spend").desc(), F.col("c_custkey"))
    return spend.withColumn(
        "rnk", F.row_number().over(w).cast("long")  # long: oracle BIGINT ROW_NUMBER
    ).filter(F.col("rnk") <= 3)


@op(
    "window_frame_running_spend",
    tags=("relational", "window"),
    oracle="""
SELECT o_custkey, o_orderkey, o_orderdate,
       (SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
          OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0)
         AS running_spend
FROM orders
""",
)
def window_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per customer (frame aggregate) — the 'running supply'
    pattern from SURVEY.md §2.6, in exact cents for cross-engine equality."""
    from ..functions.det import cents

    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        lt(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .withColumn("running_spend", F.sum(cents("o_totalprice")).over(w) / F.lit(100.0))
        .drop("o_totalprice")
    )


@op(
    "window_lag_order_gap",
    tags=("relational", "window"),
    oracle="""
SELECT o_custkey, o_orderkey,
       date_diff('day',
                 LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderdate, o_orderkey),
                 o_orderdate) AS days_since_prev
FROM orders
""",
)
def window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG: days between a customer's consecutive orders (NULL for first)."""
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        lt(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", "o_orderdate")
        .withColumn(
            "days_since_prev",
            F.datediff(
                F.col("o_orderdate"), F.lag("o_orderdate").over(w)
            ).cast("long"),  # oracle date subtraction is BIGINT
        )
        .drop("o_orderdate")
        .select("o_custkey", "o_orderkey", "days_since_prev")
    )


# ---------------------------------------------------------------------------
# sort / top-k / set ops


@op(
    "sort_topk_orders",
    tags=("relational", "sort"),
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
""",
)
def sort_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT compiles to TakeOrderedAndProject: each task keeps a
    k-row heap; no global sort materialization — O(n) at 100 TB."""
    return (
        lt(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(10)
    )


_H1 = "SELECT DISTINCT o_custkey FROM orders WHERE o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'"
_H2 = "SELECT DISTINCT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'"


def _halves(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    orders = lt(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    before = orders.filter(F.col("o_orderdate") < "1998-01-01").select("o_custkey").distinct()
    after = orders.filter(F.col("o_orderdate") >= "1998-01-01").select("o_custkey").distinct()
    return before, after


@op("set_union_buyers", tags=("relational", "setop"),
    oracle=f"({_H1}) UNION ({_H2})")
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of the two period buyer sets."""
    before, after = _halves(spark, sf_dir)
    return before.union(after).distinct()


@op("set_intersect_repeat_buyers", tags=("relational", "setop"),
    oracle=f"({_H1}) INTERSECT ({_H2})")
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: customers who bought in both periods."""
    before, after = _halves(spark, sf_dir)
    return before.intersect(after)


@op("set_except_churned_buyers", tags=("relational", "setop"),
    oracle=f"({_H1}) EXCEPT ({_H2})")
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: customers who bought before 1998 but not after."""
    before, after = _halves(spark, sf_dir)
    return before.exceptAll(after).distinct()


# ---------------------------------------------------------------------------
# time windows (batch twins of the streaming ops)


@op(
    "window_time_hourly_events",
    tags=("relational", "window", "time"),
    oracle=f"""
SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start, event_type,
       COUNT(*) AS n_events, {sql_dsum('value')} AS total_value
FROM events
GROUP BY 1, 2
""",
)
def window_time_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time window (batch form of T2/window_time;
    the streaming twin lives in streaming.pipeline)."""
    ev = lt(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", "ts").cast("timestamp_ntz").alias("hour_start"),
            "event_type",
        )
        .agg(F.count("*").alias("n_events"), dsum("value").alias("total_value"))
    )


@op(
    "window_session_user",
    tags=("relational", "window", "time"),
    oracle="""
WITH ordered AS (
  SELECT user_id, ts, event_id,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS is_new_session
  FROM events
),
sessions AS (
  SELECT user_id, ts, event_id,
         SUM(is_new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_no
  FROM ordered
)
SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
       MIN(ts) AS session_start, MAX(ts) AS session_end,
       COUNT(*) AS n_events
FROM sessions GROUP BY user_id, session_no
""",
)
def window_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (30-min inactivity gap) via gaps-and-islands — one
    shuffle on user_id; equivalent to Spark's session_window but expressed
    portably so the oracle matches row-for-row."""
    ev = lt(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    prev = F.lag("ts").over(w)
    new_sess = F.when(
        prev.isNull() | ((F.col("ts") - prev) > F.expr("INTERVAL 30 MINUTE")), 1
    ).otherwise(0)
    return (
        ev.withColumn("is_new_session", new_sess)
        .withColumn("session_no", F.sum("is_new_session").over(wrun))
        .groupBy("user_id", "session_no")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
        )
    )


# ---------------------------------------------------------------------------
# scalar function surface


@op(
    "scalar_funcs_showcase",
    tags=("relational", "scalar"),
    oracle="""
SELECT p_partkey,
       UPPER(p_brand) AS brand_upper,
       SUBSTR(p_name, 1, 8) AS name_prefix,
       CAST(LENGTH(p_name) AS BIGINT) AS name_len,
       ((CAST(ROUND(p_retailprice * 100.0) AS BIGINT) * 110 + 50) // 100)
         / 100.0 AS price_with_tax,
       ABS(p_size - 25) AS size_dev,
       CASE WHEN p_size >= 25 THEN 'large' ELSE 'small' END AS size_class,
       CONCAT(p_brand, ':', p_type) AS brand_type
FROM part
""",
)
def scalar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/math/conditional scalar functions — all JVM-side codegen'd
    built-ins (pyspark.sql.functions), zero Python in the row path.

    price_with_tax follows the det.py integer-cents convention: exact
    cents * 110, half-up integer division back to cents, one final /100.
    The r3 form ROUND(p * 1.1, 2) rounded a DOUBLE — every cents value
    ending in 5 makes p*1.1 a .xx5 boundary where Spark's BigDecimal
    HALF_UP and DuckDB's double rounding can disagree by one cent (found
    by the ties fuzz profile, whose 12-value price pool amplified one
    boundary case into 18 rows)."""
    p = lt(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").cast("long").alias("name_len"),
        # floor-form cents (det.cents proof): same BIGINT as ROUND without
        # the per-row BigDecimal; Spark-side text only (the oracle keeps
        # ROUND — DuckDB executes that text)
        F.expr(
            "((CASE WHEN p_retailprice >= 0"
            " THEN FLOOR(p_retailprice * 100.0 + 0.5D)"
            " ELSE -FLOOR(0.5D - p_retailprice * 100.0) END) * 110 + 50)"
            " div 100 / CAST(100 AS DOUBLE)"
        ).alias("price_with_tax"),
        F.abs(F.col("p_size") - 25).alias("size_dev"),
        F.when(F.col("p_size") >= 25, "large").otherwise("small").alias("size_class"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
    )


@op(
    "window_time_sliding_events",
    tags=("relational", "window", "time"),
    oracle=f"""
WITH starts AS (
  SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS win_start, event_type, value FROM events
  UNION ALL
  SELECT CAST(date_trunc('hour', ts - INTERVAL 30 MINUTE) + INTERVAL 30 MINUTE AS TIMESTAMP)
         AS win_start, event_type, value
  FROM events
)
SELECT win_start, event_type,
       COUNT(*) AS n_events, {sql_dsum('value')} AS total_value
FROM starts
GROUP BY 1, 2
""",
)
def window_time_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window: 1-hour length, 30-minute slide — every event lands in
    exactly two windows (Spark's `window(ts, '1 hour', '30 minutes')`
    replicates rows before the aggregation; the oracle builds the same two
    window-starts explicitly). Same one-shuffle plan as the tumbling form,
    with a 2x replication factor paid map-side."""
    ev = lt(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type"
        )
        .agg(F.count("*").alias("n_events"), dsum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("win_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@op(
    "window_value_functions",
    tags=("relational", "window"),
    oracle="""
SELECT o_custkey, o_orderkey,
       FIRST_VALUE(o_orderkey) OVER w AS first_orderkey,
       LAST_VALUE(o_orderkey) OVER
         (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         AS last_orderkey,
       NTH_VALUE(o_orderkey, 2) OVER
         (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         AS second_orderkey,
       date_diff('day', o_orderdate,
                 LEAD(o_orderdate) OVER w) AS days_to_next
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
)
def window_value_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window VALUE functions in one pass over each customer's order
    history: FIRST_VALUE (their first order), LAST_VALUE and NTH_VALUE(2)
    over the explicit unbounded ROWS frame (the default frame stops at the
    current row — the classic LAST_VALUE trap), and LEAD for days until
    the next order (NULL on the latest). Completes the window surface next
    to ranking (row_number/ntile/percent_rank), frames (running sums), and
    LAG. One shuffle on o_custkey serves all four functions — Catalyst
    collapses same-spec windows into a single Window node; ordering ties
    are broken by the unique order key."""
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return (
        lt(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", "o_orderdate")
        .select(
            "o_custkey",
            "o_orderkey",
            F.first("o_orderkey").over(w).alias("first_orderkey"),
            F.last("o_orderkey").over(wfull).alias("last_orderkey"),
            F.nth_value("o_orderkey", 2).over(wfull).alias("second_orderkey"),
            F.datediff(
                F.lead("o_orderdate").over(w), F.col("o_orderdate")
            ).cast("long").alias("days_to_next"),  # oracle BIGINT
        )
    )


_SHARE_ORACLE = """
WITH sup AS (
  SELECT s_nationkey, s_suppkey,
         CAST(ROUND(s_acctbal * 100.0) AS BIGINT) AS bal_cents
  FROM supplier WHERE s_acctbal > 0.0
)
SELECT s_nationkey, s_suppkey, bal_cents,
       CAST((bal_cents * 1000000)
            // CAST(SUM(bal_cents) OVER (PARTITION BY s_nationkey) AS BIGINT)
            AS BIGINT) AS share_ppm,
       RANK() OVER (PARTITION BY s_nationkey
                    ORDER BY bal_cents DESC, s_suppkey) AS bal_rank
FROM sup
"""


@op("window_share_of_total", tags=("relational", "window"), oracle=_SHARE_ORACLE)
def window_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each supplier's share of its nation's positive
    account-balance pool, plus the within-nation rank — the proportional-
    allocation shape behind market-share and budget-attribution reports.
    One partition-total window and one rank window share the same nation
    key, so Catalyst plans them behind a SINGLE exchange; shares are
    integer ppm by exact floor division (numerator scaled before dividing,
    so no float ratio exists to drift between engines). Positive-balance
    filter keeps the denominator sign-stable."""
    sup = (
        lt(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") > 0.0)
        .select(
            "s_nationkey",
            "s_suppkey",
            cents(F.col("s_acctbal")).alias("bal_cents"),
        )
    )
    wt = W.partitionBy("s_nationkey")
    wr = W.partitionBy("s_nationkey").orderBy(F.col("bal_cents").desc(), "s_suppkey")
    return sup.select(
        "s_nationkey",
        "s_suppkey",
        "bal_cents",
        F.expr(
            "(bal_cents * 1000000) div SUM(bal_cents)"
            " OVER (PARTITION BY s_nationkey)"
        ).alias("share_ppm"),
        F.rank().over(wr).cast("long").alias("bal_rank"),  # oracle BIGINT RANK
    )


_ARGMAX_ORACLE = """
WITH m AS (
  SELECT o_custkey,
         MAX(struct_pack(
           d := o_orderdate,
           k := o_orderkey,
           c := CAST(ROUND(o_totalprice * 100.0) AS BIGINT))) AS top
  FROM orders GROUP BY o_custkey
)
SELECT o_custkey,
       CAST(top.d AS TIMESTAMP) AS last_orderdate,
       top.k AS last_orderkey,
       top.c AS last_cents
FROM m
"""


@op("agg_argmax_latest_order", tags=("relational", "agg"), oracle=_ARGMAX_ORACLE)
def agg_argmax_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group argmax WITHOUT a window: each customer's latest order
    (date, key, exact cents) via ONE struct-MAX aggregate — structs compare
    lexicographically in both engines, so putting (date, unique key) first
    makes the MAX a deterministic argmax that combines map-side like any
    MAX. The window formulation (row_number + filter) shuffles every row
    to its key partition and sorts; this plan reduces each partition to
    |keys| structs BEFORE the shuffle — the same idempotent merge that
    powers stream_cdc_upsert's state fold, registered here as the batch
    primitive. Oracle uses DuckDB's named-struct MAX, field-for-field."""
    orders = lt(spark, sf_dir, "orders")
    m = orders.groupBy("o_custkey").agg(
        F.max(
            F.struct(
                F.col("o_orderdate").alias("d"),
                F.col("o_orderkey").alias("k"),
                cents(F.col("o_totalprice")).alias("c"),
            )
        ).alias("top")
    )
    return m.select(
        "o_custkey",
        F.col("top.d").cast("timestamp_ntz").alias("last_orderdate"),
        F.col("top.k").alias("last_orderkey"),
        F.col("top.c").alias("last_cents"),
    )


_UNPIVOT_ORACLE = """
SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n_orders
FROM orders
GROUP BY o_orderpriority, o_orderstatus
"""


@op("agg_unpivot_roundtrip", tags=("relational", "agg"), oracle=_UNPIVOT_ORACLE)
def agg_unpivot_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT → UNPIVOT round trip: order counts pivoted wide by status
    (one column per status), then melted back to long form with `stack`,
    zero-count cells dropped — proving the wide report format and the long
    analytic format carry identical information. The pivot is one shuffle
    on the row key with map-side partials per status; the unpivot is a
    zero-shuffle projection (stack multiplies rows inside the task). The
    oracle is the direct GROUP BY — a hash match proves the round trip is
    lossless."""
    orders = lt(spark, sf_dir, "orders")
    statuses = sorted(
        r["o_orderstatus"]
        for r in orders.select("o_orderstatus").distinct().collect()
    )
    wide = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", statuses)
        .agg(F.count(F.lit(1)))
    )
    stack_args = ", ".join(f"'{s}', `{s}`" for s in statuses)
    return (
        wide.select(
            "o_orderpriority",
            F.expr(
                f"stack({len(statuses)}, {stack_args}) AS (o_orderstatus, n_orders)"
            ),
        )
        .where(F.col("n_orders").isNotNull())
        .select("o_orderpriority", "o_orderstatus", "n_orders")
    )


_DEGREE_ORACLE = """
WITH deg AS (
  SELECT l_suppkey, COUNT(DISTINCT l_partkey) AS degree
  FROM lineitem GROUP BY l_suppkey
)
SELECT degree, COUNT(*) AS n_suppliers,
       CAST(SUM(degree) AS BIGINT) AS total_edges_at_degree
FROM deg GROUP BY degree
"""


@op("stats_degree_distribution", tags=("profiling", "graph"), oracle=_DEGREE_ORACLE)
def stats_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the supplier–part bipartite graph (how many
    distinct parts each supplier ships): the first profile you compute
    before any graph algorithm, because it reveals the hubs that make the
    edge list skew-join-hostile (the graph analog of stats_join_key_skew,
    and what dedup_cluster_components' propagation cost depends on).
    Distribution-of-a-distribution: one distinct-count per node, then one
    tiny rollup by degree — both map-side combined; nothing is ever
    quadratic in edges."""
    li = lt(spark, sf_dir, "lineitem")
    deg = li.groupBy("l_suppkey").agg(
        F.countDistinct("l_partkey").alias("degree")
    )
    return deg.groupBy("degree").agg(
        F.count("*").alias("n_suppliers"),
        F.sum("degree").alias("total_edges_at_degree"),
    )


_WAVG_ORACLE = """
SELECT l_returnflag,
       CAST(SUM(CAST(l_quantity AS BIGINT)
                * CAST(ROUND(l_extendedprice * 100.0) AS BIGINT)) AS BIGINT)
         AS wsum_cents,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS wtotal,
       (CAST(SUM(CAST(l_quantity AS BIGINT)
                 * CAST(ROUND(l_extendedprice * 100.0) AS BIGINT)) AS BIGINT)
        / (100.0 * CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)))
         AS weighted_avg_price
FROM lineitem
GROUP BY l_returnflag
"""


@op("agg_weighted_average_exact", tags=("relational", "agg"), oracle=_WAVG_ORACLE)
def agg_weighted_average_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted mean price per return flag with EXACT integer
    accumulation: numerator = Σ qty·cents and denominator = Σ qty are both
    BIGINTs (quantities are whole numbers in this schema), so the only
    float operation is the single final division — the same IEEE op on the
    same two exact integers in both engines. The naive SUM(qty*price)/
    SUM(qty) on doubles is order-dependent and breaks cross-engine
    bit-equality; this op is the det.py convention generalized from plain
    sums to weighted means. Map-side combine all the way."""
    li = lt(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("long")
    cents_c = cents(F.col("l_extendedprice"))
    return li.groupBy("l_returnflag").agg(
        F.sum(qty * cents_c).alias("wsum_cents"),
        F.sum(qty).alias("wtotal"),
        (F.sum(qty * cents_c) / (F.lit(100.0) * F.sum(qty))).alias(
            "weighted_avg_price"
        ),
    )


_LISTAGG_ORACLE = """
SELECT s_nationkey,
       COUNT(*) AS n_suppliers,
       string_agg(s_name, ','
                  ORDER BY CAST(ROUND(s_acctbal * 100.0) AS BIGINT) DESC, s_name)
         AS suppliers_by_balance
FROM supplier
GROUP BY s_nationkey
"""


@op("agg_listagg_ordered", tags=("relational", "agg"), oracle=_LISTAGG_ORACLE)
def agg_listagg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-set aggregation (LISTAGG / string_agg ... ORDER BY): each
    nation's supplier names comma-joined in (balance DESC, name) order.
    Spark has no ordered string_agg, so the op builds it from primitives
    that DO combine map-side: collect_list of (sort-key, name) structs,
    array_sort (lexicographic struct order — the negated cents puts high
    balances first, name breaks ties), transform to names, array_join.
    The oracle is DuckDB's native ordered string_agg — two different
    mechanisms, identical string, which is what makes the ordering
    contract real. Lists are per-group bounded (suppliers per nation);
    for unbounded groups you'd cap with slice() as text_inverted_index
    does."""
    sup = lt(spark, sf_dir, "supplier").select(
        "s_nationkey",
        "s_name",
        (-cents(F.col("s_acctbal"))).alias("neg_cents"),
    )
    return sup.groupBy("s_nationkey").agg(
        F.count("*").alias("n_suppliers"),
        F.expr(
            "array_join(transform(array_sort(collect_list(struct(neg_cents, s_name))),"
            " x -> x.s_name), ',')"
        ).alias("suppliers_by_balance"),
    )


_NULLSEM_ORACLE = """
WITH d AS (
  SELECT o_orderkey,
         NULLIF(o_orderstatus, 'O') AS maybe_status,
         o_orderpriority
  FROM orders WHERE o_orderkey < 200
)
SELECT o_orderkey, maybe_status,
       COALESCE(maybe_status, '<open>') AS status_filled,
       (maybe_status IS NOT DISTINCT FROM 'F') AS is_f_nullsafe,
       ROW_NUMBER() OVER (ORDER BY maybe_status ASC NULLS LAST, o_orderkey)
         AS rn_nulls_last
FROM d
"""


@op("scalar_null_semantics", tags=("relational", "scalar"), oracle=_NULLSEM_ORACLE)
def scalar_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-semantics contract surface: a derived nullable column (NULLIF)
    exercised through COALESCE, null-safe equality (Spark `<=>` == SQL
    IS NOT DISTINCT FROM), and — the cross-engine trap this op exists to
    pin — EXPLICIT null ordering in a ranking window. Spark sorts nulls
    FIRST ascending by default, DuckDB sorts them LAST: any ORDER BY on a
    nullable key that doesn't spell NULLS FIRST/LAST is silently
    engine-dependent, so the engine convention is to always spell it (as
    every tie-broken LIMIT in this repo does for uniqueness). The window
    here is bounded by the key filter; the point is the semantics, not
    the plan."""
    d = (
        lt(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") < 200)
        .select(
            "o_orderkey",
            F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("maybe_status"),
            "o_orderpriority",
        )
    )
    w = W.orderBy(F.col("maybe_status").asc_nulls_last(), "o_orderkey")
    return d.select(
        "o_orderkey",
        "maybe_status",
        F.coalesce("maybe_status", F.lit("<open>")).alias("status_filled"),
        F.col("maybe_status").eqNullSafe(F.lit("F")).alias("is_f_nullsafe"),
        F.row_number().over(w).cast("long").alias("rn_nulls_last"),  # oracle BIGINT
    )


_REBUY_ORACLE = """
SELECT a.o_custkey AS custkey,
       a.o_orderkey AS first_order,
       b.o_orderkey AS repeat_order,
       CAST(date_diff('day', a.o_orderdate, b.o_orderdate) AS BIGINT)
         AS gap_days
FROM orders a
JOIN orders b
  ON a.o_custkey = b.o_custkey
 AND a.o_orderkey < b.o_orderkey
 AND b.o_orderdate >= a.o_orderdate
 AND b.o_orderdate <= a.o_orderdate + INTERVAL 7 DAY
"""


@op("join_self_temporal_overlap", tags=("relational", "join", "temporal", "scale"), oracle=_REBUY_ORACLE)
def join_self_temporal_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quick-rebuy detection — ordered order pairs from the same customer
    placed within 7 days — as a BANDED interval self-join instead of the
    O(per-key²) date-range self-join: each order lands in its epoch-week
    bucket, candidates come from joining (same customer, same-or-adjacent
    week), and the exact 7-day predicate prunes them. A 7-day window
    always fits in two consecutive week buckets, so the banding provably
    misses nothing (the temporal analog of the phash/fuzzy band
    pigeonhole). At 100 TB the join key is (custkey, week) — time-bounded
    bucket fan-out of 2, no per-customer quadratic blowup even for
    customers with thousands of orders spread over years; per-bucket
    density is what bounds the work, exactly as in join_range_ship_lag.

    gap_days is an exact integer date diff; the (a < b on the unique key,
    dates ordered) condition keeps pairs canonical. Oracle is the direct
    range self-join — identical pairs from a different plan."""
    orders = lt(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.floor(F.unix_date(F.to_date("o_orderdate")) / 7).alias("wk"),
    )
    a = orders.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("ka"),
        F.col("o_orderdate").alias("da"),
        F.col("wk").alias("wa"),
    )
    b_side = orders.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("kb"),
        F.col("o_orderdate").alias("db"),
        # the later order registers under its own AND the previous week
        # bucket: the earlier side's week is either the same or one
        # less, so one equi-join with fan-out exactly 2 sees every pair
        F.explode(F.array(F.col("wk"), F.col("wk") - 1)).alias("wa"),
    )
    cand = a.join(b_side, ["custkey", "wa"])
    return (
        cand.where(
            (F.col("ka") < F.col("kb"))
            & (F.col("db") >= F.col("da"))
            & (F.col("db") <= F.col("da") + F.expr("INTERVAL 7 DAY"))
        )
        .select(
            "custkey",
            F.col("ka").alias("first_order"),
            F.col("kb").alias("repeat_order"),
            F.datediff(F.to_date("db"), F.to_date("da"))
            .cast("long")
            .alias("gap_days"),
        )
        .distinct()
    )


_NEAREST_TOL_US = 3_600_000_000  # ±1 hour

_NEAREST_ORACLE = f"""
WITH tagged AS (
  SELECT user_id, ts, event_id, 0 AS kind,
         CAST(epoch_us(ts) AS BIGINT) AS ts_us,
         event_id AS cand_id
  FROM events WHERE event_type = 'purchase'
  UNION ALL
  SELECT user_id, ts, event_id, 1 AS kind,
         CAST(epoch_us(ts) AS BIGINT) AS ts_us,
         NULL AS cand_id
  FROM events WHERE event_type = 'error'
),
walked AS (
  SELECT user_id, ts, event_id, kind, ts_us,
         LAST_VALUE(cand_id IGNORE NULLS) OVER w_fwd AS prev_id,
         LAST_VALUE(CASE WHEN kind = 0 THEN ts_us END IGNORE NULLS) OVER w_fwd AS prev_us,
         FIRST_VALUE(cand_id IGNORE NULLS) OVER w_rev AS next_id,
         FIRST_VALUE(CASE WHEN kind = 0 THEN ts_us END IGNORE NULLS) OVER w_rev AS next_us
  FROM tagged
  WINDOW
    w_fwd AS (PARTITION BY user_id ORDER BY ts_us, kind, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    w_rev AS (PARTITION BY user_id ORDER BY ts_us, kind, event_id
              ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
),
picked AS (
  SELECT user_id, event_id AS error_id, ts AS error_ts,
         CASE
           WHEN prev_id IS NOT NULL AND (ts_us - prev_us) <= {_NEAREST_TOL_US}
                AND (next_id IS NULL OR (ts_us - prev_us) <= (next_us - ts_us)
                     OR (next_us - ts_us) > {_NEAREST_TOL_US})
             THEN 'prev'
           WHEN next_id IS NOT NULL AND (next_us - ts_us) <= {_NEAREST_TOL_US}
             THEN 'next'
           ELSE 'none' END AS direction,
         prev_id, prev_us, next_id, next_us, ts_us
  FROM walked WHERE kind = 1
)
SELECT error_id, user_id, error_ts, direction,
       COALESCE(CASE WHEN direction = 'prev' THEN prev_id
                     WHEN direction = 'next' THEN next_id END, -1)
         AS matched_purchase_id,
       COALESCE(CASE WHEN direction = 'prev' THEN ts_us - prev_us
                     WHEN direction = 'next' THEN next_us - ts_us END, -1)
         AS dist_us
FROM picked
"""


@op("join_asof_nearest", tags=("relational", "join", "asof"), oracle=_NEAREST_ORACLE)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-neighbor as-of join: each error event matches the closest
    purchase by the same user within ±1 hour, in EITHER direction — the
    sensor-alignment semantics plain backward as-of can't express (pandas
    merge_asof direction='nearest'). Same union-and-window plan as the
    backward as-of: ONE shuffle on user_id, a forward and a reverse walk
    carry the straddling purchase pair to every error row, and a pure
    projection picks the closer side (exact integer µs distances; ties go
    backward; a same-instant purchase sorts before the error and matches
    at distance 0). No range join, no candidate explosion — linear state
    at any scale. Unmatched errors stay as 'none' rows with sentinel -1s
    so the output is join-loss-free and every column non-nullable."""
    ev = lt(spark, sf_dir, "events")
    # ONE scan with CASE projections instead of a union of two filtered
    # scans of the same table (r11, same rewrite as join_asof — guide §2.4:
    # one corpus pass instead of two feeding the same user_id exchange;
    # rows identical by construction: the filters are disjoint and the
    # WHEN branches emit exactly the union branches' columns)
    is_purch = F.col("event_type") == "purchase"
    merged = ev.filter(F.col("event_type").isin("purchase", "error")).select(
        "user_id",
        "ts",
        "event_id",
        F.when(is_purch, 0).otherwise(1).alias("kind"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.when(is_purch, F.col("event_id")).cast("long").alias("cand_id"),
    )
    w_fwd = (
        W.partitionBy("user_id")
        .orderBy("ts_us", "kind", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_rev = (
        W.partitionBy("user_id")
        .orderBy("ts_us", "kind", "event_id")
        .rowsBetween(1, W.unboundedFollowing)
    )
    cand_us = F.when(F.col("kind") == 0, F.col("ts_us"))
    walked = merged.select(
        "user_id",
        "ts",
        "event_id",
        "kind",
        "ts_us",
        F.last("cand_id", ignorenulls=True).over(w_fwd).alias("prev_id"),
        F.last(cand_us, ignorenulls=True).over(w_fwd).alias("prev_us"),
        F.first("cand_id", ignorenulls=True).over(w_rev).alias("next_id"),
        F.first(cand_us, ignorenulls=True).over(w_rev).alias("next_us"),
    ).where(F.col("kind") == 1)
    prev_d = F.col("ts_us") - F.col("prev_us")
    next_d = F.col("next_us") - F.col("ts_us")
    tol = F.lit(_NEAREST_TOL_US)
    direction = (
        F.when(
            F.col("prev_id").isNotNull()
            & (prev_d <= tol)
            & (
                F.col("next_id").isNull()
                | (prev_d <= next_d)
                | (next_d > tol)
            ),
            "prev",
        )
        .when(F.col("next_id").isNotNull() & (next_d <= tol), "next")
        .otherwise("none")
    )
    picked = walked.select(
        F.col("event_id").alias("error_id"),
        "user_id",
        F.col("ts").alias("error_ts"),
        direction.alias("direction"),
        "prev_id",
        "next_id",
        prev_d.alias("pd"),
        next_d.alias("nd"),
    )
    return picked.select(
        "error_id",
        "user_id",
        "error_ts",
        "direction",
        F.coalesce(
            F.when(F.col("direction") == "prev", F.col("prev_id")).when(
                F.col("direction") == "next", F.col("next_id")
            ),
            F.lit(-1),
        ).alias("matched_purchase_id"),
        F.coalesce(
            F.when(F.col("direction") == "prev", F.col("pd")).when(
                F.col("direction") == "next", F.col("nd")
            ),
            F.lit(-1),
        ).alias("dist_us"),
    )


_HOF_ORACLE = """
WITH per_cust AS (
  SELECT o_custkey,
         list_sort(list(CAST(ROUND(o_totalprice * 100.0) AS BIGINT))) AS totals
  FROM orders GROUP BY o_custkey
)
SELECT o_custkey,
       len(totals) AS n_orders,
       CAST(list_sum(totals) AS BIGINT) AS folded_total_cents,
       CAST(list_max(list_transform(totals, x -> x * 2)) AS BIGINT)
         AS doubled_max_cents,
       CAST(len(list_filter(totals, x -> x > 10000000)) AS BIGINT)
         AS n_above_100k,
       CAST(list_sum(array_slice(totals, 1, 3)) AS BIGINT)
         AS smallest3_cents
FROM per_cust
"""


@op("scalar_higher_order_arrays", tags=("relational", "scalar", "arrays"), oracle=_HOF_ORACLE)
def scalar_higher_order_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions over per-customer order histories —
    the lambda surface (transform / filter / aggregate / slice on an
    array_sort'ed collect_list) that lets per-entity sequence logic run
    INSIDE whole-stage codegen instead of exploding back to rows or
    dropping to Python: fold to a total, map-then-max, predicate count,
    and a sorted-prefix sum, each with a DuckDB list-lambda twin
    computing the identical exact-cents integers. Completes the scalar
    surface next to scalar_funcs_showcase (string/math/conditional) and
    scalar_null_semantics.

    Scale shape: ONE shuffle builds the per-key arrays (collect_list is
    a map-side-combinable aggregate); every lambda then evaluates
    row-local with no further exchange — the pattern to reach for when
    per-entity history fits in an array (bounded here by orders per
    customer), vs the window/explode path when it does not."""
    orders = lt(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.array_sort(
            F.collect_list(cents(F.col("o_totalprice")))
        ).alias("totals")
    )
    return per_cust.select(
        "o_custkey",
        F.size("totals").cast("long").alias("n_orders"),
        F.aggregate(
            "totals", F.lit(0).cast("long"), lambda acc, x: acc + x
        ).alias("folded_total_cents"),
        F.array_max(F.transform("totals", lambda x: x * 2)).alias(
            "doubled_max_cents"
        ),
        F.size(F.filter("totals", lambda x: x > 10_000_000))
        .cast("long")
        .alias("n_above_100k"),
        F.aggregate(
            F.slice("totals", 1, 3), F.lit(0).cast("long"), lambda acc, x: acc + x
        ).alias("smallest3_cents"),
    )


_DECIMAL_ORACLE = """
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n_lines,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                     * CAST(1 - l_discount AS DECIMAL(4,2)))
                 AS DECIMAL(38,4)) AS VARCHAR) AS revenue_dec
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


@op("agg_decimal_money_exact", tags=("relational", "agg", "decimal"), oracle=_DECIMAL_ORACLE)
def agg_decimal_money_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Money aggregation in NATIVE DECIMAL arithmetic — the type discipline
    that is actually correct at 100 TB, where the repo's BIGINT-cents
    convention (and its ppm floor divisions) would overflow 2⁶³: prices
    cast to DECIMAL(18,2), the discount factor to DECIMAL(4,2), so every
    product is exact at scale 4 and Tungsten accumulates in its 128-bit
    decimal representation — no rounding anywhere, at any row count. The
    result is emitted as the canonical DECIMAL(38,4) STRING because the
    correctness harness deliberately REJECTS DecimalType columns (Decimal
    reaching the pandas bridge is usually an accident — cf. the
    agg_grouping_sets round-2 red); stringifying declares the decimal
    intentional while keeping the value bit-checkable.

    Scale shape: identical to the Q1 flagship — one map-side-combinable
    hash aggregate to |flag×status| rows; decimal adds ~2× ALU cost over
    long, the price of exactness past 2⁶³."""
    li = lt(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(4,2)")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(revenue).cast("decimal(38,4)").cast("string").alias("revenue_dec"),
        )
    )


_GINI_ORACLE = """
WITH spend AS (
  SELECT c_mktsegment, c_custkey,
         CAST(ROUND(c_acctbal * 100.0) AS BIGINT) - 
         (SELECT MIN(CAST(ROUND(c_acctbal * 100.0) AS BIGINT)) FROM customer)
           AS x
  FROM customer
),
ranked AS (
  SELECT c_mktsegment, x,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                            ORDER BY x, c_custkey) AS i
  FROM spend
),
moments AS (
  SELECT c_mktsegment,
         COUNT(*) AS n,
         CAST(SUM(x) AS BIGINT) AS s0,
         CAST(SUM(i * x) AS BIGINT) AS s1
  FROM ranked GROUP BY c_mktsegment
)
SELECT c_mktsegment, n, s0 AS total_shifted_cents,
       CASE WHEN s0 = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST(((2 * CAST(s1 AS HUGEINT) - (n + 1) * CAST(s0 AS HUGEINT))
                       * 1000000) // (CAST(n AS HUGEINT) * s0) AS BIGINT)
       END AS gini_ppm
FROM moments
"""


@op("agg_gini_concentration", tags=("relational", "agg", "analytics"), oracle=_GINI_ORACLE)
def agg_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini concentration coefficient of (shifted-to-nonnegative) account
    balance per market segment — the inequality metric concentration
    reports are built on — via the rank formula
    G = (2·Σi·xᵢ − (n+1)·Σxᵢ) / (n·Σxᵢ) over the within-segment
    ascending sort, with 128-bit moments arithmetic and one final ppm
    floor division (balances shift by the global minimum so x ≥ 0, which the
    formula requires; ties rank deterministically by custkey). G=0 means
    uniform balances, →1 means one customer holds everything.

    Scale shape: ONE shuffle on the segment key feeds the ranking window,
    and the moments rollup map-side combines to |segments| rows. Per-group
    SUM(i·x) stays in BIGINT to ~10⁹ rows×10⁴ cents; the ppm step runs in
    DECIMAL(38)/HUGEINT on both engines (the ×1e6 blew int64 at just 3·10⁴
    rows/segment — found by the decade-stress differential)."""
    cust = lt(spark, sf_dir, "customer")
    gmin = cust.agg(
        F.min(cents(F.col("c_acctbal"))).alias("m")
    )
    spend = cust.crossJoin(F.broadcast(gmin)).select(
        "c_mktsegment",
        "c_custkey",
        (cents(F.col("c_acctbal")) - F.col("m")).alias("x"),
    )
    ranked = spend.select(
        "c_mktsegment",
        "x",
        F.row_number()
        .over(W.partitionBy("c_mktsegment").orderBy("x", "c_custkey"))
        .alias("i"),
    )
    m = ranked.groupBy("c_mktsegment").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("s0"),
        F.sum(F.col("i") * F.col("x")).alias("s1"),
    )
    # 128-bit intermediate: s1 ~ n²·x̄/2 crosses 2⁶³/1e6 around 10⁵ rows
    # per segment once the ×1e6 ppm step lands on it (caught by the r4
    # decade-stress differential at 10× sf0.1) — DECIMAL(38,0) here and
    # HUGEINT in the oracle keep the division exact to ~10¹⁹ rows·cents;
    # output stays BIGINT.
    return m.select(
        "c_mktsegment",
        "n",
        F.col("s0").alias("total_shifted_cents"),
        F.expr(
            # s0 = 0 ⟺ every balance in the segment equals the global
            # minimum (a perfectly uniform segment — guaranteed to occur
            # at scale, e.g. a single-customer segment): the rank formula
            # is 0/0 there and its uniform-distribution limit is G = 0
            # (dust:101 fuzz kill — ANSI DIVIDE_BY_ZERO)
            "CASE WHEN s0 = 0 THEN CAST(0 AS BIGINT)"
            " ELSE CAST(((2 * CAST(s1 AS DECIMAL(38,0))"
            " - (n + 1) * CAST(s0 AS DECIMAL(38,0))) * 1000000)"
            " div (CAST(n AS DECIMAL(38,0)) * s0) AS BIGINT) END"
        ).alias("gini_ppm"),
    )


_PARETO_ORACLE = """
WITH spend AS (
  SELECT c_mktsegment, o_custkey,
         CAST(SUM(CAST(ROUND(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS s
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY c_mktsegment, o_custkey
),
ranked AS (
  SELECT c_mktsegment, s,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                            ORDER BY s DESC, o_custkey) AS rk,
         SUM(s) OVER (PARTITION BY c_mktsegment
                      ORDER BY s DESC, o_custkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(s) OVER (PARTITION BY c_mktsegment) AS tot,
         COUNT(*) OVER (PARTITION BY c_mktsegment) AS n
  FROM spend
)
SELECT c_mktsegment,
       MAX(n) AS n_customers,
       MIN(CASE WHEN cum * 5 >= tot * 4 THEN rk END) AS n_top_for_80pct,
       CAST((MIN(CASE WHEN cum * 5 >= tot * 4 THEN rk END) * 1000000)
            // MAX(n) AS BIGINT) AS top_share_ppm
FROM ranked
GROUP BY c_mktsegment
"""


@op("window_pareto_concentration", tags=("relational", "window", "analytics"), oracle=_PARETO_ORACLE)
def window_pareto_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto (80/20) concentration per market segment: the smallest
    number of customers whose descending-spend cumulative sum reaches
    80% of the segment total, and what fraction of the customer base
    that is — the 'how top-heavy is this business' number next to
    agg_gini_concentration's full-distribution coefficient (Gini
    summarizes the whole curve; Pareto reads one operating point off
    it). The 80% test is the integer cross-multiplication cum·5 ≥ tot·4
    — no percentage column, no float threshold, so the cut row can't
    flip between engines; ties rank deterministically by custkey.

    Scale shape: one (segment, customer) rollup, then ONE segment-key
    exchange serving the rank, running sum, and segment totals in the
    same window spec family (Catalyst collapses them), and a
    |segments|-row reduction."""
    orders = lt(spark, sf_dir, "orders")
    cust = lt(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    spend = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment", "o_custkey")
        .agg(F.sum(cents(F.col("o_totalprice"))).alias("s"))
    )
    wo = W.partitionBy("c_mktsegment").orderBy(F.col("s").desc(), "o_custkey")
    wp = W.partitionBy("c_mktsegment")
    ranked = spend.select(
        "c_mktsegment",
        F.row_number().over(wo).alias("rk"),
        F.sum("s").over(wo.rowsBetween(W.unboundedPreceding, W.currentRow)).alias("cum"),
        F.sum("s").over(wp).alias("tot"),
        F.count("*").over(wp).alias("n"),
    )
    return ranked.groupBy("c_mktsegment").agg(
        F.max("n").alias("n_customers"),
        F.min(
            F.when(F.col("cum") * 5 >= F.col("tot") * 4, F.col("rk"))
        ).cast("long").alias("n_top_for_80pct"),  # oracle BIGINT
        F.expr(
            "CAST((MIN(CASE WHEN cum * 5 >= tot * 4 THEN rk END) * 1000000)"
            " div MAX(n) AS BIGINT)"
        ).alias("top_share_ppm"),
    )


_NULLSAFE_ORACLE = """
WITH keyed AS (
  SELECT o_orderkey, NULLIF(o_orderpriority, '4-NOT SPECIFIED') AS pk
  FROM orders
),
sides AS (SELECT pk, COUNT(*) AS n FROM keyed GROUP BY pk)
SELECT
  CAST(COALESCE((SELECT SUM(a.n * b.n) FROM sides a JOIN sides b
                 ON a.pk = b.pk), 0) AS BIGINT) AS eq_join_pairs,
  CAST(COALESCE((SELECT SUM(a.n * b.n) FROM sides a JOIN sides b
                 ON a.pk IS NOT DISTINCT FROM b.pk), 0)
       AS BIGINT) AS nullsafe_join_pairs,
  CAST(COALESCE((SELECT n FROM sides WHERE pk IS NULL), 0)
       AS BIGINT) AS n_null_keys
"""


@op("join_null_safe_eq", tags=("relational", "join", "scalar"), oracle=_NULLSAFE_ORACLE)
def join_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join semantics made explicit: self-join pair
    counts over a deliberately-nullable key (priority with its
    'unspecified' level nulled) under `=` versus `<=>` (Spark's
    null-safe operator; `IS NOT DISTINCT FROM` in the oracle). Standard
    equality silently DROPS every null-keyed row from the join — the
    classic missing-rows bug when a dimension key is optional — while
    the null-safe form matches nulls to each other; the difference is
    exactly n_null² pairs, which this op emits alongside both counts so
    the contract is visible (completing the null surface next to
    scalar_null_semantics' scalar ops and the NULLS FIRST/LAST ordering
    contract). Counts are computed on the AGGREGATED key table (|keys|
    rows) so the quadratic pair arithmetic never touches row-level data.

    At scale: `<=>` compiles to the same hash join as `=` (null becomes
    an ordinary key value) — safety costs nothing, which is the point."""
    orders = lt(spark, sf_dir, "orders")
    keyed = orders.select(
        F.nullif(F.col("o_orderpriority"), F.lit("4-NOT SPECIFIED")).alias("pk")
    )
    sides = keyed.groupBy("pk").agg(F.count("*").alias("n"))
    a = sides.select(F.col("pk").alias("pka"), F.col("n").alias("na"))
    b = sides.select(F.col("pk").alias("pkb"), F.col("n").alias("nb"))
    zero = F.lit(0).cast("long")
    eq = a.join(b, F.col("pka") == F.col("pkb")).agg(
        F.coalesce(F.sum(F.col("na") * F.col("nb")), zero).alias("eq_join_pairs")
    )
    ns = a.join(b, F.col("pka").eqNullSafe(F.col("pkb"))).agg(
        F.coalesce(F.sum(F.col("na") * F.col("nb")), zero).alias(
            "nullsafe_join_pairs"
        )
    )
    # an AGGREGATE, not a filter: a dataset with zero null keys must
    # report n_null_keys = 0, not annihilate the whole report row via a
    # crossJoin with an empty side (dust:102 fuzz kill — the oracle's
    # scalar subquery kept its row while the Spark crossJoin dropped it)
    nn = sides.agg(
        F.coalesce(
            F.sum(F.when(F.col("pk").isNull(), F.col("n"))), zero
        ).alias("n_null_keys")
    )
    return eq.crossJoin(ns).crossJoin(F.broadcast(nn))


_RFM_ORACLE = """
WITH per_cust AS (
  SELECT o_custkey,
         MAX(o_orderdate) AS last_order,
         COUNT(*) AS freq,
         CAST(SUM(CAST(ROUND(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS mon
  FROM orders GROUP BY o_custkey
),
anchor AS (SELECT MAX(o_orderdate) AS mx FROM orders),
scored AS (
  SELECT o_custkey,
         NTILE(5) OVER (ORDER BY last_order DESC, o_custkey) AS r_score,
         NTILE(5) OVER (ORDER BY freq DESC, o_custkey) AS f_score,
         NTILE(5) OVER (ORDER BY mon DESC, o_custkey) AS m_score,
         mon
  FROM per_cust CROSS JOIN anchor
)
SELECT CAST(r_score AS BIGINT) AS r_score,
       CAST(f_score AS BIGINT) AS f_score,
       CAST(m_score AS BIGINT) AS m_score,
       COUNT(*) AS n_customers,
       CAST(SUM(mon) AS BIGINT) AS segment_cents
FROM scored
GROUP BY r_score, f_score, m_score
"""


@op("query_rfm_segmentation", tags=("relational", "analytics", "window"), oracle=_RFM_ORACLE)
def query_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — the marketing-standard customer scoring:
    recency (last order), frequency (order count), monetary (exact cent
    total) each cut into quintiles by NTILE with custkey tie-breaks
    (NTILE's equal-fill remainder rule is identical on both engines once
    the ORDER BY is total), then the (r, f, m) cell census with customer
    counts and cell revenue. '555' is the win-back-immediately cell;
    '111' is churned-low-value — the labels campaign tooling consumes.

    Scale note: the three NTILEs here share ONE unpartitioned window
    input — fine at |customers| rows per segment-analysis batch, and the
    documented trade vs window_ntile_distributed's two-phase
    range-partition plan, which is what this op switches to when the
    customer dimension itself outgrows a partition (the registry carries
    both so the cutover is explicit)."""
    orders = lt(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count("*").alias("freq"),
        F.sum(cents(F.col("o_totalprice"))).alias("mon"),
    )
    wr = W.orderBy(F.col("last_order").desc(), "o_custkey")
    wf = W.orderBy(F.col("freq").desc(), "o_custkey")
    wm = W.orderBy(F.col("mon").desc(), "o_custkey")
    scored = per_cust.select(
        "o_custkey",
        "mon",
        F.ntile(5).over(wr).cast("long").alias("r_score"),
        F.ntile(5).over(wf).cast("long").alias("f_score"),
        F.ntile(5).over(wm).cast("long").alias("m_score"),
    )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count("*").alias("n_customers"),
        F.sum("mon").alias("segment_cents"),
    )
