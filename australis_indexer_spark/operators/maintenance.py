"""Snapshot maintenance operators: version diffing and delete propagation.

Reference parity: the reference's sink is append-only and never restates
history; these ops are the maintenance verbs a mutable 100 TB warehouse
layer needs on top of it — "what changed between snapshot v1 and v2" and
"propagate a deletion set through the foreign-key chain" (the
right-to-be-forgotten sweep). Both derive their second input
deterministically from the base tables with closed-form SQL shared by the
oracle, so the diff/delete logic itself is what the oracle checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.det import cents
from ..registry import op
from ..sources.batch import load_table as lt

# v2 derivation (shared closed-form): every 67th order is deleted, every
# 53rd surviving order gets +$1.00, every 71st order is cloned as an insert
# under a shifted key range.
_INS_SHIFT = 100_000_000

_DIFF_ORACLE = f"""
WITH v1 AS (
  SELECT o_orderkey AS k,
         CAST(ROUND(o_totalprice * 100.0) AS BIGINT) AS cents,
         o_orderstatus AS status
  FROM orders
),
v2 AS (
  SELECT k,
         CASE WHEN k % 53 = 0 THEN cents + 100 ELSE cents END AS cents,
         status
  FROM v1 WHERE k % 67 <> 0
  UNION ALL
  SELECT k + {_INS_SHIFT}, cents, status FROM v1 WHERE k % 71 = 0
),
classified AS (
  SELECT CASE WHEN v1.k IS NULL THEN 'added'
              WHEN v2.k IS NULL THEN 'removed'
              WHEN v1.cents <> v2.cents OR v1.status <> v2.status THEN 'changed'
              ELSE 'unchanged' END AS change_type,
         COALESCE(v2.cents, 0) - COALESCE(v1.cents, 0) AS delta_cents
  FROM v1 FULL OUTER JOIN v2 ON v1.k = v2.k
)
SELECT change_type, COUNT(*) AS n_rows,
       CAST(SUM(delta_cents) AS BIGINT) AS total_delta_cents
FROM classified GROUP BY change_type
"""


@op("table_snapshot_diff", tags=("maintenance", "join"), oracle=_DIFF_ORACLE)
def table_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot version diff — the change-data-feed a downstream consumer
    wants between table versions: rows classified added / removed /
    changed / unchanged with the net money delta, via ONE full-outer join
    on the key comparing exact-cents representations (never raw doubles,
    so 'changed' can't flicker on float formatting).

    Scale shape: both snapshots pre-project to (key, cents, status) before
    the full-outer sort-merge join — the only shuffle, keyed on the
    primary key; the classification is a narrow map over the joined rows
    and the rollup map-side combines to 4 rows. At 100 TB both versions
    would be bucketed on the key and the join goes exchange-free (the
    join_bucketed_colocated layout)."""
    v1 = lt(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        cents(F.col("o_totalprice")).alias("cents"),
        F.col("o_orderstatus").alias("status"),
    )
    survivors = v1.where(F.col("k") % 67 != 0).select(
        "k",
        F.when(F.col("k") % 53 == 0, F.col("cents") + 100)
        .otherwise(F.col("cents"))
        .alias("cents"),
        "status",
    )
    inserts = v1.where(F.col("k") % 71 == 0).select(
        (F.col("k") + _INS_SHIFT).alias("k"), "cents", "status"
    )
    v2 = survivors.unionAll(inserts)
    j = v1.alias("a").join(v2.alias("b"), F.col("a.k") == F.col("b.k"), "full_outer")
    classified = j.select(
        F.when(F.col("a.k").isNull(), "added")
        .when(F.col("b.k").isNull(), "removed")
        .when(
            (F.col("a.cents") != F.col("b.cents"))
            | (F.col("a.status") != F.col("b.status")),
            "changed",
        )
        .otherwise("unchanged")
        .alias("change_type"),
        (
            F.coalesce(F.col("b.cents"), F.lit(0))
            - F.coalesce(F.col("a.cents"), F.lit(0))
        ).alias("delta_cents"),
    )
    return classified.groupBy("change_type").agg(
        F.count("*").alias("n_rows"),
        F.sum("delta_cents").alias("total_delta_cents"),
    )


_TOMBSTONE_ORACLE = """
WITH tomb AS (SELECT c_custkey FROM customer WHERE c_custkey % 101 = 0),
dead_orders AS (
  SELECT o_orderkey FROM orders WHERE o_custkey IN (SELECT c_custkey FROM tomb)
)
SELECT 'customer' AS table_name,
       (SELECT COUNT(*) FROM customer) AS rows_before,
       (SELECT COUNT(*) FROM tomb) AS rows_deleted,
       (SELECT COUNT(*) FROM customer) - (SELECT COUNT(*) FROM tomb) AS rows_after
UNION ALL
SELECT 'orders',
       (SELECT COUNT(*) FROM orders),
       (SELECT COUNT(*) FROM dead_orders),
       (SELECT COUNT(*) FROM orders) - (SELECT COUNT(*) FROM dead_orders)
UNION ALL
SELECT 'lineitem',
       (SELECT COUNT(*) FROM lineitem),
       (SELECT COUNT(*) FROM lineitem
        WHERE l_orderkey IN (SELECT o_orderkey FROM dead_orders)),
       (SELECT COUNT(*) FROM lineitem)
         - (SELECT COUNT(*) FROM lineitem
            WHERE l_orderkey IN (SELECT o_orderkey FROM dead_orders))
"""


@op("pipeline_tombstone_delete", tags=("maintenance", "pipeline"), oracle=_TOMBSTONE_ORACLE)
def pipeline_tombstone_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-set propagation (the right-to-be-forgotten sweep): a customer
    tombstone set cascades through the FK chain — their orders, and those
    orders' lineitems — reporting per-table before/deleted/after counts
    whose conservation (before - deleted = after) the test re-checks
    against independently executed anti-joins.

    Scale shape: the tombstone set is tiny and broadcasts into a semi-join
    per child table; the orders->lineitem hop reuses the just-computed dead
    order keys (also broadcast-sized relative to the fact). Each cascade
    level is one semi/anti join on its own FK — no table is scanned more
    than once per level, and the actual delete at 100 TB is the same plan
    with `left_anti` written back through dynamic partition overwrite
    (the stream_cdc_upsert machinery)."""
    cust = lt(spark, sf_dir, "customer")
    orders = lt(spark, sf_dir, "orders")
    li = lt(spark, sf_dir, "lineitem")
    tomb = cust.where(F.col("c_custkey") % 101 == 0).select("c_custkey")
    dead_orders = orders.join(
        F.broadcast(tomb), orders.o_custkey == tomb.c_custkey, "left_semi"
    ).select("o_orderkey")
    dead_lines = li.join(
        F.broadcast(dead_orders), li.l_orderkey == dead_orders.o_orderkey, "left_semi"
    )

    def row(name: str, total: DataFrame, dead: DataFrame) -> DataFrame:
        t = total.agg(F.count("*").alias("rows_before"))
        d = dead.agg(F.count("*").alias("rows_deleted"))
        return (
            t.crossJoin(d)
            .select(
                F.lit(name).alias("table_name"),
                "rows_before",
                "rows_deleted",
                (F.col("rows_before") - F.col("rows_deleted")).alias("rows_after"),
            )
        )

    return (
        row("customer", cust, tomb)
        .unionAll(row("orders", orders, dead_orders))
        .unionAll(row("lineitem", li, dead_lines))
    )


_PIT_CUT = "TIMESTAMP '1998-01-01 00:00:00'"
_PIT_EOT = "TIMESTAMP '2999-01-01 00:00:00'"

_PIT_ORACLE = f"""
WITH dim AS (
  SELECT c_custkey, 1 AS version,
         CAST(ROUND(c_acctbal * 100.0) AS BIGINT) AS bal_cents,
         TIMESTAMP '1900-01-01 00:00:00' AS valid_from,
         CASE WHEN c_custkey % 7 = 0 THEN {_PIT_CUT} ELSE {_PIT_EOT} END AS valid_to
  FROM customer
  UNION ALL
  SELECT c_custkey, 2,
         CAST(ROUND(c_acctbal * 100.0) AS BIGINT) + 10000,
         {_PIT_CUT}, {_PIT_EOT}
  FROM customer WHERE c_custkey % 7 = 0
)
SELECT d.version,
       CAST(year(o.o_orderdate) AS BIGINT) AS order_year,
       COUNT(*) AS n_orders,
       CAST(SUM(d.bal_cents) AS BIGINT) AS attributed_bal_cents
FROM orders o
JOIN dim d ON o.o_custkey = d.c_custkey
          AND o.o_orderdate >= d.valid_from
          AND o.o_orderdate <  d.valid_to
GROUP BY d.version, order_year
"""


@op("join_pit_temporal_dim", tags=("maintenance", "join", "temporal"), oracle=_PIT_ORACLE)
def join_pit_temporal_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join against a versioned (SCD2-style) dimension: every
    order picks the dim version that was valid ON ITS ORDER DATE — version
    2 (a +$100 balance restatement, validity cut 1998-01-01) applies only
    to orders placed after the cut, so historical facts keep historical
    attributes. The versioned dim is derived closed-form (every 7th
    customer is two-versioned) and mirrored exactly in the oracle; validity
    intervals are half-open [from, to) so no date can match two versions.

    Scale shape: the join is EQUI on the customer key with the interval
    predicate as a residual — one key-partitioned sort-merge join whose
    per-key version fan-in is the (small) version count, never a range
    explosion; this is the standard PIT layout when versions-per-key is
    bounded. (For unbounded version histories the as-of union trick at
    join_asof_purchase_attribution replaces the residual.) The rollup
    map-side combines to |versions x years| rows."""
    cust = lt(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    cents_c = cents(F.col("c_acctbal"))
    cut = F.expr(_PIT_CUT)
    eot = F.expr(_PIT_EOT)
    v1 = cust.select(
        "c_custkey",
        F.lit(1).alias("version"),
        cents_c.alias("bal_cents"),
        F.expr("TIMESTAMP '1900-01-01 00:00:00'").alias("valid_from"),
        F.when(F.col("c_custkey") % 7 == 0, cut).otherwise(eot).alias("valid_to"),
    )
    v2 = cust.where(F.col("c_custkey") % 7 == 0).select(
        "c_custkey",
        F.lit(2).alias("version"),
        (cents_c + 10000).alias("bal_cents"),
        cut.alias("valid_from"),
        eot.alias("valid_to"),
    )
    dim = v1.unionAll(v2)
    orders = lt(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    j = orders.join(
        dim,
        (orders.o_custkey == dim.c_custkey)
        & (orders.o_orderdate >= dim.valid_from)
        & (orders.o_orderdate < dim.valid_to),
    )
    return j.groupBy(
        "version", F.year("o_orderdate").cast("long").alias("order_year")
    ).agg(
        F.count("*").alias("n_orders"),
        F.sum("bal_cents").alias("attributed_bal_cents"),
    )
