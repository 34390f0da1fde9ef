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
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
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
