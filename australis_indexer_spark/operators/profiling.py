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

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.det import cents
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
    cents_c = cents(F.col("o_totalprice"))
    bucket = F.least(
        F.floor(cents_c / float(_HIST_WIDTH_CENTS)).cast("long"),
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


# --- Triangle counting on the part co-purchase graph -----------------------

_TRI_ORACLE = """
WITH pairs AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
),
edges AS (
  SELECT DISTINCT a.p AS ea, b.p AS eb
  FROM pairs a JOIN pairs b ON a.o = b.o AND a.p < b.p
),
deg AS (
  SELECT node, COUNT(*) AS d FROM (
    SELECT ea AS node FROM edges UNION ALL SELECT eb AS node FROM edges
  ) GROUP BY node
),
oriented AS (
  SELECT CASE WHEN (da.d < db.d) OR (da.d = db.d AND ea < eb) THEN ea ELSE eb END AS src,
         CASE WHEN (da.d < db.d) OR (da.d = db.d AND ea < eb) THEN eb ELSE ea END AS dst,
         CASE WHEN (da.d < db.d) OR (da.d = db.d AND ea < eb) THEN db.d ELSE da.d END AS dst_d
  FROM edges
  JOIN deg da ON da.node = ea
  JOIN deg db ON db.node = eb
),
wedges AS (
  SELECT o1.dst AS v1, o2.dst AS v2
  FROM oriented o1 JOIN oriented o2
    ON o1.src = o2.src
   AND ((o1.dst_d < o2.dst_d) OR (o1.dst_d = o2.dst_d AND o1.dst < o2.dst))
)
SELECT (SELECT COUNT(*) FROM deg)   AS n_nodes,
       (SELECT COUNT(*) FROM edges) AS n_edges,
       (SELECT COUNT(*) FROM wedges) AS n_wedges,
       (SELECT COUNT(*) FROM wedges w JOIN edges e
          ON e.ea = LEAST(w.v1, w.v2) AND e.eb = GREATEST(w.v1, w.v2))
         AS n_triangles
"""


@op("stats_triangle_count", tags=("profiling", "graph"), oracle=_TRI_ORACLE)
def stats_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle count on the part co-purchase graph (parts that
    appear in the same order are adjacent) via DEGREE-ORIENTED wedge
    counting — the algorithm that makes triangle counting survive skew
    at scale (Cohen's MapReduce formulation; GraphFrames uses the same
    orientation): every edge points from its lower-degree endpoint to the
    higher (id tie-break), so a hub of degree D generates wedges only
    from edges where it is the LOW side — O(m^1.5) wedges total instead
    of Σd² exploding on the heaviest node. Wedges then left-semi-probe
    the canonical edge set for closure. Three shuffles (edge dedup,
    wedge join on src, closure join on the undirected key), each on keys
    Catalyst hash-partitions; the wedge join's skew is exactly what the
    orientation bounds. Emits the one-row (nodes, edges, wedges,
    triangles) census."""
    li = lt(spark, sf_dir, "lineitem")
    pairs = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    b = pairs.select(F.col("o"), F.col("p").alias("p2"))
    # materialize the deduped edge set ONCE (localCheckpoint truncates the
    # lineage): degrees, orientation, closure probe and the two cheap
    # counts all reuse it instead of re-running the co-purchase self-join
    edges = (
        pairs.join(b, "o")
        .where(F.col("p") < F.col("p2"))
        .select(F.col("p").alias("ea"), F.col("p2").alias("eb"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        edges.select(F.col("ea").alias("node"))
        .unionAll(edges.select(F.col("eb").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )
    da = deg.select(F.col("node").alias("ea"), F.col("d").alias("da"))
    db = deg.select(F.col("node").alias("eb"), F.col("d").alias("db"))
    fwd = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("ea") < F.col("eb"))
    )
    oriented = (
        edges.join(da, "ea")
        .join(db, "eb")
        .select(
            F.when(fwd, F.col("ea")).otherwise(F.col("eb")).alias("src"),
            F.when(fwd, F.col("eb")).otherwise(F.col("ea")).alias("dst"),
            F.when(fwd, F.col("db")).otherwise(F.col("da")).alias("dst_d"),
        )
    )
    # pin the wedge join's partitioning (REPARTITION_BY_NUM is exempt from
    # AQE coalescing): the join's INPUT is tiny, so AQE sized the wedge
    # stage from it and coalesced the O(m^1.5) wedge GENERATION into a
    # single task — the output-explosive-join trap (guide §2.5/§3.4).
    # Measured 2.4 → 1.8 s warm (and 12.5 s → 5.5 s cold) at sf0.01.
    oriented = oriented.repartition(spark.sparkContext.defaultParallelism, "src")
    o2 = oriented.select(
        F.col("src"), F.col("dst").alias("dst2"), F.col("dst_d").alias("dst_d2")
    )
    wedges = oriented.join(o2, "src").where(
        (F.col("dst_d") < F.col("dst_d2"))
        | ((F.col("dst_d") == F.col("dst_d2")) & (F.col("dst") < F.col("dst2")))
    ).select(
        F.least("dst", "dst2").alias("ca"), F.greatest("dst", "dst2").alias("cb")
    )
    # One pass over the wedge stream: LEFT-join closure and count wedges +
    # matched wedges (= triangles; edges are distinct so a wedge matches at
    # most once) in a single aggregate. r3 ran `wedges.count()` and
    # `closed.count()` as separate actions — the O(m^1.5) wedge generation,
    # the plan's real cost, executed TWICE (and the un-checkpointed edge
    # dedup four times across the four counts: ~2x total work, the 465 MiB
    # sf0.1 shuffle in SCALING.md §2).
    stats = (
        wedges.join(
            edges,
            (F.col("ca") == F.col("ea")) & (F.col("cb") == F.col("eb")),
            "left",
        )
        .agg(
            F.count("*").alias("n_wedges"),
            F.count("ea").alias("n_triangles"),
        )
        .collect()[0]
    )
    n_nodes = deg.count()
    n_edges = edges.count()
    return spark.createDataFrame(
        [(n_nodes, n_edges, stats["n_wedges"], stats["n_triangles"])],
        "n_nodes long, n_edges long, n_wedges long, n_triangles long",
    )


# --- Count–min sketch with exact cross-engine cells ------------------------

_CMS_DEPTH = 3  # independent hash rows
_CMS_PROBE_K = 10


def _cms_cell_sql(d: int) -> str:
    # cell id stays a 2-hex-char string (width 256) — no hex->int
    # conversion exists to diverge between engines
    return f"substr(md5('{d}:' || CAST(user_id AS VARCHAR)), 1, 2)"


_CMS_ORACLE = f"""
WITH cells AS (
  SELECT d, cell, COUNT(*) AS cnt FROM (
    {" UNION ALL ".join(
        f"SELECT {d} AS d, {_cms_cell_sql(d)} AS cell FROM events"
        for d in range(_CMS_DEPTH)
    )}
  ) GROUP BY d, cell
),
truth AS (
  SELECT user_id, COUNT(*) AS true_count
  FROM events GROUP BY user_id
  ORDER BY true_count DESC, user_id LIMIT {_CMS_PROBE_K}
),
est AS (
  SELECT t.user_id, t.true_count, MIN(c.cnt) AS est_count
  FROM truth t JOIN cells c
    ON (   (c.d = 0 AND c.cell = {_cms_cell_sql(0).replace('user_id', 't.user_id')})
        OR (c.d = 1 AND c.cell = {_cms_cell_sql(1).replace('user_id', 't.user_id')})
        OR (c.d = 2 AND c.cell = {_cms_cell_sql(2).replace('user_id', 't.user_id')}))
  GROUP BY t.user_id, t.true_count
)
SELECT user_id, true_count, est_count,
       CAST(est_count - true_count AS BIGINT) AS overcount
FROM est
"""


@op("agg_countmin_heavyhitters", tags=("agg", "sketch"), oracle=_CMS_ORACLE)
def agg_countmin_heavyhitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count–min sketch (Cormode & Muthukrishnan 2005) built as ordinary
    Spark aggregation, probed at the true heavy hitters: three independent
    md5-derived hash rows × 256 cells each — the cell id stays a 2-hex-char
    STRING (the repo's portable-hash convention), so both engines bucket
    identically and every cell count is exact. The estimate for a key is
    the MIN over its three cells; CMS can only overcount, which the output
    states as `overcount >= 0` per probe.

    Scale shape: the sketch build is ONE map-side-combinable groupBy whose
    state is ≤ depth×width = 768 cells per task regardless of stream size —
    this is why CMS exists: frequency estimates over 100 TB with KB of
    state. The probe side is the exact top-k (one more combine-friendly
    aggregate + TakeOrderedAndProject) joined to the broadcast-sized cell
    table. Spark's built-in count_min_sketch() produces an opaque binary
    with engine-private hashing; building the cells explicitly keeps the
    sketch portable and oracle-checkable."""
    ev = lt(spark, sf_dir, "events").select("user_id")
    uid = F.col("user_id").cast("string")
    cells = None
    for d in range(_CMS_DEPTH):
        part = ev.select(
            F.lit(d).alias("d"),
            F.substring(F.md5(F.concat(F.lit(f"{d}:"), uid)), 1, 2).alias("cell"),
        )
        cells = part if cells is None else cells.unionAll(part)
    cells = cells.groupBy("d", "cell").agg(F.count("*").alias("cnt"))
    truth = (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("true_count"))
        .orderBy(F.col("true_count").desc(), "user_id")
        .limit(_CMS_PROBE_K)
    )
    tuid = F.col("user_id").cast("string")
    probe_cell = [
        F.substring(F.md5(F.concat(F.lit(f"{d}:"), tuid)), 1, 2)
        for d in range(_CMS_DEPTH)
    ]
    cond = None
    for d in range(_CMS_DEPTH):
        c = (F.col("d") == d) & (F.col("cell") == probe_cell[d])
        cond = c if cond is None else cond | c
    est = (
        F.broadcast(truth)
        .join(cells, cond)
        .groupBy("user_id", "true_count")
        .agg(F.min("cnt").alias("est_count"))
    )
    return est.select(
        "user_id",
        "true_count",
        "est_count",
        (F.col("est_count") - F.col("true_count")).alias("overcount"),
    )


# --- Benford first-digit conformance profile -------------------------------

_BENFORD_ORACLE = """
WITH digits AS (
  SELECT CAST(substr(CAST(CAST(ROUND(o_totalprice * 100.0) AS BIGINT) AS VARCHAR), 1, 1)
              AS BIGINT) AS first_digit
  FROM orders WHERE o_totalprice > 0
),
n AS (SELECT COUNT(*) AS total FROM digits)
SELECT first_digit,
       COUNT(*) AS n_values,
       CAST((COUNT(*) * 1000000) // MAX(n.total) AS BIGINT) AS observed_ppm,
       CAST(FLOOR(LOG10(1.0 + 1.0 / first_digit) * 1000000) AS BIGINT)
         AS benford_ppm
FROM digits CROSS JOIN n
GROUP BY first_digit
"""


@op("profile_benford_digits", tags=("profiling", "quality"), oracle=_BENFORD_ORACLE)
def profile_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution of order totals against
    Benford's law — the forensic data-quality screen for fabricated or
    truncated numeric columns (synthetic uniform data like this corpus
    fails it loudly, which is itself the signal: observed_ppm far from
    benford_ppm flags a column whose magnitudes are not organically
    spread). Digit extraction goes through exact integer cents and string
    truncation — no float log in the grouping path; the observed share is
    exact integer ppm. The Benford expectation log10(1+1/d) is the one
    deliberately-float column: both engines evaluate the same IEEE
    expression on the nine literal digits, floored to ppm.

    Scale shape: narrow map + one combine-friendly groupBy to nine rows;
    the total-count scalar rides a broadcast. Runs identically over any
    numeric column at any scale."""
    orders = lt(spark, sf_dir, "orders").where(F.col("o_totalprice") > 0)
    digits = orders.select(
        F.substring(
            cents(F.col("o_totalprice")).cast("string"), 1, 1
        )
        .cast("long")
        .alias("first_digit")
    )
    n = digits.agg(F.count("*").alias("total"))
    return (
        digits.crossJoin(F.broadcast(n))
        .groupBy("first_digit")
        .agg(
            F.count("*").alias("n_values"),
            F.expr("CAST((COUNT(*) * 1000000) div MAX(total) AS BIGINT)").alias(
                "observed_ppm"
            ),
            F.floor(
                F.log10(1.0 + 1.0 / F.col("first_digit")) * 1_000_000
            ).alias("benford_ppm"),
        )
    )


# --- Market-basket association rules ---------------------------------------

_ASSOC_MIN_PAIR = 3

_ASSOC_ORACLE = f"""
WITH baskets AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
),
n AS (SELECT COUNT(DISTINCT o) AS n_baskets FROM baskets),
item AS (SELECT p, COUNT(*) AS item_cnt FROM baskets GROUP BY p),
pair AS (
  SELECT a.p AS ante, b.p AS cons, COUNT(*) AS pair_cnt
  FROM baskets a JOIN baskets b ON a.o = b.o AND a.p <> b.p
  GROUP BY a.p, b.p
  HAVING COUNT(*) >= {_ASSOC_MIN_PAIR}
)
SELECT ante, cons, pair_cnt,
       ia.item_cnt AS ante_cnt, ic.item_cnt AS cons_cnt,
       CAST((pair_cnt * 1000000) // ia.item_cnt AS BIGINT) AS confidence_ppm,
       CAST((pair_cnt * n.n_baskets * 1000000) // (ia.item_cnt * ic.item_cnt)
            AS BIGINT) AS lift_x1e6
FROM pair
JOIN item ia ON ia.p = ante
JOIN item ic ON ic.p = cons
CROSS JOIN n
"""


@op("stats_association_rules", tags=("profiling", "analytics"), oracle=_ASSOC_ORACLE)
def stats_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules ante→cons over order baskets —
    support, confidence, and lift for every directed part pair co-ordered
    at least 3 times, all in EXACT integer parts-per-million (floor
    division; lift's cross-multiplication stays in BIGINT), so no float
    ratio can drift between engines.

    Scale shape: the A-Priori-style candidate generation is ONE self-join
    on the basket key — baskets are small (max 13 lines here), so fan-out
    is bounded by Σ|basket|², the quantity the support threshold then
    prunes; item counts reduce to vocabulary size and broadcast back onto
    the surviving pairs, and the one-row basket total rides the same
    broadcast. No stage ever shuffles more than the pair table."""
    li = lt(spark, sf_dir, "lineitem")
    baskets = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    n = baskets.agg(F.countDistinct("o").alias("n_baskets"))
    item = baskets.groupBy("p").agg(F.count("*").alias("item_cnt"))
    b2 = baskets.select(F.col("o"), F.col("p").alias("p2"))
    pair = (
        baskets.join(b2, "o")
        .where(F.col("p") != F.col("p2"))
        .groupBy(F.col("p").alias("ante"), F.col("p2").alias("cons"))
        .agg(F.count("*").alias("pair_cnt"))
        .where(F.col("pair_cnt") >= _ASSOC_MIN_PAIR)
    )
    ia = item.select(F.col("p").alias("ante"), F.col("item_cnt").alias("ante_cnt"))
    ic = item.select(F.col("p").alias("cons"), F.col("item_cnt").alias("cons_cnt"))
    return (
        pair.join(F.broadcast(ia), "ante")
        .join(F.broadcast(ic), "cons")
        .crossJoin(F.broadcast(n))
        .select(
            "ante",
            "cons",
            "pair_cnt",
            "ante_cnt",
            "cons_cnt",
            F.expr("(pair_cnt * 1000000) div ante_cnt").alias("confidence_ppm"),
            F.expr(
                "(pair_cnt * n_baskets * 1000000) div (ante_cnt * cons_cnt)"
            ).alias("lift_x1e6"),
        )
    )


# --- k-anonymity / l-diversity compliance profile --------------------------

_KANON_K = 5

_KANON_ORACLE = f"""
WITH eq AS (
  SELECT c_mktsegment, c_nationkey,
         COUNT(*) AS class_size,
         COUNT(DISTINCT c_acctbal) AS n_sensitive
  FROM customer
  GROUP BY c_mktsegment, c_nationkey
)
SELECT c_mktsegment,
       COUNT(*) AS n_classes,
       MIN(class_size) AS min_class_size,
       CAST(SUM(CASE WHEN class_size < {_KANON_K} THEN class_size ELSE 0 END)
            AS BIGINT) AS n_rows_below_k,
       MIN(n_sensitive) AS min_l_diversity
FROM eq
GROUP BY c_mktsegment
"""


@op("profile_k_anonymity", tags=("profiling", "quality", "privacy"), oracle=_KANON_ORACLE)
def profile_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity audit (Sweeney 2002; Machanavajjhala
    2007) for the quasi-identifier pair (segment, nation) with account
    balance as the sensitive attribute: per segment, the number of
    equivalence classes, the smallest class (k-anonymity level), how many
    ROWS sit in classes below k=5 (re-identification exposure mass), and
    the minimum distinct sensitive values in any class (l-diversity —
    a class where everyone shares one balance leaks it even at high k).
    The compliance gate a release pipeline runs before publishing — the
    quantitative companion to text_pii_redact's scrubbing.

    Scale shape: one combine-friendly groupBy to the equivalence-class
    table (bounded by the QI domain, not row count), then a second tiny
    rollup; COUNT(DISTINCT) shuffles only (QI, sensitive) pairs."""
    cust = lt(spark, sf_dir, "customer")
    eq = cust.groupBy("c_mktsegment", "c_nationkey").agg(
        F.count("*").alias("class_size"),
        F.countDistinct("c_acctbal").alias("n_sensitive"),
    )
    return eq.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_classes"),
        F.min("class_size").alias("min_class_size"),
        F.sum(
            F.when(F.col("class_size") < _KANON_K, F.col("class_size")).otherwise(0)
        ).alias("n_rows_below_k"),
        F.min("n_sensitive").alias("min_l_diversity"),
    )


# --- Functional-dependency discovery ---------------------------------------

_FD_CANDIDATES = (
    ("nation", "n_nationkey", "n_name"),
    ("nation", "n_name", "n_regionkey"),
    ("orders", "o_orderkey", "o_custkey"),
    ("orders", "o_custkey", "o_orderpriority"),
    ("customer", "c_custkey", "c_mktsegment"),
)


def _fd_sql_one(tbl: str, lhs: str, rhs: str) -> str:
    return f"""
SELECT '{tbl}' AS table_name, '{lhs}' AS lhs, '{rhs}' AS rhs,
       COUNT(*) AS n_lhs,
       CAST(SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violating_lhs,
       CAST(CASE WHEN MAX(n_rhs) = 1 THEN 1 ELSE 0 END AS BIGINT) AS holds
FROM (SELECT {lhs}, COUNT(DISTINCT {rhs}) AS n_rhs
      FROM {tbl} GROUP BY {lhs})"""


_FD_ORACLE = "\nUNION ALL\n".join(
    _fd_sql_one(t, l, r) for t, l, r in _FD_CANDIDATES
)


@op("profile_fd_discovery", tags=("profiling", "quality"), oracle=_FD_ORACLE)
def profile_fd_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency verification over a candidate set (the core
    loop of FD-discovery profilers à la TANE/Metanome, with the lattice
    search fixed to the five business-rule candidates a warehouse actually
    asserts): lhs→rhs holds iff no lhs value maps to two rhs values.
    Emits per candidate the lhs cardinality, how many lhs values violate,
    and the verdict as 0/1 — a schema-contract check (key-ness,
    dimension consistency) that runs before constraints are declared to
    the optimizer (cf. profile_constraints, which checks DECLARED
    contracts; this DISCOVERS them).

    Scale shape: each candidate is one combine-friendly groupBy(lhs)
    counting distinct rhs (shuffles (lhs, rhs) pairs only) folded to a
    single row; candidates union to a 5-row report. Nothing wider than
    the distinct pair set ever moves."""
    out = None
    for tbl, lhs, rhs in _FD_CANDIDATES:
        t = lt(spark, sf_dir, tbl)
        per_lhs = t.groupBy(lhs).agg(F.countDistinct(rhs).alias("n_rhs"))
        one = per_lhs.agg(
            F.count("*").alias("n_lhs"),
            F.sum(F.when(F.col("n_rhs") > 1, 1).otherwise(0)).alias(
                "n_violating_lhs"
            ),
            F.when(F.max("n_rhs") == 1, 1).otherwise(0).cast("long").alias("holds"),
        ).select(
            F.lit(tbl).alias("table_name"),
            F.lit(lhs).alias("lhs"),
            F.lit(rhs).alias("rhs"),
            "n_lhs",
            "n_violating_lhs",
            "holds",
        )
        out = one if out is None else out.unionByName(one)
    return out


# --- Parquet physical-layout introspection ---------------------------------

_PQMETA_TABLES = ("orders", "lineitem", "customer", "documents")

# parquet_metadata() takes a filename, not a view, so this is the one oracle
# that must name the dataset directory. It follows $SPARK_GRAFT_ORACLE_SF_DIR
# (defaulting to the correctness gate's pinned sf0.01) so a local diffcheck at
# any other scale factor compares the same files on both sides instead of
# spuriously failing (ADVICE r3).
_PQMETA_SF_DIR = os.environ.get(
    "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
)

_PQMETA_ORACLE = "\nUNION ALL\n".join(
    f"""
SELECT '{t}' AS table_name,
       CAST(row_group_id AS BIGINT) AS row_group,
       path_in_schema AS column_name,
       CAST(num_values AS BIGINT) AS num_values,
       CAST(total_compressed_size AS BIGINT) AS compressed_bytes,
       CAST(total_uncompressed_size AS BIGINT) AS uncompressed_bytes,
       CAST((total_compressed_size * 1000000) // total_uncompressed_size
            AS BIGINT) AS compression_ppm
FROM parquet_metadata('{_PQMETA_SF_DIR}/{t}.parquet')"""
    for t in _PQMETA_TABLES
)


@op("profile_parquet_metadata", tags=("profiling", "storage"), oracle=_PQMETA_ORACLE)
def profile_parquet_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Physical parquet-layout introspection straight from the file
    footers: per (table, row group, column chunk) the value count,
    compressed and uncompressed bytes, and the compression ratio in exact
    ppm — the numbers every layout decision in this repo (row-group
    sizing, clustering, z-order, maxPartitionBytes) is actually made
    FROM, surfaced as a queryable table instead of folklore. The oracle
    is DuckDB's parquet_metadata() over the SAME files: two independent
    footer parsers, byte-identical answers.

    Footers are KB-sized regardless of data volume, so this reads
    metadata only, driver-side, via pyarrow. (The oracle addresses files
    by path — parquet_metadata() takes a filename, not a view — following
    $SPARK_GRAFT_ORACLE_SF_DIR, default the gate's sf0.01; set it when
    diffchecking another scale factor.) At 100 TB (millions of
    files) the identical per-file logic runs distributed: list files,
    mapInPandas over paths, each task parsing its footers — the output
    schema and semantics here are exactly that job's."""
    import pyarrow.parquet as pqt

    rows = []
    for t in _PQMETA_TABLES:
        md = pqt.ParquetFile(os.path.join(sf_dir, f"{t}.parquet")).metadata
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            for ci in range(rg.num_columns):
                c = rg.column(ci)
                rows.append(
                    (
                        t,
                        g,
                        c.path_in_schema,
                        c.num_values,
                        c.total_compressed_size,
                        c.total_uncompressed_size,
                        (c.total_compressed_size * 1_000_000)
                        // c.total_uncompressed_size,
                    )
                )
    return spark.createDataFrame(
        rows,
        "table_name string, row_group long, column_name string, "
        "num_values long, compressed_bytes long, uncompressed_bytes long, "
        "compression_ppm long",
    )


# --- Deterministic experiment assignment + readout -------------------------

_AB_HASH = "substr(md5('exp1:' || CAST(user_id AS VARCHAR)), 1, 2)"

_AB_ORACLE = f"""
WITH assign AS (
  SELECT DISTINCT user_id,
         CASE WHEN {_AB_HASH} < '80' THEN 'A' ELSE 'B' END AS arm
  FROM events
),
conv AS (
  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
)
SELECT a.arm,
       COUNT(*) AS n_users,
       CAST(SUM(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_converted,
       CAST((SUM(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END) * 1000000)
            // COUNT(*) AS BIGINT) AS conversion_ppm
FROM assign a LEFT JOIN conv c ON a.user_id = c.user_id
GROUP BY a.arm
"""


@op("stats_ab_experiment_readout", tags=("profiling", "analytics", "sampling"), oracle=_AB_ORACLE)
def stats_ab_experiment_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic A/B experiment assignment and readout: each user's
    arm is a pure function of identity (`md5('exp1:' || user_id)` first
    byte < 0x80 → A, the repo's hash-membership convention at a 50/50
    split), so assignment survives retries, backfills, and re-analysis
    with zero stored state — the experiment SDK pattern (unit-of-
    randomization hashing) as an engine op. The readout reports per-arm
    population and purchase-conversion in exact ppm; the statistical
    test on top consumes these integers (the engine's job is the exact
    counts, not the p-value's transcendentals).

    Scale shape: assignment is a narrow map over the deduped user set;
    conversion is one semi-joinable distinct; the readout is a two-row
    rollup. Arm balance is itself an audit output — a skewed split means
    the hash domain or the population changed, caught here before any
    effect-size claim."""
    ev = lt(spark, sf_dir, "events")
    assign = ev.select("user_id").distinct().select(
        "user_id",
        F.when(
            F.substring(
                F.md5(F.concat(F.lit("exp1:"), F.col("user_id").cast("string"))),
                1,
                2,
            )
            < "80",
            "A",
        )
        .otherwise("B")
        .alias("arm"),
    )
    conv = (
        ev.where(F.col("event_type") == "purchase").select("user_id").distinct()
        .withColumn("converted", F.lit(1))
    )
    j = assign.join(F.broadcast(conv), "user_id", "left")
    return j.groupBy("arm").agg(
        F.count("*").alias("n_users"),
        F.sum(F.coalesce("converted", F.lit(0))).alias("n_converted"),
        F.expr(
            "CAST((SUM(COALESCE(converted, 0)) * 1000000) div COUNT(*) AS BIGINT)"
        ).alias("conversion_ppm"),
    )
