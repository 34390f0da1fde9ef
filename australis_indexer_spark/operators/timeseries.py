"""Time-series / hypertable-style operators over the events stream.

Reference parity: the reference engine orders and buckets block-height
streams (borealis-indexer's height-ordered delivery); these ops are the
time-bucket analytics layer a hypertable user expects on top — dense
gap-filled rollups with last-observation-carried-forward, and state-
duration accounting between irregular events.

Determinism: durations are exact integer epoch-seconds, money stays in
integer cents; timestamps are µs-precision NTZ on both engines (see
sources.batch.load_table), so every output column is engine-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..functions.det import cents, sql_cents
from ..registry import op
from ..sources.batch import load_table as lt

_GAPFILL_ORACLE = f"""
WITH bounds AS (
  SELECT date_trunc('hour', MIN(ts)) AS h0, date_trunc('hour', MAX(ts)) AS h1
  FROM events
),
spine_hours AS (
  SELECT UNNEST(generate_series(h0, h1, INTERVAL 1 HOUR)) AS bucket_hour
  FROM bounds
),
types AS (SELECT DISTINCT event_type FROM events),
spine AS (SELECT event_type, bucket_hour FROM types CROSS JOIN spine_hours),
observed AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket_hour,
         COUNT(*) AS n_obs,
         CAST(SUM({sql_cents('value')}) AS BIGINT) AS obs_cents
  FROM events GROUP BY 1, 2
),
joined AS (
  SELECT s.event_type, CAST(s.bucket_hour AS TIMESTAMP) AS bucket_hour,
         o.n_obs, o.obs_cents
  FROM spine s LEFT JOIN observed o
    ON s.event_type = o.event_type AND s.bucket_hour = o.bucket_hour
)
SELECT event_type, bucket_hour,
       COALESCE(n_obs, 0) AS n_events,
       CAST(CASE WHEN n_obs IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_gap,
       COALESCE(
         LAST_VALUE(obs_cents IGNORE NULLS) OVER (
           PARTITION BY event_type ORDER BY bucket_hour
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         0) AS locf_cents
FROM joined
"""


@op("window_time_gapfill_locf", tags=("timeseries", "window", "time"), oracle=_GAPFILL_ORACLE)
def window_time_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense gap-filled hourly rollup with last-observation-carried-forward
    (the TimescaleDB `time_bucket_gapfill` + `locf` shape): every (event
    type × hour) between the stream's first and last hour gets a row —
    observed hours carry their count and exact-cents value sum, missing
    hours get count 0, a gap flag, and the most recent observed hourly sum
    carried forward.

    Scale shape: the only large-input stage is the hourly aggregate, which
    map-side combines before its shuffle; the hour spine is generated from
    a ONE-ROW bounds aggregate (`sequence(h0, h1, interval 1 hour)` then
    explode) crossed with the tiny distinct-type table, so spine size is
    |hours|x|types| regardless of event volume. The LOCF window runs over
    that spine-sized table partitioned by type — at 100 TB the window input
    is still only (years x 8760 x types) rows. Leading cents before the
    first observation COALESCE to 0 so no nullable int column reaches the
    pandas bridge.
    """
    ev = lt(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).cast("timestamp_ntz").alias("h0"),
        F.date_trunc("hour", F.max("ts")).cast("timestamp_ntz").alias("h1"),
    )
    spine_hours = bounds.select(
        F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("bucket_hour")
    )
    types = ev.select("event_type").distinct()
    spine = types.crossJoin(F.broadcast(spine_hours))
    observed = ev.groupBy(
        "event_type",
        F.date_trunc("hour", "ts").cast("timestamp_ntz").alias("bucket_hour"),
    ).agg(
        F.count("*").alias("n_obs"),
        F.sum(cents(F.col("value"))).alias("obs_cents"),
    )
    joined = spine.join(observed, ["event_type", "bucket_hour"], "left")
    w = (
        W.partitionBy("event_type")
        .orderBy("bucket_hour")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return joined.select(
        "event_type",
        "bucket_hour",
        F.coalesce("n_obs", F.lit(0)).alias("n_events"),
        F.when(F.col("n_obs").isNull(), 1).otherwise(0).cast("long").alias("is_gap"),
        F.coalesce(F.last("obs_cents", ignorenulls=True).over(w), F.lit(0)).alias(
            "locf_cents"
        ),
    )


_STATE_ORACLE = """
WITH steps AS (
  SELECT user_id, event_type, ts,
         LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
  FROM events
)
SELECT event_type,
       COUNT(*) AS n_intervals,
       CAST(SUM(CAST(date_diff('second', ts, next_ts) AS BIGINT)) AS BIGINT)
         AS total_state_seconds,
       MAX(CAST(date_diff('second', ts, next_ts) AS BIGINT)) AS max_state_seconds
FROM steps
WHERE next_ts IS NOT NULL
GROUP BY event_type
"""


@op("window_time_in_state", tags=("timeseries", "window", "time"), oracle=_STATE_ORACLE)
def window_time_in_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """State-duration accounting over an irregular event stream: each event
    puts its user "in" that event's state until the user's next event, and
    the op totals exact integer seconds spent per state across all users
    (n_intervals, total and max dwell seconds). The last event per user is
    an open interval and is excluded — the batch form of the gap tracker's
    streaming semantics (streaming/stateful.py).

    Scale shape: ONE shuffle on user_id feeds the LEAD window (each user's
    history sorts independently within its partition — no global sort),
    and the per-state rollup that follows map-side combines to |types|
    rows. Durations are epoch-second BIGINT diffs on µs-exact NTZ
    timestamps — no floats anywhere.
    """
    ev = lt(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    steps = ev.select(
        "user_id",
        "event_type",
        "ts",
        F.lead("ts").over(w).alias("next_ts"),
    ).where(F.col("next_ts").isNotNull())
    dwell = (F.unix_timestamp("next_ts") - F.unix_timestamp("ts")).alias("dwell_s")
    return steps.select("event_type", dwell).groupBy("event_type").agg(
        F.count("*").alias("n_intervals"),
        F.sum("dwell_s").alias("total_state_seconds"),
        F.max("dwell_s").alias("max_state_seconds"),
    )


_RUNDIST_ORACLE = """
WITH firsts AS (
  SELECT event_type, user_id,
         CAST(date_trunc('day', MIN(ts)) AS TIMESTAMP) AS first_day
  FROM events GROUP BY event_type, user_id
),
daily AS (
  SELECT event_type, first_day AS day, COUNT(*) AS n_new_users
  FROM firsts GROUP BY event_type, first_day
)
SELECT event_type, day, n_new_users,
       CAST(SUM(n_new_users) OVER (
         PARTITION BY event_type ORDER BY day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_distinct_users
FROM daily
"""


@op(
    "window_running_distinct",
    tags=("timeseries", "window", "agg"),
    oracle=_RUNDIST_ORACLE,
)
def window_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running distinct-user count per event type by day — the cumulative
    audience curve — WITHOUT a distinct-aggregating window (which Spark
    doesn't support and which is inherently quadratic in frame size).
    Restated as: a user contributes on exactly their FIRST day (per-key MIN),
    daily new-user counts roll up, and a plain running SUM over the daily
    table is then exactly the running COUNT(DISTINCT).

    Scale shape: the only event-volume shuffle is the (type, user) MIN —
    map-side combined, output |types x users|; the daily rollup and running
    sum operate on |types x days| rows. The equivalent windowed
    collect_set/size plan would carry every user id through every frame.
    """
    ev = lt(spark, sf_dir, "events")
    firsts = ev.groupBy("event_type", "user_id").agg(
        F.date_trunc("day", F.min("ts")).cast("timestamp_ntz").alias("first_day")
    )
    daily = firsts.groupBy(
        "event_type", F.col("first_day").alias("day")
    ).agg(F.count("*").alias("n_new_users"))
    w = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return daily.select(
        "event_type",
        "day",
        "n_new_users",
        F.sum("n_new_users").over(w).alias("cum_distinct_users"),
    )


_OHLC_ORACLE = f"""
WITH ranked AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket_hour, value,
         first_value(value) OVER (
           PARTITION BY event_type, date_trunc('hour', ts)
           ORDER BY ts, event_id) AS open_v,
         last_value(value) OVER (
           PARTITION BY event_type, date_trunc('hour', ts)
           ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS close_v
  FROM events
)
SELECT event_type, CAST(bucket_hour AS TIMESTAMP) AS bucket_hour,
       MIN(open_v)  AS open,
       MAX(value)   AS high,
       MIN(value)   AS low,
       MIN(close_v) AS close,
       COUNT(*)     AS n_events,
       CAST(SUM({sql_cents('value')}) AS BIGINT) AS volume_cents
FROM ranked
GROUP BY event_type, bucket_hour
"""


@op("window_time_ohlc_bars", tags=("timeseries", "agg", "time"), oracle=_OHLC_ORACLE)
def window_time_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downsample the irregular event stream into hourly OHLC candles per
    event type (the financial-tick / hypertable `candlestick_agg` shape):
    open and close are the first/last observed value in the bucket under
    the total order (ts, event_id) — the unique event id breaks timestamp
    ties so the selected row can never depend on scan order — plus exact
    high/low/count and the value sum in integer cents.

    Scale shape: ONE map-side-combinable groupBy — `min_by`/`max_by` keyed
    on the (ts, event_id) struct carry first/last through partial
    aggregation, so no window, no sort, and no second shuffle ever touches
    the raw stream (the oracle restates the same semantics as a
    first/last_value window, which is the plan this op deliberately
    avoids: a window would sort every partition; the aggregate reduces
    each map task to |types×hours| rows before the exchange). high/low/
    open/close compare raw parquet doubles — no arithmetic, so engine-
    exact without the cents detour; only the accumulated volume needs it."""
    ev = lt(spark, sf_dir, "events")
    key = F.struct(F.col("ts"), F.col("event_id"))
    return (
        ev.groupBy(
            "event_type",
            F.date_trunc("hour", "ts").cast("timestamp_ntz").alias("bucket_hour"),
        )
        .agg(
            F.min_by("value", key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", key).alias("close"),
            F.count("*").alias("n_events"),
            F.sum(cents(F.col("value"))).alias("volume_cents"),
        )
    )


# Truncating integer division shared by both engines: Spark's `div`
# truncates toward zero while DuckDB's `//` floors, so the oracle wraps
# the negative case explicitly. Numerators here are (next-prev)*(g-p),
# which is negative whenever the series is falling.
_TRUNCDIV_SPARK = "({n}) div ({d})"
_TRUNCDIV_DUCK = "CASE WHEN ({n}) >= 0 THEN CAST(({n}) // ({d}) AS BIGINT) ELSE -CAST((-({n})) // ({d}) AS BIGINT) END"

_INTERP_ORACLE = f"""
WITH bounds AS (
  SELECT date_trunc('hour', MIN(ts)) AS h0, date_trunc('hour', MAX(ts)) AS h1
  FROM events
),
grid AS (
  SELECT event_type, UNNEST(generate_series(h0, h1, INTERVAL 1 HOUR)) AS gts
  FROM bounds CROSS JOIN (SELECT DISTINCT event_type FROM events) t
),
merged AS (
  SELECT event_type, ts, 0 AS kind, event_id,
         CAST(epoch_us(ts) AS BIGINT) AS ts_us,
         CAST(ROUND(value * 100.0) AS BIGINT) AS v_cents
  FROM events
  UNION ALL
  SELECT event_type, gts AS ts, 1 AS kind, -1 AS event_id,
         CAST(epoch_us(gts) AS BIGINT) AS ts_us, NULL AS v_cents
  FROM grid
),
walked AS (
  SELECT event_type, ts, kind, ts_us,
         LAST_VALUE(v_cents IGNORE NULLS) OVER w_fwd AS prev_c,
         LAST_VALUE(CASE WHEN kind = 0 THEN ts_us END IGNORE NULLS) OVER w_fwd AS prev_us,
         FIRST_VALUE(v_cents IGNORE NULLS) OVER w_rev AS next_c,
         FIRST_VALUE(CASE WHEN kind = 0 THEN ts_us END IGNORE NULLS) OVER w_rev AS next_us
  FROM merged
  WINDOW
    w_fwd AS (PARTITION BY event_type ORDER BY ts_us, kind, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    w_rev AS (PARTITION BY event_type ORDER BY ts_us, kind, event_id
              ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
)
SELECT event_type, CAST(ts AS TIMESTAMP) AS grid_ts,
       prev_c AS prev_cents, next_c AS next_cents,
       prev_c + ({_TRUNCDIV_DUCK.format(
           n="CAST(next_c - prev_c AS HUGEINT) * (ts_us - prev_us)",
           d="next_us - prev_us")}) AS interp_cents
FROM walked
WHERE kind = 1 AND prev_c IS NOT NULL AND next_c IS NOT NULL
"""


@op("window_time_interpolate_linear", tags=("timeseries", "window", "time"), oracle=_INTERP_ORACLE)
def window_time_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation of the irregular event stream onto the hourly
    grid (the hypertable `interpolate()` companion to gapfill's LOCF):
    each interior grid instant gets prev + (next−prev)·(g−p)/(n−p)
    evaluated in EXACT integer arithmetic — cents for values, epoch-µs
    for time, one truncating integer division (semantics pinned on both
    engines; Spark `div` truncates, DuckDB `//` floors, and the oracle
    spells out the negative branch so falling series can't drift by one).

    Scale shape: the same merge-the-spine trick as gapfill — grid points
    UNION into the observation stream (spine is |types×hours|, tiny), and
    ONE forward + ONE reverse window walk per type carries the straddling
    observation pair to every grid row; no per-grid-point join, no range
    join, no re-scan. Boundary grid points (before the first / after the
    last observation) are excluded rather than extrapolated."""
    ev = lt(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).cast("timestamp_ntz").alias("h0"),
        F.date_trunc("hour", F.max("ts")).cast("timestamp_ntz").alias("h1"),
    )
    grid = (
        ev.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("gts"),
        )
    )
    obs = ev.select(
        "event_type",
        F.col("ts"),
        F.lit(0).alias("kind"),
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        cents(F.col("value")).alias("v_cents"),
    )
    gridr = grid.select(
        "event_type",
        F.col("gts").alias("ts"),
        F.lit(1).alias("kind"),
        F.lit(-1).alias("event_id"),
        F.unix_micros(F.col("gts").cast("timestamp")).alias("ts_us"),
        F.lit(None).cast("long").alias("v_cents"),
    )
    merged = obs.unionByName(gridr)
    w_fwd = (
        W.partitionBy("event_type")
        .orderBy("ts_us", "kind", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_rev = (
        W.partitionBy("event_type")
        .orderBy("ts_us", "kind", "event_id")
        .rowsBetween(1, W.unboundedFollowing)
    )
    obs_us = F.when(F.col("kind") == 0, F.col("ts_us"))
    walked = merged.select(
        "event_type",
        "ts",
        "kind",
        "ts_us",
        F.last("v_cents", ignorenulls=True).over(w_fwd).alias("prev_c"),
        F.last(obs_us, ignorenulls=True).over(w_fwd).alias("prev_us"),
        F.first("v_cents", ignorenulls=True).over(w_rev).alias("next_c"),
        F.first(obs_us, ignorenulls=True).over(w_rev).alias("next_us"),
    )
    # The numerator is cents-delta × µs-gap: at enterprise money scale
    # (~1e10 cents) against a multi-day gap (~1e12 µs) the INT64 product
    # crosses 2^63 — ANSI ARITHMETIC_OVERFLOW, caught by the bignum fuzz
    # profile. Widen to DECIMAL(38,0) / HUGEINT for the product only; the
    # quotient is back at cents scale and `div` returns BIGINT on both.
    interp = F.expr(
        _TRUNCDIV_SPARK.format(
            n="CAST(next_c - prev_c AS DECIMAL(38, 0)) * (ts_us - prev_us)",
            d="next_us - prev_us",
        )
    )
    return (
        walked.where(
            (F.col("kind") == 1)
            & F.col("prev_c").isNotNull()
            & F.col("next_c").isNotNull()
        )
        .select(
            "event_type",
            F.col("ts").alias("grid_ts"),
            F.col("prev_c").alias("prev_cents"),
            F.col("next_c").alias("next_cents"),
            (F.col("prev_c") + interp).alias("interp_cents"),
        )
    )


_HQ_NBINS = 100
_HQ_QS = (500_000, 900_000, 990_000)  # ppm

_HQ_ORACLE = f"""
WITH vals AS (
  SELECT event_type, event_id,
         CAST(ROUND(value * 100.0) AS BIGINT) AS v_cents
  FROM events
  WHERE value IS NOT NULL
),
width AS (
  SELECT CAST((MAX(v_cents) + {_HQ_NBINS}) // {_HQ_NBINS} AS BIGINT) AS w
  FROM vals
),
hist AS (
  SELECT event_type, v_cents // w AS bin, COUNT(*) AS cnt
  FROM vals CROSS JOIN width GROUP BY event_type, v_cents // w
),
cum AS (
  SELECT event_type, bin, cnt,
         SUM(cnt) OVER (PARTITION BY event_type ORDER BY bin
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
  FROM hist
),
n AS (SELECT event_type, COUNT(*) AS n FROM vals GROUP BY event_type),
targets AS (
  SELECT event_type, n, q_ppm,
         CAST((q_ppm * n + 999999) // 1000000 AS BIGINT) AS rank_needed
  FROM n CROSS JOIN (SELECT UNNEST(CAST([{", ".join(map(str, _HQ_QS))}] AS BIGINT[])) AS q_ppm)
),
est AS (
  SELECT t.event_type, t.q_ppm, t.rank_needed, t.n,
         MIN(c.bin) AS est_bin
  FROM targets t JOIN cum c
    ON c.event_type = t.event_type AND c.c >= t.rank_needed
  GROUP BY t.event_type, t.q_ppm, t.rank_needed, t.n
),
ranked AS (
  SELECT event_type, v_cents,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY v_cents, event_id) AS rk
  FROM vals
)
SELECT e.event_type, e.q_ppm, e.n,
       (e.est_bin + 1) * w AS est_upper_cents,
       r.v_cents AS exact_cents,
       (e.est_bin + 1) * w - r.v_cents AS err_cents
FROM est e
JOIN ranked r ON r.event_type = e.event_type AND r.rk = e.rank_needed
CROSS JOIN width
"""


@op("agg_quantile_from_histogram", tags=("timeseries", "agg", "sketch"), oracle=_HQ_ORACLE)
def agg_quantile_from_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantiles SERVED FROM a fixed-bin histogram sketch, with the exact
    answer computed alongside so the sketch's error is part of the
    checked output: p50/p90/p99 per event type as the upper bound of the
    first histogram bin whose cumulative count reaches ⌈q·n⌉, next to the
    true order statistic at the same rank. The histogram is the mergeable
    summary a 100 TB monitoring pipeline actually maintains (bounded
    state: |types×bins| integers, additive across partitions, days,
    clusters — cf. agg_countmin_heavyhitters for counts); the exact
    column is the audit that bounds its error to one bin width, here
    provably (err_cents ∈ [0, w]).

    Everything is integer: cents, integer bin width w = ⌈max/NBINS⌉,
    ceiling ranks by integer arithmetic, so both engines agree exactly.
    Scale shape: the histogram build is one combine-friendly groupBy;
    the cumulative walk runs over |types×bins| rows; only the audit's
    order statistic touches a per-type sort — at 100 TB you drop that
    audit column and keep the sketch."""
    ev = lt(spark, sf_dir, "events")
    # quantiles are over PRESENT measurements: NULL values would form a
    # NULL histogram bin and rank NULLS FIRST in Spark vs NULLS LAST in
    # DuckDB's audit ranks (nullstorm:141 kill) — exclude them up front
    vals = ev.where(F.col("value").isNotNull()).select(
        "event_type",
        "event_id",
        cents(F.col("value")).alias("v_cents"),
    )
    width = vals.agg(
        F.expr(f"CAST((MAX(v_cents) + {_HQ_NBINS}) div {_HQ_NBINS} AS BIGINT)").alias("w")
    )
    hist = (
        vals.crossJoin(F.broadcast(width))
        .groupBy("event_type", F.expr("v_cents div w").alias("bin"))
        .agg(F.count("*").alias("cnt"))
    )
    cum = hist.select(
        "event_type",
        "bin",
        F.sum("cnt")
        .over(
            W.partitionBy("event_type")
            .orderBy("bin")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        .alias("c"),
    )
    n = vals.groupBy("event_type").agg(F.count("*").alias("n"))
    qdf = spark.createDataFrame([(q,) for q in _HQ_QS], "q_ppm long")
    targets = n.crossJoin(F.broadcast(qdf)).select(
        "event_type",
        "n",
        "q_ppm",
        F.expr("CAST((q_ppm * n + 999999) div 1000000 AS BIGINT)").alias(
            "rank_needed"
        ),
    )
    t = targets.alias("t")
    c = cum.alias("c")
    est = (
        t.join(
            c,
            (F.col("c.event_type") == F.col("t.event_type"))
            & (F.col("c.c") >= F.col("t.rank_needed")),
        )
        .groupBy(
            F.col("t.event_type").alias("event_type"),
            "t.q_ppm",
            "t.rank_needed",
            "t.n",
        )
        .agg(F.min("c.bin").alias("est_bin"))
    )
    ranked = vals.select(
        "event_type",
        "v_cents",
        F.row_number()
        .over(W.partitionBy("event_type").orderBy("v_cents", "event_id"))
        .alias("rk"),
    )
    r = ranked.alias("r")
    e = est.alias("e")
    return (
        e.join(
            r,
            (F.col("r.event_type") == F.col("e.event_type"))
            & (F.col("r.rk") == F.col("e.rank_needed")),
        )
        .crossJoin(F.broadcast(width))
        .select(
            F.col("e.event_type").alias("event_type"),
            F.col("e.q_ppm").alias("q_ppm"),
            F.col("e.n").alias("n"),
            ((F.col("est_bin") + 1) * F.col("w")).alias("est_upper_cents"),
            F.col("r.v_cents").alias("exact_cents"),
            ((F.col("est_bin") + 1) * F.col("w") - F.col("r.v_cents")).alias(
                "err_cents"
            ),
        )
    )


_CEP_WINDOW_S = 1800  # purchase must follow within 30 minutes

_CEP_ORACLE = f"""
WITH seq AS (
  SELECT user_id, event_id, event_type, ts,
         LEAD(event_type, 1) OVER w AS t1,
         LEAD(event_type, 2) OVER w AS t2,
         LEAD(ts, 1) OVER w AS ts1,
         LEAD(ts, 2) OVER w AS ts2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
matches AS (
  SELECT user_id, event_id, ts,
         CASE
           WHEN t1 = 'purchase'
                AND date_diff('second', ts, ts1) <= {_CEP_WINDOW_S} THEN 1
           WHEN t2 = 'purchase' AND (t1 IS NOT NULL AND t1 <> 'purchase')
                AND date_diff('second', ts, ts2) <= {_CEP_WINDOW_S} THEN 2
           ELSE 0 END AS hit_gap
  FROM seq WHERE event_type = 'click'
)
SELECT user_id,
       COUNT(*) AS n_clicks,
       CAST(SUM(CASE WHEN hit_gap > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_converted,
       CAST(SUM(CASE WHEN hit_gap = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_immediate,
       COALESCE(MIN(CASE WHEN hit_gap > 0 THEN event_id END), -1)
         AS first_converting_click
FROM matches
GROUP BY user_id
"""


@op("window_pattern_cep", tags=("timeseries", "window", "cep"), oracle=_CEP_ORACLE)
def window_pattern_cep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-pattern detection (the MATCH_RECOGNIZE / Flink-CEP shape
    expressed on window functions): per user, find every click followed
    by a purchase within the next TWO events AND 30 minutes — pattern
    `click → (¬purchase)? → purchase` under a time constraint. LEAD
    pulls each click's next two events alongside it, so the pattern
    becomes a row-local predicate: no self-join, no per-pattern scan —
    the plan is ONE shuffle on user_id serving both LEAD frames, then a
    rollup to per-user conversion counts (clicks, converted, immediate,
    first converting click id with -1 sentinel).

    At 100 TB this is the CEP trade: fixed-lookahead patterns compile to
    LEAD columns (k columns for lookahead k, always one shuffle);
    unbounded patterns need the stateful path
    (stream_stateful_gap_tracker's applyInPandasWithState)."""
    ev = lt(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_id",
        "event_type",
        "ts",
        F.lead("event_type", 1).over(w).alias("t1"),
        F.lead("event_type", 2).over(w).alias("t2"),
        F.lead("ts", 1).over(w).alias("ts1"),
        F.lead("ts", 2).over(w).alias("ts2"),
    ).where(F.col("event_type") == "click")
    gap_ok1 = (
        F.unix_micros(F.col("ts1").cast("timestamp"))
        - F.unix_micros(F.col("ts").cast("timestamp"))
    ) <= _CEP_WINDOW_S * 1_000_000
    gap_ok2 = (
        F.unix_micros(F.col("ts2").cast("timestamp"))
        - F.unix_micros(F.col("ts").cast("timestamp"))
    ) <= _CEP_WINDOW_S * 1_000_000
    hit_gap = (
        F.when((F.col("t1") == "purchase") & gap_ok1, 1)
        .when(
            (F.col("t2") == "purchase")
            & F.col("t1").isNotNull()
            & (F.col("t1") != "purchase")
            & gap_ok2,
            2,
        )
        .otherwise(0)
    )
    m = seq.select("user_id", "event_id", hit_gap.alias("hit_gap"))
    return m.groupBy("user_id").agg(
        F.count("*").alias("n_clicks"),
        F.sum(F.when(F.col("hit_gap") > 0, 1).otherwise(0)).alias("n_converted"),
        F.sum(F.when(F.col("hit_gap") == 1, 1).otherwise(0)).alias("n_immediate"),
        F.coalesce(
            F.min(F.when(F.col("hit_gap") > 0, F.col("event_id"))), F.lit(-1)
        ).alias("first_converting_click"),
    )


_MARKOV_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type AS src,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS dst
  FROM events
),
trans AS (
  SELECT src, dst, COUNT(*) AS n_trans
  FROM seq WHERE dst IS NOT NULL GROUP BY src, dst
),
outdeg AS (SELECT src, SUM(n_trans) AS n_out FROM trans GROUP BY src)
SELECT t.src, t.dst, t.n_trans,
       CAST((t.n_trans * 1000000) // o.n_out AS BIGINT) AS prob_ppm
FROM trans t JOIN outdeg o ON o.src = t.src
"""


@op("stats_markov_transitions", tags=("timeseries", "profiling", "graph"), oracle=_MARKOV_ORACLE)
def stats_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user behavior: for every
    (src → dst) event-type pair, how often a user's next event follows,
    with the row-normalized transition probability in exact integer ppm —
    the path-analysis summary funnels and CEP patterns are designed FROM
    (you pick patterns worth detecting by reading this matrix). LEAD over
    each user's ordered stream emits consecutive pairs without a self
    join; the matrix is |types|² rows regardless of volume.

    Scale shape: one shuffle on user_id for the LEAD, one combine-
    friendly rollup to the matrix, out-degrees re-derived from the matrix
    itself (no second scan) and joined back broadcast-sized."""
    ev = lt(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    ).where(F.col("dst").isNotNull())
    trans = seq.groupBy("src", "dst").agg(F.count("*").alias("n_trans"))
    outdeg = trans.groupBy("src").agg(F.sum("n_trans").alias("n_out"))
    return (
        trans.join(F.broadcast(outdeg), "src")
        .select(
            "src",
            "dst",
            "n_trans",
            F.expr("(n_trans * 1000000) div n_out").alias("prob_ppm"),
        )
    )


_RATE_ORACLE = """
WITH steps AS (
  SELECT event_type, event_id, ts,
         CAST(ROUND(value * 100.0) AS BIGINT) AS v_cents,
         LAG(CAST(ROUND(value * 100.0) AS BIGINT)) OVER w AS prev_cents,
         LAG(ts) OVER w AS prev_ts
  FROM events
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
),
deltas AS (
  SELECT event_type,
         v_cents - prev_cents AS delta_cents,
         CAST((epoch_us(ts) - epoch_us(prev_ts)) // 1000000 AS BIGINT) AS dt_s
  FROM steps WHERE prev_ts IS NOT NULL
)
SELECT event_type,
       COUNT(*) AS n_steps,
       CAST(SUM(CASE WHEN delta_cents > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_rising,
       CAST(SUM(ABS(delta_cents)) AS BIGINT) AS total_variation_cents,
       MAX(ABS(delta_cents)) AS max_abs_delta_cents,
       CAST(SUM(dt_s) AS BIGINT) AS total_elapsed_s
FROM deltas
GROUP BY event_type
"""


@op("window_time_rate_of_change", tags=("timeseries", "window", "time"), oracle=_RATE_ORACLE)
def window_time_rate_of_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete derivative of each event-type series (the hypertable
    `delta`/`rate` shape): LAG pairs every observation with its
    predecessor, and the per-type rollup reports step count, rising-step
    count, TOTAL VARIATION (Σ|Δ| — the wiggliness measure change-point
    monitors threshold on), the largest single jump, and elapsed seconds
    — rate served as exact integer (variation, elapsed) pairs rather
    than a float division. Completes the hypertable family's calculus
    corner next to interpolate (values between observations), in_state
    (durations), and OHLC (extrema).

    Scale shape: ONE shuffle on event_type feeds the LAG window; the
    rollup map-side combines to |types| rows. At high cardinality the
    partition key would be (type, series_id) — same plan."""
    ev = lt(spark, sf_dir, "events")
    w = W.partitionBy("event_type").orderBy("ts", "event_id")
    v = cents(F.col("value"))
    steps = ev.select(
        "event_type",
        "ts",
        v.alias("v_cents"),
        F.lag(v).over(w).alias("prev_cents"),
        F.lag("ts").over(w).alias("prev_ts"),
    ).where(F.col("prev_ts").isNotNull())
    deltas = steps.select(
        "event_type",
        (F.col("v_cents") - F.col("prev_cents")).alias("delta_cents"),
        F.expr(
            "(unix_micros(CAST(ts AS TIMESTAMP))"
            " - unix_micros(CAST(prev_ts AS TIMESTAMP))) div 1000000"
        ).alias("dt_s"),
    )
    return deltas.groupBy("event_type").agg(
        F.count("*").alias("n_steps"),
        F.sum(F.when(F.col("delta_cents") > 0, 1).otherwise(0)).alias("n_rising"),
        F.sum(F.abs("delta_cents")).alias("total_variation_cents"),
        F.max(F.abs("delta_cents")).alias("max_abs_delta_cents"),
        F.sum("dt_s").alias("total_elapsed_s"),
    )


_SLIDE_HOURS = 24

_SLIDE_DISTINCT_ORACLE = f"""
WITH presence AS (
  SELECT DISTINCT date_trunc('hour', ts) AS h, user_id FROM events
),
contrib AS (
  SELECT user_id, h + TO_HOURS(CAST(g.i AS BIGINT)) AS window_end_hour
  FROM presence,
  LATERAL (SELECT UNNEST(range({_SLIDE_HOURS})) AS i) g
),
windows AS (
  SELECT CAST(window_end_hour AS TIMESTAMP) AS window_end_hour,
         COUNT(DISTINCT user_id) AS n_distinct_users
  FROM contrib GROUP BY window_end_hour
),
bounds AS (
  SELECT date_trunc('hour', MIN(ts)) AS h0, date_trunc('hour', MAX(ts)) AS h1
  FROM events
)
SELECT w.window_end_hour, w.n_distinct_users
FROM windows w, bounds b
WHERE w.window_end_hour >= b.h0 + TO_HOURS({_SLIDE_HOURS} - 1)
  AND w.window_end_hour <= b.h1
"""


@op("window_sliding_distinct_users", tags=("timeseries", "window", "agg"), oracle=_SLIDE_DISTINCT_ORACLE)
def window_sliding_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct users over a 24-hour sliding window (per ending
    hour) — the metric a naive plan computes as COUNT(DISTINCT) OVER a
    RANGE frame, which Spark correctly refuses (distinct isn't
    subtractable, so no incremental frame exists). The scalable exact
    form: dedup presence to (hour, user), explode each presence into the
    {_SLIDE_HOURS} window-ends it contributes to (fan-out = window/granularity,
    a CONSTANT), then one distinct-count per window-end. Interior windows
    only (full {_SLIDE_HOURS}-hour support) so edges don't report partial windows.

    Scale shape: presence dedup is one combine-friendly shuffle that also
    collapses volume to |hours×users-active|; the explode is narrow with
    constant fan-out; the final distinct shuffles (window_end, user)
    pairs. Nothing resembles the O(|window|·|stream|) re-scan the RANGE
    frame would need — and when approximate is acceptable the same spine
    takes agg_hll_daily_merge's sketches instead."""
    ev = lt(spark, sf_dir, "events")
    presence = ev.select(
        F.date_trunc("hour", "ts").cast("timestamp_ntz").alias("h"), "user_id"
    ).distinct()
    offs = spark.range(_SLIDE_HOURS).select(F.col("id").alias("i"))
    contrib = presence.crossJoin(F.broadcast(offs)).select(
        "user_id",
        (F.col("h") + F.make_dt_interval(hours=F.col("i").cast("int"))).alias(
            "window_end_hour"
        ),
    )
    windows = contrib.groupBy("window_end_hour").agg(
        F.countDistinct("user_id").alias("n_distinct_users")
    )
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).cast("timestamp_ntz").alias("h0"),
        F.date_trunc("hour", F.max("ts")).cast("timestamp_ntz").alias("h1"),
    )
    return (
        windows.crossJoin(F.broadcast(bounds))
        .where(
            (
                F.col("window_end_hour")
                >= F.col("h0") + F.expr(f"INTERVAL {_SLIDE_HOURS - 1} HOURS")
            )
            & (F.col("window_end_hour") <= F.col("h1"))
        )
        .select("window_end_hour", "n_distinct_users")
    )


_SEASON_ORACLE = """
SELECT event_type,
       CAST(isodow(ts) AS BIGINT) AS dow,
       CAST(hour(ts) AS BIGINT) AS hod,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(ROUND(value * 100.0) AS BIGINT)) AS BIGINT) AS total_cents,
       CAST((SUM(CAST(ROUND(value * 100.0) AS BIGINT)) * 100) // COUNT(*)
            AS BIGINT) AS mean_cents_x100
FROM events
GROUP BY event_type, dow, hod
"""


@op("stats_seasonality_heatmap", tags=("timeseries", "agg", "profiling"), oracle=_SEASON_ORACLE)
def stats_seasonality_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week × hour-of-day seasonality heatmap per event type —
    the fixed 7×24 grid an ops dashboard draws and an anomaly detector
    baselines against (agg_anomalous_hours flags deviations from the
    GLOBAL hourly mean; this is the conditional mean it should really be
    compared to, because Monday 9am and Sunday 3am are different
    normals). Counts, exact cent totals, and the mean at two fixed
    decimals by integer floor division — no float average. ISO weekday
    numbering (Mon=1) on both engines via isodow/dayofweek mapping.

    Scale shape: ONE map-side-combinable groupBy to at most
    |types|×7×24 rows, the canonical bounded-cardinality rollup — at
    100 TB this is still a 840-row table per type family."""
    ev = lt(spark, sf_dir, "events")
    # Spark dayofweek: Sun=1..Sat=7 → ISO Mon=1..Sun=7
    iso_dow = ((F.dayofweek("ts") + 5) % 7) + 1
    return (
        ev.groupBy(
            "event_type",
            iso_dow.cast("long").alias("dow"),
            F.hour("ts").cast("long").alias("hod"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(cents(F.col("value"))).alias("total_cents"),
        )
        # derive the mean from the emitted aggregates instead of a second
        # SUM(ROUND(value*100)) aggregate — the r10 form computed the cents
        # sum twice per group (the expressions no longer dedup once cents()
        # is floor-form); same integer math as the oracle's (sum*100)//count
        .withColumn(
            "mean_cents_x100",
            F.expr("CAST((total_cents * 100) div n_events AS BIGINT)"),
        )
    )


_NVR_ORACLE = """
WITH firsts AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day FROM events GROUP BY user_id
),
daily AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
)
SELECT CAST(d.day AS TIMESTAMP) AS day,
       COUNT(*) AS n_active,
       CAST(SUM(CASE WHEN d.day = f.first_day THEN 1 ELSE 0 END) AS BIGINT)
         AS n_new,
       CAST(SUM(CASE WHEN d.day > f.first_day THEN 1 ELSE 0 END) AS BIGINT)
         AS n_returning
FROM daily d JOIN firsts f ON d.user_id = f.user_id
GROUP BY d.day
"""


@op("agg_new_vs_returning_users", tags=("timeseries", "agg", "analytics"), oracle=_NVR_ORACLE)
def agg_new_vs_returning_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new-vs-returning user split — the growth-accounting metric
    every product dashboard leads with: a user is 'new' on the day of
    their first-ever event and 'returning' on every later active day.
    First-day assignment is a MIN over the user's whole history (the
    same first-occurrence reduction window_running_distinct uses), so no
    window function and no ordering — two combine-friendly aggregates
    and one join on user_id that reuses the same hash partitioning.

    Scale shape: daily-presence dedup collapses volume to |days×active|;
    the firsts table is |users| and joins on the key both sides already
    shuffled on; the final rollup is |days| rows. Incremental form at
    100 TB: firsts is a monotone MERGE-able table (min is idempotent) —
    cf. stream_ivm_join_view for the fold discipline."""
    ev = lt(spark, sf_dir, "events")
    day = F.col("ts").cast("date")
    firsts = ev.groupBy("user_id").agg(F.min(day).alias("first_day"))
    daily = ev.select(day.alias("day"), "user_id").distinct()
    j = daily.join(firsts, "user_id")
    return (
        j.groupBy(F.col("day").cast("timestamp_ntz").alias("day"))
        .agg(
            F.count("*").alias("n_active"),
            F.sum(F.when(F.col("day") == F.col("first_day"), 1).otherwise(0)).alias(
                "n_new"
            ),
            F.sum(F.when(F.col("day") > F.col("first_day"), 1).otherwise(0)).alias(
                "n_returning"
            ),
        )
    )


_STREAK_ORACLE = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
),
islands AS (
  SELECT user_id, d,
         d - CAST(ROW_NUMBER() OVER (
                  PARTITION BY user_id ORDER BY d) AS INTEGER) AS grp
  FROM days
),
runs AS (
  SELECT user_id, COUNT(*) AS run_len, MAX(d) AS run_end
  FROM islands GROUP BY user_id, grp
),
best AS (
  SELECT user_id,
         MAX(run_len) AS longest_streak_days,
         COUNT(*) AS n_streaks
  FROM runs GROUP BY user_id
),
latest AS (
  SELECT user_id, run_len AS last_streak_days,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY run_end DESC) AS rk
  FROM runs
)
SELECT b.user_id, b.longest_streak_days, b.n_streaks, l.last_streak_days
FROM best b JOIN latest l ON b.user_id = l.user_id AND l.rk = 1
"""


@op("window_longest_streak", tags=("timeseries", "window", "analytics"), oracle=_STREAK_ORACLE)
def window_longest_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-active-day streak per user — the canonical
    gaps-and-islands problem solved the classic way: within each user's
    sorted distinct days, `day − row_number` is CONSTANT exactly along a
    consecutive run, so grouping by that difference labels every island
    without any self-join or iteration. Emits longest streak, number of
    distinct streaks, and the most recent streak's length (engagement
    metrics dashboards call these 'best streak' / 'current streak').

    Scale shape: presence dedup collapses to |user-days|; ONE shuffle on
    user_id serves the row_number, the island rollup, and the per-user
    reduction — Catalyst reuses the partitioning across all three."""
    ev = lt(spark, sf_dir, "events")
    days = ev.select("user_id", F.col("ts").cast("date").alias("d")).distinct()
    w = W.partitionBy("user_id").orderBy("d")
    islands = days.select(
        "user_id",
        "d",
        F.date_sub(F.col("d"), F.row_number().over(w)).alias("grp"),
    )
    runs = islands.groupBy("user_id", "grp").agg(
        F.count("*").alias("run_len"), F.max("d").alias("run_end")
    )
    best = runs.groupBy("user_id").agg(
        F.max("run_len").alias("longest_streak_days"),
        F.count("*").alias("n_streaks"),
    )
    wl = W.partitionBy("user_id").orderBy(F.col("run_end").desc())
    latest = (
        runs.select(
            "user_id",
            F.col("run_len").alias("last_streak_days"),
            F.row_number().over(wl).alias("rk"),
        )
        .where(F.col("rk") == 1)
        .drop("rk")
    )
    return best.join(latest, "user_id")


_DWM_HORIZONS = (1, 7, 30)

_DWM_ORACLE = f"""
WITH presence AS (
  SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
),
bounds AS (SELECT MIN(d) AS d0, MAX(d) AS d1 FROM presence),
contrib AS (
  SELECT h.k, p.user_id, p.d + CAST(g.i AS INTEGER) AS wend
  FROM presence p
  CROSS JOIN (SELECT UNNEST([{", ".join(map(str, _DWM_HORIZONS))}]) AS k) h
  CROSS JOIN LATERAL (SELECT UNNEST(range(h.k)) AS i) g
),
counts AS (
  SELECT wend, k, COUNT(DISTINCT user_id) AS n
  FROM contrib GROUP BY wend, k
),
pivoted AS (
  SELECT wend AS day,
         MAX(CASE WHEN k = 1 THEN n END) AS dau,
         MAX(CASE WHEN k = 7 THEN n END) AS wau,
         MAX(CASE WHEN k = 30 THEN n END) AS mau
  FROM counts GROUP BY wend
)
SELECT CAST(p.day AS TIMESTAMP) AS day,
       COALESCE(p.dau, 0) AS dau, p.wau, p.mau,
       CAST((COALESCE(p.dau, 0) * 1000000) // p.mau AS BIGINT)
         AS stickiness_ppm
FROM pivoted p, bounds b
WHERE p.day >= b.d0 + 29 AND p.day <= b.d1
"""


@op("agg_dau_wau_mau", tags=("timeseries", "agg", "analytics"), oracle=_DWM_ORACLE)
def agg_dau_wau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / WAU / MAU and stickiness (DAU/MAU, the engagement-quality
    ratio) per day — the multi-horizon generalization of
    window_sliding_distinct_users: one deduped (day, user) presence
    table feeds all three horizons via constant fan-out explode (1+7+30
    rows per presence), one distinct-count per (window-end, horizon),
    and a pivot to the daily report with stickiness in exact ppm.
    Interior days only (full 30-day support) so MAU never reports a
    partial window; DAU coalesces to 0 on days where a window end
    exists without same-day actives.

    Scale shape: exactly sliding-distinct's — presence dedup collapses
    volume first, fan-out is a constant 38, and nothing rescans the
    stream per horizon. The approximate twin swaps the distinct-count
    for agg_hll_daily_merge's mergeable sketches on the same spine."""
    ev = lt(spark, sf_dir, "events")
    presence = ev.select(
        F.col("ts").cast("date").alias("d"), "user_id"
    ).distinct()
    hs = spark.createDataFrame([(k,) for k in _DWM_HORIZONS], "k int")
    offs = spark.range(max(_DWM_HORIZONS)).select(F.col("id").cast("int").alias("i"))
    contrib = (
        presence.crossJoin(F.broadcast(hs))
        .join(F.broadcast(offs), F.col("i") < F.col("k"))
        .select("k", "user_id", F.expr("date_add(d, i)").alias("wend"))
    )
    counts = contrib.groupBy("wend", "k").agg(
        F.countDistinct("user_id").alias("n")
    )
    pivoted = counts.groupBy(F.col("wend").alias("day")).agg(
        F.max(F.when(F.col("k") == 1, F.col("n"))).alias("dau_raw"),
        F.max(F.when(F.col("k") == 7, F.col("n"))).alias("wau"),
        F.max(F.when(F.col("k") == 30, F.col("n"))).alias("mau"),
    )
    bounds = presence.agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
    return (
        pivoted.crossJoin(F.broadcast(bounds))
        .where(
            (F.col("day") >= F.expr("date_add(d0, 29)"))
            & (F.col("day") <= F.col("d1"))
        )
        .select(
            F.col("day").cast("timestamp_ntz").alias("day"),
            F.coalesce("dau_raw", F.lit(0)).alias("dau"),
            "wau",
            "mau",
            F.expr("(COALESCE(dau_raw, 0) * 1000000) div mau").alias(
                "stickiness_ppm"
            ),
        )
    )


_MAD_ORACLE = """
WITH vals AS (
  SELECT event_type, event_id,
         CAST(ROUND(value * 100.0) AS BIGINT) AS v FROM events
  WHERE value IS NOT NULL
),
n AS (SELECT event_type, COUNT(*) AS n FROM vals GROUP BY event_type),
med AS (
  SELECT r.event_type, r.v AS median_cents
  FROM (SELECT event_type, v,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY v, event_id) AS rk
        FROM vals) r
  JOIN n ON n.event_type = r.event_type AND r.rk = (n.n + 1) // 2
),
dev AS (
  SELECT v.event_type, v.event_id, ABS(v.v - m.median_cents) AS d
  FROM vals v JOIN med m ON v.event_type = m.event_type
),
mad AS (
  SELECT r.event_type, r.d AS mad_cents
  FROM (SELECT event_type, d, event_id,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY d, event_id) AS rk
        FROM dev) r
  JOIN n ON n.event_type = r.event_type AND r.rk = (n.n + 1) // 2
)
SELECT n.event_type, n.n, med.median_cents, mad.mad_cents
FROM n
JOIN med ON med.event_type = n.event_type
JOIN mad ON mad.event_type = n.event_type
"""


@op("agg_median_absolute_deviation", tags=("timeseries", "agg", "profiling"), oracle=_MAD_ORACLE)
def agg_median_absolute_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust dispersion per event type: the EXACT median and median
    absolute deviation (lower-median convention, rank (n+1) div 2 with
    the event id breaking value ties) — the outlier-resistant scale
    estimate an anomaly detector should threshold on where a single
    corrupt reading can drag a standard deviation arbitrarily (compare
    agg_anomalous_hours' σ baseline: MAD is its robust twin; both now
    registered so the trade is explicit). Two order-statistic passes,
    both deterministic integers — no interpolated quantiles to drift.

    Scale shape: both medians ride the same event_type hash partitioning
    (rank window + one-row-per-type reduction, the partition-local sort
    agg_percentiles_exact also uses); the deviation pass re-joins the
    broadcast-sized median table, never re-shuffling the stream on a
    new key."""
    ev = lt(spark, sf_dir, "events")
    # a median of VALUES is over rows that have one: NULL measurements are
    # excluded up front on both engines — left in, they rank NULLS FIRST
    # in Spark but NULLS LAST in DuckDB, silently shifting the (n+1)/2
    # rank onto different elements (nullstorm:141 kill)
    vals = ev.where(F.col("value").isNotNull()).select(
        "event_type",
        "event_id",
        cents(F.col("value")).alias("v"),
    )
    n = vals.groupBy("event_type").agg(F.count("*").alias("n"))
    w = W.partitionBy("event_type").orderBy("v", "event_id")
    ranked = vals.withColumn("rk", F.row_number().over(w))
    med = (
        ranked.join(F.broadcast(n), "event_type")
        .where(F.col("rk") == F.expr("(n + 1) div 2"))
        .select("event_type", F.col("v").alias("median_cents"))
    )
    dev = vals.join(F.broadcast(med), "event_type").select(
        "event_type",
        "event_id",
        F.abs(F.col("v") - F.col("median_cents")).alias("d"),
    )
    wd = W.partitionBy("event_type").orderBy("d", "event_id")
    mad = (
        dev.withColumn("rk", F.row_number().over(wd))
        .join(F.broadcast(n), "event_type")
        .where(F.col("rk") == F.expr("(n + 1) div 2"))
        .select("event_type", F.col("d").alias("mad_cents"))
    )
    return (
        n.join(F.broadcast(med), "event_type")
        .join(F.broadcast(mad), "event_type")
        .select("event_type", "n", "median_cents", "mad_cents")
    )
