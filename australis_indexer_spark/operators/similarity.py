"""Similarity search over embeddings (north-star: BASELINE.json).

Two paths:

- **brute-force top-k** — broadcast the (small) query set against all
  candidates, exact cosine, per-query ranking window. The correctness
  baseline, and the right plan whenever |queries| is small: one broadcast,
  no shuffle of the candidate side, TakeOrdered per query.
- **LSH-bucketed ANN** — 8 deterministic integer hyperplanes → sign-bit
  bucket per vector → query joins only its bucket. The 100 TB path: the
  bucket join is an equi-join on an 8-bit key; recall is tuned by
  bands/hyperplanes. (Hyperplanes are integer-valued and inlined in the
  oracle SQL so DuckDB reproduces the bucketing bit-for-bit.)

- **IVF (inverted-file) ANN** — K deterministic coarse centroids; every
  vector is assigned to its nearest centroid (broadcast argmax join), a
  query probes its `NPROBE` nearest cells only. The serving plan is an
  equi-join on `cluster_id`, exactly like the LSH bucket join, but recall
  degrades gracefully with NPROBE instead of bucket granularity. (A k-means
  trainer would refine the centroids iteratively; the *serving-path*
  operator below is the part that matters at 100 TB and is fully
  oracle-checked with fixed centroids.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.vectors import cosine_cols, dot, with_norm
from ..registry import op
from ..sources.batch import load_table as lt

N_QUERIES = 8   # vec_id < 8 are the query set
TOP_K = 5

_BRUTE_ORACLE = f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS emb,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
  FROM embeddings
),
q AS (SELECT vec_id AS query_id, emb AS qemb, nrm AS qnrm FROM e WHERE vec_id < {N_QUERIES}),
s AS (
  SELECT query_id, vec_id AS neighbor_id,
         (list_dot_product(qemb, emb) / (qnrm * nrm)) AS cosine
  FROM q, e WHERE vec_id <> query_id
)
SELECT query_id, neighbor_id, cosine, rnk FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id) AS rnk
  FROM s
) WHERE rnk <= {TOP_K}
"""


@op("sim_topk_bruteforce", tags=("northstar", "similarity", "vector"), oracle=_BRUTE_ORACLE)
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k: broadcast query set × candidates, ranking window
    per query (ties broken by neighbor_id)."""
    e = with_norm(
        lt(spark, sf_dir, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("emb")
        )
    )
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("qemb"),
        F.col("nrm").alias("qnrm"),
    )
    scored = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine_cols("qemb", "emb", "qnrm", "nrm").alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return scored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= TOP_K)


# ---------------------------------------------------------------------------
# LSH-bucketed ANN — deterministic integer hyperplanes, reproducible in SQL

N_PLANES = 8
DIM = 64


def _plane(j: int) -> list[int]:
    # pseudo-random-ish integer hyperplane, identical in Spark and the oracle
    return [((73 * j + 37 * d) % 19) - 9 for d in range(DIM)]


def _sql_bucket(tbl_alias: str = "") -> str:
    pfx = f"{tbl_alias}." if tbl_alias else ""
    bits = " || ".join(
        f"(CASE WHEN list_dot_product({pfx}emb, "
        f"[{', '.join(str(v) for v in _plane(j))}]::DOUBLE[]) >= 0 THEN '1' ELSE '0' END)"
        for j in range(N_PLANES)
    )
    return f"({bits})"


_ANN_ORACLE = f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS emb,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
  FROM embeddings
),
bucketed AS (SELECT vec_id, emb, nrm, {_sql_bucket()} AS bucket FROM e),
q AS (SELECT vec_id AS query_id, emb AS qemb, nrm AS qnrm, bucket
      FROM bucketed WHERE vec_id < {N_QUERIES}),
s AS (
  SELECT query_id, b.vec_id AS neighbor_id,
         (list_dot_product(qemb, b.emb) / (qnrm * b.nrm)) AS cosine
  FROM q JOIN bucketed b USING (bucket)
  WHERE b.vec_id <> query_id
)
SELECT query_id, neighbor_id, cosine, rnk FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id) AS rnk
  FROM s
) WHERE rnk <= {TOP_K}
"""


def _bucket_col() -> F.Column:
    bits = [
        F.when(
            dot(F.col("emb"), F.array(*[F.lit(float(v)) for v in _plane(j)])) >= 0, "1"
        ).otherwise("0")
        for j in range(N_PLANES)
    ]
    return F.concat(*bits)


@op("sim_ann_lsh", tags=("northstar", "similarity", "vector"), oracle=_ANN_ORACLE)
def sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via random-hyperplane LSH: 8 sign bits → bucket; a query scans
    only its bucket (~n/256 of the corpus). The bucket join is an equi-join —
    at 100 TB, bucket the corpus once (partitioned parquet by bucket) and
    every query batch prunes to its partitions."""
    e = with_norm(
        lt(spark, sf_dir, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("emb")
        )
    ).withColumn("bucket", _bucket_col())
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("qemb"),
        F.col("nrm").alias("qnrm"),
        "bucket",
    )
    scored = (
        e.join(F.broadcast(q), "bucket")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine_cols("qemb", "emb", "qnrm", "nrm").alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return scored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= TOP_K)


# ---------------------------------------------------------------------------
# IVF ANN — deterministic coarse quantizer, fully oracle-checked

N_CENTROIDS = 16
NPROBE = 2

_IVF_ORACLE = f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS emb,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
  FROM embeddings
),
c AS (
  SELECT vec_id AS cid, emb AS cemb, nrm AS cnrm
  FROM e WHERE vec_id >= {N_QUERIES} AND vec_id < {N_QUERIES + N_CENTROIDS}
),
assign AS (
  SELECT vec_id, emb, nrm, cid,
         ROW_NUMBER() OVER (
           PARTITION BY vec_id
           ORDER BY (list_dot_product(emb, cemb) / (nrm * cnrm)) DESC, cid
         ) AS r
  FROM e CROSS JOIN c
),
members AS (SELECT vec_id, emb, nrm, cid FROM assign WHERE r = 1),
q AS (SELECT vec_id AS query_id, emb AS qemb, nrm AS qnrm
      FROM e WHERE vec_id < {N_QUERIES}),
probes AS (
  SELECT query_id, qemb, qnrm, cid,
         ROW_NUMBER() OVER (
           PARTITION BY query_id
           ORDER BY (list_dot_product(qemb, cemb) / (qnrm * cnrm)) DESC, cid
         ) AS r
  FROM q CROSS JOIN c
),
s AS (
  SELECT query_id, m.vec_id AS neighbor_id,
         (list_dot_product(qemb, m.emb) / (qnrm * m.nrm)) AS cosine
  FROM (SELECT * FROM probes WHERE r <= {NPROBE}) p
  JOIN members m USING (cid)
  WHERE m.vec_id <> p.query_id
)
SELECT query_id, neighbor_id, cosine, rnk FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id) AS rnk
  FROM s
) WHERE rnk <= {TOP_K}
"""


@op("sim_ann_ivf", tags=("northstar", "similarity", "vector"), oracle=_IVF_ORACLE)
def sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF serving path: assign corpus→nearest centroid (broadcast argmax,
    one narrow pass), probe NPROBE cells per query, exact cosine within the
    probed cells. At 100 TB: partition the corpus parquet by cluster_id at
    ingest — a query batch then reads only NPROBE/K of the data (partition
    pruning), and the probe join is an ordinary equi-join; centroids come
    from a sampled k-means refresh job, swapped atomically."""
    e = with_norm(
        lt(spark, sf_dir, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("emb")
        )
    )
    c = F.broadcast(
        e.filter(
            (F.col("vec_id") >= N_QUERIES)
            & (F.col("vec_id") < N_QUERIES + N_CENTROIDS)
        ).select(
            F.col("vec_id").alias("cid"),
            F.col("emb").alias("cemb"),
            F.col("nrm").alias("cnrm"),
        )
    )
    w_assign = W.partitionBy("vec_id").orderBy(
        cosine_cols("emb", "cemb", "nrm", "cnrm").desc(), F.col("cid")
    )
    members = (
        e.crossJoin(c)
        .withColumn("r", F.row_number().over(w_assign))
        .filter(F.col("r") == 1)
        .select("vec_id", "emb", "nrm", "cid")
    )
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("qemb"),
        F.col("nrm").alias("qnrm"),
    )
    w_probe = W.partitionBy("query_id").orderBy(
        cosine_cols("qemb", "cemb", "qnrm", "cnrm").desc(), F.col("cid")
    )
    probes = (
        q.crossJoin(c)
        .withColumn("r", F.row_number().over(w_probe))
        .filter(F.col("r") <= NPROBE)
        .select("query_id", "qemb", "qnrm", "cid")
    )
    scored = (
        members.join(F.broadcast(probes), "cid")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine_cols("qemb", "emb", "qnrm", "nrm").alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return scored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= TOP_K)
