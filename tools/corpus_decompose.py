#!/usr/bin/env python3
"""Decompose pipeline_corpus_build's decade-stress exponent bend
(VERDICT r7 'Next round' #3: +0.77 at sf0.1→sf1 steepening to +0.88 at
sf1→sf10 — attribute the bend to legitimate output growth vs a stage
superlinear in INPUT before the curve is trusted at 1000x).

Method: rebuild the op's logical stages (mirrors
operators/curation.py:pipeline_corpus_build line-for-line; each count
below names the frame it measures) and record per-stage ROW counts at
sf0.1 and the derived 10x/100x decade-stress replicas of `documents`
(same construction as tools/scale_stress.py: verbatim text, doc_id
shifted by replica*2^32 — so every replica group is an R-way exact
duplicate, and the doc_id%10 eval split ROTATES across replicas because
2^32 % 10 == 6). Alongside, run the REAL registered op in a UI-enabled
session and aggregate shuffle read/write bytes per stage from the
status REST API. Per-decade log-log exponents of each stage count and
of total shuffle bytes then attribute the wall-clock bend.

Writes the '### pipeline_corpus_build decomposition' subsection of
SCALING.md (replacing any previous run) and prints one JSON line.

Usage: python tools/corpus_decompose.py
"""

from __future__ import annotations

import json
import math
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F

from australis_indexer_spark.operators.curation import (
    NGRAM,
    _canonical_text,
    _ngrams,
)
from australis_indexer_spark.registry import load_all
from tools.docsplice import splice_section
from tools.shuffle_telemetry import _stages, _ui_session

SRC = "/root/testdata/sf0.1"
OUT_BASE = os.environ.get("SPARK_GRAFT_STRESS_DIR", "/tmp/aispark_sfstress")
STRIDE = 2**32
FACTORS = (10, 100)
_MARK = "### pipeline_corpus_build decomposition"


def _build_documents(spark, replicas: int, out: str) -> None:
    """documents-only decade replica (the op reads nothing else); same
    key-stride construction as tools/scale_stress.py:build."""
    os.makedirs(out, exist_ok=True)
    dst = os.path.join(out, "documents.parquet")
    marker = os.path.join(dst, "_SUCCESS")
    src_path = os.path.join(SRC, "documents.parquet")
    if os.path.exists(marker) and os.path.getmtime(marker) >= os.path.getmtime(
        src_path
    ):
        return
    base = spark.read.parquet(src_path)
    out_df = None
    for i in range(replicas):
        rep = base.withColumn(
            "doc_id", (F.col("doc_id") + F.lit(i * STRIDE)).cast("long")
        )
        out_df = rep if out_df is None else out_df.unionByName(rep)
    out_df.write.mode("overwrite").parquet(dst)
    print(f"built documents {replicas}x -> {dst}", flush=True)


def _stage_counts(spark, sf_dir: str) -> dict[str, int]:
    """Row counts of every logical stage of pipeline_corpus_build
    (operators/curation.py:335), computed WITHOUT materializing the
    explodes where an aggregate suffices (pos rows = sum(n-1) over train
    docs with n>=2; chunk rows = sum(ceil(n/stride)) over survivors)."""
    from australis_indexer_spark.operators.curation import (
        CHUNK_STRIDE,
    )
    from australis_indexer_spark.sources.batch import load_table as lt
    from pyspark.sql import Window as W

    norm = _canonical_text()
    docs = (
        lt(spark, sf_dir, "documents")
        .select("doc_id", norm.alias("t"))
        .withColumn("toks", F.split("t", " "))
        .withColumn("n", F.size("toks"))
    )
    docs = docs.repartition(spark.sparkContext.defaultParallelism, "doc_id")
    is_eval = F.col("doc_id") % 10 == 0
    train = docs.filter(~is_eval).cache()

    eval_g8 = _ngrams(docs.filter(is_eval), NGRAM).select("gram").distinct()

    c: dict[str, int] = {}
    c["docs"] = docs.count()
    c["train_docs"] = train.count()
    c["eval_docs"] = c["docs"] - c["train_docs"]
    c["eval_g8_distinct"] = eval_g8.count()  # the broadcast side
    agg = train.filter(F.col("n") >= 2).agg(
        F.sum(F.col("n") - 1).alias("pos"),
        F.sum(
            F.greatest(F.col("n") - (NGRAM - 1), F.lit(0))
        ).alias("g8_pos"),
    ).collect()[0]
    c["pos_explode_rows"] = int(agg["pos"] or 0)  # 2-gram probe explode
    c["g8_defined_rows"] = int(agg["g8_pos"] or 0)

    # the real gate sub-plan: contamination + repetition keep flags
    g8 = F.when(
        F.col("p") <= F.col("n") - (NGRAM - 1),
        F.concat_ws(
            " ", *[F.element_at("toks", F.col("p") + i) for i in range(NGRAM)]
        ),
    )
    pos = (
        train.filter(F.col("n") >= 2)
        .select(
            "doc_id",
            "toks",
            "n",
            F.explode(F.sequence(F.lit(1), F.col("n") - 1)).alias("p"),
        )
        .select(
            "doc_id",
            F.concat_ws(
                " ",
                F.element_at("toks", F.col("p")),
                F.element_at("toks", F.col("p") + 1),
            ).alias("g2"),
            g8.alias("g8"),
        )
    )
    probed = pos.join(
        F.broadcast(eval_g8), pos["g8"] == eval_g8["gram"], "left"
    ).select("doc_id", "g2", F.col("gram").isNotNull().alias("hit"))
    per2 = probed.groupBy("doc_id", "g2").agg(
        F.count("*").alias("c"), F.max("hit").alias("h2")
    )
    stats = per2.groupBy("doc_id").agg(
        (
            ((F.sum("c") - F.count("*")) / F.sum("c") < 0.2)
            & (F.max("c") / F.sum("c") < 0.1)
        ).alias("keep"),
        F.max("h2").alias("contaminated"),
    ).cache()
    c["contaminated_docs"] = stats.filter("contaminated").count()
    c["repetition_gated_docs"] = stats.filter("NOT keep").count()

    kept = (
        train.join(stats, "doc_id", "left")
        .filter(
            F.coalesce("keep", F.lit(True))
            & ~F.coalesce("contaminated", F.lit(False))
        )
        .drop("keep", "contaminated")
    )
    c["kept_docs"] = kept.count()
    w_dup = F.row_number().over(W.partitionBy("t").orderBy("doc_id"))
    final = kept.withColumn("rn", w_dup).filter(F.col("rn") == 1).drop("rn")
    fagg = final.agg(
        F.count("*").alias("final"),
        F.sum(
            F.ceil(F.col("n") / F.lit(CHUNK_STRIDE)).cast("long")
        ).alias("chunks"),
    ).collect()[0]
    c["final_docs"] = int(fagg["final"] or 0)
    c["chunk_rows"] = int(fagg["chunks"] or 0)
    train.unpersist()
    stats.unpersist()
    return c


def _run_op_with_shuffle(spark, fn, sf_dir: str) -> tuple[float, int, int, list]:
    """min-of-2 cache-cold wall time for the REAL op, plus per-run shuffle
    read/write bytes (from the run whose wall time was the min) and the
    top stages by shuffle write."""
    best = (math.inf, 0, 0, [])
    for _ in range(2):
        spark.catalog.clearCache()
        before = _stages(spark)
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        after = _stages(spark)
        new = {k: v for k, v in after.items() if k not in before}
        rd = sum(s.get("shuffleReadBytes", 0) for s in new.values())
        wr = sum(s.get("shuffleWriteBytes", 0) for s in new.values())
        top = sorted(
            (
                (s.get("shuffleWriteBytes", 0), s.get("name", ""))
                for s in new.values()
            ),
            reverse=True,
        )[:4]
        if dt < best[0]:
            best = (dt, rd, wr, top)
    return best


def _exp(a: float, b: float) -> float:
    return math.log(b / max(a, 1e-9)) / math.log(10)


def _fmt(n: int) -> str:
    for u in ("B", "KiB", "MiB", "GiB"):
        if n < 1024 or u == "GiB":
            return f"{n:.1f} {u}" if u != "B" else f"{n} B"
        n /= 1024
    return f"{n:.1f} GiB"


def main() -> None:
    spark = _ui_session()
    ops = load_all()
    fn = ops["pipeline_corpus_build"].fn

    datasets = [("sf0.1 (1x)", SRC)]
    for f in FACTORS:
        out = f"{OUT_BASE}_corpusdoc_{f}"
        _build_documents(spark, f, out)
        datasets.append((f"{f}x", out))

    rows = []
    for label, path in datasets:
        counts = _stage_counts(spark, path)
        wall, rd, wr, top = _run_op_with_shuffle(spark, fn, path)
        rows.append((label, counts, wall, rd, wr, top))
        print(f"{label}: wall={wall:.2f}s shuffle_wr={_fmt(wr)} {counts}", flush=True)

    keys = list(rows[0][1])
    lines = [
        _MARK + " (round 8, VERDICT r7 #3)",
        "",
        "Per-stage row counts (mirroring operators/curation.py:335) and the",
        "real op's measured shuffle bytes at sf0.1 and the 10x/100x decade",
        "replicas of `documents` (verbatim text, doc_id stride 2^32 — every",
        "replica group is an R-way exact duplicate and the doc_id%10 eval",
        "split rotates across replicas since 2^32 % 10 == 6). Generated by",
        "tools/corpus_decompose.py.",
        "",
        "| stage | 1x | 10x | 100x | exp 1x→10x | exp 10x→100x |",
        "|---|---|---|---|---|---|",
    ]
    for k in keys:
        v = [r[1][k] for r in rows]
        lines.append(
            f"| {k} | {v[0]} | {v[1]} | {v[2]} "
            f"| {_exp(v[0], v[1]):+.2f} | {_exp(v[1], v[2]):+.2f} |"
        )
    walls = [r[2] for r in rows]
    wrs = [r[4] for r in rows]
    rds = [r[3] for r in rows]
    lines += [
        f"| wall (s, real op, min of 2) | {walls[0]:.2f} | {walls[1]:.2f} | {walls[2]:.2f} "
        f"| {_exp(walls[0], walls[1]):+.2f} | {_exp(walls[1], walls[2]):+.2f} |",
        f"| shuffle write | {_fmt(wrs[0])} | {_fmt(wrs[1])} | {_fmt(wrs[2])} "
        f"| {_exp(wrs[0], wrs[1]):+.2f} | {_exp(wrs[1], wrs[2]):+.2f} |",
        f"| shuffle read | {_fmt(rds[0])} | {_fmt(rds[1])} | {_fmt(rds[2])} "
        f"| {_exp(rds[0], rds[1]):+.2f} | {_exp(rds[1], rds[2]):+.2f} |",
        "",
        "Top shuffle-write stages at 100x: "
        + "; ".join(f"{_fmt(b)} — {n[:60]}" for b, n in rows[2][5] if b),
        "",
    ]

    # Shared marker-bounded splice (tools/docsplice.py): same boundary
    # rule as state_scale, with the outside-bytes-preserved guard.
    splice_section(REPO / "SCALING.md", _MARK, "\n".join(lines) + "\n")

    print(
        json.dumps(
            {
                "metric": "corpus_build_decomposition",
                "wall": walls,
                "shuffle_write_bytes": wrs,
                "counts": {k: [r[1][k] for r in rows] for k in keys},
            }
        )
    )


if __name__ == "__main__":
    main()
