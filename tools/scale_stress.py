#!/usr/bin/env python3
"""Decade-scale stress: run the headline suite at ~10x sf0.1 (≈ sf1).

The verdicts' standing caveat is that the 100 TB design claims rest on plan
shape plus telemetry at sf <= 0.1 — the largest dataset the driver ships.
This tool extends the scaling curves one decade: it DERIVES a 10x dataset
from the provided sf0.1 tables (never synthesizing new value distributions —
each replica is the driver's own data with every int64 key shifted by
``replica * 2**32``, one uniform stride, so every cross-table relationship
(o_orderkey↔l_orderkey, o_custkey↔c_custkey, user_id joins) is preserved
inside each replica and disjoint across replicas; dimension tables
region/nation/part/supplier stay single-copy, exactly how dims behave at
scale). Text/embeddings replicate verbatim, which deliberately stresses the
dedup/ANN paths with 10-way duplicate groups — the workload shape a corpus
deduper actually faces.

Writes the dataset under $SPARK_GRAFT_STRESS_DIR (default
/tmp/aispark_sfstress), runs the bench HEADLINE ops cache-cold (min of
$SPARK_GRAFT_STRESS_RUNS, default 2), prints one JSON line, and appends a
"## Decade stress" section to SCALING.md with the sf0.1 -> sf1 exponent
per op.
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

from bench import HEADLINE
from australis_indexer_spark.registry import load_all
from australis_indexer_spark.session import get_session

SRC = "/root/testdata/sf0.1"
OUT = os.environ.get("SPARK_GRAFT_STRESS_DIR", "/tmp/aispark_sfstress")
REPLICAS = int(os.environ.get("SPARK_GRAFT_STRESS_REPLICAS", "10"))
STRIDE = 2**32  # one uniform key offset: every cross-table FK survives

# fact tables: every *key* column shifts by replica*STRIDE; dims copy once
_FACT_KEYS = {
    "lineitem": ("l_orderkey",),
    "orders": ("o_orderkey", "o_custkey"),
    "customer": ("c_custkey",),
    "events": ("event_id", "user_id"),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}
_DIMS = ("region", "nation", "part", "supplier")


def build(spark) -> None:
    os.makedirs(OUT, exist_ok=True)
    for t in _DIMS:
        dst = os.path.join(OUT, f"{t}.parquet")
        if not os.path.exists(dst):
            spark.read.parquet(os.path.join(SRC, f"{t}.parquet")).write.mode(
                "overwrite"
            ).parquet(dst)
    for t, keys in _FACT_KEYS.items():
        dst = os.path.join(OUT, f"{t}.parquet")
        if os.path.exists(dst):
            continue
        base = spark.read.parquet(os.path.join(SRC, f"{t}.parquet"))
        out = None
        for i in range(REPLICAS):
            rep = base
            for k in keys:
                rep = rep.withColumn(k, (F.col(k) + F.lit(i * STRIDE)).cast("long"))
            out = rep if out is None else out.unionByName(rep)
        out.write.mode("overwrite").parquet(dst)
        print(f"built {t}: {REPLICAS}x", flush=True)


def main() -> None:
    spark = get_session("scale_stress")
    build(spark)
    ops = load_all()
    n_runs = int(os.environ.get("SPARK_GRAFT_STRESS_RUNS", "2"))

    # warm-up (JVM/codegen) on the small source, then measure on the stress set
    ops[HEADLINE[0]].fn(spark, SRC).write.format("noop").mode("overwrite").save()

    best: dict[str, float] = {}
    for _ in range(n_runs):
        spark.catalog.clearCache()
        for name in HEADLINE:
            t0 = time.perf_counter()
            ops[name].fn(spark, OUT).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            if name not in best or dt < best[name]:
                best[name] = dt
            print(f"  {name}: {dt:.2f}s", flush=True)

    timings = {n: round(best[n], 3) for n in HEADLINE}
    print(json.dumps({
        "metric": "decade_stress_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": 1.0,
        "methodology": f"{REPLICAS}x sf0.1 derived (key-stride replicas), "
        f"min of {n_runs} cache-cold passes",
    }))

    # append/refresh the SCALING.md section using the sf0.1 column there
    md = REPO / "SCALING.md"
    text = md.read_text()
    mark = "## Decade stress"
    if mark in text:
        text = text[: text.index(mark)].rstrip() + "\n"
    sf01: dict[str, float] = {}
    for line in text.splitlines():
        parts = [p.strip() for p in line.split("|")]
        if len(parts) >= 6 and parts[1] in timings:
            try:
                sf01[parts[1]] = float(parts[4])
            except ValueError:
                pass
    lines = [
        "",
        mark + f" ({REPLICAS}x sf0.1, derived)",
        "",
        "One decade beyond the shipped data: the sf0.1 tables replicated",
        f"{REPLICAS}x with a uniform 2^32 key stride (FKs preserved per",
        "replica; dims single-copy; text/embeddings verbatim — a deliberate",
        "10-way-duplicate stress for the dedup/ANN paths). Cache-cold min of",
        "2. `exp` is the log-log slope sf0.1 -> sf1; ~1.0 = linear in data,",
        "the design target for shuffle-bound plans (sublinear = still",
        "overhead-dominated even at sf1).",
        "",
        "| op | sf0.1 | sf1 (10x) | exp |",
        "|---|---|---|---|",
    ]
    for n in HEADLINE:
        if n in sf01 and sf01[n] > 0:
            exp = math.log(timings[n] / sf01[n]) / math.log(REPLICAS)
            lines.append(f"| {n} | {sf01[n]:.2f} | {timings[n]:.2f} | {exp:+.2f} |")
    worst = max(
        (
            (n, math.log(timings[n] / sf01[n]) / math.log(REPLICAS))
            for n in HEADLINE
            if n in sf01 and sf01[n] > 0
        ),
        key=lambda x: x[1],
    )
    lines += ["", f"Steepest decade exponent: `{worst[0]}` at {worst[1]:+.2f}.", ""]
    md.write_text(text + "\n".join(lines))
    print(f"SCALING.md decade-stress section updated (steepest {worst[0]} {worst[1]:+.2f})")


if __name__ == "__main__":
    main()
