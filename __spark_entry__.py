"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``australis_indexer_spark.registry`` — every engine op from
SURVEY.md §2 (+ §2.6 relational layer + north-star extensions) registers
there with its Spark implementation and, when SQL-expressible, the exact
DuckDB oracle SQL.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

# make the repo importable regardless of the driver's CWD
sys.path.insert(0, str(Path(__file__).resolve().parent))

from australis_indexer_spark.registry import load_all  # noqa: E402

FLAGSHIP = "agg_hash_pricing_summary"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    ops = load_all()
    return ops[FLAGSHIP].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per op (omitted => driver's rows-only check)."""
    return {
        name: spec.oracle for name, spec in load_all().items() if spec.oracle is not None
    }
