"""Operator registry — the single source of truth for the driver contract.

Every engine op (SURVEY.md §2 inventory + §2.6 relational layer + north-star
extensions) registers here with its Spark implementation and, when
SQL-expressible, the exact DuckDB oracle SQL. ``__spark_entry__.py`` exposes
the registry as ``queries()`` / ``oracle_sql()``.

Determinism contract (why oracles hash-match):
- money sums go through exact integer cents (``det.dsum``) — identical IEEE
  expression trees on both engines, integer accumulation, one final division;
- every computed column is explicitly aliased the same on both sides;
- ranking ties are always broken by a unique key column;
- timestamps are µs precision on both sides (see sources.batch.load_table).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class OpSpec:
    name: str
    fn: QueryFn
    oracle: str | None          # DuckDB SQL; None => rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, OpSpec] = {}


def op(name: str, *, oracle: str | None = None, tags: tuple[str, ...] = (), doc: str = ""):
    """Register an engine op. Used as a decorator over (spark, sf_dir) -> DataFrame."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate op name: {name}")
        REGISTRY[name] = OpSpec(name=name, fn=fn, oracle=oracle, tags=tags, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def load_all() -> dict[str, OpSpec]:
    """Import every module that registers ops, then return the registry."""
    from .operators import (  # noqa: F401
        dedup,
        envelope,
        explode,
        multimodal,
        project,
        relational,
        similarity,
        text_analysis,
    )
    from .streaming import pipeline  # noqa: F401

    return REGISTRY
