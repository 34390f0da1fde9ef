"""Local oracle-differential harness — a strict stand-in for the driver's
t2 correctness gate.

For every op in the registry: run the Spark query and the DuckDB oracle on
the same sf dir, sort columns by name, sort rows, and compare **exactly**
(no float tolerance — the engine's determinism convention must make values
bit-identical; see functions/det.py). Stricter than any reasonable hash.

Usage:  python tools/diffcheck.py [sf_dir] [op ...]
"""

from __future__ import annotations

import math
import os
import sys
import time
from datetime import date, datetime, timezone
from decimal import Decimal
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from australis_indexer_spark.registry import load_all
from australis_indexer_spark.session import get_session
from australis_indexer_spark.sources.batch import TABLES


def _norm(v):
    """Dtype-faithful normalization: the driver's hash sees pandas dtypes, so
    an int64 ``2000`` and a float64 ``2000.0`` must NOT compare equal here
    (Python's ``2000 == 2000.0`` would mask exactly the HUGEINT→float64
    oracle bugs the driver catches). Scalars are tagged with a type letter."""
    if v is None:
        return None
    if type(v).__module__ == "numpy":
        if getattr(v, "ndim", 0):  # ndarray (array<...> columns) → list
            return ("arr", tuple(_norm(x) for x in v.tolist()))
        v = v.item()
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "NaN")
        if v == 0.0 and math.copysign(1.0, v) < 0.0:
            # IEEE -0.0: Python's ``-0.0 == 0.0`` is True, so an untagged
            # tuple would wave a sign-of-zero divergence through while a
            # bit-pattern pandas hash (the driver's shape) distinguishes
            # the two encodings. Tag the negative zero distinctly.
            return ("f", "-0.0")
        return ("f", v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, Decimal):
        # Distinct tag: the engine convention FORBIDS decimals in oracle-checked
        # outputs (pandas bridges coerce them engine-specifically), so a Decimal
        # here must fail against the oracle's float — the driver's pandas-dtype
        # hash would. Coercing to ("f", float) masked agg_grouping_sets in r2.
        return ("dec", str(v))
    if isinstance(v, datetime):
        # Distinct tag for tz-aware values: DuckDB's TIMESTAMPTZ (e.g. bare
        # to_timestamp()) vs Spark's naive TIMESTAMP is a SCHEMA divergence
        # the driver's strict check fails — stripping tzinfo here waved the
        # stream_windowed_topk r5 red through every local sweep. Mirror the
        # Decimal precedent: normalize the instant to UTC but keep an
        # "aware" marker so naive-vs-aware never compares equal.
        if v.tzinfo is not None:
            return ("tz", v.astimezone(timezone.utc).replace(tzinfo=None).isoformat())
        # Tagged for the same reason as "tz": an UNTAGGED isoformat string
        # would compare equal to a STRING column holding the same text — a
        # STRING-vs-TIMESTAMP schema divergence the driver's dtype-strict
        # hash fails but every local sweep would wave through (the exact
        # shape of the r5 stream_windowed_topk red, one type over).
        return ("ts", v.isoformat())
    if isinstance(v, date):
        return ("d", v.isoformat())
    if isinstance(v, (bytes, bytearray)):
        # tagged: hex text in a STRING column must not equal BINARY bytes
        return ("by", bytes(v).hex())
    if isinstance(v, (list, tuple)):
        # tagged like every other non-string scalar family: an UNTAGGED
        # tuple would let an array<string> value spoof the tag tuples
        # themselves — ['d','2024-01-01'] comparing equal to a real DATE,
        # ['f','NaN'] to a DOUBLE NaN — the same cross-type seam one level
        # up (round-6 tools review)
        return ("arr", tuple(_norm(x) for x in v))
    if isinstance(v, dict):
        # struct/map scalars: Arrow toPandas and DuckDB fetch_df both
        # deliver these as Python dicts, and raw dict equality compares
        # the INNER values with Python semantics (``2000 == 2000.0`` is
        # True) — the int-vs-float dtype seam one container level down.
        # Normalize keys and values recursively, sort entries so map key
        # order can't matter, and tag distinctly so a struct never
        # compares equal to an array of pairs.
        return (
            "st",
            tuple(sorted(((_norm(k), _norm(x)) for k, x in v.items()), key=repr)),
        )
    return v


def _rows(df_pandas):
    cols = sorted(df_pandas.columns)
    recs = [tuple(_norm(v) for v in row) for row in df_pandas[cols].itertuples(index=False)]
    return cols, sorted(recs, key=repr)


def connect_oracle(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    """DuckDB connection with the dataset's tables registered as views —
    the same registration the driver's t2 gate performs."""
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).is_dir():  # Spark-written dataset dir (e.g. scale_stress)
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def run_ops(spark, con, ops, sf_dir, only=None):
    """Run the strict Spark-vs-oracle diff for each op; returns
    ``(n_pass, n_fail, n_rowsonly, failures)`` where ``failures`` is the
    list of failing op names. Printing matches the historical CLI output
    so committed artifacts stay comparable across rounds."""
    n_pass = n_fail = n_rowsonly = 0
    failures: list[str] = []
    for name, spec in sorted(ops.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_df = spec.fn(spark, sf_dir)
            dec_cols = [
                f.name for f in spark_df.schema.fields
                if f.dataType.typeName() == "decimal"
            ]
            if dec_cols:
                # No op may emit DecimalType: pandas/DuckDB bridges coerce
                # decimals with engine-specific rounding, so the driver hash
                # can fail even when values match (the agg_grouping_sets r2 red).
                print(f"FAIL  {name}: DecimalType output columns {dec_cols}")
                n_fail += 1
                failures.append(name)
                continue
            sdf = spark_df.toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark raised {type(e).__name__}: {e}")
            n_fail += 1
            failures.append(name)
            continue
        if spec.oracle is None:
            print(f"rows  {name}: {len(sdf)} rows ({time.time()-t0:.1f}s) [rows-only]")
            n_rowsonly += 1
            continue
        try:
            odf = con.execute(spec.oracle).fetch_df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: oracle raised {type(e).__name__}: {e}")
            n_fail += 1
            failures.append(name)
            continue
        scols, srows = _rows(sdf)
        ocols, orows = _rows(odf)
        if scols != ocols:
            print(f"FAIL  {name}: columns differ spark={scols} oracle={ocols}")
            n_fail += 1
            failures.append(name)
            continue
        if len(srows) != len(orows):
            print(f"FAIL  {name}: row count spark={len(srows)} oracle={len(orows)}")
            n_fail += 1
            failures.append(name)
            continue
        bad = [(a, b) for a, b in zip(srows, orows) if a != b]
        if bad:
            print(f"FAIL  {name}: {len(bad)}/{len(srows)} rows differ; first: spark={bad[0][0]} oracle={bad[0][1]}")
            n_fail += 1
            failures.append(name)
            continue
        print(f"PASS  {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
        n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    return n_pass, n_fail, n_rowsonly, failures


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    # profile_parquet_metadata's oracle reads parquet FOOTERS by path and
    # bakes $SPARK_GRAFT_ORACLE_SF_DIR at operator-module import — default
    # it to the swept dataset (explicit exports, e.g. the cross-SF recipe,
    # still win), or a run over any non-default directory compares two
    # different datasets on that op (round-6 tools review)
    os.environ.setdefault("SPARK_GRAFT_ORACLE_SF_DIR", sf_dir)
    ops = load_all()
    only = set(sys.argv[2:])
    spark = get_session("diffcheck")
    con = connect_oracle(sf_dir)
    _, n_fail, _, _ = run_ops(spark, con, ops, sf_dir, only=only)
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
