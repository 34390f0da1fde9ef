"""Shared micro-batch test-harness helpers for the streaming ops.

Four near-identical copies of the quantile chunk-file splitter (cdc.py,
rollup.py x2, stateful.py) and two of the versioned-state directory
scanner (rollup.py) had to be kept in lockstep by hand — and had already
drifted: the CEP copy carried the mtime-stamping fix (ADVICE r3) and the
empty-frame guard (fuzz kill dust:102) the others lacked. One definition
each, with the variations as parameters (round-6 review).
"""

from __future__ import annotations

import os
import re
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def split_into_batches(
    df: DataFrame,
    key: str,
    src: str,
    *,
    n: int = 4,
    rel_err: float = 0.001,
    stamp_mtimes: bool = False,
) -> None:
    """Write ``df`` as ``n`` chunk files under ``src``, cut at the
    quantiles of ``key`` and appended in chunk order — the file-source
    stand-in for n chronological micro-batches.

    Empty-frame guard: ``approxQuantile`` returns ``[]`` on an empty
    frame; a stream with no qualifying rows must still run its n (empty)
    micro-batches and produce the oracle's empty answer, not crash on
    ``bounds[i+1]`` (fuzz kill dust:102 — one event, of another type).

    ``stamp_mtimes``: FileStreamSource orders new files by modification
    time, and n appends in rapid succession can share an mtime — making
    micro-batch order mtime-lucky rather than pinned (ADVICE r3). Only
    order-DEPENDENT consumers need it (the CEP NFA); argmax and additive
    folds converge under any delivery order, which their replay and
    reversed-fold tests prove.

    Contract: ``key`` must be null-free. The chunk filters are
    ``key > lo AND key <= hi`` — NULLs satisfy neither bound, so a
    nullable key would silently drop rows from EVERY micro-batch
    (ADVICE r6, latent: all current callers key on non-null columns).
    Asserted here so a future caller fails loudly instead. Cost: ZERO
    extra jobs (ADVICE r7 — the earlier isEmpty() probe had to scan the
    whole key column to prove the null-free pass case): the null count
    rides the approxQuantile job as an ``observe()`` metric — the
    CollectMetrics node sits under the same action that computes the
    cut points, and the check still fails before any chunk is written.
    Skipped entirely when the schema already proves non-nullability.
    """
    fracs = [i / n for i in range(1, n)]
    if df.schema[key].nullable:
        from pyspark.sql import Observation

        obs = Observation()
        qs = df.observe(
            obs, F.count(F.when(F.col(key).isNull(), 1)).alias("n_null")
        ).approxQuantile(key, fracs, rel_err)
        if len(qs) == len(fracs):
            n_null = obs.get["n_null"]
        else:
            # approxQuantile found NO non-null key values (empty frame or
            # all-null column) — its short-circuit return leaves the
            # Observation unreadable (PythonSQLUtils.toPyRow asserts), so
            # this degenerate case pays one explicit probe job. Cheap by
            # construction: the frame has no quantile-bearing rows.
            n_null = df.select(key).filter(F.col(key).isNull()).count()
        if n_null > 0:
            raise ValueError(
                f"split_into_batches: key column {key!r} contains NULLs — "
                "they would be dropped from every micro-batch"
            )
    else:
        qs = df.approxQuantile(key, fracs, rel_err)
    if len(qs) < n - 1:
        qs = [0.0] * (n - 1)
    bounds = [float("-inf"), *qs, float("inf")]
    stamp0 = time.time() - 3600
    stamped: set[str] = set()
    for i in range(n):
        df.filter(
            (F.col(key) > bounds[i]) & (F.col(key) <= bounds[i + 1])
        ).coalesce(1).write.mode("append").parquet(src)
        if stamp_mtimes:
            for fn in os.listdir(src):
                full = os.path.join(src, fn)
                if fn.endswith(".parquet") and full not in stamped:
                    os.utime(full, (stamp0 + 10 * i, stamp0 + 10 * i))
                    stamped.add(full)


def state_versions(base: str, prefix: str = "state_v") -> list[int]:
    """Sorted batch-ids of the versioned state dirs ``<base>/<prefix><N>``
    — the idempotent-commit scheme's ledger (rollup module docstring)."""
    pat = re.compile(rf"^{re.escape(prefix)}(\d+)$")
    return sorted(
        int(m.group(1)) for d in os.listdir(base) if (m := pat.match(d))
    )
