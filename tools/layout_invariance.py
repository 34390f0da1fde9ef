"""Physical-layout invariance sweep — certify that every registered op's
RESULT is a function of the data's VALUES, never of its physical layout.

At 100 TB the physical layout of a table is not stable: compaction
(`sink_compaction`), clustering rewrites (`sink_clustered_stats`,
`sink_zorder_stats`), backfills and vacuum all permute row order and move
row-group boundaries, and parquet guarantees neither. Any op whose answer
shifts when the same rows arrive in a different order — a `first()`
without ordering, a limit without a sort, an argmax tie broken by arrival
position, a window function with an under-specified ORDER BY, a pandas
kernel assuming sorted input — produces silent wrong answers the day the
table is rewritten. This sweep attacks exactly that class:

1. Every sf table is rewritten with a seeded random ROW PERMUTATION and a
   deliberately awkward row-group size (997 rows — prime, misaligned with
   every batch/page default), so both the order and the row-group
   boundaries differ from the certified layout.
2. The full registry runs with Spark reading the SHUFFLED layout while
   the DuckDB oracle reads the ORIGINAL files — strict value-exact
   (sorted columns, sorted rows, no float tolerance). A PASS is therefore
   a proof of layout-independence, not just determinism-given-layout.

The one op that measures the layout itself (`profile_parquet_metadata` —
two independent footer parsers over the SAME files) follows
$SPARK_GRAFT_ORACLE_SF_DIR to the shuffled copy, so it checks
footer-parser agreement on the new layout rather than asserting the
impossible (identical footers across different layouts).

Usage:  python tools/layout_invariance.py [sf_dir] [seed]
Artifact: the layout section of INVARIANCE_r{N}.txt.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

ROW_GROUP_SIZE = 997  # prime, misaligned with every default batch size


def shuffle_layout(sf_dir: str, out_dir: str, seed: int) -> None:
    """Rewrite every table with permuted row order + awkward row groups."""
    import numpy as np
    import pyarrow.parquet as pq

    from tools.diffcheck import TABLES

    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    for t in TABLES:
        tbl = pq.read_table(f"{sf_dir}/{t}.parquet")
        perm = rng.permutation(tbl.num_rows)
        pq.write_table(
            tbl.take(perm),
            f"{out_dir}/{t}.parquet",
            row_group_size=ROW_GROUP_SIZE,
        )


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    seed = int(args[1]) if len(args) > 1 else 404
    out_dir = f"/tmp/layout_shuffled_{Path(sf_dir).name}_{seed}"
    # profile_parquet_metadata reads footers on both engines — point its
    # path-addressed oracle at the SHUFFLED copy (set before operator
    # import; the op's Spark side reads the sf_dir argument = shuffled).
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = out_dir

    from australis_indexer_spark.registry import load_all
    from australis_indexer_spark.session import get_session
    from tools.diffcheck import connect_oracle, run_ops

    shuffle_layout(sf_dir, out_dir, seed)
    print(f"== layout shuffle seed {seed}: {sf_dir} -> {out_dir} "
          f"(row order permuted, row groups of {ROW_GROUP_SIZE})")
    ops = load_all()
    spark = get_session("layout_invariance")
    # Spark reads the shuffled layout; the oracle reads the ORIGINAL files.
    con = connect_oracle(sf_dir)
    n_pass, n_fail, n_rowsonly, failures = run_ops(spark, con, ops, out_dir)
    print(f"== layout invariance: {n_pass} pass, {n_fail} fail"
          f"{'  FAILURES: ' + str(failures) if failures else ''}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
