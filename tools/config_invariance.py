"""Parallelism/config-invariance sweep — certify that every registered op's
RESULT is a pure function of the data, never of the cluster geometry.

The 100 TB design claim ("this plan survives a 1000-executor cluster") has a
testable core: on a real cluster the shuffle partition count, AQE re-planning,
broadcast availability, input split size and Arrow batch size all differ from
the local[32] test profile — and none of them may change an answer. Any op
whose output shifts under these knobs is relying on partition layout
(`spark_partition_id` leaking into values, per-partition seeded `rand`,
unordered `collect_list`, float sums whose addition order matters, a pandas
kernel assuming one batch per group) — a real at-scale wrong-answer bug that
the fixed-config differential sweeps can never see.

Each profile below perturbs runtime-settable SQL confs on the shared session,
then re-runs the FULL registry strict-exact against the DuckDB oracle
(tools/diffcheck.run_ops — sorted columns, sorted rows, no float tolerance):

- serial        one shuffle partition: all parallelism collapsed; any
                per-partition arithmetic (salting, two-phase prefix sums,
                distributed ntile) must degrade to the identical answer.
- prime_noaqe   7 shuffle partitions (prime, coprime to every bucket/salt
                constant) with AQE disabled: no runtime re-planning safety
                net, hash placement scrambled.
- nobroadcast   autoBroadcastJoinThreshold=-1: every non-hinted join falls
                back to sort-merge/shuffle — the exact fallback a 100 TB
                run hits when a "small" side outgrows the threshold.
- microsplit    64 KiB input splits + openCost 0 + Arrow batches of 193
                rows: scans shatter into many tasks and every pandas_udf /
                mapInPandas kernel sees its data sliced into many small
                batches — kernels must be batch-shape-agnostic.
- interpreted   whole-stage codegen off: the interpreted expression path
                (also what janino-overflow fallback produces at scale) must
                compute bit-identical values.
- session_tz    spark.sql.session.timeZone=America/New_York: the driver
                harness never pins a session timezone, so a foreign-session
                host must not shift any answer. r6 fixed two hazards of
                this class at the source (the events ns->timestamp rebuild,
                the CEP clock) and audits the ORACLES under two zones; this
                profile closes the class from the ENGINE side — every op
                re-run strict-exact under a non-UTC session (VERDICT r6 #3).

Usage:  python tools/config_invariance.py [sf_dir] [profile ...]
        python tools/config_invariance.py --fuzz <data_profile:seed> [profile ...]

The --fuzz form composes the two orthogonal validation axes: it generates
a randomized dataset with tools/fuzz_differential.gen_dataset (same
profile grammar: chaos:201, nullstorm:202, ...) and sweeps the geometry
matrix against THAT data — random DATA x perturbed GEOMETRY, the combo
neither axis alone exercises. Prints per-profile full PASS/FAIL lines and
a final matrix summary; exit 1 on any failure. Artifact:
INVARIANCE_r{N}.txt (composed-axis section at the bottom).
"""

from __future__ import annotations

import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from australis_indexer_spark.session import get_session
from tools.diffcheck import connect_oracle, run_ops

PROFILES: dict[str, dict[str, str]] = {
    "serial": {"spark.sql.shuffle.partitions": "1"},
    "prime_noaqe": {
        "spark.sql.shuffle.partitions": "7",
        "spark.sql.adaptive.enabled": "false",
    },
    "nobroadcast": {"spark.sql.autoBroadcastJoinThreshold": "-1"},
    "microsplit": {
        "spark.sql.files.maxPartitionBytes": "65536",
        "spark.sql.files.openCostInBytes": "0",
        "spark.sql.execution.arrow.maxRecordsPerBatch": "193",
    },
    "interpreted": {"spark.sql.codegen.wholeStage": "false"},
    "session_tz": {"spark.sql.session.timeZone": "America/New_York"},
}


def run_profile(spark, con, ops, sf_dir: str, name: str, confs: dict[str, str]):
    saved: dict[str, str | None] = {}
    for k, v in confs.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:  # noqa: BLE001 — conf unset
            saved[k] = None
        spark.conf.set(k, v)
    try:
        print(f"\n## profile {name}: {confs}")
        t0 = time.time()
        n_pass, n_fail, n_rowsonly, failures = run_ops(spark, con, ops, sf_dir)
        print(f"## profile {name}: {n_pass} pass, {n_fail} fail in {time.time()-t0:.0f}s")
        return n_pass, n_fail, failures
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def main() -> int:
    args = sys.argv[1:]
    fuzz_tok = None
    if "--fuzz" in args:
        i = args.index("--fuzz")
        fuzz_tok = args[i + 1]
        del args[i : i + 2]
    if fuzz_tok is not None:
        prof, _, s = fuzz_tok.rpartition(":")
        prof = prof or "default"
        sf_dir = f"/tmp/invariance_fuzz_{prof}_{s}"
        only_profiles = list(args)
        # same validation as the non-fuzz path (ADVICE r4 #4): a typo'd
        # profile name must error, not silently match nothing and let the
        # gate exit 0 having swept zero ops — a vacuous green
        unknown = [a for a in only_profiles if a not in PROFILES]
        if unknown:
            print(
                f"error: unknown profile(s) {unknown} "
                f"(known: {', '.join(sorted(PROFILES))})",
                file=sys.stderr,
            )
            return 2
    else:
        # Classify positionals by what they ARE, not by a '/'-substring
        # heuristic: a relative dataset path like 'sf0.01' must select the
        # dataset, and an unknown profile name must error instead of
        # silently sweeping the default dataset (ADVICE r4 #4).
        sf_dir = "/root/testdata/sf0.01"
        only_profiles = []
        for a in args:
            if a in PROFILES:
                # profile names win outright: a stray local directory that
                # happens to share a profile's name (or a cwd change) must
                # not silently become the dataset (ADVICE r5 #4)
                only_profiles.append(a)
            elif os.path.isdir(a) and os.path.exists(
                os.path.join(a, "orders.parquet")
            ):
                # only a directory with the fixture layout is a dataset —
                # an arbitrary directory erroring here beats sweeping a
                # wrong tree and reporting vacuous passes
                sf_dir = os.path.abspath(a)
            else:
                print(
                    f"error: '{a}' is neither a dataset dir (needs "
                    f"orders.parquet inside) nor a profile "
                    f"(known: {', '.join(sorted(PROFILES))})",
                    file=sys.stderr,
                )
                return 2
    # profile_parquet_metadata's oracle addresses files by PATH (DuckDB's
    # parquet_metadata() takes a filename, not a view) and bakes
    # $SPARK_GRAFT_ORACLE_SF_DIR at operator-module import — point it at
    # the swept dataset BEFORE load_all() imports the operator modules,
    # exactly as tools/fuzz_differential.py does, or a sweep over any
    # non-default directory compares two different datasets on that op.
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir
    if fuzz_tok is not None:
        from tools.fuzz_differential import gen_dataset

        prof, _, s = fuzz_tok.rpartition(":")
        sizes = gen_dataset(int(s), sf_dir, prof or "default")
        print(f"== composed axis: data {fuzz_tok}: {sizes} -> {sf_dir}")
    from australis_indexer_spark.registry import load_all

    ops = load_all()
    # lane-scoped warehouse: concurrent single-profile lanes used to share
    # ./spark-warehouse, and join_bucketed_colocated's saveAsTable raced on
    # the table's _temporary/0 commit dir across processes (INVARIANCE_r9
    # infra failure, VERDICT r9 'Next round' #3). Each lane now writes its
    # managed tables under its own temp dir.
    lane = tempfile.mkdtemp(prefix="aispark_inv_lane_")
    spark = get_session(
        "config_invariance",
        extra_conf={"spark.sql.warehouse.dir": os.path.join(lane, "warehouse")},
    )
    con = connect_oracle(sf_dir)
    summary: list[tuple[str, int, int, list[str]]] = []
    for name, confs in PROFILES.items():
        if only_profiles and name not in only_profiles:
            continue
        n_pass, n_fail, failures = run_profile(spark, con, ops, sf_dir, name, confs)
        summary.append((name, n_pass, n_fail, failures))
    print("\n# invariance matrix summary")
    total_fail = 0
    for name, n_pass, n_fail, failures in summary:
        total_fail += n_fail
        tail = f"  FAILURES: {failures}" if failures else ""
        print(f"#   {name:12s} {n_pass} pass, {n_fail} fail{tail}")
    return 1 if total_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
