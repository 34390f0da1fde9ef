"""Command-line surface — the engine's analog of the reference binaries.

The reference ships two clap CLIs (SURVEY.md §3):

- ``borealis-indexer {init,check,run}``  — bootstrap configs, probe the bus,
  run the producer pipeline (borealis-indexer/src/main.rs:1161-1212 arg
  parse; subcommand dispatch main.rs:1240-1318; configs.rs:74-246).
- ``borealis-consumer {init,check,run}`` — create the durable stream, probe,
  replay + process (borealis-consumer/src/main.rs:538-605).

This module maps those verbs onto the Spark engine so a user of the
reference can switch and keep their operational muscle memory:

| reference                                  | here                                |
|--------------------------------------------|-------------------------------------|
| ``borealis-indexer init``                  | ``init`` — register tables, verify  |
|   (indexer_init_configs, main.rs:1252-56)  |   each is queryable                 |
| ``borealis-indexer check``                 | ``check`` — session probe: rtt of a |
|   (flush+rtt probe, main.rs:1206-1251)     |   1-row job, version, parallelism   |
| ``borealis-indexer run --sync-mode ...``   | ``run`` — producer pipeline:        |
|   (main.rs:1258-1318; configs.rs:139-159)  |   stream → envelope → durable sink  |
| ``borealis-consumer run``                  | ``consume`` — replay the durable    |
|   (replay+project, main.rs:607-677)        |   sink, canonical projection, logs  |
| (no analog — consumers do their own SQL)   | ``query`` — run any registry op     |

Output is one JSON line per record on stdout (the structured-log analog of
the reference's tracing output, configs.rs:269-293) so it composes with jq —
the reference's own docs drive everything through jq (main.rs:453-454).

Usage::

    python -m australis_indexer_spark init  --sf-dir /root/testdata/sf0.001
    python -m australis_indexer_spark check
    python -m australis_indexer_spark run --workdir /tmp/pipe \
        --sync-mode BlockHeight --block-height 12 [--no-dedup]
    python -m australis_indexer_spark consume --workdir /tmp/pipe -v 1
    python -m australis_indexer_spark query --name agg_hash_pricing_summary \
        --sf-dir /root/testdata/sf0.001 [--out /tmp/result.parquet]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from typing import Any

# ---------------------------------------------------------------------------
# helpers


def _emit(obj: dict[str, Any]) -> None:
    sys.stdout.write(json.dumps(obj, default=str) + "\n")


def _session(cpus: int | None):
    from .session import get_session

    return get_session("australis_indexer_cli", cpus=cpus)


# ---------------------------------------------------------------------------
# subcommands


def cmd_init(args: argparse.Namespace) -> int:
    """``init``: bootstrap the catalog (S7) — the Spark analog of writing
    config/genesis/keys (near_indexer::indexer_init_configs,
    borealis-indexer/src/main.rs:1252-1256): register every table as a view
    and prove each one is queryable before any pipeline starts."""
    spark = _session(args.cpus)
    from .sources.batch import TABLES, load_table, register_views

    register_views(spark, args.sf_dir)
    for t in TABLES:
        n = load_table(spark, args.sf_dir, t).count()
        _emit({"event": "table_registered", "table": t, "n_rows": n})
    _emit({"event": "init_done", "sf_dir": args.sf_dir, "n_tables": len(TABLES)})
    return 0


def cmd_check(args: argparse.Namespace) -> int:
    """``check``: end-to-end health probe — the analog of the reference's
    flush-with-timeout probe reporting rtt/ip/client-id/max-payload
    (borealis-indexer/src/main.rs:1206-1251). Here the 'connection' is the
    Spark session: run a 1-row distributed job and report round-trip time
    plus the session facts an operator needs."""
    t0 = time.time()
    spark = _session(args.cpus)
    session_up_ms = round((time.time() - t0) * 1000, 1)
    t0 = time.time()
    n = spark.range(1000).selectExpr("sum(id) AS s").collect()[0]["s"]
    rtt_ms = round((time.time() - t0) * 1000, 1)
    ok = n == 499500
    _emit(
        {
            "event": "health",
            "ok": ok,
            "session_up_ms": session_up_ms,
            "probe_rtt_ms": rtt_ms,  # the reference's `rtt` field
            "spark_version": spark.version,
            "master": spark.sparkContext.master,
            "default_parallelism": spark.sparkContext.defaultParallelism,
            # the reference reports the server's max_payload; ours is the
            # scan-split ceiling (bytes one task will ingest)
            "max_payload": spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728"),
        }
    )
    return 0 if ok else 1


def cmd_run(args: argparse.Namespace) -> int:
    """``run``: the producer pipeline (borealis-indexer run) — stream →
    envelope → 24 h-dedup → height-ordered durable sink.

    ``--sync-mode`` mirrors configs.rs:139-159 exactly:

    - ``LatestSynced``     — start from the live tip: fresh checkpoint AND
      skip everything at or below the current max height (the Kafka
      ``startingOffsets=latest`` analog for a file source — the backlog is
      not reprocessed; only files arriving after this run flow);
    - ``FromInterruption`` — resume from the existing checkpoint dir
      (the default, like the reference);
    - ``BlockHeight``      — replay from ``--block-height N``.
    """
    spark = _session(args.cpus)
    from .streaming.pipeline import run_pipeline, write_stream_source

    src = os.path.join(args.workdir, "src")
    sink = os.path.join(args.workdir, "sink")
    ckpt = os.path.join(args.workdir, "checkpoint")

    write_stream_source(spark, src, n_blocks=args.n_blocks)

    from_height = None
    if args.sync_mode == "BlockHeight":
        if args.block_height is None:
            _emit({"event": "error", "error": "--sync-mode BlockHeight requires --block-height"})
            return 2
        from_height = args.block_height
    elif args.sync_mode == "LatestSynced":
        # fresh cursor at the tip: drop any interruption point and filter
        # out the existing backlog (one batch read of just the height column)
        import shutil

        shutil.rmtree(ckpt, ignore_errors=True)
        from .schemas import STREAMER_SCHEMA

        tip = (
            spark.read.schema(STREAMER_SCHEMA)
            .json(src)
            .agg({"block.header.height": "max"})
            .first()[0]
        )
        if tip is not None:
            from_height = int(tip) + 1

    t0 = time.time()
    run_pipeline(
        spark,
        src,
        sink,
        ckpt,
        from_height=from_height,
        dedup=not args.no_dedup,
        available_now=True,
    )
    n = spark.read.parquet(sink).count() if os.path.isdir(sink) else 0
    _emit(
        {
            "event": "run_done",
            "sync_mode": args.sync_mode,
            "from_height": from_height,
            "dedup": not args.no_dedup,
            "sink": sink,
            "rows_in_sink": n,
            "elapsed_sec": round(time.time() - t0, 2),
        }
    )
    return 0


def cmd_consume(args: argparse.Namespace) -> int:
    """``consume``: the consumer replay (borealis-consumer run,
    main.rs:607-677) — read the durable sink from the start
    (DeliverPolicy::All), unwrap, and log per-message keys; ``-v`` levels
    mirror the reference's verbosity gate (consumer configs.rs:153-170):
    0 = keys only, 1 = + payload length, 2 = + full payload."""
    spark = _session(args.cpus)
    sink = os.path.join(args.workdir, "sink")
    if not os.path.isdir(sink):
        _emit({"event": "error", "error": f"no durable sink at {sink}; run `run` first"})
        return 2
    rows = (
        spark.read.parquet(sink)
        .orderBy("sequence_id")
        .limit(args.limit)
        .collect()
    )
    for r in rows:
        msg: dict[str, Any] = {"event": "message", "sequence_id": r["sequence_id"]}
        if args.verbose >= 1:
            msg["payload_len"] = len(r["payload"] or "")
        if args.verbose >= 2:
            msg["payload"] = r["payload"]
        _emit(msg)
    _emit({"event": "consume_done", "n_messages": len(rows)})
    return 0


def cmd_query(args: argparse.Namespace) -> int:
    """``query``: run any op from the registry (the analytics surface the
    reference delegates to downstream consumers — README.md:4) and print its
    rows as JSON lines or write parquet with ``--out``."""
    from .registry import load_all

    ops = load_all()
    if args.name not in ops:
        _emit({"event": "error", "error": f"unknown op {args.name!r}", "available": sorted(ops)})
        return 2
    spark = _session(args.cpus)
    t0 = time.time()
    df = ops[args.name].fn(spark, args.sf_dir)
    if args.explain:
        # show the physical plan the engine actually ships (pushdown,
        # broadcast choice, exchange count) instead of executing
        df.explain("formatted")
        _emit({"event": "explain_done", "op": args.name})
        return 0
    if args.out:
        df.write.mode("overwrite").parquet(args.out)
        n = spark.read.parquet(args.out).count()
    else:
        rows = df.limit(args.limit).collect()
        for r in rows:
            _emit(r.asDict(recursive=True))
        n = len(rows)
    _emit(
        {
            "event": "query_done",
            "op": args.name,
            "rows": n,
            "out": args.out,
            "elapsed_sec": round(time.time() - t0, 2),
        }
    )
    return 0


# ---------------------------------------------------------------------------
# parser


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="australis_indexer_spark",
        description="PySpark-native engine with the reference indexer's verbs",
    )
    p.add_argument("--cpus", type=int, default=None, help="local[N] cores (default: all)")
    sub = p.add_subparsers(dest="command", required=True)

    pi = sub.add_parser("init", help="register tables and verify the catalog (S7)")
    pi.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    pi.set_defaults(fn=cmd_init)

    pc = sub.add_parser("check", help="session health probe with rtt (T10)")
    pc.set_defaults(fn=cmd_check)

    pr = sub.add_parser("run", help="producer pipeline: stream → envelope → durable sink")
    pr.add_argument("--workdir", required=True, help="dir for src/sink/checkpoint")
    pr.add_argument(
        "--sync-mode",
        choices=["LatestSynced", "FromInterruption", "BlockHeight"],
        default="FromInterruption",
    )
    pr.add_argument("--block-height", type=int, default=None)
    pr.add_argument("--no-dedup", action="store_true", help="disable the 24 h dedup window")
    from .constants import FIXTURE_BLOCKS  # pyspark-free (ADVICE r7)

    pr.add_argument(
        "--n-blocks", type=int, default=FIXTURE_BLOCKS, help="fixture stream size"
    )
    pr.set_defaults(fn=cmd_run)

    pco = sub.add_parser("consume", help="replay the durable sink (DeliverPolicy::All)")
    pco.add_argument("--workdir", required=True)
    pco.add_argument("-v", "--verbose", type=int, default=0, choices=[0, 1, 2])
    pco.add_argument("--limit", type=int, default=100)
    pco.set_defaults(fn=cmd_consume)

    pq = sub.add_parser("query", help="run a registry op by name")
    pq.add_argument("--name", required=True)
    pq.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    pq.add_argument("--out", default=None, help="write parquet here instead of stdout")
    pq.add_argument("--limit", type=int, default=1000)
    pq.add_argument("--explain", action="store_true", help="print the physical plan, don't run")
    pq.set_defaults(fn=cmd_query)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(main())
