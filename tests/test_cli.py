"""CLI parity surface (cli.py) — the reference's `init`/`check`/`run`
verbs (borealis-indexer/src/main.rs:1240-1318) plus `consume` and `query`.

Each verb is driven through `cli.main(argv)` in-process (same SparkSession,
no JVM-per-test) and its JSON-lines stdout is parsed — the same way an
operator would pipe it to jq."""

from __future__ import annotations

import json
import os

import pytest

from australis_indexer_spark.cli import main

from tests.conftest import SF_SMOKE


def run_cli(capsys, argv: list[str]) -> tuple[int, list[dict]]:
    rc = main(argv)
    out = capsys.readouterr().out
    return rc, [json.loads(line) for line in out.splitlines() if line.strip()]


def test_check_reports_health(spark, capsys):
    rc, events = run_cli(capsys, ["check"])
    assert rc == 0
    (h,) = [e for e in events if e["event"] == "health"]
    assert h["ok"] is True
    assert h["probe_rtt_ms"] > 0
    assert h["master"].startswith("local[")


def test_init_registers_all_tables(spark, capsys):
    rc, events = run_cli(capsys, ["init", "--sf-dir", SF_SMOKE])
    assert rc == 0
    tables = {e["table"]: e["n_rows"] for e in events if e["event"] == "table_registered"}
    assert set(tables) >= {"region", "nation", "orders", "lineitem", "events", "documents"}
    assert all(n > 0 for n in tables.values())
    assert events[-1]["event"] == "init_done"


def test_run_then_consume_roundtrip(spark, capsys, tmp_path):
    wd = str(tmp_path / "pipe")
    rc, events = run_cli(capsys, ["run", "--workdir", wd, "--n-blocks", "12"])
    assert rc == 0
    done = events[-1]
    assert done["event"] == "run_done" and done["rows_in_sink"] == 12

    # FromInterruption (default): rerun resumes from the checkpoint — the
    # backlog is already drained, so no new rows land (T3 semantics)
    rc, events = run_cli(capsys, ["run", "--workdir", wd, "--n-blocks", "12"])
    assert rc == 0 and events[-1]["rows_in_sink"] == 12

    rc, events = run_cli(capsys, ["consume", "--workdir", wd, "-v", "1", "--limit", "5"])
    assert rc == 0
    msgs = [e for e in events if e["event"] == "message"]
    assert [m["sequence_id"] for m in msgs] == sorted(m["sequence_id"] for m in msgs)
    assert all(m["payload_len"] > 0 for m in msgs)


def test_run_block_height_replay(spark, capsys, tmp_path):
    wd = str(tmp_path / "pipe2")
    # fixture heights start at 63_596 (the example block, main.rs:130):
    # replay from 63_602 of 12 blocks keeps the last 6
    rc, events = run_cli(
        capsys,
        ["run", "--workdir", wd, "--sync-mode", "BlockHeight",
         "--block-height", "63602", "--n-blocks", "12"],
    )
    assert rc == 0
    done = events[-1]
    assert done["from_height"] == 63602 and done["rows_in_sink"] == 6


def test_run_block_height_requires_height(spark, capsys, tmp_path):
    rc, events = run_cli(
        capsys, ["run", "--workdir", str(tmp_path / "x"), "--sync-mode", "BlockHeight"]
    )
    assert rc == 2 and events[-1]["event"] == "error"


def test_query_runs_registry_op(spark, capsys):
    rc, events = run_cli(
        capsys, ["query", "--name", "sort_topk_orders", "--sf-dir", SF_SMOKE, "--limit", "3"]
    )
    assert rc == 0
    assert events[-1]["event"] == "query_done" and events[-1]["rows"] == 3


def test_query_unknown_op_lists_available(spark, capsys):
    rc, events = run_cli(capsys, ["query", "--name", "nope"])
    assert rc == 2
    assert "dedup_exact" in events[-1]["available"]


def test_run_latest_synced_skips_backlog(spark, capsys, tmp_path):
    """LatestSynced = start at the live tip: the pre-existing backlog must
    NOT be reprocessed (startingOffsets=latest semantics)."""
    wd = str(tmp_path / "pipe3")
    rc, events = run_cli(capsys, ["run", "--workdir", wd, "--n-blocks", "12"])
    assert rc == 0 and events[-1]["rows_in_sink"] == 12

    rc, events = run_cli(
        capsys, ["run", "--workdir", wd, "--sync-mode", "LatestSynced", "--n-blocks", "12"]
    )
    assert rc == 0
    done = events[-1]
    # tip+1 cursor: nothing new arrived, so the sink is unchanged
    assert done["from_height"] > 0 and done["rows_in_sink"] == 12


def test_query_explain_prints_plan(spark, capsys):
    rc = main(["query", "--name", "join_broadcast_dims", "--sf-dir", SF_SMOKE, "--explain"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "Physical Plan" in out and "BroadcastHashJoin" in out


def test_parser_build_stays_pyspark_free():
    """ADVICE r7: build_parser previously imported .fixtures (pyspark at
    module level) just to read FIXTURE_BLOCKS, so --help and argument
    errors paid the full pyspark import that every other cli import
    defers into subcommand bodies. Pinned in a clean subprocess: parsing
    --help must complete WITHOUT pyspark entering sys.modules, and the
    pyspark-free constants module must agree with fixtures' re-export."""
    import subprocess
    import sys

    code = (
        "import sys\n"
        "from australis_indexer_spark.cli import build_parser\n"
        "p = build_parser()\n"
        "assert not any(m == 'pyspark' or m.startswith('pyspark.')"
        " for m in sys.modules), 'build_parser imported pyspark'\n"
        "print('CLEAN')\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr
    assert "CLEAN" in out.stdout

    from australis_indexer_spark import constants, fixtures

    assert constants.FIXTURE_BLOCKS == fixtures.FIXTURE_BLOCKS == 48
    assert (
        constants.FIXTURE_START_HEIGHT
        == fixtures.FIXTURE_START_HEIGHT
        == 63_596
    )
