"""Driver-contract surface tests: registry completeness + entry module."""

from __future__ import annotations

import importlib.util
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _entry_module():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", REPO / "__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_registry_nonempty(ops):
    assert len(ops) >= 50


def test_oracles_are_subset(ops):
    mod = _entry_module()
    qs, osql = mod.queries(), mod.oracle_sql()
    assert set(osql) <= set(qs)
    assert set(qs) == set(ops)
    for sql in osql.values():
        assert isinstance(sql, str) and sql.strip()


def test_flagship_entry_returns_rows(spark):
    mod = _entry_module()
    df = mod.entry(spark)
    assert df.count() > 0


def test_every_op_has_doc(ops):
    for name, spec in ops.items():
        assert spec.doc.strip(), f"{name} lacks a docstring/doc"


def test_every_operator_module_is_loaded(ops):
    """Every module in operators/ (and streaming/) must contribute at least
    one registered op after load_all() — catches a new module file that was
    never added to load_all's import list (the registry dict is shared, so
    a stray import elsewhere can mask the omission)."""
    import os

    import australis_indexer_spark.operators as pkg

    helpers = {"fixture_oracles"}  # oracle builders, not op definitions
    mod_files = {
        f[:-3]
        for f in os.listdir(os.path.dirname(pkg.__file__))
        if f.endswith(".py") and f != "__init__.py"
    } - helpers
    loaded = {spec.fn.__module__.rsplit(".", 1)[-1] for spec in ops.values()}
    missing = mod_files - loaded
    assert not missing, f"operator modules never imported by load_all: {missing}"


def test_all_ops_oracle_backed(ops):
    """The repo's headline claim: EVERY registered op carries an oracle
    string. Rows-only ops were eliminated in round 3 — this pins that it
    stays true as ops are added."""
    missing = [n for n, s in ops.items() if s.oracle is None]
    assert not missing, f"ops without oracles: {missing}"


def test_priority_covers_registry_prefix(ops):
    """Registration order starts with the explicit _PRIORITY rotation and
    every priority name resolves (load_all already raises otherwise);
    the first 50 — the driver's certification window — must be unique."""
    names = list(ops)
    window = names[:50]
    assert len(set(window)) == 50


def test_certification_ledger_current():
    """CERTIFICATION.md must be regenerated whenever the registry order
    changes (VERDICT r3 #2: window planning reads the ledger, not three
    JSON files). The comparison pins the round the ledger declares it
    covers, so a NEW driver artifact landing at round end — after the
    builder's turns — doesn't retroactively fail this in a fresh pytest;
    the next round's builder regenerates and advances the cover line."""
    import importlib.util as ilu
    import re

    spec = ilu.spec_from_file_location("certification", REPO / "tools" / "certification.py")
    mod = ilu.module_from_spec(spec)
    spec.loader.exec_module(mod)
    on_disk = (REPO / "CERTIFICATION.md").read_text()
    m = re.search(r"Covers driver artifacts through round (\d+)\.", on_disk)
    assert m, "ledger missing its cover line"
    assert on_disk == mod.render(max_round=int(m.group(1)))


def test_r4_window_is_pure_rotation():
    """The round-4 driver window (registry slots 1-50) contained ZERO
    already-green ops AS PLANNED FROM rounds 1-3: slots 1-4 the env-bound
    red-latest four, slots 5-50 never-driver-seen (VERDICT r3 #1 'zero
    repeats'). Pinned to max_round=3 — the round-4 artifact itself turning
    these green is the PLAN SUCCEEDING, not a repeat."""
    import importlib.util as ilu

    spec = ilu.spec_from_file_location("certification", REPO / "tools" / "certification.py")
    mod = ilu.module_from_spec(spec)
    spec.loader.exec_module(mod)

    import sys

    sys.path.insert(0, str(REPO))
    from australis_indexer_spark.registry import load_all

    names = list(load_all())
    hist = mod.collect_rows(max_round=3)
    for n in names[:50]:
        rows = hist.get(n, [])
        assert not (rows and rows[-1][1]), f"window repeat of already-green op: {n}"
    assert names[:4] == [
        "scan_stream", "health_check", "cbor_encode", "compress_roundtrip",
    ]
