"""Shared pytest fixtures: one session-scoped SparkSession + sf dirs."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from australis_indexer_spark.session import get_session  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_session("pytest", cpus=8)
    yield s


@pytest.fixture(scope="session")
def ops():
    from australis_indexer_spark.registry import load_all

    return load_all()
