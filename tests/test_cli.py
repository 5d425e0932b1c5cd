"""CLI smoke tests via subprocess — the user-facing surface stays green."""

from __future__ import annotations

import subprocess
import sys


def _run(*args: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, "-m", "market_data_ingestion_scraper_spark", *args],
        capture_output=True,
        text=True,
        timeout=300,
    )


def test_cli_list():
    r = _run("list")
    assert r.returncode == 0
    assert "top5_commodities" in r.stdout and "[oracle]" in r.stdout


def test_cli_unknown_query_exit_code():
    r = _run("run", "definitely_not_a_query")
    assert r.returncode == 2
    assert "unknown query" in r.stderr


def test_cli_run_small_query():
    r = _run("run", "commodity_lookup", "--sf-dir", "/root/testdata/sf0.001")
    assert r.returncode == 0
    assert "red gear" in r.stdout
