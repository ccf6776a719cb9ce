"""CLI entry point (python -m pasta_pipeline_spark) — list / run /
explain / sql drive the same catalog the driver contract exposes."""

from __future__ import annotations

import io
import json

from pasta_pipeline_spark.__main__ import main

SF = "/root/testdata/sf0.001"


def test_list_and_grep():
    out = io.StringIO()
    assert main(["list"], out=out) == 0
    lines = out.getvalue().splitlines()
    assert len(lines) >= 200
    out2 = io.StringIO()
    assert main(["list", "--grep", "dedup"], out=out2) == 0
    grepped = out2.getvalue().splitlines()
    assert 0 < len(grepped) < len(lines)
    assert all("dedup" in l.split("\t")[0] for l in grepped)


def test_run_json_and_limit(spark):
    out = io.StringIO()
    assert main(
        ["run", "group_by_status", "--sf-dir", SF, "--json"], out=out
    ) == 0
    rows = [json.loads(l) for l in out.getvalue().splitlines()]
    assert rows and all("o_orderstatus" in r for r in rows)
    out2 = io.StringIO()
    assert main(
        ["run", "group_by_status", "--sf-dir", SF, "--limit", "1"], out=out2
    ) == 0
    assert len(out2.getvalue().splitlines()) == 2  # header + 1 row


def test_unknown_query_errors():
    out = io.StringIO()
    assert main(["run", "nope_not_real", "--sf-dir", SF], out=out) == 2
    assert "unknown query" in out.getvalue()


def test_explain_prints_physical_plan(spark):
    out = io.StringIO()
    assert main(["explain", "pricing_summary", "--sf-dir", SF], out=out) == 0
    assert "Physical Plan" in out.getvalue()


def test_sql_over_views(spark):
    out = io.StringIO()
    assert main(
        [
            "sql",
            "SELECT count(*) AS n FROM documents",
            "--sf-dir", SF, "--json",
        ],
        out=out,
    ) == 0
    (row,) = [json.loads(l) for l in out.getvalue().splitlines()]
    assert row["n"] == 500
