"""CLI smoke tests (python -m oeem_etl_spark): the user-facing surface
must keep working — list all queries, run one, run ad-hoc SQL."""

from __future__ import annotations

from oeem_etl_spark.__main__ import cmd_list, cmd_run, cmd_sql


def test_cli_list(capsys):
    assert cmd_list() == 0
    out = capsys.readouterr().out
    assert "q01_pricing_summary" in out and "l19_decontaminate" in out
    assert out.count("\n") >= 140


def test_cli_run_and_sql(spark, sf_dir, capsys):
    assert cmd_run("a1_parquet_scan", sf_dir, limit=5, explain=False) == 0
    assert "AFRICA" in capsys.readouterr().out
    assert cmd_run("no_such_query", sf_dir, limit=5, explain=False) == 2
    capsys.readouterr()
    assert cmd_sql("SELECT COUNT(*) AS n FROM region", sf_dir, limit=5) == 0
    assert "5" in capsys.readouterr().out
