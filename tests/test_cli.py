"""CLI argument normalization (aliases, default subcommand) and in-process
command dispatch."""

from __future__ import annotations

import pytest

from pgweasel_ray.cli import build_parser, main, normalize_argv


class TestNormalizeArgv:
    def test_alias_expansion(self):
        assert normalize_argv(["err", "top", "f.log"]) == ["errors", "top", "f.log"]
        assert normalize_argv(["conn", "f.log"]) == ["connections", "f.log"]
        assert normalize_argv(["sys", "f.log"]) == ["system", "f.log"]
        assert normalize_argv(["deadlocks", "f.log"]) == ["locks", "f.log"]

    def test_default_errors_subcommand(self):
        # clap's default subcommand behaviour (main.rs:80)
        assert normalize_argv(["errors", "f.log"]) == ["errors", "list", "f.log"]
        assert normalize_argv(["err", "hist", "f.log"]) == [
            "errors", "hist", "f.log",
        ]

    def test_global_flags_before_command(self):
        args = build_parser().parse_args(
            normalize_argv(["-m", "xx", "-b", "10m", "errors", "f.log"])
        )
        assert args.mask == "xx" and args.begin == "10m"
        assert args.command == "errors" and args.subcommand == "list"

    def test_hist_local_bucket_flag(self):
        # inside `errors hist`, -b means bucket (cli.rs:40-45)
        args = build_parser().parse_args(
            normalize_argv(["errors", "hist", "-b", "1s", "f.log"])
        )
        assert args.bucket == "1s" and args.begin is None

    def test_top_local_max_flag(self):
        args = build_parser().parse_args(
            normalize_argv(["err", "top", "-m", "2", "f.log"])
        )
        assert args.max == 2 and args.mask is None


def test_cli_debug_stage_timings(sf_dir, capsys):
    """-d must surface a per-stage elapsed report (reference --debug logs
    read/output/aggregate elapsed: output_results/mod.rs:39,82,126,136):
    driver phase lines + Ray Data per-operator stats lines on stderr,
    stdout unchanged."""
    rc = main(["-d", "errors", "top", sf_dir])
    assert rc == 0
    cap = capsys.readouterr()
    assert "[debug] resolve input elapsed:" in cap.err
    assert "[debug] build+execute+render elapsed:" in cap.err
    assert "[debug] Operator" in cap.err  # per-operator wall times
    assert "[debug]" not in cap.out  # report stream stays clean

    # without -d: no debug lines at all
    main(["errors", "top", sf_dir])
    cap = capsys.readouterr()
    assert "[debug]" not in cap.err


def test_cli_debug_route_shard_walls(sf_dir, capsys, tmp_path):
    rc = main(["-d", "route", sf_dir, "--out", str(tmp_path / "r")])
    assert rc == 0
    cap = capsys.readouterr()
    assert "[debug] shard=0: rows=" in cap.err
    assert "wall=" in cap.err


def test_cli_end_to_end_list(sf_dir, capsys):
    rc = main(["errors", "list", sf_dir, "-l", "fatal"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "FATAL:" in out
    assert "ERROR:" not in out.replace("FATAL:", "")  # floor respected


def test_cli_export_training_shards(sf_dir, capsys, tmp_path):
    rc = main(["-d", "export", sf_dir, "--out", str(tmp_path / "exp"),
               "--shards", "4"])
    assert rc == 0
    cap = capsys.readouterr()
    assert "ordered shards under" in cap.out
    assert "[debug] shard=0: rows=" in cap.err
    assert "keys=[" in cap.err
    import pyarrow.parquet as pq

    files = sorted((tmp_path / "exp").glob("shard=*/shard.parquet"))
    assert files and sum(pq.read_metadata(f).num_rows for f in files) > 0


def test_cli_query_list(capsys):
    rc = main(["query", "--list"])
    assert rc == 0
    names = capsys.readouterr().out.split()
    from pgweasel_ray.registry import queries

    assert names == list(queries())


def test_cli_query_runs_named_pipeline(sf_dir, capsys):
    rc = main(["query", "severity_tool_rollup", sf_dir])
    assert rc == 0
    out = capsys.readouterr().out
    assert "ALL" in out and "cnt" in out


def test_cli_query_unknown_name(capsys):
    rc = main(["query", "definitely_not_a_query", "/tmp"])
    assert rc == 2
    assert "query --list" in capsys.readouterr().err
