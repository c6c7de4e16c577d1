"""CLI help/version surface — mirrors the reference's tests/help.rs
assertions (usage shapes) plus the argv-normalization edge cases."""

from __future__ import annotations

import pytest

from pgweasel_ray.cli import VERSION, build_parser, normalize_argv


def _help_of(argv) -> str:
    parser = build_parser()
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf), pytest.raises(SystemExit) as exc:
        parser.parse_args(argv)
    assert exc.value.code == 0
    return buf.getvalue()


def test_base_help_with_options():
    # help.rs:5-15
    out = _help_of(["--help"])
    assert "pgweasel-ray [OPTIONS] <COMMAND>" in out
    assert "A PostgreSQL log parser" in out


def test_errors_command_help():
    # help.rs:17-29
    out = _help_of(["errors", "--help"])
    assert "pgweasel-ray errors [OPTIONS] <PATH>..." in out
    assert "Show or summarize error messages" in out


def test_errors_list_help():
    # help.rs:31-43
    out = _help_of(["errors", "list", "--help"])
    assert "pgweasel-ray errors list [OPTIONS] <PATH>..." in out


def test_slow_help_contains_treshold_and_top():
    # help.rs:45-66
    out = _help_of(["slow", "--help"])
    assert "slow <TRESHOLD>" in out
    assert "top" in out


def test_version():
    # cli.rs:10 .version("0.1")
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf), pytest.raises(SystemExit) as exc:
        build_parser().parse_args(["--version"])
    assert exc.value.code == 0
    assert buf.getvalue().strip() == f"pgweasel-ray {VERSION}"


def test_about_strings_present():
    # cli.rs:50-97 subcommand about strings
    for cmd, needle in [
        (["locks", "--help"], "locking (incl. deadlocks"),
        (["system", "--help"], "autovacuum, replication, extensions"),
        (["connections", "--help"], "Assumes log_connections enabled"),
        (["peaks", "--help"], "busiest"),
        (["stats", "--help"], "counts / frequency of errors"),
    ]:
        flat = " ".join(_help_of(cmd).split())  # argparse wraps long lines
        assert needle in flat


def test_normalize_mask_value_matching_command_name():
    # a -m value equal to a command name must not become the command
    got = normalize_argv(["-m", "errors", "locks", "x.log"])
    assert got == ["-m", "errors", "locks", "x.log"]
    got = normalize_argv(["-b", "today", "err", "x.log"])
    assert got == ["-b", "today", "errors", "list", "x.log"]


def test_slow_multiple_paths_treshold_fallback(tmp_path):
    """`slow a.log b.log` — the first path must not be eaten as TRESHOLD."""
    a = tmp_path / "a.log"
    b = tmp_path / "b.log"
    stamp = "2025-01-01 10:00:00.000 UTC [1] LOG:  duration: 5001.0 ms  x\n"
    a.write_text(stamp)
    b.write_text(stamp.replace("10:00:00", "10:00:01"))

    from pgweasel_ray.cli import main

    assert main(["slow", str(a), str(b)]) == 0
