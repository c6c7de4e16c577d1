"""CLI veneer — pgweasel's command surface over the Ray Data engine.

Flag layout, aliases and defaults mirror /root/reference/src/cli.rs:7-109 and
main.rs:68-170:

    pgweasel-ray [-b BEGIN] [-e END] [-m MASK] errors [list|top|hist] PATH...
    pgweasel-ray errors top  [-m MAX] PATH        (max default 20)
    pgweasel-ray errors hist [-b BUCKET] PATH     (bucket default 1h)
    pgweasel-ray slow [TRESHOLD] PATH | slow top PATH   (threshold default 3s)
    pgweasel-ray locks | system | connections PATH
    pgweasel-ray route PATH --out DIR [--shards N]      (our routed sink)

Global ``-b/-e`` accept absolute timestamps, date-only, "today" and relative
intervals ("10m" = 10 minutes ago, "-10m" = 10 minutes ahead), resolved
against now BEFORE the job (functions/timeparse.py ⇄ util.rs:33-169). Inside
``errors hist``, ``-b`` is the bucket width, exactly as in the reference
(cli.rs:40-45). Inputs may be transcript parquet, raw PostgreSQL logs
(.log/.csv/.gz/.zip), or an sf fixture name.

Severity floors: Error for errors (main.rs:85-87), Log elsewhere
(main.rs:136,140,145,155,163).

This module OWNS the Ray session (guarded init) — library code never does.
"""

from __future__ import annotations

import argparse
import sys

from .functions.timeparse import parse_time_or_interval
from .severity import RANK, severity_from_cli

VERSION = "0.1"  # mirrors cli.rs:10 .version("0.1")

ALIASES = {
    "err": "errors", "error": "errors",
    "loc": "locks", "lock": "locks", "deadlock": "locks", "deadlocks": "locks",
    "sys": "system", "pg": "system", "postgre": "system", "postgres": "system",
    "conn": "connections", "conns": "connections",
}
ERROR_SUBCOMMANDS = {"list", "top", "hist", "histogram"}

# global options that consume the NEXT token as a value — the command scan
# must never mistake such a value (e.g. `-m errors`) for the command itself
VALUE_FLAGS = {"-m", "--mask", "-b", "--begin", "-e", "--end",
               "--num-cpus", "-l", "--level"}


def _init_ray(num_cpus: int | None) -> bool:
    """Returns True when this call owns (and must shut down) the session."""
    import logging

    import ray

    owns = not ray.is_initialized()
    if owns:
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return owns


def _resolve_time(value: str | None) -> str | None:
    return None if value is None else str(parse_time_or_interval(value))


def normalize_argv(argv: list[str]) -> list[str]:
    """Alias expansion + implicit ``errors list`` / explicit subcommand
    handling (clap's default-subcommand behaviour, main.rs:80)."""
    out = []
    i = 0
    seen_command = None
    while i < len(argv):
        tok = argv[i]
        if (seen_command is None and tok in VALUE_FLAGS
                and i + 1 < len(argv)):
            out.extend(argv[i:i + 2])  # flag + its value, verbatim
            i += 2
            continue
        mapped = ALIASES.get(tok, tok)
        if seen_command is None and mapped in (
            "errors", "locks", "system", "connections", "slow", "route",
            "peaks", "stats", "export"
        ):
            seen_command = mapped
            out.append(mapped)
            if mapped == "errors":
                nxt = argv[i + 1] if i + 1 < len(argv) else None
                if nxt == "histogram":
                    argv[i + 1] = "hist"
                if nxt not in ERROR_SUBCOMMANDS:
                    out.append("list")
        else:
            out.append(tok)
        i += 1
    return out


def build_parser() -> argparse.ArgumentParser:
    # about/usage strings mirror cli.rs:8-97 (tests/help.rs pins the usage
    # shapes; test_cli_help.py mirrors those assertions for this binary)
    p = argparse.ArgumentParser(
        prog="pgweasel-ray",
        description="A PostgreSQL log parser",
        usage="pgweasel-ray [OPTIONS] <COMMAND>",
    )
    p.add_argument("-V", "--version", action="version",
                   version=f"pgweasel-ray {VERSION}")
    p.add_argument("--num-cpus", type=int, default=None)
    p.add_argument("-d", "--debug", action="store_true",
                   help="Verbose. Show debug information")
    p.add_argument("-m", "--mask", default=None,
                   help='Postgres log timestamp mask (e.g. "2025-05-21 '
                        '12:57" - will show all events at 12:57)')
    p.add_argument("-b", "--begin", default=None)
    p.add_argument("-e", "--end", default=None)
    sp = p.add_subparsers(dest="command", required=True)

    def paths(sub):
        sub.add_argument("paths", nargs="+", metavar="PATH",
                         help="Log files to analyze (parquet transcripts / "
                              "raw logs / sf name)")

    def level(sub):
        sub.add_argument("-l", "--level", default=None)

    errors = sp.add_parser(
        "errors", description="Show or summarize error messages",
        help="Show or summarize error messages",
        usage="pgweasel-ray errors [OPTIONS] <PATH>...",
    )
    esp = errors.add_subparsers(dest="subcommand", required=True)
    e_list = esp.add_parser(
        "list",
        description="Default subcommand of error. Show error messages",
        usage="pgweasel-ray errors list [OPTIONS] <PATH>...",
    )
    level(e_list); paths(e_list)
    e_top = esp.add_parser(
        "top", description="Shows top most frequent error messages",
        usage="pgweasel-ray errors top [OPTIONS] <PATH>...",
    )
    level(e_top); paths(e_top)
    e_top.add_argument("-m", "--max", type=int, default=20,
                       help="Max number of top errors to show (default 20)")
    e_hist = esp.add_parser(
        "hist",
        description="Show histogram of error occurrences over time",
        usage="pgweasel-ray errors hist [OPTIONS] <PATH>...",
    )
    level(e_hist); paths(e_hist)
    e_hist.add_argument("-b", "--bucket", default="1h",
                        help="Interval for histogram buckets, e.g. 10s, 1m, "
                             "1h. Defaults to 1h")

    slow = sp.add_parser(
        "slow",
        description="Show queries taking longer than give threshold "
                    "(subcommand `top` shows the slowest queries)",
        help="Show queries taking longer than give threshold",
        usage="pgweasel-ray slow <TRESHOLD> <PATH>... | slow top <PATH>...",
    )
    slow.add_argument("treshold", nargs="?", default="3s",
                      help="Treshold in format like 10s, 10ms to consider "
                           "slow query. Or 'top'.")
    paths(slow)

    for name, about in (
        ("locks", "Only show locking (incl. deadlocks, recovery conflicts) "
                  "entries"),
        ("system", "Show lifecycle / Postgres internal events, i.e. "
                   "autovacuum, replication, extensions, config changes etc"),
        ("connections", "Show connections counts by total, db, user, "
                        "application name. Assumes log_connections enabled"),
        ("peaks", 'Show the "busiest" time periods with most log events'),
        ("stats", "Summary of log events - counts / frequency of errors, "
                  "connections, checkpoints, autovacuums"),
    ):
        sub = sp.add_parser(name, description=about, help=about)
        level(sub)
        paths(sub)

    route = sp.add_parser(
        "route",
        description="Route records into a partitioned parquet sink "
                    "(severity × tool) with a resumable manifest",
    )
    paths(route)
    route.add_argument("--out", required=True)
    route.add_argument("--shards", type=int, default=4)
    route.add_argument("--salt", type=int, default=None,
                       help="hot-key salt for --exchange hash: spread each "
                            "(severity, tool) partition over N aggregators")
    route.add_argument("--exchange", choices=("compact", "hash"),
                       default="compact",
                       help="partition exchange: write-then-compact "
                            "(map-only, default) or keyed hash shuffle")
    route.add_argument("--shard-by", choices=("index", "file"),
                       default="index", dest="shard_by",
                       help="'file' = one shard per input file keyed by "
                            "name (incremental ingest: reruns build only "
                            "newly arrived files)")

    query = sp.add_parser(
        "query",
        description="Run ANY named engine pipeline (dedup/ANN/text-"
                    "analysis/sketches/events/multimodal — see --list) over "
                    "an sf-style data directory and print the result",
        help="Run a named engine pipeline by name",
    )
    query.add_argument("name", nargs="?", default=None,
                       help="query name (see --list)")
    query.add_argument("input", nargs="?", default=None,
                       help="sf-style data directory")
    query.add_argument("--list", action="store_true", dest="list_queries",
                       help="list all query names and exit")
    query.add_argument("--limit", type=int, default=20,
                       help="max rows to print (0 = all)")

    export = sp.add_parser(
        "export",
        description="Run the corpus-prep recipe (quality filter → exact "
                    "dedup → MinHash near-dedup → decontamination) over a "
                    "documents table and write the survivors as "
                    "globally-shuffle-ordered training shards",
    )
    export.add_argument("input", help="directory containing documents.parquet")
    export.add_argument("--out", required=True)
    export.add_argument("--shards", type=int, default=None,
                        help="number of ordered range-partitioned shards")
    return p


class _DebugTimer:
    """``-d/--debug`` per-stage elapsed report (the reference logs read/
    output/aggregate elapsed per file with --debug:
    /root/reference/src/output_results/mod.rs:39,82,126,136 + README.md:66).
    Driver-side phases are timed with mark(); within-pipeline attribution
    (read vs parse vs aggregate wall) comes from Ray Data's own per-operator
    stats of the EXECUTED dataset. Lines go to stderr so report stdout stays
    parseable."""

    def __init__(self, enabled: bool):
        import time

        self.enabled = enabled
        self._clock = time.monotonic
        self._last = self._clock()

    def mark(self, label: str) -> None:
        now = self._clock()
        if self.enabled:
            print(f"[debug] {label} elapsed: {now - self._last:.3f}s",
                  file=sys.stderr)
        self._last = now

    def stats(self, ds) -> None:
        """Per-operator wall-time lines of an executed Dataset."""
        if not self.enabled or ds is None:
            return
        try:
            text = ds.stats()
        except Exception:
            return
        for line in text.splitlines():
            s = line.strip()
            if s.startswith("Operator") or "Execution time" in s:
                print(f"[debug] {s}", file=sys.stderr)


def _input(args) -> str:
    if len(args.paths) == 1:
        return args.paths[0]
    # multiple raw files: ingest together (S1 multiple-paths behaviour)
    import tempfile

    from .sources.rawlog import ingest_to_transcripts

    out = tempfile.mkdtemp(prefix="pgweasel_ray_ingest_")
    return ingest_to_transcripts(args.paths, out)


def _print_records(ds):
    # stable (conv_id, turn_idx) order, text verbatim (the reference prints
    # in file order; ours is the documented deterministic order, SURVEY §2.5)
    # returns the EXECUTED dataset so --debug can read its operator stats
    executed = ds.sort(["conv_id", "turn_idx"])
    for batch in executed.iter_batches(batch_size=4096, batch_format="pyarrow"):
        for text in batch.column("text").to_pylist():
            print(text)
    return executed


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    args = build_parser().parse_args(normalize_argv(argv))
    owns_session = _init_ray(args.num_cpus)
    from .functions import render
    from .pipelines import core, router
    from .pipelines.common import grouped_count
    from .stages.parse import add_bucket

    timer = _DebugTimer(args.debug)
    executed = None  # the pipeline whose operator stats --debug reports

    begin, end, mask = _resolve_time(args.begin), _resolve_time(args.end), args.mask
    inp = _input(args) if hasattr(args, "paths") else args.input
    timer.mark("resolve input")

    def floor(default_rank: int) -> int:
        if getattr(args, "level", None):
            return RANK[severity_from_cli(args.level)]
        return default_rank

    if args.command == "errors":
        rank = floor(core.ERROR_RANK)
        if args.subcommand == "list":
            executed = _print_records(core.records(inp, rank, mask, begin, end))
        elif args.subcommand == "top":
            ds = core.records(inp, rank, mask, begin, end,
                              keep=("message",))
            counts = (
                grouped_count(
                    ds.map_batches(core._drop_null_messages,
                                   batch_format="pyarrow"),
                    ["message"],
                )
                .sort(["cnt", "message"], descending=[True, False])
                .limit(args.max)
            )
            print(render.render_frequency(counts.to_pandas(), "message"))
            executed = counts
        else:  # hist
            import pandas as pd

            width_s = max(1, int(pd.Timedelta(args.bucket).total_seconds()))
            ds = core.records(inp, rank, mask, begin, end, keep=("ts",))
            buckets = (
                grouped_count(
                    ds.map_batches(add_bucket, batch_format="pyarrow",
                                   fn_kwargs={"width_s": width_s})
                    .select_columns(["bucket_ts"]),
                    ["bucket_ts"],
                ).sort("bucket_ts")
            )
            print(render.render_histogram(buckets.to_pandas()))
            executed = buckets

    elif args.command == "slow":
        rank = core.LOG_RANK  # main.rs:155,163
        if args.treshold != "top":
            # `slow a.log b.log`: argparse gives the first path to the
            # optional TRESHOLD slot — if the token does not parse as a
            # duration, treat it as a path and keep the 3 s default
            import pandas as pd

            try:
                pd.Timedelta(args.treshold)
            except ValueError:
                args.paths = [args.treshold] + args.paths
                args.treshold = "3s"
                inp = _input(args)
        if args.treshold == "top":
            top = core.records(
                inp, rank, mask, begin, end,
                keep=("conv_id", "turn_idx", "duration_ms", "text"),
            ).map_batches(core._drop_null_durations, batch_format="pyarrow")
            top = top.sort(
                ["duration_ms", "conv_id", "turn_idx"],
                descending=[True, False, False],
            ).limit(core.TOP_SLOW_K)
            print(render.render_top_slow(top.to_pandas()))
            executed = top
        else:
            import pandas as pd

            thr_ms = pd.Timedelta(args.treshold).total_seconds() * 1000.0
            ds = core.records(inp, rank, mask, begin, end,
                              keep=("conv_id", "turn_idx", "duration_ms", "text"))
            ds = ds.map_batches(core._slow_filter, batch_format="pyarrow",
                                fn_kwargs={"threshold_ms": thr_ms})
            executed = _print_records(ds)

    elif args.command in ("locks", "system"):
        feature = "is_lock" if args.command == "locks" else "is_system"
        executed = _print_records(
            core.records(inp, floor(core.LOG_RANK), mask, begin, end,
                         feature=feature)
        )

    elif args.command == "connections":
        print(render.render_connections(
            core.connections_summary(inp),
            core.connections_by_host(inp).to_pandas().sort_values("host"),
            core.connections_by_db(inp).to_pandas().sort_values("db"),
            core.connections_by_user(inp).to_pandas().sort_values("user"),
            core.connections_by_appname(inp).to_pandas().sort_values("appname"),
            core.connections_by_bucket(inp).to_pandas(),
        ))

    elif args.command == "peaks":
        # reference stub (main.rs:147-149) made real: busiest 10-min buckets
        from .pipelines import windows

        df = windows.peaks(inp).to_pandas()
        print(render.render_frequency(
            df.assign(bucket=df["bucket_ts"].astype(str)), "bucket",
            header="Busiest time periods:",
        ))

    elif args.command == "stats":
        from .pipelines import windows

        row = windows.stats(inp).iloc[0]
        for key in row.index:
            print(f"{key}: {int(row[key])}")

    elif args.command == "route":
        manifest = router.route(inp, out_dir=args.out, num_shards=args.shards,
                                salt=args.salt, exchange=args.exchange,
                                shard_by=args.shard_by)
        print(f"routed {manifest.total_rows()} turns into "
              f"{len(manifest.entries)} shards under {args.out}")
        if args.debug:
            for key, e in sorted(manifest.entries.items()):
                print(f"[debug] {key}: rows={e.get('rows')} "
                      f"wall={e.get('wall_s', 0):.3f}s", file=sys.stderr)

    elif args.command == "query":
        from .registry import queries as registry_queries

        reg = registry_queries()
        if args.list_queries or args.name is None:
            for name in reg:
                print(name)
        elif args.name not in reg:
            print(f"unknown query {args.name!r}; `query --list` shows all "
                  f"{len(reg)} names", file=sys.stderr)
            return 2
        elif args.input is None:
            print("query needs an input data directory", file=sys.stderr)
            return 2
        else:
            import pandas as pd

            result = reg[args.name](args.input)
            df = result if isinstance(result, pd.DataFrame) \
                else result.to_pandas()
            with pd.option_context("display.max_columns", None,
                                   "display.width", 200):
                print(df.head(args.limit) if args.limit else df)
            if args.limit and len(df) > args.limit:
                print(f"... {len(df) - args.limit} more rows")

    elif args.command == "export":
        from .pipelines import export as export_mod

        kwargs = {}
        if args.shards:
            kwargs["num_shards"] = args.shards
        manifest = export_mod.corpus_export(args.input, args.out, **kwargs)
        print(f"exported {manifest.total_rows()} docs into "
              f"{len(manifest.entries)} ordered shards under {args.out}")
        if args.debug:
            for key, e in sorted(manifest.entries.items()):
                print(f"[debug] {key}: rows={e.get('rows')} "
                      f"keys=[{e.get('key_min')}, {e.get('key_max')}]",
                      file=sys.stderr)

    timer.mark("build+execute+render")
    timer.stats(executed)

    if owns_session:
        import ray

        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
