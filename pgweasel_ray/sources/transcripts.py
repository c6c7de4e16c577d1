"""Deterministic synthetic transcript tables (the engine's primary input).

`BASELINE.json.input_hint` mandates the input shape::

    conv_id:string, turn_idx:int32, role:string, text:string,
    tool:string, ts:timestamp[us]

The driver's testdata (/root/testdata/sf*) has no transcripts table, so we
synthesise one deterministically per scale factor (seeded, UTC, no external
data) and cache it under /tmp. Each turn's ``text`` is rendered in pgweasel's
plain-log shape (FIXTURES.md §2) so every reference extractor is exercised:
severity tags, ``duration:`` slow statements straddling the 3 s threshold,
connection lifecycle with key=value fields (including the empty-value and
CloudSQL-prefix quirks), all 17+1 locking needles plus a near-miss, system
needles, SQLSTATE-suffixed errors, multi-line records, and a Zipf mixture of
repeated error messages for deterministic top-N answers.

The SAME parquet file feeds both the Ray pipelines and the DuckDB oracle SQL
(which reads it via ``read_parquet('<path>')``), so correctness comparisons
run on identical bytes. Cache layout is versioned: bump GEN_VERSION whenever
generation changes.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

GEN_VERSION = 3
CACHE_ROOT = Path(os.environ.get("PGWEASEL_RAY_CACHE", "/tmp/pgweasel_ray_fixtures"))
ROWS_PER_UNIT_SF = 6_000_000  # sf0.001 → 6k turns, sf0.1 → 600k (mirrors lineitem)
BASE_TS_US = np.int64(pd.Timestamp("2025-05-21 10:00:00").value // 1000)

ERROR_MESSAGES = [
    'new row for relation "pgbench_accounts" violates check constraint "abalance_check"',
    'syntax error at or near "sdaasdasda" at character 12',
    "division by zero",
    'relation "missing_table" does not exist',
    'duplicate key value violates unique constraint "pgbench_branches_pkey"',
    'null value in column "bid" violates not-null constraint',
    'invalid input syntax for type integer: "abc"',
    "permission denied for table accounts_secure",
]
ERROR_WEIGHTS = [0.35, 0.20, 0.13, 0.10, 0.08, 0.06, 0.05, 0.03]

SQLSTATE_CODES = ["23503", "23505", "42601", "22012", "40P01", "57014"]

GENERIC_LOG = [
    "statement: SELECT abalance FROM pgbench_accounts WHERE aid = 77",
    'temporary file: path "base/pgsql_tmp/pgsql_tmp123.0", size 1048576',
    'parameter "work_mem" changed to "64MB"',
    "checkpoint starting: time",
    "checkpoint complete: wrote 42 buffers (0.3%); sync files=9",
    "process acquired nothing of note",  # locking near-miss: no digits
    "statement: UPDATE pgbench_tellers SET tbalance = tbalance + 1 WHERE tid = 5",
]

SLOW_SQL = [
    "SELECT abalance FROM pgbench_accounts WHERE aid = 4242",
    "UPDATE pgbench_branches SET bbalance = bbalance + 10 WHERE bid = 1",
    "SELECT count(*) FROM pgbench_history h JOIN pgbench_accounts a ON a.aid = h.aid",
    "INSERT INTO pgbench_history (tid, bid, aid, delta) VALUES (1, 1, 1, 10)",
    "COPY pgbench_accounts FROM stdin",
]

LOCKING_LINES = [  # each hits LockingFilter (locking_filter.rs:12-30,51-83)
    ("ERROR", "deadlock detected"),
    ("LOG", "process 4242 still waiting for ShareLock on transaction 1000 after 1000.056 ms"),
    ("LOG", "process 4243 acquired ShareLock on transaction 1001 after 1500.500 ms"),
    ("ERROR", "could not serialize access due to concurrent update"),
    ("ERROR", 'could not obtain lock on relation "accounts"'),
    ("LOG", "virtual transaction blocked by process 777"),
    ("ERROR", "canceling statement due to lock timeout while updating tuple (0,3)"),
    ("ERROR", "tuple to be locked was updated while locking tuple in relation"),
    ("LOG", "recovery conflict detected on buffer 42"),
    ("ERROR", "update conflicts with concurrent delete on relation x"),
    ("LOG", "Wait queue: 3 processes waiting"),
    ("ERROR", "cannot lock rows in materialized view"),
    ("LOG", "stuck spinlock semaphore: pg_sema 9"),
]

SYSTEM_LINES = [  # each hits SystemFilter (system_filter.rs:12-43)
    "database system is ready to accept connections",
    'listening on IPv4 address "0.0.0.0", port 5432',
    "received SIGHUP, reloading configuration files",
    "autovacuum launcher started",
    "checkpoint complete: wrote 3 buffers; WAL file(s) added 1",
    "starting PostgreSQL 16.3 on x86_64-pc-linux-gnu",
    "database system was shut down at 2025-05-21 09:59:58 UTC",
    'loaded library "pg_stat_statements" from shared_preload_libraries',
    'logical replication apply worker for subscription "sub1" has started',
    "archiver process shutting down",
]

AUTHORIZED_LINES = [
    "connection authorized: user=alice database=shop application_name=psql",
    "connection authorized: user=bob database=app application_name=pgbench SSL enabled (protocol=TLSv1.3, cipher=TLS_AES_256_GCM_SHA384, bits=256)",
    "connection authorized: user=carol database=shop SSL enabled (protocol=TLSv1.2)",
    "connection authorized: user= database=shop",  # empty-value quirk
    "connection authorized: user=dave database=analytics application_name=etl_loader",
]

RECEIVED_HOSTS = ["10.0.0.7", "10.0.0.8", "192.168.1.11", "127.0.0.1", "[local]"]

ROLES = ["user", "assistant", "system", "tool", "operator"]
ROLE_P = [0.35, 0.35, 0.10, 0.15, 0.05]
TOOLS = ["postmaster", "checkpointer", "client_backend", "autovacuum", "walwriter", "psql", "pgbench", "cron"]
TOOL_P = [0.10, 0.10, 0.30, 0.10, 0.08, 0.17, 0.10, 0.05]

ROLE_TENANT = {
    "user": "acme",
    "assistant": "model-serving",
    "system": "platform",
    "tool": "integrations",
    # "operator" intentionally unmapped → tenant "unknown"
}
TOOL_SUBSYSTEM = {
    "postmaster": "core",
    "checkpointer": "storage",
    "client_backend": "frontend",
    "autovacuum": "maintenance",
    "walwriter": "storage",
    "psql": "client",
    "pgbench": "client",
    # "cron" intentionally unmapped → subsystem "unknown"
}

PREFIX_STD, PREFIX_USERDB, PREFIX_CLOUDSQL = 0, 1, 2

CATEGORIES = [
    # (name, weight)
    ("generic_log", 0.21),
    ("slow", 0.14),
    ("conn_received", 0.09),
    ("conn_authorized", 0.07),
    ("disconnection", 0.03),
    ("auth_fail", 0.02),
    ("error_sqlstate", 0.09),
    ("error_multiline", 0.03),
    ("warning", 0.04),
    ("notice", 0.03),
    ("info", 0.02),
    ("debug", 0.05),
    ("panic", 0.005),
    ("fatal_other", 0.005),
    ("locking", 0.05),
    ("system", 0.05),
    ("no_tag", 0.02),
    ("error_zipf", 0.05),
]


def sf_name_of(sf_dir: str | Path) -> str:
    return Path(sf_dir).name or Path(sf_dir).parent.name


def rows_for_sf(sf_dir: str | Path) -> int:
    name = sf_name_of(sf_dir)
    try:
        sf = float(name.removeprefix("sf"))
    except ValueError:
        sf = 0.001
    return max(2000, int(round(sf * ROWS_PER_UNIT_SF)))


def fixture_dir(sf_dir: str | Path) -> Path:
    return CACHE_ROOT / f"v{GEN_VERSION}" / sf_name_of(sf_dir)


def transcripts_path(sf_dir: str | Path) -> Path:
    """Directory of part files — multi-file input is the realistic layout at
    scale and is the router's shard/resume unit."""
    return fixture_dir(sf_dir) / "transcripts"


def transcripts_glob(sf_dir: str | Path) -> str:
    """Glob usable by DuckDB's read_parquet for the same bytes Ray reads."""
    return str(transcripts_path(sf_dir) / "*.parquet")


def lookup_path(sf_dir: str | Path, which: str) -> Path:
    return fixture_dir(sf_dir) / f"{which}.parquet"


def _conv_layout(rng: np.random.Generator, rows: int):
    """Skewed conversation sizes: two hot conv_ids hold ~30% of all turns
    (FIXTURES.md §4); remaining turns spread multinomially."""
    n_convs = max(10, rows // 120)
    hot = int(rows * 0.15)
    rest = rows - 2 * hot
    p = rng.dirichlet(np.ones(n_convs - 2) * 5.0)
    counts = rng.multinomial(rest, p)
    counts = np.concatenate([[hot, hot], counts])
    # drop empty convs for clean turn_idx ranges
    counts = counts[counts > 0]
    conv_names = np.array([f"conv-{i:05d}" for i in range(len(counts))])
    conv_per_row = np.repeat(np.arange(len(counts)), counts)
    # turn_idx: 0..n-1 within each conv
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])
    turn_idx = np.arange(rows) - np.repeat(offsets, counts)
    return conv_names, conv_per_row, counts, offsets, turn_idx


def _timestamps(rng, conv_per_row, counts, offsets, rows):
    steps = rng.integers(1, 6, size=rows).astype(np.int64) * 1_000_000  # 1-5 s in µs
    steps += rng.integers(0, 1_000_000, size=rows)  # µs jitter → .mmm in rendered text
    cs = np.cumsum(steps)
    seg_base = np.concatenate([[0], cs[np.cumsum(counts)[:-1] - 1]])
    within = cs - np.repeat(seg_base, counts)
    conv_start = BASE_TS_US + np.arange(len(counts), dtype=np.int64) * 137_000_000
    return conv_start[conv_per_row] + within


def _render_bodies(rng: np.random.Generator, cat: np.ndarray, rows: int) -> np.ndarray:
    """Category index → body string (severity tag + message), vectorized per
    category over its row subset."""
    body = np.empty(rows, dtype=object)
    names = [c[0] for c in CATEGORIES]

    def idx(name):
        return np.nonzero(cat == names.index(name))[0]

    i = idx("generic_log")
    body[i] = np.array(["LOG:  " + m for m in GENERIC_LOG], dtype=object)[
        rng.integers(0, len(GENERIC_LOG), len(i))
    ]

    i = idx("slow")
    if len(i):
        unit_choice = rng.choice(5, size=len(i), p=[0.70, 0.15, 0.08, 0.04, 0.03])
        units = np.array(["ms", "s", "us", "ns", "m"], dtype=object)[unit_choice]
        u = rng.uniform(size=len(i))
        vals = np.select(
            [unit_choice == 0, unit_choice == 1, unit_choice == 2, unit_choice == 3, unit_choice == 4],
            [10 ** (u * 4.7 - 1),          # 0.1 .. ~5e3 ms, straddles 3000 ms
             0.1 + u * 9.9,                # 0.1 .. 10 s, straddles 3 s
             10 + u * 5e6,                 # µs
             100 + u * 1e9,                # ns
             0.05 + u * 5],                # minutes
        )
        sqls = np.array(SLOW_SQL, dtype=object)[rng.integers(0, len(SLOW_SQL), len(i))]
        body[i] = [
            f"LOG:  duration: {v:.3f} {un}  statement: {s}"
            for v, un, s in zip(vals, units, sqls)
        ]

    i = idx("conn_received")
    if len(i):
        hosts = np.array(RECEIVED_HOSTS, dtype=object)[
            rng.integers(0, len(RECEIVED_HOSTS), len(i))
        ]
        ports = rng.integers(40000, 60000, len(i))
        nohost = rng.uniform(size=len(i)) < 0.15
        body[i] = [
            f"LOG:  connection received: port={p}" if nh
            else f"LOG:  connection received: host={h} port={p}"
            for h, p, nh in zip(hosts, ports, nohost)
        ]

    i = idx("conn_authorized")
    body[i] = np.array(["LOG:  " + m for m in AUTHORIZED_LINES], dtype=object)[
        rng.integers(0, len(AUTHORIZED_LINES), len(i))
    ]

    i = idx("disconnection")
    if len(i):
        secs = rng.integers(1, 3600, len(i))
        body[i] = [
            f"LOG:  disconnection: session time: 0:{s // 60:02d}:{s % 60:02d}.034 "
            f"user=azuresu database=azure_maintenance host=127.0.0.1 port=55304"
            for s in secs
        ]

    i = idx("auth_fail")
    if len(i):
        which = rng.uniform(size=len(i)) < 0.6
        body[i] = [
            'FATAL:  password authentication failed for user "mallory"' if w
            else 'FATAL:  role "eve" is not permitted to log in'
            for w in which
        ]

    i = idx("error_sqlstate")
    if len(i):
        msgs = rng.choice(len(ERROR_MESSAGES), size=len(i), p=ERROR_WEIGHTS)
        codes = np.array(SQLSTATE_CODES, dtype=object)[
            rng.integers(0, len(SQLSTATE_CODES), len(i))
        ]
        body[i] = [
            f"ERROR:  {ERROR_MESSAGES[m]} ({c})" for m, c in zip(msgs, codes)
        ]

    i = idx("error_multiline")
    body[i] = (
        'ERROR:  insert or update on table "pgbench_accounts" violates foreign key '
        'constraint "pgbench_accounts_bid_fkey" (23503)\n'
        "DETAIL:  Key (bid)=(0) is not present in table \"pgbench_branches\".\n"
        "STATEMENT:  insert into pgbench_accounts select 0, 0, 0"
    )

    i = idx("warning")
    if len(i):
        w = rng.uniform(size=len(i)) < 0.5
        body[i] = [
            "WARNING:  there is no transaction in progress" if x
            else 'WARNING:  nonstandard use of escape in a string literal'
            for x in w
        ]

    body[idx("notice")] = 'NOTICE:  identifier "verylongname" will be truncated'
    body[idx("info")] = 'INFO:  analyzing "public.pgbench_branches"'

    i = idx("debug")
    if len(i):
        lvl = rng.integers(1, 6, len(i))
        body[i] = [f"DEBUG{n}:  StartTransaction(1) name: unnamed" for n in lvl]

    body[idx("panic")] = "PANIC:  out of shared memory in critical section"
    body[idx("fatal_other")] = "FATAL:  terminating connection due to administrator command"

    i = idx("locking")
    if len(i):
        pick = rng.integers(0, len(LOCKING_LINES), len(i))
        body[i] = [f"{LOCKING_LINES[k][0]}:  {LOCKING_LINES[k][1]}" for k in pick]

    i = idx("system")
    body[i] = np.array(["LOG:  " + m for m in SYSTEM_LINES], dtype=object)[
        rng.integers(0, len(SYSTEM_LINES), len(i))
    ]

    body[idx("no_tag")] = "weasel event: backend signal received"

    i = idx("error_zipf")
    if len(i):
        msgs = rng.choice(len(ERROR_MESSAGES), size=len(i), p=ERROR_WEIGHTS)
        body[i] = [f"ERROR:  {ERROR_MESSAGES[m]}" for m in msgs]

    return body


def generate_transcripts(sf_dir: str | Path) -> Path:
    """Generate (or reuse) the transcript fixture for ``sf_dir``; returns the
    parquet path. Deterministic: seed derives from the sf name only."""
    out = transcripts_path(sf_dir)
    if out.exists():
        return out
    out.parent.mkdir(parents=True, exist_ok=True)

    rows = rows_for_sf(sf_dir)
    seed = abs(hash_stable(sf_name_of(sf_dir))) % (2**31)
    rng = np.random.default_rng(seed)

    conv_names, conv_per_row, counts, offsets, turn_idx = _conv_layout(rng, rows)
    ts_us = _timestamps(rng, conv_per_row, counts, offsets, rows)

    weights = np.array([c[1] for c in CATEGORIES])
    cat = rng.choice(len(CATEGORIES), size=rows, p=weights / weights.sum())
    body = _render_bodies(rng, cat, rows)

    ts = pd.to_datetime(ts_us, unit="us")
    ts_str = ts.strftime("%Y-%m-%d %H:%M:%S.%f").str[:-3]
    pids = rng.integers(100, 99999, rows)
    prefix_kind = rng.choice(3, size=rows, p=[0.8, 0.1, 0.1])
    prefix = np.where(
        prefix_kind == PREFIX_STD,
        ts_str + np.array([f" UTC [{p}] " for p in pids], dtype=object),
        np.where(
            prefix_kind == PREFIX_USERDB,
            ts_str + np.array([f" UTC [{p}] alice@shop " for p in pids], dtype=object),
            ts_str
            + np.array(
                [f" UTC [{p}]: [1-1] db=postgres,user=cloudsqladmin,host=127.0.0.1 " for p in pids],
                dtype=object,
            ),
        ),
    )
    text = prefix + body

    role = np.array(ROLES, dtype=object)[rng.choice(len(ROLES), rows, p=ROLE_P)]
    tool = np.array(TOOLS, dtype=object)[rng.choice(len(TOOLS), rows, p=TOOL_P)]

    perm = rng.permutation(rows)
    table = pa.table(
        {
            "conv_id": pa.array(conv_names[conv_per_row][perm], type=pa.string()),
            "turn_idx": pa.array(turn_idx[perm].astype(np.int32), type=pa.int32()),
            "role": pa.array(role[perm], type=pa.string()),
            "text": pa.array(text[perm], type=pa.string()),
            "tool": pa.array(tool[perm], type=pa.string()),
            "ts": pa.array(ts_us[perm], type=pa.timestamp("us")),
        }
    )
    # Multiple part files (the shard/resume unit at scale) with modest row
    # groups so ray.data.read_parquet splits each file into several blocks.
    n_files = min(max(4, rows // 50_000), 64)
    tmp_dir = out.parent / (out.name + ".tmp")
    if tmp_dir.exists():
        import shutil

        shutil.rmtree(tmp_dir)
    tmp_dir.mkdir(parents=True)
    per = -(-rows // n_files)
    for k in range(n_files):
        part = table.slice(k * per, per)
        if part.num_rows:
            pq.write_table(part, tmp_dir / f"part-{k:04d}.parquet",
                           row_group_size=32768)
    os.replace(tmp_dir, out)

    _write_lookup(sf_dir, "role_tenant", ("role", "tenant"), ROLE_TENANT)
    _write_lookup(sf_dir, "tool_subsystem", ("tool", "subsystem"), TOOL_SUBSYSTEM)
    return out


def _write_lookup(sf_dir, which, cols, mapping):
    p = lookup_path(sf_dir, which)
    tmp = p.with_suffix(".parquet.tmp")
    table = pa.table({cols[0]: list(mapping), cols[1]: list(mapping.values())})
    pq.write_table(table, tmp)
    os.replace(tmp, p)


def ensure_fixture(sf_dir: str | Path) -> Path:
    """Idempotent fixture materialization for an sf dir; returns the
    transcripts parquet path (lookups live next to it)."""
    p = transcripts_path(sf_dir)
    if not (p.exists() and lookup_path(sf_dir, "role_tenant").exists()
            and lookup_path(sf_dir, "tool_subsystem").exists()):
        generate_transcripts(sf_dir)
    return p


def hash_stable(s: str) -> int:
    """Python's str hash is salted per process; use a stable FNV-1a."""
    h = 0xCBF29CE484222325
    for ch in s.encode():
        h = ((h ^ ch) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


RAW_LOG_SUFFIXES = {".log", ".csv", ".gz", ".zip", ".json"}


def raw_log_paths(sf_dir: str | Path) -> list[str]:
    """Raw pgweasel-style inputs (log/csv/gz/zip file, or a dir of them)."""
    p = Path(sf_dir)
    if p.is_file() and p.suffix.lower() in RAW_LOG_SUFFIXES:
        return [str(p)]
    if p.is_dir():
        files = sorted(
            str(f) for f in p.iterdir()
            if f.is_file() and f.suffix.lower() in RAW_LOG_SUFFIXES
        )
        if files and not list(p.glob("*.parquet")):
            return files
    return []


def resolve_input(sf_dir: str | Path) -> Path | None:
    """A real transcripts parquet dir/file (schema carries ``conv_id``) is
    used as-is; raw log inputs return None (callers go through the rawlog
    ingester); anything else (driver sf dirs, phantom paths) maps to the
    deterministic fixture for that name."""
    p = Path(sf_dir)
    candidates = []
    if p.is_file() and p.suffix.lower() == ".parquet":
        candidates = [p]
    elif p.is_dir():
        candidates = sorted(p.glob("*.parquet"))
    if candidates:
        import pyarrow.parquet as pq

        if "conv_id" in pq.read_schema(candidates[0]).names:
            return p
    if raw_log_paths(sf_dir):
        return None
    return ensure_fixture(sf_dir)


def _read_blocks(path: Path) -> int:
    """Block-count override: one block per input file, or one per CPU when
    files are few. Ray's default splits each file's output into several
    small blocks to chase parallelism, which doubles per-batch overhead in
    the fused read→parse tasks (measured 4.2 s → 2.2 s for a full parse of
    4M rows at 16 CPUs)."""
    import ray

    n_files = (
        sum(1 for _ in path.glob("*.parquet")) if path.is_dir() else 1
    )
    n_cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(n_cpus, n_files)


def read_transcripts(sf_dir: str | Path, columns: list[str] | None = None):
    """ray.data.read_parquet over the transcripts input with column pruning
    (the read is the place to prune: a histogram pipeline reads only
    (text, ts)). Raw pgweasel log inputs (.log/.csv/.gz/.zip) are ingested
    on the fly into the same transcript schema."""
    import ray.data

    resolved = resolve_input(sf_dir)
    if resolved is None:
        from .rawlog import read_raw_logs

        ds = read_raw_logs(raw_log_paths(sf_dir))
        return ds.select_columns(columns) if columns else ds
    return ray.data.read_parquet(
        str(resolved), columns=columns,
        override_num_blocks=_read_blocks(resolved),
    )
