"""Ingest sweep over the reference's FULL testdata corpus — the ~20
real-world logs (RDS, CloudSQL, Azure, rocky9/debian stderr, pgaudit,
csvlog pg12-14, jsonlog) plus the 19 gzipped pg-archives mailing-list logs
the reference ships but never asserts on (/root/reference/testdata/).

Every file is pushed through the raw-log ingest + parse pipeline and
compared record-by-record against a NAIVE in-test oracle: a pure-Python
line loop that re-implements the reference's record-split rule
(output_results/mod.rs:222-230: punctuation positions of the first 23
bytes), first-needle-wins severity (severity.rs:62-101), the plain/csv
message rules (plain.rs:2-23, csv.rs:1-53) and the jsonlog rendering spec
(sources/rawlog.py docstring) — same spec, independent mechanism (the
library path is vectorized RE2/np.select over Arrow; this is `str.find`
per record)."""

from __future__ import annotations

import csv
import gzip
import io
import json
import re
from pathlib import Path

import pytest

TESTDATA = Path("/root/reference/testdata")
pytestmark = pytest.mark.skipif(
    not TESTDATA.exists(), reason="reference testdata not available"
)


def _sweep_files() -> list[Path]:
    files = []
    for p in sorted(TESTDATA.iterdir()):
        if p.name == "syslog1.log":  # covered by TestSyslogWrapped
            continue
        if p.suffix in (".log", ".csv", ".json"):
            files.append(p)
        elif p.suffix == ".gz" and not p.with_suffix("").exists():
            files.append(p)  # root .gz with no uncompressed twin
    archives = TESTDATA / "pg-archives"
    if archives.is_dir():
        files.extend(sorted(archives.glob("*.gz")))
    return files


SWEEP = _sweep_files()

# --- the naive oracle ---------------------------------------------------------

# record start: len>=23, '-' at 4 and 7, ' ' at 10, ':' at 13 and 16,
# '.' or ' ' at 19 (output_results/mod.rs:222-230) — byte-position regex,
# deliberately NOT reusing pgweasel_ray.sources.rawlog.is_record_start
_START = re.compile(rb"^.{4}-.{2}-.{2} .{2}:.{2}:.{2}[. ].{3}", re.DOTALL)
_TS = re.compile(r"^(\d{4}-\d\d-\d\d \d\d:\d\d:\d\d(?:\.\d+)?)")

_PLAIN_ORDER = ["LOG", "ERROR", "INFO", "NOTICE", "WARNING", "DEBUG5",
                "DEBUG4", "DEBUG3", "DEBUG2", "DEBUG1", "FATAL", "PANIC"]


def naive_split(content: bytes) -> list[str]:
    lines = content.split(b"\n")
    if lines and lines[-1] == b"":
        lines.pop()
    records, current = [], []
    for line in lines:
        if _START.match(line) and current:
            records.append(b"\n".join(current))
            current = [line]
        else:
            current.append(line)
    if current and b"\n".join(current).strip():
        records.append(b"\n".join(current))
    return [r.decode("utf-8", errors="replace") for r in records]


def naive_jsonlog(content: bytes) -> list[str]:
    out = []
    for line in content.splitlines():
        if not line.strip():
            continue
        try:
            rec = json.loads(line)
        except ValueError:
            continue
        attrs = "".join(
            f" {key}={rec[field]}"
            for field, key in (("user", "user"), ("dbname", "database"),
                               ("application_name", "application_name"))
            if rec.get(field)
        )
        text = (f"{rec.get('timestamp', '')} [{rec.get('pid', 0)}] "
                f"{rec.get('error_severity', 'LOG')}:  "
                f"{rec.get('message', '')}{attrs}")
        if rec.get("detail"):
            text += f"\nDETAIL:  {rec['detail']}"
        if rec.get("statement"):
            text += f"\nSTATEMENT:  {rec['statement']}"
        out.append(text)
    return out


def naive_severity(text: str, fmt: str) -> str:
    for tag in _PLAIN_ORDER:
        needle = f",{tag}," if fmt == "csv" else f"{tag}:"
        if needle in text:
            return tag.lower()
    return "log"


def naive_message(text: str, fmt: str) -> str | None:
    if fmt == "csv":
        try:
            row = next(csv.reader(io.StringIO(text)))
        except (csv.Error, StopIteration):
            return None
        return row[13] if len(row) >= 14 else None
    i = text.find(": ")
    if i < 0:
        return None
    return text[i + 2:].lstrip(" ").split("\n", 1)[0]


def naive_parse(path: Path) -> dict:
    data = path.read_bytes()
    name = path.name
    if name.endswith(".gz"):
        data = gzip.decompress(data)
        name = name[:-3]
    if name.endswith(".json"):
        texts, fmt = naive_jsonlog(data), "plain"
    else:
        fmt = "csv" if name.endswith(".csv") else "plain"
        texts = naive_split(data)
    return {
        "conv_id": Path(name).stem,
        "n": len(texts),
        "severities": [naive_severity(t, fmt) for t in texts],
        "n_ts": sum(1 for t in texts if _TS.match(t)),
        "n_msg": sum(1 for t in texts
                     if naive_message(t, fmt) is not None),
    }


# --- fixtures -----------------------------------------------------------------

@pytest.fixture(scope="module")
def parsed_all(tmp_path_factory):
    """All sweep files ingested + parsed once; dict conv_id → DataFrame."""
    pytest.importorskip("ray")
    from pgweasel_ray.pipelines.core import records
    from pgweasel_ray.sources.rawlog import ingest_to_transcripts

    out = tmp_path_factory.mktemp("sweep")
    ingest_to_transcripts([str(p) for p in SWEEP], str(out))
    df = records(
        str(out), min_rank=0, fmt="auto",
        keep=("conv_id", "turn_idx", "severity", "message", "text", "ts"),
    ).to_pandas()
    return {cid: g.sort_values("turn_idx") for cid, g in df.groupby("conv_id")}


@pytest.mark.parametrize("path", SWEEP, ids=lambda p: p.name)
def test_file_against_naive_oracle(path, parsed_all):
    want = naive_parse(path)
    got = parsed_all.get(want["conv_id"])
    assert got is not None, f"no records ingested for {want['conv_id']}"
    assert len(got) == want["n"]
    assert list(got["severity"]) == want["severities"]
    assert int(got["ts"].notna().sum()) == want["n_ts"]
    assert int(got["message"].notna().sum()) == want["n_msg"]


def test_sweep_is_nontrivial():
    """The corpus actually exercises variety: several formats, >20 files,
    and at least one record of each headline severity somewhere."""
    assert len(SWEEP) >= 20
    seen = set()
    for p in SWEEP:
        seen.update(naive_parse(p)["severities"])
    assert {"log", "error", "fatal", "warning"} <= seen
