"""Raw PostgreSQL-log ingest → transcript-shaped Dataset (operators S3-S6).

Gives drop-in parity with the reference's file inputs: plain stderr logs
(any log_line_prefix), csvlog, ``.gz`` and ``.zip`` archives. Each physical
file becomes one ingest task (`read_binary_files` → `map_batches`), which
mirrors the reference's unit of work (whole-file mmap, rayon chunks within —
/root/reference/src/output_results/mod.rs:41-80); at 100 TB the file is the
natural shard and intra-file record order is preserved by construction.

Record assembly copies the reference exactly:
- a record starts at any line whose first 23 bytes are timestamp-shaped
  (``is_record_start``: positions 4,7 = '-', 10 = ' ', 13,16 = ':', 19 = '.'
  or ' ' — output_results/mod.rs:222-230);
- continuation lines (multi-line SQL, DETAIL) accumulate into the current
  record; content before the first start line becomes the first record
  (output_results/mod.rs:95-121).

Cosmetic divergence: the reference's record slices carry their trailing
newline (offset bookkeeping in mod.rs:95-121); ours are newline-joined
without it — no extractor's semantics depend on the trailing byte.

Output schema = the transcript contract: conv_id (file stem), turn_idx
(record index within the file), role ("log"), text (the raw record,
byte-for-byte), tool ("csv" or "plain" — Format::from_file_extension,
format/mod.rs:12-21), ts (timestamp parsed from the record head; null when
unparseable — the reference aborts the run instead, SURVEY §7.4).
"""

from __future__ import annotations

import gzip
import io
import zipfile
from pathlib import Path

import pandas as pd
import pyarrow as pa


def is_record_start(line: bytes) -> bool:
    """output_results/mod.rs:222-230, byte-for-byte."""
    return (
        len(line) >= 23
        and line[4:5] == b"-"
        and line[7:8] == b"-"
        and line[10:11] == b" "
        and line[13:14] == b":"
        and line[16:17] == b":"
        and (line[19:20] == b"." or line[19:20] == b" ")
    )


def split_records(content: bytes) -> list[bytes]:
    """Multi-line record assembly (output_results/mod.rs:95-121)."""
    records: list[bytes] = []
    lines = content.split(b"\n")
    if lines and lines[-1] == b"":  # file's trailing newline, not a line
        lines.pop()
    current: list[bytes] = []
    for line in lines:
        if is_record_start(line) and current:
            records.append(b"\n".join(current))
            current = [line]
        else:
            current.append(line)
    if current:
        tail = b"\n".join(current)
        if tail.strip():
            records.append(tail)
    return records


def _expand_archive(path: str, data: bytes) -> list[tuple[str, bytes]]:
    """gz/zip expansion (convert_args.rs:119-193)."""
    if path.endswith(".gz"):
        # ray.data.read_binary_files may have inferred the codec from the
        # extension and decompressed already; decompress only if still gzip.
        if data[:2] == b"\x1f\x8b":
            data = gzip.decompress(data)
        return [(path[:-3], data)]
    if path.endswith(".zip"):
        out = []
        with zipfile.ZipFile(io.BytesIO(data)) as zf:
            for name in zf.namelist():
                if not name.endswith("/"):
                    out.append((name, zf.read(name)))
        return out
    return [(path, data)]


_TS_HEAD = r"^(\d{4}-\d\d-\d\d \d\d:\d\d:\d\d(?:\.\d+)?)"


def jsonlog_to_plain(line: bytes) -> str | None:
    """PostgreSQL jsonlog record → the equivalent plain-format record text.

    The reference only *enumerates* jsonlog (JsonNotYetImplemented,
    error.rs:34); here it is supported by rendering each JSON record in the
    plain shape the extractors understand::

        <timestamp> [<pid>] <SEVERITY>:  <message>[ + user=/database=/
        application_name= attributes][\\nDETAIL:...][\\nSTATEMENT:...]

    so severity precedence, message, duration, kv and the filters behave
    identically to a stderr log of the same events.
    """
    import json

    try:
        rec = json.loads(line)
    except (ValueError, UnicodeDecodeError):
        return None
    ts = rec.get("timestamp", "")
    pid = rec.get("pid", 0)
    sev = rec.get("error_severity", "LOG")
    msg = rec.get("message", "")
    attrs = "".join(
        f" {key}={rec[field]}"
        for field, key in (("user", "user"), ("dbname", "database"),
                           ("application_name", "application_name"))
        if rec.get(field)
    )
    parts = [f"{ts} [{pid}] {sev}:  {msg}{attrs}"]
    if rec.get("detail"):
        parts.append(f"DETAIL:  {rec['detail']}")
    if rec.get("statement"):
        parts.append(f"STATEMENT:  {rec['statement']}")
    return "\n".join(parts)


def _files_to_records(batch: pa.Table) -> pa.Table:
    import re

    ts_re = re.compile(_TS_HEAD)
    conv_ids, turn_idxs, texts, tools, ts_strs = [], [], [], [], []
    for path, data in zip(batch["path"].to_pylist(), batch["bytes"].to_pylist()):
        for name, content in _expand_archive(path, data):
            p = Path(name)
            if p.suffix.lower() == ".json":
                recs = [
                    t for t in (jsonlog_to_plain(l)
                                for l in content.splitlines() if l.strip())
                    if t is not None
                ]
                tool = "plain"  # rendered into plain form
            else:
                tool = "csv" if p.suffix.lower() == ".csv" else "plain"
                recs = [
                    r.decode("utf-8", errors="replace")
                    for r in split_records(content)
                ]
            for i, text in enumerate(recs):
                m = ts_re.match(text)
                conv_ids.append(p.stem)
                turn_idxs.append(i)
                texts.append(text)
                tools.append(tool)
                ts_strs.append(m.group(1) if m else None)
    ts = pd.to_datetime(pd.Series(ts_strs, dtype=object), errors="coerce")
    return pa.table(
        {
            "conv_id": pa.array(conv_ids, type=pa.string()),
            "turn_idx": pa.array(turn_idxs, type=pa.int32()),
            "role": pa.array(["log"] * len(texts), type=pa.string()),
            "text": pa.array(texts, type=pa.string()),
            "tool": pa.array(tools, type=pa.string()),
            "ts": pa.Array.from_pandas(ts, type=pa.timestamp("us")),
        }
    )


def read_raw_logs(paths: list[str] | str):
    """Raw log files/dirs → transcript-shaped ``ray.data.Dataset``."""
    import ray.data

    ds = ray.data.read_binary_files(paths, include_paths=True)
    return ds.map_batches(_files_to_records, batch_format="pyarrow",
                          batch_size=1)


def ingest_to_transcripts(paths: list[str] | str, out_dir: str) -> str:
    """Materialize raw logs as a transcripts parquet dir usable by every
    pipeline and the CLI (`pgweasel-ray errors <out_dir> ...`)."""
    read_raw_logs(paths).write_parquet(out_dir)
    return out_dir
