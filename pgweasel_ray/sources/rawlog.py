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
import re
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


# syslog-wrapped postgres log line: "May 30 11:03:43 host postgres[693826]:
# [seq-part] <payload>" (reference corpus: testdata/syslog1.log). Each part
# payload repeats the log_line_prefix timestamp, so stripping the wrapper
# yields exactly the stderr/plain format; split payloads of one long line
# carry no timestamp and stay continuation lines. The reference never
# unwraps (its record splitter sees no timestamp-shaped line start and
# collapses the whole file into ONE record) — handling the prefix is a
# documented improvement, not a divergence in any reference-tested path.
_SYSLOG_PREFIX = re.compile(
    rb"^[A-Z][a-z]{2} [ \d]\d \d\d:\d\d:\d\d \S+ [^\s\[]+\[\d+\]: "
    rb"\[\d+-\d+\] "
)


def unwrap_syslog(content: bytes) -> bytes:
    """Strip the syslog transport prefix when the content is a
    syslog-wrapped postgres log (detected on the first line); other content
    is returned unchanged."""
    first = content.split(b"\n", 1)[0]
    if not _SYSLOG_PREFIX.match(first):
        return content
    out = []
    for line in content.split(b"\n"):
        m = _SYSLOG_PREFIX.match(line)
        out.append(line[m.end():] if m else line)
    return b"\n".join(out)


def split_records(content: bytes) -> list[bytes]:
    """Multi-line record assembly (output_results/mod.rs:95-121)."""
    content = unwrap_syslog(content)
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


# --- chunked ingest for huge single files ------------------------------------

CHUNK_BYTES = 64 * 1024 * 1024
BOUNDARY_OVERSCAN = 1024 * 1024  # max record size scanned past a chunk edge


def _chunk_tasks(paths: list[str], chunk_bytes: int) -> list[dict]:
    import os

    tasks = []
    for path in paths:
        size = os.path.getsize(path)
        start = 0
        while start < size:
            tasks.append({"path": path, "start": start,
                          "end": min(start + chunk_bytes, size)})
            start += chunk_bytes
    return tasks


def _read_chunk(batch: pa.Table) -> pa.Table:
    """One byte-range task: seek to the first record-start line at/after
    ``start`` (unless at file head) and consume records until the first
    record-start at/after ``end`` — exactly the reference's chunk-boundary
    alignment (output_results/mod.rs:55-80: chunk edges advance forward to
    the next timestamp-shaped line), so every record lands in exactly one
    chunk and multi-line records never split."""
    import re

    ts_re = re.compile(_TS_HEAD)
    out = {k: [] for k in ("conv_id", "turn_idx", "role", "text", "tool", "ts")}
    for path, start, end in zip(batch["path"].to_pylist(),
                                batch["start"].to_pylist(),
                                batch["end"].to_pylist()):
        p = Path(path)
        import os

        size = os.path.getsize(path)
        # read one lead byte before `start` so "does the chunk begin at a
        # line boundary" is decidable without the rest of the file
        lead = 1 if start > 0 else 0
        with open(path, "rb") as f:
            f.seek(start - lead)
            data = f.read(lead + (end - start) + BOUNDARY_OVERSCAN)
            # align the head: skip the partial record belonging to the
            # previous chunk (its task consumes it via its tail overscan)
            offset = lead
            if start > 0:
                data, offset = _scan_record_start(
                    f, data, lead, start - lead, size
                )
                if offset is None:
                    continue  # no record starts in this chunk
            # align the tail: first record start at/after the nominal end —
            # the scan keeps extending the buffer from the file (records
            # larger than one overscan must not be truncated, and the bytes
            # up to the true next record start belong to THIS chunk)
            data, tail = _scan_record_start(
                f, data, lead + (end - start), start - lead, size
            )
        body = data[offset: tail if tail is not None else len(data)]
        for i, rec in enumerate(split_records(body)):
            text = rec.decode("utf-8", errors="replace")
            m = ts_re.match(text)
            out["conv_id"].append(f"{p.stem}@{start}")
            out["turn_idx"].append(i)
            out["role"].append("log")
            out["text"].append(text)
            out["tool"].append("csv" if p.suffix.lower() == ".csv" else "plain")
            out["ts"].append(m.group(1) if m else None)
    import pandas as pd

    ts = pd.to_datetime(pd.Series(out["ts"], dtype=object), errors="coerce")
    return pa.table(
        {
            "conv_id": pa.array(out["conv_id"], type=pa.string()),
            "turn_idx": pa.array(out["turn_idx"], type=pa.int32()),
            "role": pa.array(out["role"], type=pa.string()),
            "text": pa.array(out["text"], type=pa.string()),
            "tool": pa.array(out["tool"], type=pa.string()),
            "ts": pa.Array.from_pandas(ts, type=pa.timestamp("us")),
        }
    )


def _scan_record_start(
    f, data: bytes, from_pos: int, data_abs_start: int, file_size: int
) -> tuple[bytes, int | None]:
    """Like :func:`_next_record_start`, but when the buffer ends before a
    record start is found, keep reading the file in geometrically growing
    increments until one is found or EOF — a record (or the gap to the next
    record start) may exceed any fixed overscan, and truncating it would
    silently lose data. Returns the (possibly grown) buffer and the offset
    (None ⇒ no record start between from_pos and EOF; the buffer then ends
    exactly at EOF, so slicing to ``len(data)`` is lossless)."""
    grow = BOUNDARY_OVERSCAN
    while True:
        pos = _next_record_start(data, from_pos)
        if pos is not None:
            return data, pos
        abs_end = data_abs_start + len(data)
        if abs_end >= file_size:
            return data, None
        f.seek(abs_end)
        more = f.read(grow)
        if not more:
            return data, None
        data += more
        grow *= 2


def _next_record_start(data: bytes, from_pos: int) -> int | None:
    """Offset of the first line at/after ``from_pos`` that is a record
    start; None when there is none. ``from_pos`` itself counts when it sits
    at a line beginning (chunk boundaries can land exactly on a record
    start — both neighbour tasks must agree it belongs to the later one)."""
    if from_pos >= len(data):
        return None
    if from_pos == 0 or data[from_pos - 1: from_pos] == b"\n":
        line_end = data.find(b"\n", from_pos)
        line = data[from_pos: line_end if line_end != -1 else len(data)]
        if is_record_start(line):
            return from_pos
    pos = from_pos
    while True:
        nl = data.find(b"\n", pos)
        if nl == -1:
            return None
        cand = nl + 1
        line_end = data.find(b"\n", cand)
        line = data[cand: line_end if line_end != -1 else len(data)]
        if is_record_start(line):
            return cand
        pos = cand


def read_raw_logs_chunked(paths: list[str] | str,
                          chunk_bytes: int = CHUNK_BYTES):
    """Byte-range-parallel raw-log ingest for files larger than one worker
    should hold: each task reads one aligned chunk (the reference's
    per-chunk rayon model, distributed). conv_id is ``<stem>@<offset>`` so
    (conv_id, turn_idx) stays unique across chunks. Plain/csv only
    (archives use :func:`read_raw_logs`, which needs whole files)."""
    import ray.data

    if isinstance(paths, str):
        paths = [paths]
    tasks = _chunk_tasks(paths, chunk_bytes)
    ds = ray.data.from_items(tasks)
    return ds.map_batches(_read_chunk, batch_format="pyarrow", batch_size=1)


def ingest_to_transcripts(paths: list[str] | str, out_dir: str) -> str:
    """Materialize raw logs as a transcripts parquet dir usable by every
    pipeline and the CLI (`pgweasel-ray errors <out_dir> ...`)."""
    read_raw_logs(paths).write_parquet(out_dir)
    return out_dir
