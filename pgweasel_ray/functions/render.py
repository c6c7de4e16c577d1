"""Report renderers (sink S8) — pgweasel's stdout report formats.

- histogram bars: ``[YYYY-MM-DD HH:MM:SS] ###...--- count`` scaled to a
  50-char bar of '#' filled / '-' empty, rounded —
  /root/reference/src/aggregators/error_histogram.rs:58-84.
- frequency table: counts right-aligned width 6, two spaces, message —
  error_frequency.rs:67-77 (header "Most frequent error messages:").
- top slow: ``--- <duration> ---`` separator then the record —
  top_slow_query.rs:69-78 (durations rendered like Rust's Duration Debug,
  e.g. ``25.761ms`` / ``2.5s``).
- connections summary: four scalar lines + five "  count  key" tables —
  connections.rs:144-178.
"""

from __future__ import annotations

import pandas as pd

BAR_WIDTH = 50  # error_histogram.rs:59


def render_histogram(df: pd.DataFrame, bucket_col: str = "bucket_ts",
                     count_col: str = "cnt") -> str:
    if df.empty:
        return ""
    max_count = int(df[count_col].max())
    if max_count == 0:
        return ""
    lines = []
    for _, row in df.iterrows():
        count = int(row[count_col])
        filled = round((count / max_count) * BAR_WIDTH)
        filled = max(0, min(BAR_WIDTH, filled))
        ts = pd.Timestamp(row[bucket_col]).strftime("%Y-%m-%d %H:%M:%S")
        lines.append(f"[{ts}] {'#' * filled}{'-' * (BAR_WIDTH - filled)} {count}")
    return "\n".join(lines)


def render_frequency(df: pd.DataFrame, key_col: str, count_col: str = "cnt",
                     header: str = "Most frequent error messages:") -> str:
    lines = [header]
    for _, row in df.iterrows():
        lines.append(f"{int(row[count_col]):>6}  {row[key_col]}")
    return "\n".join(lines)


def _fmt_duration_ms(ms: float) -> str:
    """Rust ``Duration`` Debug-style rendering: 25.761ms, 2.5s, 90s → 90s."""
    if ms < 1:
        return f"{ms * 1000:g}µs"
    if ms < 1000:
        return f"{ms:g}ms"
    return f"{ms / 1000.0:g}s"


def render_top_slow(df: pd.DataFrame, duration_col: str = "duration_ms",
                    text_col: str = "text") -> str:
    lines = [f"Top {len(df)} slowest queries:"]
    for _, row in df.iterrows():
        lines.append(f"--- {_fmt_duration_ms(float(row[duration_col]))} ---")
        lines.append(str(row[text_col]))
    return "\n".join(lines)


def render_connections(summary: pd.DataFrame,
                       by_host: pd.DataFrame, by_db: pd.DataFrame,
                       by_user: pd.DataFrame, by_appname: pd.DataFrame,
                       by_bucket: pd.DataFrame) -> str:
    s = summary.iloc[0]
    lines = [
        f"Total connection attempts: {int(s['attempts'])}",
        f"Total authenticated connections: {int(s['authenticated'])}",
        f"Total authenticated SSL connections: {int(s['authenticated_ssl'])}",
        f"Total connection failures: {int(s['failures'])}",
    ]

    def table(title, df, key):
        lines.append(title)
        for _, row in df.iterrows():
            lines.append(f"  {int(row['cnt']):>6}  {row[key]}")

    table("Connections by host:", by_host, "host")
    table("Connections by database:", by_db, "db")
    table("Connections by user:", by_user, "user")
    table("Connections by application name:", by_appname, "appname")
    lines.append("Connections by time bucket:")
    for _, row in by_bucket.iterrows():
        ts = pd.Timestamp(row["bucket_ts"]).strftime("%Y-%m-%d %H:%M:%S")
        lines.append(f"  {int(row['cnt']):>6}  {ts}")
    return "\n".join(lines)
