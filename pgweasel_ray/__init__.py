"""pgweasel_ray — a Ray-Data-native log/transcript processing engine.

A from-scratch reimplementation of the query/data-processing capabilities of
kmoppel/pgweasel (a Rust PostgreSQL-log CLI, see /root/reference) as a
distributed parse → enrich → route → aggregate pipeline over Parquet tables of
multi-turn conversation/agent transcripts:

    conv_id:string, turn_idx:int32, role:string, text:string,
    tool:string, ts:timestamp[us]

Each turn's ``text`` plays the role of one pgweasel log record; the vectorized
parse stage (``stages.parse``) extracts the same fields pgweasel extracts by
byte-scanning (severity, message, duration, host/user/db/appname, connection
events), with needle-for-needle identical semantics (citations in docstrings).

Execution is Ray Data first: ``read_parquet → map_batches (zero-copy Arrow)
→ groupby/sort/limit → write_parquet``; stateful stages (broadcast lookup
enrich) are actor pools. Nothing here calls ``ray.init()`` — sessions are
owned by the CLI / bench / test harness.
"""

__version__ = "0.1.0"
