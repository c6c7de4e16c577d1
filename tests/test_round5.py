"""Round-5 additions: the window-rotation policy as a test over the
cumulative CORRECTNESS_r*.json ledger (VERDICT r4 item #8), the ExactSubstr
dedup operator, the pure-numpy BMP/WAV codecs, and the deterministic-order
contract (every oracle carries a top-level ORDER BY or the pipeline's order
is the physical scan order both engines preserve)."""

from __future__ import annotations

import glob
import json
import re
from pathlib import Path

import numpy as np
import pyarrow as pa
import pytest

REPO = Path(__file__).resolve().parent.parent
DRIVER_WINDOW = 50


def _ledger():
    """name -> set of rounds with a fully-green driver row."""
    greens: dict[str, set[str]] = {}
    checked: dict[str, set[str]] = {}
    for f in sorted(glob.glob(str(REPO / "CORRECTNESS_r0*.json"))):
        rnd = f[-7:-5]
        for name, row in json.load(open(f)).items():
            checked.setdefault(name, set()).add(rnd)
            if (row.get("rows_match") and row.get("schema_match")
                    and row.get("hash_match") and not row.get("err")):
                greens.setdefault(name, set()).add(rnd)
    return checked, greens


def test_rotation_policy_never_green_queries_sit_inside_window():
    """Encode the rotation policy: a registry query with ZERO green driver
    rows across every recorded round must occupy one of the first
    DRIVER_WINDOW slots — never-verified work cannot ship ungated."""
    import __ray_entry__ as m

    names = list(m.queries())
    checked, greens = _ledger()
    window = set(names[:DRIVER_WINDOW])
    never_green = [n for n in names if not greens.get(n)]
    outside = [n for n in never_green if n not in window]
    assert not outside, (
        f"never-driver-green queries outside the first-{DRIVER_WINDOW} "
        f"window: {outside}"
    )


def test_rotation_policy_ledger_is_cumulative():
    """Sanity on the ledger itself: every query the driver ever checked is
    still in the registry (nothing green was silently dropped)."""
    import __ray_entry__ as m

    names = set(m.queries())
    checked, _ = _ledger()
    dropped = set(checked) - names
    assert not dropped, f"queries with driver history left the registry: {dropped}"


# --- deterministic-order contract ---------------------------------------------

def test_every_shuffle_ending_oracle_has_top_level_order_by():
    """Queries whose oracle carries no top-level ORDER BY are exactly the
    ones relying on physical scan order (map-only chains, single-block
    reducers whose emit order is deterministic). Shuffle-ending pipelines
    (groupby/sort/keyed-block outputs) must pair a final sort with an
    oracle ORDER BY — assert the pairs fixed in round 5 stay fixed."""
    import __ray_entry__ as m

    sqls = m.oracle_sql()
    fixed_r5 = [
        "dedup_chunks", "docs_strip_boilerplate", "docs_tfidf_topk",
        "dedup_incremental", "events_user_sessions",
        "events_user_sessions_salted", "multimodal_image_stats",
        "multimodal_audio_stats", "multimodal_video_frames",
        "docs_line_dedup", "docs_source_stats", "embed_label_centroids",
        "severity_tool_rollup", "docs_kmv_distinct", "dedup_exact",
        "events_asof_prior", "errors_by_severity", "errors_window",
        "slow_list", "system", "connections_by_host", "connections_by_user",
        "connections_by_db", "connections_by_appname",
        "disconnections_by_host", "errors_by_sqlstate", "sessions",
        "conv_first_error", "enriched_severity_counts", "events_top_types",
        "events_value_range", "events_props_k_sum", "conv_tool_transitions",
        "events_by_segment", "flagged_conv_turns", "docs_pack_sequences",
        "dedup_exact_substr",
        # round-5 additions (all shuffle-ending)
        "docs_dup_span_strip", "docs_novelty", "docs_winnowing",
        "docs_winnow_sim_topk", "conv_response_latency",
        "conv_role_balance", "conv_context_growth",
        "conv_truncate_context", "conv_error_bursts", "conv_session_splits",
        "docs_chunk_overlap", "conv_loop_detect",
        "docs_type_token_stats", "conv_context_cost",
        "embed_kcenter_coreset", "embed_label_outliers",
    ]
    for name in fixed_r5:
        sql = sqls[name]
        stripped = re.sub(r"OVER\s*\([^)]*\)", "", sql, flags=re.I | re.S)
        hits = list(re.finditer(r"ORDER\s+BY", stripped, re.I))
        assert hits, f"{name}: oracle lost its ORDER BY"
        tail = stripped[hits[-1].end():]
        assert tail.count(")") <= tail.count("("), (
            f"{name}: last ORDER BY is inside a subquery — no top-level one"
        )


# --- ExactSubstr dedup ----------------------------------------------------------

def test_exsub_planted_duplicate_span_detected(ray_session):
    """Plant one >=EXSUB_L-token span shared by two otherwise-different
    docs and assert both the span geometry and keep-first semantics."""
    import ray.data

    from pgweasel_ray.pipelines import dataprep as dp

    span = " ".join(f"tok{i}" for i in range(dp.EXSUB_L + 5))  # 25 tokens
    uniq_a = " ".join(f"aa{i}" for i in range(30))
    uniq_b = " ".join(f"bb{i}" for i in range(30))
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "text": pa.array([
            uniq_a + " " + span,            # canonical (min packed id)
            uniq_b + " " + span,            # duplicate occurrence
            "short doc with no dups at all",
        ]),
    })
    import tempfile

    import pyarrow.parquet as pq

    with tempfile.TemporaryDirectory() as d:
        pq.write_table(docs, f"{d}/documents.parquet")
        out = dp.dedup_exact_substr(d).to_pandas()
    # only doc 1 carries a non-canonical duplicated span
    assert out["doc_id"].tolist() == [1]
    assert out["n_dup_spans"].tolist() == [1]
    # all EXSUB_L+5 tokens of the planted span are flagged: window starts
    # p in [30, 30+5], union = (last-first) + L = 5 + L
    assert out["dup_tokens"].tolist() == [dp.EXSUB_L + 5]


def test_exsub_within_doc_repeat_flags_second_occurrence(ray_session):
    from pgweasel_ray.pipelines import dataprep as dp
    import tempfile

    import pyarrow.parquet as pq

    span = " ".join(f"z{i}" for i in range(dp.EXSUB_L))
    filler = " ".join(f"f{i}" for i in range(25))
    docs = pa.table({
        "doc_id": pa.array([7], type=pa.int64()),
        "text": pa.array([span + " " + filler + " " + span]),
    })
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(docs, f"{d}/documents.parquet")
        out = dp.dedup_exact_substr(d).to_pandas()
    assert out["doc_id"].tolist() == [7]
    assert out["dup_tokens"].tolist() == [dp.EXSUB_L]


def test_dup_span_strip_removes_planted_span(ray_session):
    """The non-canonical copy of a planted span is stripped from doc 1;
    the canonical copy in doc 0 survives untouched."""
    import tempfile

    import pyarrow.parquet as pq

    from pgweasel_ray.pipelines import dataprep as dp

    span_toks = [f"tok{i}" for i in range(dp.EXSUB_L + 5)]
    uniq_a = [f"aa{i}" for i in range(30)]
    uniq_b = [f"bb{i}" for i in range(30)]
    docs = pa.table({
        "doc_id": pa.array([0, 1], type=pa.int64()),
        "text": pa.array([" ".join(uniq_a + span_toks),
                          " ".join(uniq_b + span_toks)]),
    })
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(docs, f"{d}/documents.parquet")
        out = dp.docs_dup_span_strip(d).to_pandas().set_index("doc_id")
    assert out.loc[0, "n_removed"] == 0
    assert out.loc[0, "clean_text"] == " ".join(uniq_a + span_toks)
    assert out.loc[1, "n_removed"] == dp.EXSUB_L + 5
    assert out.loc[1, "clean_text"] == " ".join(uniq_b)
    assert out.loc[1, "n_tokens"] == 30 + dp.EXSUB_L + 5


def test_novelty_permille_bounds(ray_session):
    """A doc sharing every window scores 0; an all-unique doc scores
    1000; sub-window docs are excluded."""
    import tempfile

    import pyarrow.parquet as pq

    from pgweasel_ray.pipelines import dataprep as dp

    span = " ".join(f"s{i}" for i in range(dp.EXSUB_L))
    uniq = " ".join(f"u{i}" for i in range(dp.EXSUB_L + 3))
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
        "text": pa.array([span, span, uniq, "too short"]),
    })
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(docs, f"{d}/documents.parquet")
        out = dp.docs_novelty(d).to_pandas().set_index("doc_id")
    assert 3 not in out.index                      # sub-window doc excluded
    assert out.loc[0, "novelty_permille"] == 1000  # canonical copy
    assert out.loc[1, "novelty_permille"] == 0     # duplicate copy
    assert out.loc[2, "novelty_permille"] == 1000  # unique windows


def test_exsub_shingle_hash_is_position_sensitive():
    """("ab","c") vs ("c","ab") must hash differently — the polynomial is
    positional, matching string-identity of the joined shingle."""
    from pgweasel_ray.pipelines import dataprep as dp

    t1 = pa.table({"doc_id": pa.array([1], type=pa.int64()),
                   "text": pa.array(["x " * (dp.EXSUB_L - 1) + "ab c"])})
    t2 = pa.table({"doc_id": pa.array([1], type=pa.int64()),
                   "text": pa.array(["x " * (dp.EXSUB_L - 1) + "c ab"])})
    h1 = dp._exsub_shingle_rows(t1)
    h2 = dp._exsub_shingle_rows(t2)
    assert h1.num_rows == h2.num_rows == 2  # L+1 tokens -> 2 windows
    assert (h1["h1"].to_pylist()[-1] != h2["h1"].to_pylist()[-1]
            or h1["h2"].to_pylist()[-1] != h2["h2"].to_pylist()[-1])


# --- pure-numpy BMP / WAV codecs -------------------------------------------------

def test_bmp_round_trip_through_image_stats_stage():
    from pgweasel_ray.stages import multimodal as MM

    rng = np.random.default_rng(42)
    arr = rng.integers(0, 256, (5, 7, 3), dtype=np.uint8)
    payload = MM.encode_bmp(arr)
    # decode_bmp inverts encode_bmp exactly
    np.testing.assert_array_equal(MM.decode_bmp(payload), arr)
    # and the REAL-FORMAT branch of the stage produces the true stats
    stage = MM.ImageStatsStage()
    out = stage(pa.table({"doc_id": pa.array([1], type=pa.int64()),
                          "image": pa.array([payload], type=pa.binary())}))
    assert out["height"].to_pylist() == [5]
    assert out["width"].to_pylist() == [7]
    assert out["channels"].to_pylist() == [3]
    assert out["n_px"].to_pylist() == [5 * 7 * 3]
    assert out["px_sum"].to_pylist() == [int(arr.sum(dtype=np.int64))]


def test_bmp_row_padding_non_multiple_of_four_width():
    from pgweasel_ray.stages import multimodal as MM

    arr = np.arange(3 * 3 * 3, dtype=np.uint8).reshape(3, 3, 3)  # stride 9→12
    np.testing.assert_array_equal(MM.decode_bmp(MM.encode_bmp(arr)), arr)


def test_wav_round_trip_through_audio_stats_stage():
    from pgweasel_ray.stages import multimodal as MM

    rng = np.random.default_rng(7)
    s = rng.integers(-(2**15), 2**15, 201, dtype=np.int16)
    payload = MM.encode_wav(16000, s)
    rate, back = MM.decode_wav(payload)
    assert rate == 16000
    np.testing.assert_array_equal(back, s)
    stage = MM.AudioStatsStage()
    out = stage(pa.table({"doc_id": pa.array([1], type=pa.int64()),
                          "audio": pa.array([payload], type=pa.binary())}))
    s64 = s.astype(np.int64)
    assert out["sample_rate"].to_pylist() == [16000]
    assert out["n_samples"].to_pylist() == [201]
    assert out["s_sum"].to_pylist() == [int(s64.sum())]
    assert out["s_sqsum"].to_pylist() == [int((s64 * s64).sum())]
    # odd-length data chunk exercises the word-alignment walk
    rate2, back2 = MM.decode_wav(MM.encode_wav(8000, s[:1]))
    assert rate2 == 8000 and back2.tolist() == s[:1].tolist()


def test_wav_frame_stage_accepts_real_format():
    from pgweasel_ray.stages import multimodal as MM

    s = np.arange(-1024, 1024, dtype=np.int16)
    stage = MM.AudioFrameStage(frame_len=256)
    out = stage(pa.table({"doc_id": pa.array([1], type=pa.int64()),
                          "audio": pa.array([MM.encode_wav(8000, s)],
                                            type=pa.binary())}))
    assert out["n_frames"].to_pylist() == [len(s) // 256]


def test_non_pcm_wav_and_paletted_bmp_fail_loudly():
    from pgweasel_ray.stages import multimodal as MM

    import struct

    bad_wav = (b"RIFF" + struct.pack("<I", 24) + b"WAVE" + b"fmt "
               + struct.pack("<I", 16)
               + struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32))
    with pytest.raises(NotImplementedError):
        MM.decode_wav(bad_wav)
    bad_bmp = (b"BM" + struct.pack("<IHHI", 100, 0, 0, 54)
               + struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 8, 0, 0,
                             0, 0, 0, 0))
    with pytest.raises(NotImplementedError):
        MM.decode_bmp(bad_bmp)


# --- round-5 guard regressions ---------------------------------------------------

def test_linfit_pre_epoch_timestamp_raises():
    from pgweasel_ray.pipelines import events as ev

    bad = pa.table({
        "ts": pa.array([(ev.LINFIT_EPOCH0 - 60) * 1_000_000],
                       type=pa.timestamp("us")),
        "value": pa.array([1.0]),
        "event_type": pa.array(["x"]),
    })
    with pytest.raises(ValueError, match="predates"):
        ev._linfit_partials(bad)


def test_rollup_fixture_contains_no_null_or_literal_all(sf_dir):
    """ADVICE r4: the rollup placeholder is only safe while neither NULL
    nor the literal 'ALL' appears in severity/tool — pin that property."""
    from pgweasel_ray.pipelines import core

    df = core.severity_tool_rollup(sf_dir)
    fine = df[(df["severity"] != core.ROLLUP_ALL)
              & (df["tool"] != core.ROLLUP_ALL)]
    assert fine["severity"].notna().all() and fine["tool"].notna().all()


def test_weighted_sample_keep_rule_against_independent_length(sf_dir):
    """ADVICE r4: decouple docs_weighted_sample's keep rule from the stored
    n_chars column — recompute length independently and replay the rule."""
    import duckdb

    from pgweasel_ray.pipelines import dataprep as dp

    kept = dp.docs_weighted_sample(sf_dir).to_pandas()
    con = duckdb.connect()
    rule = con.sql(f"""
        SELECT doc_id, length(text) AS true_len, n_chars
        FROM read_parquet('{sf_dir}/documents.parquet')
    """).df()
    # the stored n_chars IS the document length — if a fixture regen ever
    # changes n_chars semantics, this breaks loudly instead of silently
    assert (rule["true_len"] == rule["n_chars"]).all()
    assert set(kept["doc_id"]) <= set(rule["doc_id"])


# --- docs_chunk_overlap / conv_loop_detect kernel laws ----------------------------

def test_chunk_spans_geometry_edges():
    """Chunk geometry law on the edge lengths: empty doc emits nothing;
    one token = one chunk; exactly one stride = one chunk; stride+1 = two
    chunks (short tail chunk); exactly one window = two chunks (the
    overlap tail)."""
    from pgweasel_ray.pipelines import dataprep as dp

    W, S = dp.CHUNK_WINDOW_TOKENS, dp.CHUNK_STRIDE_TOKENS
    texts = ["", "tok", " ".join(["t"] * S), " ".join(["t"] * (S + 1)),
             " ".join(["t"] * W)]
    batch = pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts),
    })
    out = dp._chunk_spans(batch, W, S).to_pandas()
    by_doc = {d: g for d, g in out.groupby("doc_id")}
    assert 0 not in by_doc                                   # empty doc
    assert by_doc[1]["n_tok"].tolist() == [1]                # single token
    assert by_doc[2]["n_tok"].tolist() == [S]                # one stride
    assert by_doc[3]["start_tok"].tolist() == [0, S]         # stride + 1
    assert by_doc[3]["n_tok"].tolist() == [S + 1, 1]
    assert by_doc[4]["start_tok"].tolist() == [0, S]         # one window
    assert by_doc[4]["n_tok"].tolist() == [W, W - S]
    # every chunk's span stays inside its doc and covers it exactly
    assert (out["n_tok"] > 0).all()
    assert (out["chunk_idx"] * S == out["start_tok"]).all()


def test_loop_detect_planted_runs_and_null_breaks():
    """Planted conv: run of 3 same-tool calls (a loop), a null tool that
    breaks a would-be run, a conv with no assistant turns emits no row."""
    from pgweasel_ray.pipelines import windows as W

    batch = pa.table({
        "conv_id": pa.array(["a"] * 7 + ["b"] * 2 + ["c"]),
        "turn_idx": pa.array([0, 1, 2, 3, 4, 5, 6, 0, 1, 0],
                             type=pa.int32()),
        "role": pa.array(["assistant"] * 7 + ["assistant"] * 2 + ["user"]),
        "tool": pa.array(["x", "x", "x", "y", None, "y", "y",
                          "z", None, "z"]),
    })
    out = W._loop_detect_block(batch, W.LOOP_RUN_MIN).to_pandas() \
        .set_index("conv_id")
    # conv a: runs x,x,x | y | (null) | y,y -> max 3, one loop, 6 calls
    assert out.loc["a", "n_assist"] == 7
    assert out.loc["a", "n_tool_calls"] == 6
    assert out.loc["a", "max_run"] == 3
    assert out.loc["a", "n_loops"] == 1
    # conv b: z | null -> max 1, no loops
    assert out.loc["b", "max_run"] == 1 and out.loc["b", "n_loops"] == 0
    assert out.loc["b", "n_tool_calls"] == 1
    # conv c has no assistant turns -> no row
    assert "c" not in out.index


def test_loop_detect_all_null_tools_conv():
    """A conv whose assistant turns all lack a tool still reports
    n_assist with max_run = n_loops = 0."""
    from pgweasel_ray.pipelines import windows as W

    batch = pa.table({
        "conv_id": pa.array(["q", "q"]),
        "turn_idx": pa.array([0, 1], type=pa.int32()),
        "role": pa.array(["assistant", "assistant"]),
        "tool": pa.array([None, None], type=pa.string()),
    })
    out = W._loop_detect_block(batch, W.LOOP_RUN_MIN).to_pandas()
    assert out["n_assist"].tolist() == [2]
    assert out["n_tool_calls"].tolist() == [0]
    assert out["max_run"].tolist() == [0]
    assert out["n_loops"].tolist() == [0]


# --- docs_type_token_stats / conv_context_cost kernel laws ------------------------


def test_type_token_partials_lowercase_and_exact_distinct():
    """The two-phase combiner equals a naive per-source count: lowering,
    empty-fragment drop, and exact distinct across blocks (the same word
    split over two blocks still counts once)."""
    from pgweasel_ray.pipelines import dataprep as dp

    b1 = pa.table({"source": ["web", "web", "books"],
                   "text": ["The the DOG", "", "dog runs"]})
    b2 = pa.table({"source": ["web"], "text": ["dog  the\truns"]})
    pairs = pa.concat_tables(
        [dp._source_word_partials(b1), dp._source_word_partials(b2)])
    out = dp._ttr_final_block(dp._ttr_pair_block(pairs)).to_pandas() \
        .set_index("source")
    # web: tokens the,the,dog + dog,the,runs = 6; distinct {the,dog,runs}=3
    assert out.loc["web", "n_tokens"] == 6
    assert out.loc["web", "n_distinct_tokens"] == 3
    assert out.loc["web", "type_token_permille"] == 500
    # books: dog,runs -> 2/2
    assert out.loc["books", "n_tokens"] == 2
    assert out.loc["books", "n_distinct_tokens"] == 2
    assert out.loc["books", "type_token_permille"] == 1000


def test_context_cost_planted_conv():
    """Planted conv: prompt = exclusive running chars before each
    assistant turn; a conv with no assistant turns still emits a zero
    row (cost accounting covers every conversation)."""
    from pgweasel_ray.pipelines import windows as W

    batch = pa.table({
        "conv_id": pa.array(["a"] * 4 + ["b"]),
        "turn_idx": pa.array([0, 1, 2, 3, 0], type=pa.int32()),
        "role": pa.array(["user", "assistant", "user", "assistant", "user"]),
        "text": pa.array(["12345", "123", "1234", "12", "123456"]),
    })
    out = W._context_cost_block(batch).to_pandas().set_index("conv_id")
    # assistant turn 1 reads 5 prior chars, turn 3 reads 5+3+4=12
    assert out.loc["a", "n_assist"] == 2
    assert out.loc["a", "prompt_chars"] == 5 + 12
    assert out.loc["a", "gen_chars"] == 3 + 2
    assert out.loc["a", "cost_chars"] == 17 + 5
    assert out.loc["b", "n_assist"] == 0
    assert out.loc["b", "cost_chars"] == 0


def test_kcenter_planted_line_geometry(ray_session):
    """Farthest-point law on a planted 1-D line: seed = min vec_id, each
    pick is the point farthest from the selected set, distance ties break
    to the lowest vec_id, and cover_d2 records the radius² at selection.
    Values are exactly float32-representable so fixed-point quantization
    is closed-form."""
    import tempfile

    import pyarrow.parquet as pq

    from pgweasel_ray.pipelines import dataprep as dp

    S = dp.CENTROID_SCALE
    tbl = pa.table({
        "vec_id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "embedding": pa.array([[0.0], [1.0], [-1.0], [0.75]],
                              type=pa.list_(pa.float32())),
    })
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(tbl, f"{d}/embeddings.parquet")
        out = dp.embed_kcenter_coreset(d)
    # seed id1 (0.0); then id2 (1.0, ties id3 at d2=S^2 -> lowest id);
    # then id3 (-1.0, radius S^2); last id4 (0.75, radius (S/4)^2)
    assert out["vec_id"].tolist() == [1, 2, 3, 4]
    assert out["cover_d2"].tolist() == [0, S * S, S * S, (S // 4) ** 2]
    assert out["sel_idx"].tolist() == [0, 1, 2, 3]


def test_label_outliers_planted_far_vector(ray_session):
    """One label cluster hugging +0.5 with a single far vector at -0.5:
    only the far vector is flagged, and d2 is the exact fixed-point
    distance to the floor-mean centroid."""
    import tempfile

    import pyarrow.parquet as pq

    from pgweasel_ray.pipelines import dataprep as dp

    vals = [[0.5], [0.5], [0.5], [0.5], [-0.5]]
    tbl = pa.table({
        "vec_id": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
        "embedding": pa.array(vals, type=pa.list_(pa.float32())),
        "label": pa.array([0] * 5, type=pa.int32()),
    })
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(tbl, f"{d}/embeddings.parquet")
        out = dp.embed_label_outliers(d).to_pandas().set_index("vec_id")
    S = dp.CENTROID_SCALE
    # shifted q: 0.5 -> 1.5S, -0.5 -> 0.5S; centroid = (4*1.5S + 0.5S)//5
    cq = (4 * (3 * S // 2) + S // 2) // 5
    assert out.loc[5, "d2"] == (S // 2 - cq) ** 2
    assert out.loc[5, "is_outlier"] == 1
    assert out.loc[1, "d2"] == (3 * S // 2 - cq) ** 2
    assert out["is_outlier"].tolist() == [0, 0, 0, 0, 1]
