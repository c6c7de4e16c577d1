"""Per-query DuckDB oracle SQL, parameterized by sf dir.

``build_oracles(sf_dir)`` returns {query_name: SQL}. Transcript queries read
the SAME fixture parquet the Ray pipelines read (via read_parquet on the
fixture glob); events/documents/embeddings queries use the driver's
pre-registered views. Every queries() entry has an oracle: the
dedup/ANN/fingerprint family replays the identical deterministic algorithm
in DuckDB list-lambda SQL generated from the shared constants in
pgweasel_ray/hashing.py (the same parity pattern the regex/needle tables
use), with seeded randomness (MinHash permutations, LSH hyperplanes, IVF
centroids) embedded as literals.
"""

from __future__ import annotations

from . import hashing as H
from . import oracle, patterns
from .pipelines import core, dataprep
from .pipelines import events as events_mod
from .pipelines import windows as windows_mod
from .sources.transcripts import ensure_fixture, lookup_path, transcripts_glob

_SQLSTATE = patterns.SQLSTATE_PATTERN


def _lang_id_sql() -> str:
    """Argmax CASE chain over the per-language function-word counts — ties
    resolve to the earlier language (numpy argmax parity), all-zero →
    'unknown'. Generated from dataprep.LANG_STOPWORDS (parity source)."""
    langs = list(dataprep.LANG_STOPWORDS)
    counts = ",\n       ".join(
        f"len(regexp_extract_all(lower(text), '{pat}'))::BIGINT AS {lang}"
        for lang, pat in dataprep.LANG_STOPWORDS.items()
    )
    branches = []
    for i, lang in enumerate(langs[:-1]):
        conds = " AND ".join(f"{lang} >= {o}" for o in langs[i + 1:])
        branches.append(f"WHEN {conds} THEN '{lang}'")
    branch_sql = "\n  ".join(branches)
    return f"""WITH c AS (
  SELECT doc_id,
       {counts}
  FROM documents
)
SELECT doc_id, CASE
  WHEN greatest({', '.join(langs)}) = 0 THEN 'unknown'
  {branch_sql}
  ELSE '{langs[-1]}' END AS lang_pred
FROM c"""


def _dedup_minhash_sql() -> str:
    """The identical banded MinHash-LSH algorithm replayed in SQL (constants
    embedded from hashing.py); dominated = shares a band bucket with a
    smaller doc_id."""
    return f"""WITH {H.sql_minhash_bands_cte()}, dom AS (
  SELECT DISTINCT b2.doc_id
  FROM bands b1 JOIN bands b2
    ON b1.band = b2.band AND b1.band_hash = b2.band_hash
   AND b1.doc_id < b2.doc_id
)
SELECT doc_id FROM documents
WHERE doc_id NOT IN (SELECT doc_id FROM dom)"""


def _dedup_components_sql() -> str:
    """Connected components of the SAME MinHash band-bucket candidate graph
    the Ray pipeline builds (dataprep.dedup_components_ds): docs sharing any
    (band, band_hash) bucket are adjacent; component_id = min doc_id
    reachable. The recursive CTE enumerates (node, reachable-id) pairs and
    folds with min — an independent transitive-closure formulation vs the
    pipeline's iterative min-label propagation."""
    return f"""WITH RECURSIVE {H.sql_minhash_bands_cte()}, edges AS (
  SELECT DISTINCT b1.doc_id AS node, b2.doc_id AS nbr
  FROM bands b1 JOIN bands b2
    ON b1.band = b2.band AND b1.band_hash = b2.band_hash
   AND b1.doc_id <> b2.doc_id
), reach AS (
  SELECT doc_id AS node, doc_id AS r FROM documents
  UNION
  SELECT e.node, reach.r FROM reach JOIN edges e ON e.nbr = reach.node
)
SELECT node AS doc_id, min(r) AS component_id
FROM reach GROUP BY node ORDER BY doc_id"""


def _dedup_cluster_best_sql() -> str:
    """Cluster-representative selection replayed independently: components
    via the recursive-CTE reachability (as _dedup_components_sql), then the
    per-component argmax by (n_tokens DESC, doc_id ASC) via a window
    row_number — vs the pipeline's Max/Count + join + equality-filter
    resolution. Integer signals only."""
    return f"""WITH RECURSIVE {H.sql_minhash_bands_cte()}, edges AS (
  SELECT DISTINCT b1.doc_id AS node, b2.doc_id AS nbr
  FROM bands b1 JOIN bands b2
    ON b1.band = b2.band AND b1.band_hash = b2.band_hash
   AND b1.doc_id <> b2.doc_id
), reach AS (
  SELECT doc_id AS node, doc_id AS r FROM documents
  UNION
  SELECT e.node, reach.r FROM reach JOIN edges e ON e.nbr = reach.node
), comp AS (
  SELECT node AS doc_id, min(r) AS component_id FROM reach GROUP BY node
), q AS (
  SELECT doc_id, len(regexp_extract_all(text, '\\S+')) AS n_tokens
  FROM documents
), j AS (
  SELECT c.component_id, c.doc_id, q.n_tokens,
         row_number() OVER (PARTITION BY c.component_id
                            ORDER BY q.n_tokens DESC, c.doc_id) AS rn,
         count(*) OVER (PARTITION BY c.component_id) AS n_members
  FROM comp c JOIN q USING (doc_id)
)
SELECT component_id, doc_id, n_tokens, n_members
FROM j WHERE rn = 1 ORDER BY component_id"""


def _dedup_jaccard_sql() -> str:
    """The ALL-PAIRS n-gram-Jaccard definition — an independent check that
    the Ray pipeline's prefix filter has exact recall. Integer threshold:
    JC_DEN*|A∩B| >= JC_NUM*|A∪B|."""
    return f"""WITH {H.sql_gram_hashes_cte()}, g AS (
  SELECT doc_id, list_distinct(hs) AS grams FROM gh
), dom AS (
  SELECT DISTINCT b.doc_id
  FROM g a JOIN g b ON a.doc_id < b.doc_id
  WHERE {H.JC_DEN} * len(list_intersect(a.grams, b.grams))
        >= {H.JC_NUM} * (len(a.grams) + len(b.grams)
                         - len(list_intersect(a.grams, b.grams)))
)
SELECT doc_id FROM documents
WHERE doc_id NOT IN (SELECT doc_id FROM dom)"""


def _dedup_simhash_sql() -> str:
    """All-pairs hamming <= SH_HAM_MAX over simhash62 — equivalent to the
    pipeline's band blocking (SH_BANDS bands are lossless at this radius:
    any pair within the radius has an intact band), so this doubles as an
    independent check of the banding."""
    return f"""WITH {H.sql_simhash_cte()}, dom AS (
  SELECT DISTINCT b.doc_id
  FROM sims a JOIN sims b ON a.doc_id < b.doc_id
  WHERE bit_count(xor(a.simhash, b.simhash)) <= {H.SH_HAM_MAX}
)
SELECT doc_id FROM documents
WHERE doc_id NOT IN (SELECT doc_id FROM dom)"""


def _sample_hash_sql() -> str:
    return f"""SELECT doc_id FROM documents
WHERE (((doc_id % {H.P}) * {H.SAMPLE_A} + {H.SAMPLE_B}) % {H.P}) * 100
      < {dataprep.SAMPLE_RATE_PCT}::BIGINT * {H.P}"""


def _mixture_sample_sql() -> str:
    """Temperature-flattened mixture sampling replayed exactly: integer
    sqrt per source (double seed + adjustment), then the keep inequality
    u * (S*T_s) < (B*isqrt(T_s)) * P evaluated in HUGEINT — the same
    rational-rate rule dataprep.docs_mixture_sample precomputes as
    per-source bignum thresholds."""
    den = dataprep.MIXTURE_BUDGET_DEN
    return rf"""WITH q AS (
  SELECT doc_id, source, len(regexp_extract_all(text, '\S+')) AS nt
  FROM documents
), st AS (
  SELECT source, CAST(sum(nt) AS BIGINT) AS t FROM q GROUP BY source
), s0 AS (
  SELECT source, t,
         CAST(floor(sqrt(CAST(t AS DOUBLE))) AS BIGINT) AS r FROM st
), s1 AS (
  SELECT source, t, r - CASE WHEN r*r > t THEN 1 ELSE 0 END AS r FROM s0
), sq AS (
  SELECT source, t,
         r + CASE WHEN (r+1)*(r+1) <= t THEN 1 ELSE 0 END AS s FROM s1
), tot AS (
  SELECT CAST(sum(s) AS BIGINT) AS ssum, CAST(sum(t) AS BIGINT) AS tsum
  FROM sq
)
SELECT q.doc_id, q.source
FROM q JOIN sq USING (source), tot
WHERE CAST((((q.doc_id % {H.P}) * {H.SAMPLE_A} + {H.SAMPLE_B}) % {H.P})
           AS HUGEINT) * (CAST(tot.ssum AS HUGEINT) * sq.t)
      < (CAST(tot.tsum // {den} AS HUGEINT) * sq.s) * {H.P}
ORDER BY q.doc_id"""


def _topk_per_source_sql() -> str:
    k = dataprep.TOPK_PER_GROUP_K
    return rf"""WITH q AS (
  SELECT doc_id, source, len(regexp_extract_all(text, '\S+')) AS n_tokens
  FROM documents
), r AS (
  SELECT source, doc_id, n_tokens,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_tokens DESC, doc_id) AS rn
  FROM q
)
SELECT source, doc_id, n_tokens FROM r WHERE rn <= {k}
ORDER BY source, n_tokens DESC, doc_id"""


def _vocab_topk_sql() -> str:
    return rf"""WITH w AS (
  SELECT unnest(regexp_extract_all(lower(text), '\S+')) AS word
  FROM documents
)
SELECT word, count(*) AS cnt FROM w
GROUP BY word ORDER BY cnt DESC, word LIMIT {dataprep.VOCAB_TOP_K}"""


def _inverted_postings_sql() -> str:
    """Vocab pass + tf + per-word top-k replayed with the same tie rules
    (count DESC, word ASC for the vocab; tf DESC, doc_id ASC per word)."""
    return rf"""WITH w AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) AS word
  FROM documents
), v AS (
  SELECT word FROM w GROUP BY word
  ORDER BY count(*) DESC, word LIMIT {dataprep.POSTINGS_VOCAB}
), tf AS (
  SELECT w.word, w.doc_id, count(*)::BIGINT AS tf
  FROM w JOIN v USING (word) GROUP BY 1, 2
)
SELECT word, doc_id, tf FROM tf
QUALIFY row_number() OVER (PARTITION BY word ORDER BY tf DESC, doc_id)
        <= {dataprep.POSTINGS_K}
ORDER BY word, doc_id"""


def _decontaminate_sql() -> str:
    """Same rule as DecontaminateStage: corpus docs (doc_id >= bench max)
    sharing no word-shingle hash with any benchmark doc."""
    mx = dataprep.DECONTAM_BENCH_MAX_ID
    return f"""WITH {H.sql_gram_hashes_cte()}, bgl AS (
  -- coalesce: zero benchmark docs must yield the EMPTY gram list, not
  -- NULL (a NULL bg would null the intersect and drop every row, while
  -- DecontaminateStage keeps all non-benchmark docs)
  SELECT coalesce(list_distinct(flatten(list(hs))), []) AS bg
  FROM gh WHERE doc_id < {mx}
)
SELECT gh.doc_id FROM gh, bgl
WHERE gh.doc_id >= {mx} AND len(list_intersect(gh.hs, bgl.bg)) = 0"""


def _length_quantiles_sql() -> str:
    pcts = ", ".join(f"({p})" for p in dataprep.QUANTILE_PCTS)
    return rf"""WITH t AS (
  SELECT len(regexp_extract_all(text, '\S+'))::BIGINT AS n FROM documents
), o AS (
  SELECT n, row_number() OVER (ORDER BY n) - 1 AS r FROM t
), c AS (SELECT count(*) AS cnt FROM t)
SELECT q.pct::BIGINT AS pct, o.n AS n_tokens
FROM (VALUES {pcts}) q(pct), c, o
WHERE o.r = (q.pct * (c.cnt - 1)) // 100
ORDER BY pct"""


def _scrub_sql() -> str:
    """Nested regexp_replace chain generated from dataprep.SCRUB_RULES (the
    parity source), innermost = first rule, 'g' for replace-all."""
    expr = "text"
    for pattern, token in dataprep.SCRUB_RULES:
        expr = f"regexp_replace({expr}, '{pattern}', '{token}', 'g')"
    return f"SELECT doc_id, {expr} AS text_scrubbed FROM documents"


def _corpus_prep_sql() -> str:
    """The composed recipe (quality → exact dedup → MinHash dedup →
    decontaminate), each stage over the previous stage's survivors —
    chained CTEs over the same shared hashing constants the Ray stages
    use. Two gram chains coexist via CTE prefixes."""
    mx = dataprep.DECONTAM_BENCH_MAX_ID
    quality = r"""len(regexp_extract_all(text, '\S+')) >= 30
    AND len(regexp_extract_all(text, '[0-9]'))
        < 0.3 * greatest(len(regexp_extract_all(text, '\S+')), 1)"""
    return f"""WITH q AS (
  SELECT doc_id, text FROM documents
  WHERE {quality}
), e AS (
  SELECT min(doc_id) AS doc_id FROM q GROUP BY text
), eq AS (
  SELECT q.doc_id, q.text FROM q JOIN e ON q.doc_id = e.doc_id
), {H.sql_minhash_bands_cte(table="eq", prefix="m_")}, mdom AS (
  SELECT DISTINCT b2.doc_id
  FROM m_bands b1 JOIN m_bands b2
    ON b1.band = b2.band AND b1.band_hash = b2.band_hash
   AND b1.doc_id < b2.doc_id
), m AS (
  SELECT doc_id FROM eq
  WHERE doc_id NOT IN (SELECT doc_id FROM mdom)
), {H.sql_gram_hashes_cte(table="documents", prefix="d_")}, bgl AS (
  SELECT coalesce(list_distinct(flatten(list(hs))), []) AS bg
  FROM d_gh WHERE doc_id < {mx}
)
SELECT m.doc_id FROM m, d_gh, bgl
WHERE d_gh.doc_id = m.doc_id
  AND m.doc_id >= {mx}
  AND len(list_intersect(d_gh.hs, bgl.bg)) = 0"""


def _repetition_sql() -> str:
    """Same repetition rules over the shared 2-gram hash CTE: dup-line
    fraction via list_distinct on str_split lines, top-bigram fraction as
    max occurrence count / total over the identical padded bigram hash
    list, thresholds from dataprep (the parity source)."""
    n = dataprep.REP_NGRAM
    return f"""WITH {H.sql_gram_hashes_cte(n=n)}, l AS (
  SELECT doc_id,
         1 - (len(list_distinct(str_split(text, chr(10))))::DOUBLE
              / len(str_split(text, chr(10)))::DOUBLE) AS dup_line_frac
  FROM documents
), b AS (
  SELECT doc_id,
         list_max(list_transform(list_distinct(hs),
                  h -> len(list_filter(hs, x -> x = h))))::DOUBLE
           / len(hs)::DOUBLE AS top_bigram_frac
  FROM gh
)
SELECT l.doc_id, l.dup_line_frac, b.top_bigram_frac,
       (l.dup_line_frac > {dataprep.REP_DUP_LINE_MAX!r}
        OR b.top_bigram_frac > {dataprep.REP_TOP_NGRAM_MAX!r}) AS is_repetitive
FROM l JOIN b ON l.doc_id = b.doc_id"""


def _normalize_sql() -> str:
    """Same three-step cleanup as dataprep._normalize over the shared RE2
    whitespace class (NORM_WS_PATTERN is the parity source)."""
    ws = dataprep.NORM_WS_PATTERN
    return f"""WITH n AS (
  SELECT doc_id,
         trim(regexp_replace(lower(text), '{ws}', ' ', 'g'), ' ')
           AS text_norm
  FROM documents
)
SELECT doc_id, text_norm, length(text_norm)::BIGINT AS n_chars FROM n"""


def _dedup_chunks_sql() -> str:
    """Chunk-level exact dedup replayed literally: tokenize, window into
    CHUNK_WORDS-word chunks, keep min packed (doc_id, chunk_idx) per
    distinct chunk string. The pipeline groups by the 128-bit chunk hash
    instead of the string — identical survivors modulo 2^-128 collisions
    (the same equivalence dedup_exact's oracle relies on)."""
    cw = dataprep.CHUNK_WORDS
    mod = 1 << dataprep.CHUNK_IDX_BITS
    sep = ord(H.GRAM_SEP)
    return rf"""WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[^\t\n\f\r ]+') AS ws
  FROM documents
), w AS (
  SELECT doc_id, unnest(ws) AS word, generate_subscripts(ws, 1) - 1 AS widx
  FROM t
), ch AS (
  SELECT doc_id, widx // {cw} AS chunk_idx,
         string_agg(word, chr({sep}) ORDER BY widx) AS chunk
  FROM w GROUP BY doc_id, chunk_idx
), m AS (
  SELECT min(doc_id * {mod} + chunk_idx) AS keep FROM ch GROUP BY chunk
)
SELECT keep // {mod} AS doc_id, keep % {mod} AS chunk_idx FROM m
ORDER BY doc_id, chunk_idx"""


def _lm_surprisal_sql() -> str:
    """Unigram surprisal replayed literally: same top-V vocab (count desc,
    word asc), same integer floor-log2 via length(bin(q)) - 1 — bit-exact
    against the pipeline's frexp kernel (no libm log on either side)."""
    v = dataprep.LM_VOCAB_TOP
    return rf"""WITH w AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) AS word
  FROM documents
), cnt AS (
  SELECT word, count(*)::BIGINT AS c FROM w GROUP BY word
), tot AS (
  SELECT sum(c)::BIGINT AS t FROM cnt
), voc AS (
  SELECT word, c FROM cnt ORDER BY c DESC, word LIMIT {v}
), sc AS (
  SELECT w.doc_id, v.word IS NULL AS oov,
         length(bin(t // coalesce(v.c, 1))) - 1 AS bits
  FROM w CROSS JOIN tot LEFT JOIN voc v ON w.word = v.word
)
SELECT doc_id, count(*)::BIGINT AS n_tokens,
       sum(CASE WHEN oov THEN 1 ELSE 0 END)::BIGINT AS n_oov,
       sum(bits)::BIGINT AS sum_bits,
       sum(bits)::DOUBLE / count(*) AS avg_bits
FROM sc GROUP BY doc_id"""


def _strip_boilerplate_sql() -> str:
    """Boilerplate strip replayed literally on chunk STRINGS: same
    chunking CTE as _dedup_chunks_sql, flag chunks in >= BOILER_MIN_DOCS
    distinct docs, reassemble kept chunks in order. Equivalent to the
    pipeline's hash-keyed flagging modulo 2^-64 bkey collisions."""
    cw = dataprep.CHUNK_WORDS
    sep = ord(H.GRAM_SEP)
    k = dataprep.BOILER_MIN_DOCS
    return rf"""WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[^\t\n\f\r ]+') AS ws
  FROM documents
), w AS (
  SELECT doc_id, unnest(ws) AS word, generate_subscripts(ws, 1) - 1 AS widx
  FROM t
), ch AS (
  SELECT doc_id, widx // {cw} AS chunk_idx,
         string_agg(word, chr({sep}) ORDER BY widx) AS chunk
  FROM w GROUP BY doc_id, chunk_idx
), f AS (
  SELECT chunk FROM ch GROUP BY chunk
  HAVING count(DISTINCT doc_id) >= {k}
), kept AS (
  SELECT doc_id, chunk_idx, chunk FROM ch
  WHERE chunk NOT IN (SELECT chunk FROM f)
), agg AS (
  SELECT doc_id, count(*) AS n_kept,
         string_agg(replace(chunk, chr({sep}), ' '), ' '
                    ORDER BY chunk_idx) AS clean_text
  FROM kept GROUP BY doc_id
), tot AS (
  SELECT doc_id, count(*) AS n_chunks FROM ch GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(tot.n_chunks, 0)::BIGINT AS n_chunks,
       (coalesce(tot.n_chunks, 0) - coalesce(agg.n_kept, 0))::BIGINT
         AS n_removed,
       coalesce(agg.clean_text, '') AS clean_text
FROM documents d
LEFT JOIN tot ON d.doc_id = tot.doc_id
LEFT JOIN agg ON d.doc_id = agg.doc_id
ORDER BY d.doc_id"""


def _shuffle_order_sql() -> str:
    return f"""WITH k AS (
  SELECT doc_id,
         ((doc_id % {H.P}) * {H.SHUF_A} + {H.SHUF_B}) % {H.P} AS key
  FROM documents
)
SELECT doc_id, row_number() OVER (ORDER BY key, doc_id) - 1 AS pos FROM k"""


def _winnowing_sql() -> str:
    """Winnowing selection replayed literally: the shared gram-hash CTE
    (hashing.sql_gram_hashes_cte — same polynomial as the kernel), one row
    per (doc, window), arg_min over the identical selection key
    h * 2^21 - pos (rightmost-min tie rule), distinct-fingerprint
    aggregation. greatest(m - W + 1, 1) gives short docs their single
    whole-doc window exactly like the kernel's reduceat path."""
    W = dataprep.WINNOW_W
    S = 1 << dataprep._WINNOW_POS_BITS
    return f"""WITH {H.sql_gram_hashes_cte()}, posx AS (
  SELECT doc_id, i - 1 AS pos, hs[i] AS h
  FROM gh, LATERAL (SELECT unnest(generate_series(1, len(hs))) AS i) u
), meta AS (
  SELECT doc_id, len(hs) AS m FROM gh
), win AS (
  SELECT doc_id, p - 1 AS p
  FROM meta, LATERAL (
    SELECT unnest(generate_series(1, greatest(m - {W} + 1, 1))) AS p) u
), sel AS (
  SELECT w.doc_id, w.p,
         arg_min(o.pos, o.h * {S} - o.pos) AS fp_pos,
         arg_min(o.h, o.h * {S} - o.pos) AS fp_h
  FROM win w JOIN posx o
    ON o.doc_id = w.doc_id AND o.pos >= w.p AND o.pos < w.p + {W}
  GROUP BY w.doc_id, w.p
), fp AS (
  SELECT DISTINCT doc_id, fp_pos, fp_h FROM sel
), fph AS (
  SELECT DISTINCT doc_id, fp_h FROM fp
), a AS (
  SELECT doc_id, count(*)::BIGINT AS n_fp FROM fp GROUP BY doc_id
), b AS (
  SELECT doc_id, count(*)::BIGINT AS n_distinct_fp,
         bit_xor(fp_h)::BIGINT AS fp_xor
  FROM fph GROUP BY doc_id
)
SELECT m.doc_id, m.m::BIGINT AS n_grams, a.n_fp, b.n_distinct_fp, b.fp_xor
FROM meta m JOIN a USING (doc_id) JOIN b USING (doc_id)
ORDER BY doc_id"""


def _winnow_sim_sql() -> str:
    """MOSS similarity pairs replayed: same selection CTEs as
    _winnowing_sql down to fph (distinct (doc, fingerprint)), then the
    hot-cap filter (2 <= docs-per-fingerprint <= WINNOW_HOT_CAP), the
    within-bucket self-join, and the deterministic (n DESC, a, b) top-k."""
    W = dataprep.WINNOW_W
    S = 1 << dataprep._WINNOW_POS_BITS
    return f"""WITH {H.sql_gram_hashes_cte()}, posx AS (
  SELECT doc_id, i - 1 AS pos, hs[i] AS h
  FROM gh, LATERAL (SELECT unnest(generate_series(1, len(hs))) AS i) u
), meta AS (
  SELECT doc_id, len(hs) AS m FROM gh
), win AS (
  SELECT doc_id, p - 1 AS p
  FROM meta, LATERAL (
    SELECT unnest(generate_series(1, greatest(m - {W} + 1, 1))) AS p) u
), sel AS (
  SELECT w.doc_id, w.p,
         arg_min(o.h, o.h * {S} - o.pos) AS fp_h
  FROM win w JOIN posx o
    ON o.doc_id = w.doc_id AND o.pos >= w.p AND o.pos < w.p + {W}
  GROUP BY w.doc_id, w.p
), fph AS (
  SELECT DISTINCT doc_id, fp_h FROM sel
), ok AS (
  SELECT fp_h FROM fph GROUP BY fp_h
  HAVING count(*) >= 2 AND count(*) <= {dataprep.WINNOW_HOT_CAP}
)
SELECT x.doc_id AS a, y.doc_id AS b, count(*)::BIGINT AS n_shared
FROM fph x JOIN fph y ON x.fp_h = y.fp_h AND x.doc_id < y.doc_id
JOIN ok ON ok.fp_h = x.fp_h
GROUP BY x.doc_id, y.doc_id
ORDER BY n_shared DESC, a, b LIMIT {dataprep.WINNOW_SIM_K}"""


def _exsub_cte_prefix() -> str:
    """Shared toks → overlapping shingles → non-canonical duplicate
    positions prefix for the ExactSubstr family (dedup_exact_substr,
    docs_dup_span_strip, docs_novelty): shingles AS STRINGS (the
    pipeline's 128-bit polynomial hash stands in for string identity —
    the dedup_exact 2^-64 equivalence), keep-first by min packed id."""
    L = dataprep.EXSUB_L
    B = 1 << dataprep.EXSUB_IDX_BITS
    return rf"""WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS ws FROM documents
), sh AS (
  SELECT doc_id, i - 1 AS p, array_to_string(ws[i:i+{L}-1], ' ') AS g
  FROM toks, LATERAL (
    SELECT unnest(generate_series(1, len(ws) - {L} + 1)) AS i) s
), k AS (
  SELECT doc_id, p,
         count(*) OVER (PARTITION BY g) AS cnt,
         min(doc_id * {B} + p) OVER (PARTITION BY g) AS keep
  FROM sh
), dup AS (
  SELECT doc_id, p FROM k WHERE cnt > 1 AND doc_id * {B} + p <> keep
)"""


def _exsub_sql() -> str:
    """ExactSubstr duplicate spans: the shared dup-position prefix, then
    the same gaps-and-islands union per doc as the pipeline."""
    L = dataprep.EXSUB_L
    return rf"""{_exsub_cte_prefix()}, isl AS (
  SELECT doc_id, p,
         CASE WHEN p - lag(p) OVER (PARTITION BY doc_id ORDER BY p)
                  <= {L} THEN 0 ELSE 1 END AS brk
  FROM dup
), grp AS (
  SELECT doc_id, p,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY p
                        ROWS UNBOUNDED PRECEDING) AS island
  FROM isl
), spans AS (
  SELECT doc_id, island, max(p) - min(p) + {L} AS span
  FROM grp GROUP BY doc_id, island
)
SELECT doc_id, count(*)::BIGINT AS n_dup_spans,
       sum(span)::BIGINT AS dup_tokens
FROM spans GROUP BY doc_id ORDER BY doc_id"""


def _dup_span_strip_sql() -> str:
    """ExactSubstr APPLIED: per-doc island spans, token coverage test,
    survivors re-joined in order — the literal replay of
    docs_dup_span_strip's diff/cumsum mask."""
    L = dataprep.EXSUB_L
    return rf"""{_exsub_cte_prefix()}, isl AS (
  SELECT doc_id, p,
         CASE WHEN p - lag(p) OVER (PARTITION BY doc_id ORDER BY p)
                  <= {L} THEN 0 ELSE 1 END AS brk
  FROM dup
), grp AS (
  SELECT doc_id, p,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY p
                        ROWS UNBOUNDED PRECEDING) AS island
  FROM isl
), spans AS (
  SELECT doc_id, min(p) AS s, max(p) + {L} AS e
  FROM grp GROUP BY doc_id, island
), tok_rows AS (
  SELECT doc_id, i - 1 AS idx, ws[i] AS w
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(ws))) AS i) u
), covered AS (
  SELECT DISTINCT t.doc_id, t.idx
  FROM tok_rows t JOIN spans s
    ON t.doc_id = s.doc_id AND t.idx >= s.s AND t.idx < s.e
), agg AS (
  SELECT t.doc_id,
         count(*)::BIGINT AS n_tokens,
         sum(CASE WHEN c.idx IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
           AS n_removed,
         coalesce(string_agg(CASE WHEN c.idx IS NULL THEN t.w END,
                             ' ' ORDER BY t.idx), '') AS clean_text
  FROM tok_rows t LEFT JOIN covered c
    ON t.doc_id = c.doc_id AND t.idx = c.idx
  GROUP BY t.doc_id
)
SELECT d.doc_id, coalesce(a.n_tokens, 0)::BIGINT AS n_tokens,
       coalesce(a.n_removed, 0)::BIGINT AS n_removed,
       coalesce(a.clean_text, '') AS clean_text
FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
ORDER BY d.doc_id"""


def _novelty_sql() -> str:
    """Per-doc novel-window fraction (integer permille), from the shared
    dup-position prefix: window counts per doc minus non-canonical
    duplicate windows."""
    return rf"""{_exsub_cte_prefix()}, w AS (
  SELECT doc_id, count(*)::BIGINT AS n_windows FROM sh GROUP BY doc_id
), dw AS (
  SELECT doc_id, count(*)::BIGINT AS dup_windows FROM dup GROUP BY doc_id
)
SELECT w.doc_id, w.n_windows,
       coalesce(dw.dup_windows, 0)::BIGINT AS dup_windows,
       (1000 * (w.n_windows - coalesce(dw.dup_windows, 0))
        // w.n_windows)::BIGINT AS novelty_permille
FROM w LEFT JOIN dw USING (doc_id) ORDER BY w.doc_id"""


def _pack_sequences_sql() -> str:
    cap = dataprep.PACK_SEQ_TOKENS
    return rf"""WITH t AS (
  SELECT doc_id, len(regexp_extract_all(text, '\S+'))::BIGINT AS n_tok
  FROM documents
), s AS (
  SELECT doc_id, n_tok,
         coalesce(sum(n_tok) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS strt
  FROM t
)
SELECT strt // {cap} AS seq_id, count(*)::BIGINT AS n_docs,
       sum(n_tok)::BIGINT AS n_tokens
FROM s GROUP BY seq_id ORDER BY seq_id"""


def _corpus_export_counts_sql() -> str:
    """Per-shard row counts of the exported corpus: the corpus_prep
    survivor chain (same chained CTE) bucketed by the affine shuffle key's
    range partition — validates the written shard files end to end."""
    from .pipelines.export import EXPORT_SHARDS

    return f"""WITH cp AS ({_corpus_prep_sql()}),
k AS (
  SELECT doc_id,
         ((doc_id % {H.P}) * {H.SHUF_A} + {H.SHUF_B}) % {H.P} AS key
  FROM cp
)
SELECT (key * {EXPORT_SHARDS}) // {H.P} AS shard, count(*)::BIGINT AS cnt
FROM k GROUP BY shard ORDER BY shard"""


def _ann_lsh_sql(dim: int, k: int = 10) -> str:
    bucket = H.sql_lsh_bucket_expr("embedding", dim)
    qbucket = H.sql_lsh_bucket_expr("qv", dim)
    return f"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
b AS (SELECT vec_id, embedding, {bucket} AS bucket FROM embeddings),
qb AS (SELECT {qbucket} AS qbucket FROM q)
SELECT b.vec_id FROM b, q, qb
WHERE b.bucket = qb.qbucket
ORDER BY list_cosine_similarity(b.embedding, q.qv) DESC, b.vec_id
LIMIT {k}"""


def _ann_ivf_sql(sf_dir: str, k: int = 10) -> str:
    """IVF assignment + probe + search replayed in SQL. The trained
    centroids (seeded spherical k-means over the bounded head sample — the
    shared training step) are embedded as literals; assignment argmax skips
    normalization (positive per-row scale never changes an argmax)."""
    import numpy as np

    centroids = dataprep._train_centroids(sf_dir, dataprep.IVF_NLIST)
    q = dataprep._query_vector(sf_dir)
    qn = q / np.linalg.norm(q)
    probed = np.argsort(-(centroids @ qn))[:dataprep.IVF_NPROBE]
    cents = "[" + ", ".join(H.sql_float_list(c) for c in centroids) + "]"
    probed_sql = ", ".join(str(int(x)) for x in sorted(probed))
    return f"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
d AS (
  SELECT vec_id, embedding,
         list_transform({cents}, ct ->
           list_inner_product(list_transform(embedding, x -> x::DOUBLE), ct))
           AS dots
  FROM embeddings
), asg AS (
  SELECT vec_id, embedding,
         list_position(dots, list_max(dots)) - 1 AS ivf_list
  FROM d
)
SELECT asg.vec_id FROM asg, q
WHERE ivf_list IN ({probed_sql})
ORDER BY list_cosine_similarity(asg.embedding, q.qv) DESC, asg.vec_id
LIMIT {k}"""


def _embed_neardup_sql(dim: int) -> str:
    bucket = H.sql_emb_nd_bucket_expr("embedding", dim)
    return f"""WITH b AS (
  SELECT vec_id, embedding, {bucket} AS bucket FROM embeddings
), dom AS (
  SELECT DISTINCT y.vec_id
  FROM b x JOIN b y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
  WHERE list_cosine_similarity(x.embedding, y.embedding)
        > {dataprep.EMBED_NEARDUP_THRESHOLD!r}
)
SELECT vec_id FROM embeddings
WHERE vec_id NOT IN (SELECT vec_id FROM dom)"""


def _gopher_filter_sql() -> str:
    """Gopher composite rules replayed literally — every threshold is an
    integer cross-multiplication (generated from the dataprep constants),
    and both engines count with RE2, so each rule is bit-exact."""
    d = dataprep
    hits = " + ".join(
        rf"(CASE WHEN len(regexp_extract_all(lower(text), '\b{w}\b')) > 0 "
        "THEN 1 ELSE 0 END)"
        for w in d.GOPHER_STOPWORDS
    )
    return rf"""WITH q AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '{d.TOKEN_PATTERN}'))::BIGINT AS nw,
         (length(text)
          - len(regexp_extract_all(text, '{d._WS_CHAR_PATTERN}')))::BIGINT
           AS wc,
         (len(regexp_extract_all(text, '#'))
          + len(regexp_extract_all(text, '\.\.\.')))::BIGINT AS n_sym,
         len(regexp_extract_all(text, '[^\s]*[A-Za-z][^\s]*'))::BIGINT
           AS n_alpha,
         ({hits})::BIGINT AS stop_hits
  FROM documents
)
SELECT doc_id FROM q
WHERE nw >= {d.GOPHER_MIN_WORDS} AND nw <= {d.GOPHER_MAX_WORDS}
  AND wc >= {d.GOPHER_MIN_MEAN_WORD_LEN} * nw
  AND wc <= {d.GOPHER_MAX_MEAN_WORD_LEN} * nw
  AND n_sym * 100 < {d.GOPHER_MAX_SYMBOL_RATIO_PCT} * nw
  AND n_alpha * 100 >= {d.GOPHER_MIN_ALPHA_WORD_PCT} * nw
  AND stop_hits >= {d.GOPHER_MIN_STOPWORD_HITS}"""


def _select_budget_sql() -> str:
    """Token-budget selection replayed literally: same integer fixed-point
    stop-ratio score (generated from the shared TOKEN/STOPWORDS patterns +
    SELECT_SCORE_SCALE), same (score DESC, doc_id) rank, same inclusive
    cumulative-tokens <= total//SELECT_BUDGET_DEN cut — all-integer, so the
    prefix boundary is exact on both sides."""
    scale = dataprep.SELECT_SCORE_SCALE
    den = dataprep.SELECT_BUDGET_DEN
    tok = dataprep.TOKEN_PATTERN
    stop = dataprep.STOPWORDS_PATTERN
    return f"""WITH q AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '{tok}'))::BIGINT AS n_tok,
         (len(regexp_extract_all(lower(text), '{stop}'))::BIGINT * {scale})
           // greatest(len(regexp_extract_all(text, '{tok}'))::BIGINT, 1)
           AS score
  FROM documents
), tot AS (SELECT CAST(sum(n_tok) AS BIGINT) // {den} AS budget FROM q),
w AS (
  SELECT doc_id, n_tok,
         CAST(sum(n_tok) OVER (ORDER BY score DESC, doc_id
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tok
  FROM q
)
SELECT w.doc_id, w.n_tok, w.cum_tok
FROM w, tot WHERE w.cum_tok <= tot.budget"""


def _semdedup_sql(sf_dir: str) -> str:
    """SemDeDup replayed in SQL: the seeded k-means centroids (shared
    bounded-sample training step, as for IVF) become literals; assignment
    argmax skips normalization (positive per-row scale never changes an
    argmax — same rule as _ann_ivf_sql); in-cluster near-dup is the
    all-pairs smaller-id join."""
    centroids = dataprep._train_centroids(sf_dir, dataprep.SEMDEDUP_NLIST)
    cents = "[" + ", ".join(H.sql_float_list(c) for c in centroids) + "]"
    return f"""WITH d AS (
  SELECT vec_id, embedding,
         list_transform({cents}, ct ->
           list_inner_product(list_transform(embedding, x -> x::DOUBLE), ct))
           AS dots
  FROM embeddings
), asg AS (
  SELECT vec_id, embedding,
         list_position(dots, list_max(dots)) - 1 AS cluster
  FROM d
), dom AS (
  -- cosine in float64 on BOTH sides (the pipeline computes in normalized
  -- float64; raw FLOAT lists would add ~1e-7 float32 noise against the
  -- threshold margin)
  SELECT DISTINCT y.vec_id
  FROM asg x JOIN asg y ON x.cluster = y.cluster AND x.vec_id < y.vec_id
  WHERE list_cosine_similarity(
          list_transform(x.embedding, v -> v::DOUBLE),
          list_transform(y.embedding, v -> v::DOUBLE))
        > {dataprep.SEMDEDUP_THRESHOLD!r}
)
SELECT vec_id FROM embeddings
WHERE vec_id NOT IN (SELECT vec_id FROM dom)"""


def _tfidf_topk_sql() -> str:
    """TF-IDF replayed literally: same top-V-by-df vocabulary (df desc,
    word asc), same integer fixed-point idf (N << SHIFT) // df, same
    per-doc rank (score desc, term asc) — all-integer scores, so no libm
    log on either side."""
    v = dataprep.TFIDF_VOCAB_TOP
    shift = 1 << dataprep.TFIDF_FP_SHIFT
    k = dataprep.TFIDF_K
    return rf"""WITH w AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) AS word
  FROM documents
), dfc AS (
  SELECT word, count(DISTINCT doc_id)::BIGINT AS df FROM w GROUP BY word
), n AS (SELECT count(*)::BIGINT AS n FROM documents),
voc AS (
  SELECT word, (n.n * {shift}) // df AS idf_fp
  FROM dfc, n ORDER BY df DESC, word LIMIT {v}
), tf AS (
  SELECT doc_id, word, count(*)::BIGINT AS tf FROM w GROUP BY doc_id, word
), sc AS (
  SELECT tf.doc_id, tf.word AS term, tf.tf, tf.tf * v.idf_fp AS score,
         row_number() OVER (PARTITION BY tf.doc_id
                            ORDER BY tf.tf * v.idf_fp DESC, tf.word) AS rn
  FROM tf JOIN voc v ON tf.word = v.word
)
SELECT doc_id, term, tf, score FROM sc WHERE rn <= {k}
ORDER BY doc_id, term"""


def _distinct_hll_sql() -> str:
    """HLL registers replayed literally: same poly-hash, same bucket/rank
    split, floor-log2 via length(bin(q)) - 1 (bit-exact vs the pipeline's
    frexp kernel)."""
    m = dataprep.HLL_BUCKETS
    rb = dataprep.HLL_REM_BITS
    return rf"""WITH w AS (
  SELECT DISTINCT unnest(regexp_extract_all(lower(text), '\S+')) AS word
  FROM documents
), h AS (SELECT {H.sql_poly_hash('word')} AS h FROM w),
r AS (SELECT h % {m} AS bucket, h // {m} AS rem FROM h)
SELECT bucket::BIGINT AS bucket,
       max(CASE WHEN rem = 0 THEN {rb + 1}
                ELSE {rb} - (length(bin(rem)) - 1) END)::BIGINT AS rho
FROM r GROUP BY bucket ORDER BY bucket"""


def _source_distinct_hll_sql() -> str:
    """Per-source HLL registers replayed literally (same poly-hash, same
    bucket/rank split as the global sketch, group keyed by source)."""
    m = dataprep.HLLG_BUCKETS
    rb = dataprep.HLLG_REM_BITS
    return rf"""WITH t AS (
  SELECT source, unnest(regexp_extract_all(lower(text), '\S+')) AS word
  FROM documents
), w AS (SELECT DISTINCT source, word FROM t),
h AS (SELECT source, {H.sql_poly_hash('word')} AS h FROM w),
r AS (SELECT source, h % {m} AS bucket, h // {m} AS rem FROM h)
SELECT source, bucket::BIGINT AS bucket,
       max(CASE WHEN rem = 0 THEN {rb + 1}
                ELSE {rb} - (length(bin(rem)) - 1) END)::BIGINT AS rho
FROM r GROUP BY 1, 2 ORDER BY 1, 2"""


def _decontaminate_bloom_sql() -> str:
    """The same two-position bloom replayed: positions built from the
    benchmark grams, corpus doc contaminated iff ANY gram finds BOTH its
    positions set (false positives and all)."""
    mx = dataprep.DECONTAM_BENCH_MAX_ID
    M, P = dataprep.BLOOM_M, H.P
    A, B = H.SAMPLE_A, H.SAMPLE_B
    return f"""WITH {H.sql_gram_hashes_cte()}, bg AS (
  SELECT DISTINCT unnest(hs) AS g FROM gh WHERE doc_id < {mx}
), pos AS (
  SELECT DISTINCT p FROM (
    SELECT g % {M} AS p FROM bg
    UNION ALL
    SELECT ((g * {A} + {B}) % {P}) % {M} AS p FROM bg
  )
), cg AS (
  SELECT doc_id, unnest(hs) AS g FROM gh WHERE doc_id >= {mx}
), hit AS (
  SELECT DISTINCT cg.doc_id
  FROM cg
  JOIN pos a ON a.p = cg.g % {M}
  JOIN pos b ON b.p = ((cg.g * {A} + {B}) % {P}) % {M}
)
SELECT doc_id FROM gh
WHERE doc_id >= {mx} AND doc_id NOT IN (SELECT doc_id FROM hit)"""


def _multimodal_image_stats_sql() -> str:
    """The deterministic image law (stages/multimodal.py SYNTH_* — the
    parity source) replayed in SQL: per-doc header fields from the same
    modular arithmetic, px_sum via a lateral generate-series over the
    pixel index — so the oracle checks the DECODED stats, exercising the
    actor-pool decode stage end to end. All-integer."""
    from .stages import multimodal as MM

    return f"""WITH p AS (
  SELECT doc_id,
         ({MM.SYNTH_H_BASE} + doc_id % {MM.SYNTH_H_MOD})::BIGINT AS height,
         ({MM.SYNTH_W_BASE} + doc_id % {MM.SYNTH_W_MOD})::BIGINT AS width,
         (1 + doc_id % {MM.SYNTH_C_MOD})::BIGINT AS channels,
         (doc_id * {MM.SYNTH_PX_A}) % 256 AS base,
         1 + doc_id % {MM.SYNTH_STEP_MOD} AS step
  FROM documents
)
SELECT p.doc_id, p.height, p.width, p.channels,
       (p.height * p.width * p.channels)::BIGINT AS n_px,
       sum((p.base + g.i * p.step) % 256)::BIGINT AS px_sum
FROM p CROSS JOIN LATERAL (
  SELECT unnest(range(0, p.height * p.width * p.channels)) AS i
) g
GROUP BY p.doc_id, p.height, p.width, p.channels
ORDER BY p.doc_id"""


def _multimodal_audio_stats_sql() -> str:
    """The deterministic audio law (stages/multimodal.py AUD_* — the parity
    source) replayed in SQL: per-doc header fields from the same modular
    arithmetic, sum/energy via a lateral generate-series over the sample
    index — so the oracle checks the DECODED stats. All-integer."""
    from .stages import multimodal as MM

    return f"""WITH p AS (
  SELECT doc_id,
         ({MM.AUD_RATE_BASE} + (doc_id % {MM.AUD_RATE_MOD})
            * {MM.AUD_RATE_STEP})::BIGINT AS sample_rate,
         ({MM.AUD_N_BASE} + doc_id % {MM.AUD_N_MOD})::BIGINT AS n_samples,
         doc_id * {MM.SYNTH_PX_A} AS base,
         1 + doc_id % {MM.SYNTH_STEP_MOD} AS step
  FROM documents
)
SELECT p.doc_id, p.sample_rate, p.n_samples,
       sum((p.base + g.i * p.step) % 65536 - 32768)::BIGINT AS s_sum,
       sum(((p.base + g.i * p.step) % 65536 - 32768)
           * ((p.base + g.i * p.step) % 65536 - 32768))::BIGINT AS s_sqsum
FROM p CROSS JOIN LATERAL (
  SELECT unnest(range(0, p.n_samples)) AS i
) g
GROUP BY p.doc_id, p.sample_rate, p.n_samples
ORDER BY p.doc_id"""


def _kmv_distinct_sql() -> str:
    """KMV sketch replayed literally: same poly-hash, DISTINCT (source, h),
    bottom-k via row_number(), same integer estimate (k−1)·P // h_(k) with
    the exact-count-below-k rule."""
    k, p = dataprep.KMV_K, H.P
    return rf"""WITH wd AS (
  SELECT source, unnest(regexp_extract_all(lower(text), '\S+')) AS word
  FROM documents
), w AS (
  SELECT DISTINCT source, {H.sql_poly_hash('word')} AS h FROM wd
), r AS (
  SELECT source, h,
         row_number() OVER (PARTITION BY source ORDER BY h) AS rk
  FROM w
), b AS (
  SELECT source, h FROM r WHERE rk <= {k}
)
SELECT source, count(*)::BIGINT AS n_bottom, max(h)::BIGINT AS kth_h,
       (CASE WHEN count(*) < {k} THEN count(*)
             ELSE ({k} - 1) * {p} // max(h) END)::BIGINT AS est_distinct
FROM b GROUP BY source ORDER BY source"""


def _value_linfit_sql() -> str:
    """OLS sufficient statistics + slope/intercept replayed literally:
    same integer x/y quantization, HUGEINT numerator/denominator (the
    pipeline folds Python ints for the same overflow-safety), then the
    identical float expression tree — bit-stable."""
    from .pipelines import events as E

    e0, xb, ys = E.LINFIT_EPOCH0, E.LINFIT_X_BUCKET_S, E.LINFIT_Y_SCALE
    return f"""WITH s AS (
  SELECT event_type,
         (epoch_us(ts) // 1000000 - {e0}) // {xb} AS x,
         floor(value * {ys})::BIGINT AS y
  FROM events
), a AS (
  SELECT event_type, count(*)::BIGINT AS n,
         sum(x)::BIGINT AS sum_x, sum(y)::BIGINT AS sum_y,
         sum(x * y)::BIGINT AS sum_xy, sum(x * x)::BIGINT AS sum_x2
  FROM s GROUP BY event_type
), f AS (
  SELECT *, (n::HUGEINT * sum_xy - sum_x::HUGEINT * sum_y) AS num,
         (n::HUGEINT * sum_x2 - sum_x::HUGEINT * sum_x) AS den
  FROM a
)
SELECT event_type, n, sum_x, sum_y, sum_xy, sum_x2,
       CASE WHEN den = 0 THEN NULL
            ELSE num::DOUBLE / den::DOUBLE END AS slope,
       CASE WHEN den = 0 THEN NULL
            ELSE (sum_y::DOUBLE - (num::DOUBLE / den::DOUBLE)
                  * sum_x::DOUBLE) / n::DOUBLE END AS intercept
FROM f ORDER BY event_type"""


def _value_corr_sql() -> str:
    """Pearson r replayed: same integer sufficient statistics (plus Σy²),
    HUGEINT numerator/variances, identical float expression tree (sqrt is
    IEEE correctly-rounded in both engines)."""
    from .pipelines import events as E

    e0, xb, ys = E.LINFIT_EPOCH0, E.LINFIT_X_BUCKET_S, E.LINFIT_Y_SCALE
    return f"""WITH s AS (
  SELECT event_type,
         (epoch_us(ts) // 1000000 - {e0}) // {xb} AS x,
         floor(value * {ys})::BIGINT AS y
  FROM events
), a AS (
  SELECT event_type, count(*)::BIGINT AS n,
         sum(x)::BIGINT AS sum_x, sum(y)::BIGINT AS sum_y,
         sum(x * y)::BIGINT AS sum_xy, sum(x * x)::BIGINT AS sum_x2,
         sum(y * y)::BIGINT AS sum_y2
  FROM s GROUP BY event_type
), f AS (
  SELECT *, (n::HUGEINT * sum_xy - sum_x::HUGEINT * sum_y) AS num,
         (n::HUGEINT * sum_x2 - sum_x::HUGEINT * sum_x) AS dx,
         (n::HUGEINT * sum_y2 - sum_y::HUGEINT * sum_y) AS dy
  FROM a
)
SELECT event_type, n, sum_x, sum_y, sum_xy, sum_x2, sum_y2,
       CASE WHEN dx = 0 OR dy = 0 THEN NULL
            ELSE num::DOUBLE / (sqrt(dx::DOUBLE) * sqrt(dy::DOUBLE))
       END AS corr
FROM f ORDER BY event_type"""


def _pmi_topk_sql() -> str:
    """PMI collocations replayed literally: same top-V unigram vocab, same
    in-vocab adjacent-pair counts and support floor, HUGEINT fixed-point
    ratio (the pipeline uses Python ints for the same overflow safety),
    same (pmi desc, cnt desc, a, b) order."""
    v = dataprep.LM_VOCAB_TOP
    s, mc, k = dataprep.PMI_SCALE, dataprep.PMI_MIN_COUNT, dataprep.PMI_TOP_K
    return rf"""WITH tt AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS ws FROM documents
), w AS (
  SELECT doc_id, unnest(ws) AS word, generate_subscripts(ws, 1) AS widx
  FROM tt
), cnt AS (
  SELECT word, count(*)::BIGINT AS c FROM w GROUP BY word
), tot AS (
  SELECT sum(c)::BIGINT AS t FROM cnt
), voc AS (
  SELECT word, c FROM cnt ORDER BY c DESC, word LIMIT {v}
), pr0 AS (
  SELECT doc_id, lag(word) OVER (PARTITION BY doc_id ORDER BY widx) AS a,
         word AS b
  FROM w
), pr AS (
  SELECT * FROM pr0 WHERE a IS NOT NULL
), bgc AS (
  SELECT pr.a, pr.b, count(*)::BIGINT AS c
  FROM pr JOIN voc va ON pr.a = va.word JOIN voc vb ON pr.b = vb.word
  GROUP BY pr.a, pr.b
), f AS (
  SELECT a, b, c FROM bgc WHERE c >= {mc}
), p AS (
  SELECT f.a, f.b, f.c AS cnt,
         ({s}::HUGEINT * f.c * t.t) // (va.c::HUGEINT * vb.c) AS pmi_fp
  FROM f CROSS JOIN tot t
  JOIN voc va ON f.a = va.word JOIN voc vb ON f.b = vb.word
)
SELECT a, b, cnt, pmi_fp::BIGINT AS pmi_fp FROM p
ORDER BY pmi_fp DESC, cnt DESC, a, b LIMIT {k}"""


def _kmeans_sql(sf_dir: str) -> str:
    """Lloyd's k-means replayed iteration by iteration: same shifted
    fixed-point quantization (non-negative so DuckDB's truncating // and
    Python's flooring // agree), same seed rule (K smallest vec_ids), same
    exact int64 distances with ties to the lowest cluster, same floor-mean
    updates with empty clusters keeping their centroid."""
    k, s = dataprep.KM_K, dataprep.CENTROID_SCALE
    dim = dataprep._embedding_dim(sf_dir)
    iters = []
    for t in range(1, dataprep.KM_ITERS + 1):
        prev = f"c{t - 1}"
        iters.append(f"""a{t} AS (
  SELECT vec_id, qv, cluster FROM (
    SELECT d.*, row_number() OVER (PARTITION BY vec_id
             ORDER BY d2, cluster) AS rk
    FROM (
      SELECT q.vec_id, q.qv, c.cluster,
             list_sum(list_transform(range(1, {dim + 1}),
               i -> (q.qv[i] - c.cv[i]) * (q.qv[i] - c.cv[i]))) AS d2
      FROM q CROSS JOIN {prev} c) d)
  WHERE rk = 1
), s{t} AS (
  SELECT a.cluster, g.i AS dim_i, count(*)::BIGINT AS n,
         sum(a.qv[g.i])::BIGINT AS sq
  FROM a{t} a CROSS JOIN LATERAL (
    SELECT unnest(range(1, {dim + 1})) AS i
  ) g
  GROUP BY a.cluster, g.i
), m{t} AS (
  SELECT cluster, max(n) AS n, list(sq // n ORDER BY dim_i) AS cv
  FROM s{t} GROUP BY cluster
), c{t} AS (
  SELECT p.cluster, coalesce(m.cv, p.cv) AS cv
  FROM {prev} p LEFT JOIN m{t} m ON p.cluster = m.cluster
)""")
        last = t
    chain = ",\n".join(iters)
    return f"""WITH q AS (
  SELECT vec_id, list_transform(embedding,
           x -> floor(x::DOUBLE * {s})::BIGINT + {s}) AS qv
  FROM embeddings
), c0 AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster, qv AS cv
  FROM q ORDER BY vec_id LIMIT {k}
),
{chain}
SELECT c.cluster, coalesce(m.n, 0)::BIGINT AS n,
       (g.i - 1)::BIGINT AS dim_idx, (c.cv[g.i] - {s})::BIGINT AS c_fp
FROM c{last} c LEFT JOIN m{last} m ON c.cluster = m.cluster
CROSS JOIN LATERAL (SELECT unnest(range(1, {dim + 1})) AS i) g
ORDER BY c.cluster, dim_idx"""


def _kcenter_sql(sf_dir: str) -> str:
    """Greedy k-center replayed selection by selection: same shifted
    fixed-point quantization, same seed rule (smallest vec_id, cover_d2 0),
    same exact int64 min-distance to the selected set, same argmax rule
    (d2 DESC, vec_id ASC) with already-selected ids excluded."""
    k, s = dataprep.KC_K, dataprep.CENTROID_SCALE
    dim = dataprep._embedding_dim(sf_dir)
    iters = []
    for t in range(1, k):
        prev = f"s{t - 1}"
        iters.append(f"""d{t} AS (
  SELECT q.vec_id,
         min(list_sum(list_transform(range(1, {dim + 1}),
           i -> (q.qv[i] - c.qv[i]) * (q.qv[i] - c.qv[i])))) AS md
  FROM q CROSS JOIN (
    SELECT q2.qv FROM q q2 JOIN {prev} sel ON q2.vec_id = sel.vec_id) c
  WHERE q.vec_id NOT IN (SELECT vec_id FROM {prev})
  GROUP BY q.vec_id
), n{t} AS (
  SELECT {t}::BIGINT AS sel_idx, vec_id, md::BIGINT AS cover_d2
  FROM d{t} ORDER BY md DESC, vec_id LIMIT 1
), s{t} AS (
  SELECT * FROM {prev} UNION ALL SELECT * FROM n{t}
)""")
        last = t
    chain = ",\n".join(iters)
    return f"""WITH q AS (
  SELECT vec_id, list_transform(embedding,
           x -> floor(x::DOUBLE * {s})::BIGINT + {s}) AS qv
  FROM embeddings
), s0 AS (
  SELECT 0::BIGINT AS sel_idx, vec_id, 0::BIGINT AS cover_d2
  FROM q ORDER BY vec_id LIMIT 1
),
{chain}
SELECT sel_idx, vec_id, cover_d2 FROM s{last} ORDER BY sel_idx"""


def _char_entropy_sql() -> str:
    """Character entropy replayed literally: per-(doc, codepoint) counts via
    1-based char indexing + unicode(), same integer floor-log2 bits."""
    return """WITH c AS (
  SELECT doc_id, unicode(text[g.i]) AS cp, length(text) AS n
  FROM documents CROSS JOIN LATERAL (
    SELECT unnest(range(1, length(text) + 1)) AS i
  ) g
), cnt AS (
  SELECT doc_id, any_value(n) AS n, cp, count(*)::BIGINT AS c
  FROM c GROUP BY doc_id, cp
)
SELECT doc_id, any_value(n)::BIGINT AS n_chars,
       count(*)::BIGINT AS distinct_chars,
       sum(c * (length(bin(n // c)) - 1))::BIGINT AS sum_bits,
       sum(c * (length(bin(n // c)) - 1))::DOUBLE / any_value(n) AS avg_bits
FROM cnt GROUP BY doc_id"""


def _late_arrivals_sql() -> str:
    """Watermark semantics replayed with a window function: the same
    affine-hash straggler-delay arrival model, prev_max = max(event time)
    over arrival order excluding the current row; late ⇔ window_end ≤
    prev_max − allowed_lateness."""
    from .pipelines import events as E

    w = E.LATE_WINDOW_S * 1_000_000
    a = E.LATE_ALLOWED_S * 1_000_000
    d = E.LATE_STRAGGLER_DELAY_S * 1_000_000
    return f"""WITH k AS (
  SELECT ts, event_id,
         epoch_us(ts) + CASE WHEN ((event_id % {H.P}) * {H.SHUF_A}
                                   + {H.SHUF_B}) % {H.P}
                                  % {E.LATE_STRAGGLER_MOD} = 0
                             THEN {d} ELSE 0 END AS arrival_key
  FROM events
), m AS (
  SELECT ts, max(epoch_us(ts)) OVER (ORDER BY arrival_key, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
  FROM k
), c AS (
  SELECT {oracle.bucket_expr(E.LATE_WINDOW_S)} AS bucket_ts,
         CASE WHEN prev_max IS NOT NULL
               AND (epoch_us(ts) // {w}) * {w} + {w} <= prev_max - {a}
              THEN 1 ELSE 0 END AS late
  FROM m
)
SELECT bucket_ts, sum(1 - late)::BIGINT AS on_time, sum(late)::BIGINT AS late
FROM c GROUP BY bucket_ts ORDER BY bucket_ts"""


def _multimodal_video_frames_sql() -> str:
    """The deterministic video law (stages/multimodal.py VID_* — the parity
    source) replayed in SQL: sampled frame indices via range(0, n, k), per
    frame a lateral generate-series over the pixel index inside that
    frame's slice of the flat buffer — so BOTH decode hops (frame sample →
    image stats) are correctness-gated. All-integer."""
    from .stages import multimodal as MM

    return f"""WITH p AS (
  SELECT doc_id,
         ({MM.VID_N_BASE} + doc_id % {MM.VID_N_MOD})::BIGINT AS n_frames,
         ({MM.VID_H_BASE} + doc_id % {MM.VID_H_MOD})::BIGINT AS height,
         ({MM.VID_W_BASE} + doc_id % {MM.VID_W_MOD})::BIGINT AS width,
         (doc_id * {MM.SYNTH_PX_A}) % 256 AS base,
         1 + doc_id % {MM.SYNTH_STEP_MOD} AS step
  FROM documents
), f AS (
  SELECT p.*, g.frame_idx
  FROM p CROSS JOIN LATERAL (
    SELECT unnest(range(0, p.n_frames, {MM.VID_SAMPLE_K})) AS frame_idx
  ) g
)
SELECT f.doc_id, f.frame_idx::BIGINT AS frame_idx, f.height, f.width,
       1::BIGINT AS channels, (f.height * f.width)::BIGINT AS n_px,
       sum((f.base + (f.frame_idx * f.height * f.width + j.i) * f.step)
           % 256)::BIGINT AS px_sum
FROM f CROSS JOIN LATERAL (
  SELECT unnest(range(0, f.height * f.width)) AS i
) j
GROUP BY f.doc_id, f.frame_idx, f.height, f.width
ORDER BY f.doc_id, f.frame_idx"""


def _bigram_surprisal_sql() -> str:
    """Conditional bigram surprisal replayed literally: same top-V unigram
    vocab (count desc, word asc), same top-B in-vocab bigram table (count
    desc, a, b), same integer floor-log2 via length(bin(q)) - 1 — bit-exact
    against the pipeline's frexp kernel. Pairs come from a lag() window
    over regexp_extract_all positions, the SQL twin of the kernel's
    flat-adjacency derivation."""
    v = dataprep.LM_VOCAB_TOP
    b = dataprep.BG_VOCAB_TOP
    return rf"""WITH tt AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS ws FROM documents
), w AS (
  SELECT doc_id, unnest(ws) AS word, generate_subscripts(ws, 1) AS widx
  FROM tt
), cnt AS (
  SELECT word, count(*)::BIGINT AS c FROM w GROUP BY word
), tot AS (
  SELECT sum(c)::BIGINT AS t FROM cnt
), voc AS (
  SELECT word, c FROM cnt ORDER BY c DESC, word LIMIT {v}
), pr0 AS (
  SELECT doc_id, lag(word) OVER (PARTITION BY doc_id ORDER BY widx) AS a,
         word AS b
  FROM w
), pr AS (
  SELECT * FROM pr0 WHERE a IS NOT NULL
), bgc AS (
  SELECT pr.a, pr.b, count(*)::BIGINT AS c
  FROM pr JOIN voc va ON pr.a = va.word JOIN voc vb ON pr.b = vb.word
  GROUP BY pr.a, pr.b
), bg AS (
  SELECT a, b, c FROM bgc ORDER BY c DESC, a, b LIMIT {b}
), sc AS (
  SELECT pr.doc_id, bg.a IS NULL AS backoff,
         length(bin(CASE WHEN va.word IS NULL THEN tot.t
                         WHEN bg.a IS NULL THEN va.c
                         ELSE va.c // bg.c END)) - 1 AS bits
  FROM pr CROSS JOIN tot
  LEFT JOIN voc va ON pr.a = va.word
  LEFT JOIN bg ON pr.a = bg.a AND pr.b = bg.b
)
SELECT doc_id, count(*)::BIGINT AS n_pairs,
       sum(CASE WHEN backoff THEN 1 ELSE 0 END)::BIGINT AS n_backoff,
       sum(bits)::BIGINT AS sum_bits,
       sum(bits)::DOUBLE / count(*) AS avg_bits
FROM sc GROUP BY doc_id"""


def _tool_pagerank_sql(glob: str) -> str:
    """Fixed-point PageRank replayed as PR_ITERS chained CTEs over the same
    transition-count edge table: same floor divisions, HUGEINT products
    (rank·weight overflows BIGINT at realistic edge counts — the pipeline
    uses Python ints for the same reason)."""
    from .pipelines import windows as W

    s, num, den = W.PR_SCALE, W.PR_DAMP_NUM, W.PR_DAMP_DEN
    iters = []
    for k in range(1, W.PR_ITERS + 1):
        prev = f"r{k - 1}"
        iters.append(f"""r{k} AS (
  SELECT nd.tool,
         ((({den} - {num})::HUGEINT * {s}) // ({den} * nn.n))
         + ({num} * (coalesce(c.contrib, 0) + d.dang // nn.n)) // {den}
           AS rank
  FROM nd CROSS JOIN nn
  CROSS JOIN (
    SELECT coalesce(sum(r.rank), 0)::HUGEINT AS dang
    FROM {prev} r JOIN deg ON deg.tool = r.tool WHERE deg.w = 0
  ) d
  LEFT JOIN (
    SELECT e.dst AS tool, sum((r.rank * e.w) // deg.w) AS contrib
    FROM e JOIN {prev} r ON e.src = r.tool
    JOIN deg ON deg.tool = e.src
    GROUP BY e.dst
  ) c ON c.tool = nd.tool
)""")
    chain = ",\n".join(iters)
    return f"""WITH t AS (
  SELECT conv_id, tool,
         lag(tool) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev
  FROM read_parquet('{glob}')
), e AS (
  SELECT prev AS src, tool AS dst, count(*)::HUGEINT AS w
  FROM t WHERE prev IS NOT NULL GROUP BY 1, 2
), nd AS (
  SELECT src AS tool FROM e UNION SELECT dst FROM e
), nn AS (
  SELECT count(*)::HUGEINT AS n FROM nd
), deg AS (
  SELECT nd.tool, coalesce(sum(e.w), 0)::HUGEINT AS w
  FROM nd LEFT JOIN e ON e.src = nd.tool GROUP BY nd.tool
), r0 AS (
  SELECT nd.tool, ({s}::HUGEINT // nn.n) AS rank FROM nd CROSS JOIN nn
),
{chain}
SELECT tool, rank::BIGINT AS rank FROM r{W.PR_ITERS} ORDER BY tool"""


def _tool_hits_sql(glob: str) -> str:
    """HITS replayed as chained HUGEINT CTEs over the same transition-count
    edge table: authority then hub per iteration, each half-step
    floor-renormalized to HITS_SCALE — the same exact integer rule the
    pipeline's Python-int loop applies."""
    from .pipelines import windows as W

    s = W.HITS_SCALE
    steps = []
    prev_h = "h0"
    for t in range(1, W.HITS_ITERS + 1):
        steps.append(f"""a{t}raw AS (
  SELECT nd.tool, coalesce(sum(x.wv), 0)::HUGEINT AS v
  FROM nd LEFT JOIN (
    SELECT e.dst AS tool, e.w * h.v AS wv
    FROM e JOIN {prev_h} h ON e.src = h.tool
  ) x ON x.tool = nd.tool GROUP BY nd.tool
), a{t} AS (
  SELECT r.tool, CASE WHEN m.m > 0 THEN r.v * {s} // m.m ELSE r.v END AS v
  FROM a{t}raw r CROSS JOIN (SELECT max(v) AS m FROM a{t}raw) m
), h{t}raw AS (
  SELECT nd.tool, coalesce(sum(x.wv), 0)::HUGEINT AS v
  FROM nd LEFT JOIN (
    SELECT e.src AS tool, e.w * a.v AS wv
    FROM e JOIN a{t} a ON e.dst = a.tool
  ) x ON x.tool = nd.tool GROUP BY nd.tool
), h{t} AS (
  SELECT r.tool, CASE WHEN m.m > 0 THEN r.v * {s} // m.m ELSE r.v END AS v
  FROM h{t}raw r CROSS JOIN (SELECT max(v) AS m FROM h{t}raw) m
)""")
        prev_h = f"h{t}"
    chain = ",\n".join(steps)
    it = W.HITS_ITERS
    return f"""WITH t AS (
  SELECT conv_id, tool,
         lag(tool) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev
  FROM read_parquet('{glob}')
), e AS (
  SELECT prev AS src, tool AS dst, count(*)::HUGEINT AS w
  FROM t WHERE prev IS NOT NULL GROUP BY 1, 2
), nd AS (
  SELECT src AS tool FROM e UNION SELECT dst FROM e
), h0 AS (
  SELECT tool, {s}::HUGEINT AS v FROM nd
),
{chain}
SELECT nd.tool, h{it}.v::BIGINT AS hub, a{it}.v::BIGINT AS authority
FROM nd JOIN h{it} ON nd.tool = h{it}.tool
JOIN a{it} ON nd.tool = a{it}.tool
ORDER BY nd.tool"""


def _line_dedup_sql() -> str:
    """Line dedup replayed literally on line STRINGS: min packed
    (doc_id << LINE_IDX_BITS | idx) per distinct line, kept-per-doc counts,
    left join for all-lines-duplicated docs. Equivalent to the pipeline's
    128-bit line-hash grouping modulo the usual collision odds."""
    mod = 1 << dataprep.LINE_IDX_BITS
    return """WITH t AS (
  SELECT doc_id, str_split(text, chr(10)) AS ls FROM documents
), l AS (
  SELECT doc_id, unnest(ls) AS line, generate_subscripts(ls, 1) - 1 AS idx
  FROM t
), m AS (
  SELECT min(doc_id * {mod} + idx) AS keep FROM l GROUP BY line
), k AS (
  SELECT keep // {mod} AS doc_id, count(*)::BIGINT AS n_kept
  FROM m GROUP BY 1
)
SELECT t.doc_id, len(t.ls)::BIGINT AS n_lines,
       coalesce(k.n_kept, 0)::BIGINT AS n_kept
FROM t LEFT JOIN k ON t.doc_id = k.doc_id
ORDER BY t.doc_id""".format(mod=mod)


def _minhash_sim_topk_sql() -> str:
    """MinHash similarity top-k replayed from the shared signature CTE:
    candidates = band-bucket collisions, n_match = equal signature slots,
    deterministic total order (n_match DESC, a, b)."""
    k = dataprep.MINHASH_SIM_K
    return f"""WITH {H.sql_minhash_bands_cte()}, cand AS (
  SELECT DISTINCT b1.doc_id AS a, b2.doc_id AS b
  FROM bands b1 JOIN bands b2
    ON b1.band = b2.band AND b1.band_hash = b2.band_hash
   AND b1.doc_id < b2.doc_id
)
SELECT c.a, c.b,
       list_sum(list_transform(range(1, {H.MH_NUM_PERM + 1}),
         i -> CASE WHEN sa.sig[i] = sb.sig[i] THEN 1 ELSE 0 END))::BIGINT
         AS n_match
FROM cand c
JOIN sig_t sa ON sa.doc_id = c.a
JOIN sig_t sb ON sb.doc_id = c.b
ORDER BY n_match DESC, c.a, c.b LIMIT {k}"""


def _contamination_overlap_sql() -> str:
    """Fractional benchmark-overlap replayed over the shared gram CTE:
    distinct grams, intersect size, integer permille — all-integer."""
    mx = dataprep.DECONTAM_BENCH_MAX_ID
    return f"""WITH {H.sql_gram_hashes_cte()}, g AS (
  SELECT doc_id, list_distinct(hs) AS grams FROM gh
), bgl AS (
  SELECT coalesce(list_distinct(flatten(list(hs))), []) AS bg
  FROM gh WHERE doc_id < {mx}
)
SELECT g.doc_id,
       len(g.grams)::BIGINT AS n_grams,
       len(list_intersect(g.grams, bgl.bg))::BIGINT AS n_overlap,
       (1000 * len(list_intersect(g.grams, bgl.bg))
        // len(g.grams))::BIGINT AS overlap_permille
FROM g, bgl WHERE g.doc_id >= {mx}"""


def _heavy_hitters_cms_sql() -> str:
    """CMS registers replayed literally: same poly word hash, same seeded
    affine row hashes (constants embedded from hashing.py), registers as
    a grouped count over word occurrences."""
    rows = "\n  UNION ALL ".join(
        f"SELECT {d} AS row, (({int(H.CMS_A[d])} * h + {int(H.CMS_B[d])}) "
        f"% {H.P}) % {H.CMS_W} AS bucket FROM h"
        for d in range(H.CMS_D)
    )
    return rf"""WITH w AS (
  SELECT unnest(regexp_extract_all(lower(text), '\S+')) AS word
  FROM documents
), h AS (SELECT {H.sql_poly_hash('word')} AS h FROM w),
r AS (
  {rows}
)
SELECT row, bucket, count(*)::BIGINT AS cnt
FROM r GROUP BY row, bucket ORDER BY row, bucket"""


def _source_stats_sql() -> str:
    return r"""
SELECT source, count(*)::BIGINT AS n_docs,
       sum(len(regexp_extract_all(text, '\S+')))::BIGINT AS n_tokens,
       sum(length(text))::BIGINT AS n_chars
FROM documents GROUP BY source ORDER BY source"""


def build_oracles(sf_dir: str) -> dict[str, str]:
    ensure_fixture(sf_dir)  # the oracle may run before the Ray query does
    glob = transcripts_glob(sf_dir)
    cte = oracle.parsed_cte(glob)
    role_pq = str(lookup_path(sf_dir, "role_tenant"))
    tool_pq = str(lookup_path(sf_dir, "tool_subsystem"))

    h1 = oracle.bucket_expr(core.HIST_WIDTH_S)
    b10 = oracle.bucket_expr(core.CONN_BUCKET_S)
    eh = oracle.bucket_expr(3600)

    out = {
        "errors_list": f"""{cte}
SELECT conv_id, turn_idx, severity, message, text FROM parsed
WHERE severity_rank >= {core.ERROR_RANK}""",
        "errors_by_severity": f"""{cte}
SELECT severity, count(*) AS cnt FROM parsed
WHERE severity_rank >= {core.ERROR_RANK} GROUP BY severity ORDER BY severity""",
        "errors_top_messages": f"""{cte}
SELECT message, count(*) AS cnt FROM parsed
WHERE severity_rank >= {core.ERROR_RANK} AND message IS NOT NULL
GROUP BY message ORDER BY cnt DESC, message LIMIT {core.TOP_N_MESSAGES}""",
        "errors_hist": f"""{cte}
SELECT {h1} AS bucket_ts, count(*) AS cnt FROM parsed
WHERE severity_rank >= {core.ERROR_RANK} GROUP BY bucket_ts ORDER BY bucket_ts""",
        "errors_masked": f"""{cte}
SELECT conv_id, turn_idx, severity, text FROM parsed
WHERE contains(text, '{core.MASK_SUBSTRING}')
  AND severity_rank >= {core.ERROR_RANK}""",
        "errors_window": f"""{cte}
SELECT conv_id, turn_idx, severity, text FROM parsed
WHERE severity_rank >= {core.ERROR_RANK}
  AND ts >= TIMESTAMP '{core.WINDOW_BEGIN}' AND ts <= TIMESTAMP '{core.WINDOW_END}'
ORDER BY conv_id, turn_idx""",
        "slow_list": f"""{cte}
SELECT conv_id, turn_idx, duration_ms, text FROM parsed
WHERE severity_rank >= {core.LOG_RANK} AND duration_ms > {core.SLOW_THRESHOLD_MS}
ORDER BY conv_id, turn_idx""",
        "slow_top": f"""{cte}
SELECT conv_id, turn_idx, duration_ms, text FROM parsed
WHERE severity_rank >= {core.LOG_RANK} AND duration_ms IS NOT NULL
ORDER BY duration_ms DESC, conv_id, turn_idx LIMIT {core.TOP_SLOW_K}""",
        "locks": f"""{cte}
SELECT conv_id, turn_idx, text FROM parsed
WHERE severity_rank >= {core.LOG_RANK} AND is_lock""",
        "system": f"""{cte}
SELECT conv_id, turn_idx, text FROM parsed
WHERE severity_rank >= {core.LOG_RANK} AND is_system
ORDER BY conv_id, turn_idx""",
        "connections_summary": f"""{cte}
SELECT
  sum(CASE WHEN event = 'received' THEN 1 ELSE 0 END)::BIGINT AS attempts,
  sum(CASE WHEN event = 'authorized' THEN 1 ELSE 0 END)::BIGINT AS authenticated,
  sum(CASE WHEN {oracle.ssl_expr()} THEN 1 ELSE 0 END)::BIGINT AS authenticated_ssl,
  sum(CASE WHEN event = 'auth_failure' THEN 1 ELSE 0 END)::BIGINT AS failures
FROM parsed""",
        "connections_by_host": f"""{cte}
SELECT coalesce(host, 'unknown') AS host, count(*) AS cnt FROM parsed
WHERE event = 'received' GROUP BY 1 ORDER BY 1""",
        "connections_by_user": f"""{cte}
SELECT coalesce("user", 'unknown') AS "user", count(*) AS cnt FROM parsed
WHERE event = 'authorized' GROUP BY 1 ORDER BY 1""",
        "connections_by_db": f"""{cte}
SELECT coalesce(db, 'unknown') AS db, count(*) AS cnt FROM parsed
WHERE event = 'authorized' GROUP BY 1 ORDER BY 1""",
        "connections_by_appname": f"""{cte}
SELECT coalesce(appname, 'unknown') AS appname, count(*) AS cnt FROM parsed
WHERE event = 'authorized' GROUP BY 1 ORDER BY 1""",
        "connections_by_bucket": f"""{cte}
SELECT {b10} AS bucket_ts, count(*) AS cnt FROM parsed
WHERE event = 'received' GROUP BY bucket_ts ORDER BY bucket_ts""",
        "errors_by_sqlstate": f"""{cte}
SELECT regexp_extract(text, '{_SQLSTATE}', 1) AS sqlstate, count(*) AS cnt
FROM parsed
WHERE severity_rank >= {core.ERROR_RANK}
  AND regexp_matches(text, '{_SQLSTATE}')
GROUP BY 1 ORDER BY 1""",
        "disconnections_by_host": f"""{cte}
SELECT coalesce(host, 'unknown') AS host, count(*) AS cnt FROM parsed
WHERE event = 'disconnection' GROUP BY 1 ORDER BY 1""",
        "conv_first_error": f"""{cte}
SELECT conv_id, min(turn_idx) AS first_error_turn FROM parsed
WHERE severity_rank >= {core.ERROR_RANK} GROUP BY conv_id ORDER BY conv_id""",
        "sessions_top_errors": f"""{cte}
SELECT conv_id, count(*)::BIGINT AS n_turns,
       sum(CASE WHEN severity_rank >= {core.ERROR_RANK} THEN 1 ELSE 0 END)::BIGINT AS n_errors
FROM parsed GROUP BY conv_id
ORDER BY n_errors DESC, conv_id LIMIT 10""",
        "sessions": f"""{cte}
SELECT conv_id,
       count(*)::BIGINT AS n_turns,
       min(ts) AS first_ts,
       max(ts) AS last_ts,
       sum(CASE WHEN severity_rank >= {core.ERROR_RANK} THEN 1 ELSE 0 END)::BIGINT AS n_errors,
       string_agg(text, chr(10) ORDER BY turn_idx) AS transcript
FROM parsed GROUP BY conv_id ORDER BY conv_id""",
        "enriched_severity_counts": f"""{cte}
SELECT coalesce(rt.tenant, 'unknown') AS tenant,
       coalesce(tsb.subsystem, 'unknown') AS subsystem,
       p.severity, count(*) AS cnt
FROM parsed p
LEFT JOIN read_parquet('{role_pq}') rt ON p.role = rt.role
LEFT JOIN read_parquet('{tool_pq}') tsb ON p.tool = tsb.tool
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",
        "routed_counts": f"""{cte}
SELECT severity, count(*) AS cnt FROM parsed GROUP BY severity ORDER BY severity""",
        # --- events table (driver's native view) ---
        "events_per_hour": f"""
SELECT {eh} AS bucket_ts, count(*) AS cnt FROM events
GROUP BY bucket_ts ORDER BY bucket_ts""",
        "events_top_types": """
SELECT event_type, count(*) AS cnt FROM events GROUP BY event_type
ORDER BY event_type""",
        "events_value_quantiles": f"""
WITH r AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value) - 1
           AS rk,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events
)
SELECT event_type, p.pct::BIGINT AS pct, value
FROM r JOIN (VALUES {', '.join(f'({p})' for p in events_mod.EVQ_PCTS)})
  p(pct) ON r.rk = (p.pct * (r.n - 1)) // 100
ORDER BY event_type, pct""",
        # histogram-sketch quantiles: the same fixed-bin + nearest-rank
        # selection rule replayed (floor(value) is exact in both engines)
        "events_value_hist_quantiles": f"""
WITH b AS (
  SELECT event_type, floor(value)::BIGINT AS bin, count(*)::BIGINT AS cnt
  FROM events GROUP BY 1, 2
), c AS (
  SELECT event_type, bin,
         sum(cnt) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
         sum(cnt) OVER (PARTITION BY event_type) AS n
  FROM b
)
SELECT c.event_type, p.pct::BIGINT AS pct, min(c.bin)::BIGINT AS est_bin
FROM c JOIN (VALUES {', '.join(f'({p})' for p in events_mod.HISTQ_PCTS)})
  p(pct) ON c.cum >= (p.pct * (c.n - 1)) // 100 + 1
GROUP BY 1, 2 ORDER BY 1, 2""",
        "events_retention": f"""
WITH w AS (
  SELECT user_id,
         epoch_us(ts) // {events_mod.RETENTION_WEEK_S * 1_000_000} AS week
  FROM events
), c AS (
  SELECT user_id, min(week) AS cohort_week FROM w GROUP BY user_id
), a AS (
  SELECT DISTINCT w.user_id, c.cohort_week,
         w.week - c.cohort_week AS week_offset
  FROM w JOIN c USING (user_id)
)
SELECT cohort_week, week_offset, count(*)::BIGINT AS n_users
FROM a GROUP BY cohort_week, week_offset
ORDER BY cohort_week, week_offset""",
        "events_props_k_sum": r"""
SELECT event_type,
       sum(try_cast(regexp_extract(props, '"k": *(-?[0-9]+)', 1) AS BIGINT))::BIGINT AS sum_k,
       count(*) AS cnt
FROM events GROUP BY event_type ORDER BY event_type""",
        "events_value_range": """
SELECT event_type, min(value) AS min_value, max(value) AS max_value,
       count(*) AS cnt
FROM events GROUP BY event_type ORDER BY event_type""",
        # --- windows / joins / stub commands made real ---
        "events_user_sessions": f"""
WITH x AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                   OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                      > INTERVAL {1800} SECOND
              THEN 1 ELSE 0 END AS new_s
  FROM events)
SELECT user_id, count(*)::BIGINT AS n_events, sum(new_s)::BIGINT AS n_sessions
FROM x GROUP BY user_id ORDER BY user_id""",
        "events_by_segment": """
SELECT c.c_mktsegment, count(*) AS cnt
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1 ORDER BY 1""",
        # as-of join: greatest right.ts <= left.ts per user; equal-ts ties
        # -> max event_id (the pipeline's merge_asof pick, made explicit)
        "events_asof_prior": """
WITH err AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'
), clk AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
), j AS (
  SELECT err.event_id, err.user_id, err.ts,
         clk.event_id AS prior_event_id, clk.ts AS pts,
         row_number() OVER (PARTITION BY err.event_id
                            ORDER BY clk.ts DESC, clk.event_id DESC) AS rn
  FROM err LEFT JOIN clk
    ON err.user_id = clk.user_id AND clk.ts <= err.ts
)
SELECT event_id, user_id, ts,
       coalesce(prior_event_id, -1)::BIGINT AS prior_event_id,
       coalesce(date_diff('microsecond', pts, ts), -1)::BIGINT AS gap_us
FROM j WHERE rn = 1 ORDER BY event_id""",
        "events_funnel": f"""
WITH s AS (
  SELECT user_id, min(ts) AS fs FROM events
  WHERE event_type = '{events_mod.FUNNEL_FROM}' GROUP BY user_id
), c AS (
  SELECT DISTINCT s.user_id
  FROM s JOIN events e ON e.user_id = s.user_id
  WHERE e.event_type = '{events_mod.FUNNEL_TO}'
    AND e.ts >= s.fs
    AND e.ts <= s.fs + INTERVAL {events_mod.FUNNEL_WINDOW_S} SECOND
)
SELECT (SELECT count(*) FROM s)::BIGINT AS signup_users,
       (SELECT count(*) FROM c)::BIGINT AS converted_users""",
        "events_anomaly": f"""
WITH b AS (
  SELECT {oracle.bucket_expr(events_mod.ANOM_WIDTH_S)} AS bucket_ts,
         count(*)::BIGINT AS cnt
  FROM events GROUP BY 1
), st AS (
  SELECT count(*)::HUGEINT AS n, sum(cnt)::HUGEINT AS s,
         sum(cnt::HUGEINT * cnt)::HUGEINT AS q
  FROM b
)
SELECT bucket_ts, cnt FROM b, st
WHERE (n*cnt - s)*(n*cnt - s) > {events_mod.ANOM_Z * events_mod.ANOM_Z}*(n*q - s*s)
ORDER BY bucket_ts""",
        # range join: integer-µs bounds so the comparison is bit-identical
        # to the kernel's int64 searchsorted arithmetic
        "events_range_join": f"""
WITH w AS (
  SELECT event_id AS window_id, epoch_us(ts) AS wts
  FROM events WHERE event_type = '{windows_mod.RJ_ANCHOR_TYPE}'
)
SELECT w.window_id, count(*)::BIGINT AS n_in_window,
       sum(CASE WHEN e.event_type = '{windows_mod.RJ_ERR_TYPE}'
                THEN 1 ELSE 0 END)::BIGINT AS n_errors
FROM w JOIN events e
  ON epoch_us(e.ts) >= w.wts
 AND epoch_us(e.ts) < w.wts + {windows_mod.RJ_WINDOW_S * 1_000_000}
GROUP BY w.window_id ORDER BY w.window_id""",
        "conv_tool_transitions": f"""
WITH t AS (
  SELECT conv_id, tool,
         lag(tool) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev
  FROM read_parquet('{glob}')
)
SELECT prev AS from_tool, tool AS to_tool, count(*)::BIGINT AS cnt
FROM t WHERE prev IS NOT NULL GROUP BY 1, 2 ORDER BY 1, 2""",
        "conv_role_handoffs": f"""
WITH t AS (
  SELECT conv_id, role,
         lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev
  FROM read_parquet('{glob}')
)
SELECT prev AS from_role, role AS to_role, count(*)::BIGINT AS cnt
FROM t WHERE prev IS NOT NULL GROUP BY 1, 2 ORDER BY 1, 2""",
        "events_sliding_avg": f"""
WITH h AS (
  SELECT {eh} AS bucket_ts, count(*) AS cnt FROM events
  GROUP BY bucket_ts
)
SELECT bucket_ts, cnt,
       avg(cnt) OVER (ORDER BY bucket_ts
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS avg_cnt
FROM h ORDER BY bucket_ts""",
        "flagged_conv_turns": f"""{cte}
SELECT conv_id, count(*) AS cnt FROM parsed
WHERE conv_id IN (SELECT DISTINCT conv_id FROM parsed
                  WHERE event = 'auth_failure')
GROUP BY conv_id ORDER BY conv_id""",
        "peaks": f"""{cte}
SELECT {oracle.bucket_expr(600)} AS bucket_ts, count(*) AS cnt FROM parsed
GROUP BY 1 ORDER BY cnt DESC, bucket_ts LIMIT 10""",
        "stats": f"""{cte}
SELECT count(*)::BIGINT AS records,
  sum(CASE WHEN severity = 'error' THEN 1 ELSE 0 END)::BIGINT AS errors,
  sum(CASE WHEN severity = 'fatal' THEN 1 ELSE 0 END)::BIGINT AS fatals,
  sum(CASE WHEN duration_ms > 1000.0 THEN 1 ELSE 0 END)::BIGINT AS slow_1s,
  sum(CASE WHEN event = 'received' THEN 1 ELSE 0 END)::BIGINT AS conn_attempts,
  sum(CASE WHEN is_lock THEN 1 ELSE 0 END)::BIGINT AS lock_events,
  sum(CASE WHEN is_system THEN 1 ELSE 0 END)::BIGINT AS system_events
FROM parsed""",
        # --- documents / embeddings ---
        "dedup_exact": """
SELECT min(doc_id) AS doc_id FROM documents GROUP BY text ORDER BY doc_id""",
        # incremental dedup with id-ordered rounds == one-shot exact dedup
        "dedup_incremental": """
SELECT min(doc_id) AS doc_id FROM documents GROUP BY text ORDER BY doc_id""",
        "docs_token_stats": r"""
SELECT doc_id,
       length(text)::BIGINT AS n_chars,
       len(regexp_extract_all(text, '\S+'))::BIGINT AS n_tokens
FROM documents""",
        "docs_bpe_tokens": r"""
SELECT doc_id,
       len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]'))::BIGINT
         AS n_bpe_tokens
FROM documents""",
        # sliding-window chunk geometry: starts 0, S, 2S, ... < n_toks;
        # width min(W, n_toks - start); all-int64 => bit-exact parity
        "docs_chunk_overlap": rf"""
WITH t AS (
  SELECT doc_id, len(regexp_extract_all(text, '\S+'))::BIGINT AS n_toks
  FROM documents
), c AS (
  SELECT doc_id, n_toks,
         unnest(range(0, n_toks, {dataprep.CHUNK_STRIDE_TOKENS}))
           AS start_tok
  FROM t WHERE n_toks > 0
)
SELECT doc_id,
       (start_tok // {dataprep.CHUNK_STRIDE_TOKENS})::BIGINT AS chunk_idx,
       start_tok::BIGINT AS start_tok,
       least({dataprep.CHUNK_WINDOW_TOKENS}, n_toks - start_tok)::BIGINT
         AS n_tok
FROM c ORDER BY doc_id, chunk_idx""",
        # two-phase exact distinct replayed as a plain (source, word)
        # group-then-group; permille is integer floor division
        "docs_type_token_stats": r"""
WITH w AS (
  SELECT source, unnest(regexp_extract_all(lower(text), '\S+')) AS word
  FROM documents
), g AS (
  SELECT source, word, count(*)::BIGINT AS c FROM w GROUP BY source, word
)
SELECT source, sum(c)::BIGINT AS n_tokens,
       count(*)::BIGINT AS n_distinct_tokens,
       ((1000 * count(*)) // sum(c))::BIGINT AS type_token_permille
FROM g GROUP BY source ORDER BY source""",
        "docs_quality": r"""
SELECT doc_id,
       len(regexp_extract_all(text, '\S+'))::BIGINT AS n_tokens,
       len(regexp_extract_all(lower(text), '\b(the|and|of|to|a|in|is|it)\b'))::BIGINT AS n_stop,
       len(regexp_extract_all(text, '[0-9]'))::BIGINT AS n_digits,
       (len(regexp_extract_all(lower(text), '\b(the|and|of|to|a|in|is|it)\b'))::DOUBLE
        / nullif(len(regexp_extract_all(text, '\S+')), 0)) AS stop_ratio
FROM documents""",
        "docs_quality_filter": r"""
SELECT doc_id FROM documents
WHERE len(regexp_extract_all(text, '\S+')) >= 30
  AND len(regexp_extract_all(text, '[0-9]'))
      < 0.3 * greatest(len(regexp_extract_all(text, '\S+')), 1)""",
        "ann_cosine_topk": """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id
FROM embeddings e, q
ORDER BY list_cosine_similarity(e.embedding, q.qv) DESC, e.vec_id
LIMIT 10""",
        # --- dedup / ANN / fingerprint: the deterministic algorithms
        # replayed in DuckDB from the shared hashing.py constants ---
        "dedup_minhash": _dedup_minhash_sql(),
        "dedup_components": _dedup_components_sql(),
        "dedup_cluster_best": _dedup_cluster_best_sql(),
        "dedup_ngram_jaccard": _dedup_jaccard_sql(),
        "dedup_simhash": _dedup_simhash_sql(),
        "docs_lang_id": _lang_id_sql(),
        "docs_fingerprint": H.sql_fingerprint_select(),
        "corpus_prep": _corpus_prep_sql(),
        "docs_scrub": _scrub_sql(),
        "docs_repetition": _repetition_sql(),
        "docs_sample_hash": _sample_hash_sql(),
        "docs_weighted_sample": f"""SELECT doc_id FROM documents
WHERE (((doc_id % {H.P}) * {H.SAMPLE_A} + {H.SAMPLE_B}) % {H.P})
      * {dataprep.WSAMPLE_DEN} < n_chars::BIGINT * {H.P}""",
        "docs_inverted_postings": _inverted_postings_sql(),
        "docs_mixture_sample": _mixture_sample_sql(),
        "docs_topk_per_source": _topk_per_source_sql(),
        "docs_stratified_sample": f"""
WITH s AS (
  SELECT source, doc_id,
         (((doc_id % {H.P}) * {H.SAMPLE_A} + {H.SAMPLE_B}) % {H.P}) AS u
  FROM documents)
SELECT source, doc_id FROM s
QUALIFY row_number() OVER (PARTITION BY source ORDER BY u, doc_id)
        <= {dataprep.STRATIFIED_K}
ORDER BY source, doc_id""",
        # fixed-point vector aggregate: floor(v * 2^20) is bit-exact in both
        # engines (power-of-two scaling), int64 sums are order-independent
        "embed_label_centroids": f"""
WITH e AS (
  SELECT label,
         (generate_subscripts(embedding, 1) - 1)::BIGINT AS dim,
         floor(unnest(embedding)::DOUBLE
               * {dataprep.CENTROID_SCALE})::BIGINT AS q
  FROM embeddings)
SELECT label::BIGINT AS label, dim, sum(q)::BIGINT AS sum_q,
       count(*)::BIGINT AS n_vecs
FROM e GROUP BY 1, 2 ORDER BY 1, 2""",
        # shifted fixed-point floor-mean centroids, exact int64 d2 to the
        # OWN-label centroid, downshifted-mean threshold (floor division
        # everywhere on non-negative operands so // agrees across engines)
        "embed_label_outliers": f"""
WITH e AS (
  SELECT vec_id, label::BIGINT AS label,
         (generate_subscripts(embedding, 1) - 1)::BIGINT AS dim,
         (floor(unnest(embedding)::DOUBLE * {dataprep.CENTROID_SCALE})
            ::BIGINT + {dataprep.CENTROID_SCALE}) AS q
  FROM embeddings
), cc AS (
  SELECT label, dim, sum(q) // count(*) AS cq
  FROM e GROUP BY label, dim
), d AS (
  SELECT e.vec_id, e.label,
         sum((e.q - cc.cq) * (e.q - cc.cq))::BIGINT AS d2
  FROM e JOIN cc ON e.label = cc.label AND e.dim = cc.dim
  GROUP BY e.vec_id, e.label
), t AS (
  SELECT label,
         {dataprep.OUT_FACTOR} * (sum(d2 // {1 << dataprep.OUT_DOWNSHIFT})
           // count(*)) AS thr
  FROM d GROUP BY label
)
SELECT d.vec_id, d.label, d.d2,
       (CASE WHEN (d.d2 // {1 << dataprep.OUT_DOWNSHIFT}) > t.thr
             THEN 1 ELSE 0 END)::BIGINT AS is_outlier
FROM d JOIN t ON d.label = t.label
ORDER BY d.vec_id""",
        "docs_vocab_topk": _vocab_topk_sql(),
        "docs_decontaminate": _decontaminate_sql(),
        "docs_decontaminate_bloom": _decontaminate_bloom_sql(),
        "docs_source_distinct_hll": _source_distinct_hll_sql(),
        "docs_length_quantiles": _length_quantiles_sql(),
        "docs_normalize": _normalize_sql(),
        "dedup_chunks": _dedup_chunks_sql(),
        "dedup_exact_substr": _exsub_sql(),
        "docs_dup_span_strip": _dup_span_strip_sql(),
        "docs_novelty": _novelty_sql(),
        "docs_winnowing": _winnowing_sql(),
        "docs_winnow_sim_topk": _winnow_sim_sql(),
        "docs_strip_boilerplate": _strip_boilerplate_sql(),
        "docs_lm_surprisal": _lm_surprisal_sql(),
        "docs_tfidf_topk": _tfidf_topk_sql(),
        "docs_distinct_hll": _distinct_hll_sql(),
        "docs_shuffle_order": _shuffle_order_sql(),
        "docs_pack_sequences": _pack_sequences_sql(),
        "docs_select_budget": _select_budget_sql(),
        "docs_gopher_filter": _gopher_filter_sql(),
        "corpus_export_counts": _corpus_export_counts_sql(),
        "multimodal_image_stats": _multimodal_image_stats_sql(),
        "multimodal_audio_stats": _multimodal_audio_stats_sql(),
        "multimodal_video_frames": _multimodal_video_frames_sql(),
        "docs_bigram_surprisal": _bigram_surprisal_sql(),
        "severity_tool_rollup": f"""{cte}
SELECT coalesce(severity, '{core.ROLLUP_ALL}') AS severity,
       coalesce(tool, '{core.ROLLUP_ALL}') AS tool, count(*) AS cnt
FROM parsed GROUP BY ROLLUP(severity, tool)
ORDER BY severity, tool""",
        "conv_tool_pagerank": _tool_pagerank_sql(glob),
        "conv_tool_hits": _tool_hits_sql(glob),
        # integer-µs latency partials: count/sum/min/max are all exact
        # int64, so pipeline-vs-oracle parity is bit-identical
        "conv_response_latency": f"""
WITH t AS (
  SELECT conv_id, role, tool, epoch_us(ts) AS ts_us,
         lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx)
           AS prev_role,
         lag(epoch_us(ts)) OVER (PARTITION BY conv_id ORDER BY turn_idx)
           AS prev_ts
  FROM read_parquet('{glob}')
)
SELECT tool, count(*)::BIGINT AS n_resp,
       sum(ts_us - prev_ts)::BIGINT AS sum_lat_us,
       min(ts_us - prev_ts)::BIGINT AS min_lat_us,
       max(ts_us - prev_ts)::BIGINT AS max_lat_us
FROM t WHERE prev_role = 'user' AND role = 'assistant'
GROUP BY tool ORDER BY tool""",
        # gaps-and-islands over assistant turns: a run = consecutive
        # identical non-null tools in turn_idx order; loop = run >= 3
        "conv_loop_detect": f"""
WITH a AS (
  SELECT conv_id, tool,
         row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx) AS rn
  FROM read_parquet('{glob}') WHERE role = 'assistant'
), g AS (
  SELECT conv_id, tool,
         rn - row_number() OVER (PARTITION BY conv_id, tool ORDER BY rn)
           AS grp
  FROM a WHERE tool IS NOT NULL
), r AS (
  SELECT conv_id, count(*) AS run_len FROM g GROUP BY conv_id, tool, grp
), s AS (
  SELECT conv_id, count(*)::BIGINT AS n_assist,
         count(tool)::BIGINT AS n_tool_calls
  FROM a GROUP BY conv_id
), m AS (
  SELECT conv_id, max(run_len) AS max_run,
         sum(CASE WHEN run_len >= {windows_mod.LOOP_RUN_MIN}
             THEN 1 ELSE 0 END) AS n_loops
  FROM r GROUP BY conv_id
)
SELECT s.conv_id, s.n_assist, s.n_tool_calls,
       coalesce(m.max_run, 0)::BIGINT AS max_run,
       coalesce(m.n_loops, 0)::BIGINT AS n_loops
FROM s LEFT JOIN m ON s.conv_id = m.conv_id
ORDER BY s.conv_id""",
        # quadratic-context cost: each assistant turn re-reads the conv's
        # prior chars (exclusive running sum) and emits its own
        "conv_context_cost": f"""
WITH t AS (
  SELECT conv_id, role, length(text)::BIGINT AS ch,
         coalesce(sum(length(text)) OVER (
           PARTITION BY conv_id ORDER BY turn_idx
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
           AS prior_ch
  FROM read_parquet('{glob}')
)
SELECT conv_id,
       sum(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END)::BIGINT
         AS n_assist,
       sum(CASE WHEN role = 'assistant' THEN prior_ch ELSE 0 END)::BIGINT
         AS prompt_chars,
       sum(CASE WHEN role = 'assistant' THEN ch ELSE 0 END)::BIGINT
         AS gen_chars,
       sum(CASE WHEN role = 'assistant' THEN prior_ch + ch ELSE 0 END)
         ::BIGINT AS cost_chars
FROM t GROUP BY conv_id ORDER BY conv_id""",
        "conv_role_balance": f"""
SELECT role, count(DISTINCT conv_id)::BIGINT AS n_convs,
       count(*)::BIGINT AS n_turns,
       sum(length(text))::BIGINT AS sum_chars,
       max(length(text))::BIGINT AS max_chars
FROM read_parquet('{glob}')
GROUP BY role ORDER BY role""",
        "conv_context_growth": f"""
SELECT conv_id, turn_idx::BIGINT AS turn_idx,
       length(text)::BIGINT AS n_chars,
       sum(length(text)) OVER (PARTITION BY conv_id ORDER BY turn_idx
                               ROWS UNBOUNDED PRECEDING)::BIGINT
         AS cum_chars
FROM read_parquet('{glob}')
ORDER BY conv_id, turn_idx""",
        # longest suffix fitting the token budget == rows whose
        # from-this-turn-to-end running total is <= budget
        "conv_truncate_context": rf"""
WITH t AS (
  SELECT conv_id, turn_idx,
         len(regexp_extract_all(text, '\S+'))::BIGINT AS toks
  FROM read_parquet('{glob}')
), s AS (
  SELECT conv_id, turn_idx, toks,
         sum(toks) OVER (PARTITION BY conv_id ORDER BY turn_idx DESC
                         ROWS UNBOUNDED PRECEDING) AS suffix_total
  FROM t
)
SELECT conv_id, count(*)::BIGINT AS n_turns,
       sum(CASE WHEN suffix_total <= {windows_mod.CTX_BUDGET_TOKENS}
                THEN 1 ELSE 0 END)::BIGINT AS n_kept,
       sum(CASE WHEN suffix_total <= {windows_mod.CTX_BUDGET_TOKENS}
                THEN toks ELSE 0 END)::BIGINT AS kept_tokens,
       coalesce(min(CASE WHEN suffix_total <= {windows_mod.CTX_BUDGET_TOKENS}
                         THEN turn_idx END), -1)::BIGINT AS first_kept_turn
FROM s GROUP BY conv_id ORDER BY conv_id""",
        "conv_session_splits": f"""
WITH t AS (
  SELECT conv_id, epoch_us(ts) AS ts_us,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY conv_id
                                                ORDER BY turn_idx) AS gap
  FROM read_parquet('{glob}')
)
SELECT conv_id, count(*)::BIGINT AS n_turns,
       (1 + sum(CASE WHEN gap > {windows_mod.CONV_SPLIT_GAP_US}
                     THEN 1 ELSE 0 END))::BIGINT AS n_sessions,
       coalesce(max(gap), -1)::BIGINT AS max_gap_us,
       (max(ts_us) - min(ts_us))::BIGINT AS span_us
FROM t GROUP BY conv_id ORDER BY conv_id""",
        # gaps-and-islands: grp = turn_idx - row_number() is constant
        # exactly across turn_idx-consecutive error runs
        "conv_error_bursts": f"""{cte}
, e AS (
  SELECT conv_id, turn_idx,
         turn_idx - row_number() OVER (PARTITION BY conv_id
                                       ORDER BY turn_idx) AS grp
  FROM parsed WHERE severity_rank >= {core.ERROR_RANK}
), runs AS (
  SELECT conv_id, count(*) AS run_len FROM e GROUP BY conv_id, grp
)
SELECT conv_id, max(run_len)::BIGINT AS max_run,
       sum(run_len)::BIGINT AS n_error_turns
FROM runs GROUP BY conv_id ORDER BY conv_id""",
        # robust stats: the same pct·(n−1)//100 selection rule as the
        # quantile family, applied twice (value, then |value − median|)
        "events_value_mad": f"""
WITH r AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value) - 1
           AS rk,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events
), med AS (
  SELECT event_type, value AS m FROM r WHERE rk = (50 * (n - 1)) // 100
), r2 AS (
  SELECT e.event_type, abs(e.value - med.m) AS dev,
         row_number() OVER (PARTITION BY e.event_type
                            ORDER BY abs(e.value - med.m)) - 1 AS rk,
         count(*) OVER (PARTITION BY e.event_type) AS n
  FROM events e JOIN med USING (event_type)
), mad AS (
  SELECT event_type, dev AS d FROM r2 WHERE rk = (50 * (n - 1)) // 100
)
SELECT e.event_type, count(*)::BIGINT AS n,
       any_value(med.m) AS median, any_value(mad.d) AS mad,
       sum(CASE WHEN abs(e.value - med.m) > {events_mod.MAD_K} * mad.d
                THEN 1 ELSE 0 END)::BIGINT AS n_outliers
FROM events e JOIN med USING (event_type) JOIN mad USING (event_type)
GROUP BY e.event_type ORDER BY e.event_type""",
        "events_daily_top_types": f"""
WITH c AS (
  SELECT {oracle.bucket_expr(86400)} AS bucket_ts, event_type,
         count(*) AS cnt
  FROM events GROUP BY 1, 2
), r AS (
  SELECT *, row_number() OVER (PARTITION BY bucket_ts
             ORDER BY cnt DESC, event_type) AS rank
  FROM c
)
SELECT bucket_ts, rank::BIGINT AS rank, event_type, cnt
FROM r WHERE rank <= {events_mod.DAILY_TOP_K}
ORDER BY bucket_ts, rank""",
        # mean-centered CUSUM kept integral by scaling with n:
        # c_k = n·pre_k − k·tot over the (ts, event_id)-ordered qv
        # sequence; HUGEINT window sums replay the pipeline bit-for-bit
        "events_cusum_drift": f"""
WITH q AS (
  SELECT event_type, ts, event_id,
         CAST(floor(value * {events_mod.CUSUM_SCALE}) AS HUGEINT) AS qv
  FROM events
), s AS (
  SELECT event_type,
         row_number() OVER w AS k,
         sum(qv) OVER w AS pre,
         count(*) OVER (PARTITION BY event_type) AS n,
         sum(qv) OVER (PARTITION BY event_type) AS tot
  FROM q WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING)
), c AS (
  SELECT event_type, n, k, abs(n * pre - k * tot) AS a FROM s
), r AS (
  SELECT event_type, n, k, a,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY a DESC, k) AS rn
  FROM c
)
SELECT event_type, n::BIGINT AS n, a::BIGINT AS drift,
       k::BIGINT AS drift_at
FROM r WHERE rn = 1 ORDER BY event_type""",
        "docs_kmv_distinct": _kmv_distinct_sql(),
        "events_value_linfit": _value_linfit_sql(),
        "events_late_arrivals": _late_arrivals_sql(),
        "docs_char_entropy": _char_entropy_sql(),
        "events_value_corr": _value_corr_sql(),
        "docs_pmi_topk": _pmi_topk_sql(),
        "embed_kmeans_centroids": _kmeans_sql(sf_dir),
        "embed_kcenter_coreset": _kcenter_sql(sf_dir),
        # equi-depth bins: ntile splits the sorted multiset at fixed ranks,
        # so per-bin (count, min, max) is tie-permutation-invariant
        "events_value_bins": f"""
WITH b AS (
  SELECT event_type, value,
         ntile({events_mod.EQ_BINS}) OVER (
           PARTITION BY event_type ORDER BY value) AS bin
  FROM events
)
SELECT event_type, bin::BIGINT AS bin, count(*)::BIGINT AS n_rows,
       min(value) AS vmin, max(value) AS vmax
FROM b GROUP BY 1, 2 ORDER BY 1, 2""",
        "docs_line_dedup": _line_dedup_sql(),
        "docs_minhash_sim_topk": _minhash_sim_topk_sql(),
        "docs_contamination_overlap": _contamination_overlap_sql(),
        "docs_heavy_hitters_cms": _heavy_hitters_cms_sql(),
        "docs_source_stats": _source_stats_sql(),
        "ann_lsh_topk": _ann_lsh_sql(dataprep._embedding_dim(sf_dir)),
        "ann_ivf_topk": _ann_ivf_sql(sf_dir),
        "embed_neardup": _embed_neardup_sql(dataprep._embedding_dim(sf_dir)),
        "docs_semdedup": _semdedup_sql(sf_dir),
    }
    # the salted split-merge path must produce the identical result, so it
    # shares the unsalted oracle verbatim
    out["events_user_sessions_salted"] = out["events_user_sessions"]
    # Deterministic-order contract (round 5): the r5b sweep proved that
    # physical-scan-order alignment between Ray and DuckDB is FLAKY for
    # multi-file inputs (errors_list/errors_masked/locks passed one run,
    # failed the next), so every remaining no-ORDER-BY query gets a
    # top-level ORDER BY here and a matching final .sort in its pipeline.
    # Single-row outputs (stats, connections_summary, events_funnel) are
    # order-free and excluded.
    for name, key in _DETERMINISTIC_ORDER_KEYS.items():
        out[name] = f"SELECT * FROM (\n{out[name]}\n) _q ORDER BY {key}"
    # Bounded gate shape for survivor-id queries (VERDICT r4 item #7): the
    # pipeline side returns ONE (count, min, max, xor, first-K sample) row
    # via dataprep._survivor_summary; replay the identical fold here over
    # the unchanged survivor-set SQL. xor covers EVERY id, so this is a
    # full-set check, not a sample check.
    for name, idc in _GATE_SUMMARY_IDS.items():
        out[name] = _survivor_summary_sql(out[name], idc)
    return out


_GATE_SUMMARY_IDS = {
    "dedup_minhash": "doc_id",
    "dedup_ngram_jaccard": "doc_id",
    "dedup_simhash": "doc_id",
    "docs_semdedup": "vec_id",
    "corpus_prep": "doc_id",
    "embed_neardup": "vec_id",
}


def _survivor_summary_sql(survivor_sql: str, id_col: str) -> str:
    from .pipelines.dataprep import GATE_SAMPLE_K

    return f"""WITH _s AS (
{survivor_sql}
)
SELECT count(*)::BIGINT AS n_survivors,
       min({id_col})::BIGINT AS min_id,
       max({id_col})::BIGINT AS max_id,
       bit_xor({id_col})::BIGINT AS xor_id,
       (SELECT string_agg(CAST({id_col} AS VARCHAR), ',' ORDER BY {id_col})
        FROM (SELECT {id_col} FROM _s ORDER BY {id_col}
              LIMIT {GATE_SAMPLE_K}) _t) AS sample_ids
FROM _s"""


# unique output key per wrapped query (see loop in build_oracles)
_DETERMINISTIC_ORDER_KEYS = {
    "errors_list": "conv_id, turn_idx",
    "errors_masked": "conv_id, turn_idx",
    "locks": "conv_id, turn_idx",
    "docs_token_stats": "doc_id",
    "docs_bpe_tokens": "doc_id",
    "docs_quality": "doc_id",
    "docs_quality_filter": "doc_id",
    "docs_lang_id": "doc_id",
    "docs_fingerprint": "doc_id",
    "docs_scrub": "doc_id",
    "docs_repetition": "doc_id",
    "docs_sample_hash": "doc_id",
    "docs_weighted_sample": "doc_id",
    "docs_decontaminate": "doc_id",
    "docs_decontaminate_bloom": "doc_id",
    "docs_normalize": "doc_id",
    "docs_lm_surprisal": "doc_id",
    "docs_shuffle_order": "doc_id",
    "docs_select_budget": "doc_id",
    "docs_gopher_filter": "doc_id",
    "docs_bigram_surprisal": "doc_id",
    "docs_char_entropy": "doc_id",
    "docs_contamination_overlap": "doc_id",
}
