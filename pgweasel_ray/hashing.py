"""Shared hash primitives for the dataprep operators — Python AND SQL.

The round-1 parity trick (regex/needle tables consumed by both the Arrow
kernels and the generated DuckDB oracle SQL) extended to the dedup / ANN /
fingerprint family: every hash here is defined over **mod-prime int64
arithmetic** (p = 2^31-1) so the identical computation is expressible as
DuckDB list-lambda SQL. Both sides — the distributed Ray stages in
``pipelines/dataprep.py`` and the oracle SQL in ``oracle_queries.py`` —
derive from the constants and generators in this module, so a Ray/oracle
mismatch can only come from the distributed pipeline, never from two
hand-maintained hash definitions drifting apart.

Why mod-prime instead of the usual 64-bit wraparound: DuckDB BIGINT errors
on overflow, so parity needs every intermediate product to fit in int64.
With p = 2^31-1 and all operands < p, ``a*h + b`` < 2^62 + 2^31 < 2^63.

Determinism: all randomized constants (MinHash permutations, band mixers,
LSH hyperplanes, IVF training seed) come from seeded ``default_rng`` and are
embedded in the generated SQL as literals.
"""

from __future__ import annotations

import re

import numpy as np

P = 2147483647           # 2^31 - 1 (Mersenne prime); every hash value < P
B1 = 1000003             # polynomial bases (primes < 2^31)
B2 = 1000033

# --- MinHash-LSH parameters ---------------------------------------------------
MH_NUM_PERM = 64
MH_BANDS = 16
MH_ROWS = MH_NUM_PERM // MH_BANDS    # 4 signature slots per band
MH_GRAM_CHUNK = 65_536               # perm-matrix columns per chunk (32 MB)
MH_SHINGLE = 3                       # word 3-grams
GRAM_SEP = "\x1f"                    # joins words inside a shingle
GRAM_PAD = "\x02"                    # pads docs shorter than the shingle

_mh_rng = np.random.default_rng(12345)
MH_A = _mh_rng.integers(1, P, MH_NUM_PERM, dtype=np.int64)
MH_B = _mh_rng.integers(0, P, MH_NUM_PERM, dtype=np.int64)
MH_C = _mh_rng.integers(1, P, MH_ROWS, dtype=np.int64)   # band-hash mixers

# --- SimHash parameters -------------------------------------------------------
SH_BITS = 62             # two 31-bit poly hashes concatenated
SH_BANDS = 4             # 4 × 16-bit band keys (top 2 bits dead)
SH_BAND_BITS = 16
SH_HAM_MAX = 3           # 4 bands guarantee recall for hamming <= 3

# --- fingerprint (winnowing-style min of k-gram rolling hashes) ---------------
FP_K = 8
FP_POWERS = np.empty(FP_K, dtype=np.int64)
_acc = 1
for _i in range(FP_K - 1, -1, -1):
    FP_POWERS[_i] = _acc
    _acc = (_acc * B1) % P

# --- n-gram Jaccard threshold (exact integer comparison on both sides) --------
JC_NUM = 7               # J >= 7/10  <=>  10*|A∩B| >= 7*|A∪B|
JC_DEN = 10

# --- deterministic hash sampling ---------------------------------------------
SAMPLE_A = 1103515245          # affine sampling hash: ((id % P)*A + B) % P
SAMPLE_B = 12345

# --- count-min sketch (word heavy hitters) -------------------------------------
CMS_D = 4                      # hash rows
CMS_W = 1024                   # buckets per row
_cms_rng = np.random.default_rng(987654)
CMS_A = _cms_rng.integers(1, P, CMS_D, dtype=np.int64)
CMS_B = _cms_rng.integers(0, P, CMS_D, dtype=np.int64)

# --- deterministic training-order shuffle --------------------------------------
# Distinct affine constants from SAMPLE_* so sampling and shuffling are
# independent permutations; A coprime with the prime P ⇒ the key map is a
# BIJECTION on [0, P), so every doc gets a unique shuffle key (no ties for
# doc_id < P; ties beyond P broken by doc_id). A must be LARGE (≈ P scale):
# a small multiplier leaves consecutive small ids un-wrapped (key = A*i + B
# monotone ⇒ no shuffle at all below id ~P/A, and range-partitioned export
# shards collapse into one).
SHUF_A = 1588635695
SHUF_B = 1203793753

# --- ANN constants ------------------------------------------------------------
LSH_N_PLANES = 8
LSH_SEED = 777
IVF_SEED = 424242
IVF_TRAIN_SAMPLE = 100_000   # bounded driver-side k-means training sample

# embedding near-dup blocking: MORE planes than the ANN probe scheme so
# bucket population stays bounded at corpus scale (2^16 buckets: 10^9
# vectors → ~15k per bucket; the in-bucket verify is chunked on top).
# Near-identical vectors (the >0.999-cosine regime this dedups) flip a
# hyperplane sign only when a plane lands inside their ~2.5° cone, so
# 16 planes keep recall high while shrinking buckets 256×.
EMB_ND_PLANES = 16
EMB_ND_SEED = 778


# =============================================================================
# Python / numpy side
# =============================================================================

def poly_hash(s: str, base: int = B1) -> int:
    """Left fold over codepoints: acc = cp0; acc = (acc*base + cp) % P.

    Matches DuckDB ``list_reduce`` (which seeds the fold with the first list
    element). Empty string hashes to 0.
    """
    acc = 0
    for i, ch in enumerate(s):
        c = ord(ch)
        acc = c if i == 0 else (acc * base + c) % P
    return acc


_TOKEN_RE = re.compile(r"[^\t\n\f\r ]+")


def tokens(text: str) -> list[str]:
    """Word tokens: lowercase, maximal runs of non-whitespace with RE2's
    ASCII whitespace class ``\\s = [\\t\\n\\f\\r ]`` — EXACTLY DuckDB
    ``regexp_extract_all(lower(text), '\\S+')``. (``str.split()`` would
    additionally split on \\x0b, \\x1c-\\x1f, \\x85, \\xa0 …Unicode
    whitespace and silently break MinHash/SimHash/Jaccard/decontamination
    parity on such text; fuzz-covered in test_hashing_fuzz.)"""
    return _TOKEN_RE.findall(text.lower())


def shingles(words: list[str], n: int = MH_SHINGLE) -> list[str]:
    """Word n-grams joined with GRAM_SEP; docs with < n words are padded with
    GRAM_PAD tokens so every doc has >= 1 shingle."""
    if len(words) < n:
        words = words + [GRAM_PAD] * (n - len(words))
    return [GRAM_SEP.join(words[i:i + n]) for i in range(len(words) - n + 1)]


def gram_hashes(text: str) -> np.ndarray:
    """int64 poly hashes of a doc's shingles (with duplicates)."""
    return np.array([poly_hash(g) for g in shingles(tokens(text))],
                    dtype=np.int64)


def minhash_signature(hs: np.ndarray) -> np.ndarray:
    """(MH_NUM_PERM,) signature: min over shingle hashes of (a*h + b) % P."""
    return ((MH_A[:, None] * hs[None, :] + MH_B[:, None]) % P).min(axis=1)


def band_hashes(sig: np.ndarray) -> np.ndarray:
    """(MH_BANDS,) band keys: sum of mixed signature slots mod P."""
    slots = sig.reshape(MH_BANDS, MH_ROWS)
    return ((slots * MH_C[None, :]) % P).sum(axis=1) % P


def simhash62(words: list[str]) -> int:
    """62-bit SimHash: per-word h = poly_B1 | (poly_B2 << 31); bit i of the
    result is the majority vote of bit i over word hashes. Empty doc → 0."""
    if not words:
        return 0
    h1 = np.array([poly_hash(w, B1) for w in words], dtype=np.int64)
    h2 = np.array([poly_hash(w, B2) for w in words], dtype=np.int64)
    h = h1 | (h2 << np.int64(31))
    bits = np.arange(SH_BITS, dtype=np.int64)
    votes = ((h[:, None] >> bits[None, :]) & 1).sum(axis=0)
    return int(((votes * 2 > len(words)).astype(np.int64) << bits).sum())


def simhash_band_keys(sim: int) -> list[int]:
    return [(sim >> (SH_BAND_BITS * t)) & ((1 << SH_BAND_BITS) - 1)
            for t in range(SH_BANDS)]


def fingerprint(text: str) -> int:
    """Min over k-gram windows of the codepoint polynomial hash
    (sum cp_j * B1^(k-1-j) mod P). Texts shorter than k are padded with
    codepoint 1."""
    codes = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(
        np.int64
    )
    if len(codes) < FP_K:
        codes = np.pad(codes, (0, FP_K - len(codes)), constant_values=1)
    win = np.lib.stride_tricks.sliding_window_view(codes, FP_K)
    return int((((win * FP_POWERS[None, :]) % P).sum(axis=1) % P).min())


# --- vectorized batch kernels (the Ray-stage hot path) ------------------------

_POW_CACHE: dict[int, np.ndarray] = {}
_MH_CHUNK_BUF: list = []


def _mh_chunk_buffer(width: int | None = None) -> np.ndarray:
    """Worker-persistent (MH_NUM_PERM, >=width) int64 scratch. Sized to the
    REQUESTED width per call (grown, never shrunk): a buffer frozen at the
    first call's MH_GRAM_CHUNK would under-allocate if that first call ran
    while the chunk constant was monkeypatched smaller."""
    width = MH_GRAM_CHUNK if width is None else width
    buf = _MH_CHUNK_BUF[0] if _MH_CHUNK_BUF else None
    if buf is None or buf.shape[1] < width:
        buf = np.empty((MH_NUM_PERM, width), dtype=np.int64)
        _MH_CHUNK_BUF[:] = [buf]
    return buf


def _powers(base: int, upto: int) -> np.ndarray:
    """base^k % P for k in [0, upto] (cached, grown geometrically)."""
    tbl = _POW_CACHE.get(base)
    if tbl is None or len(tbl) <= upto:
        n = max(1024, 2 * (upto + 1))
        tbl = np.empty(n, dtype=np.int64)
        tbl[0] = 1
        for k in range(1, n):
            tbl[k] = (tbl[k - 1] * base) % P
        _POW_CACHE[base] = tbl
    return tbl


def word_hash_array(words: list[str], base: int = B1) -> np.ndarray:
    """poly_hash() of every word, vectorized: one flat codepoint array for
    the whole list, per-char modmul, segment sums via ``np.add.reduceat``.
    Equivalent to ``[poly_hash(w, base) for w in words]`` (asserted in
    tests) without a per-character Python loop."""
    if not words:
        return np.empty(0, dtype=np.int64)
    lens = np.array([len(w) for w in words], dtype=np.int64)
    flat = np.frombuffer(
        "".join(words).encode("utf-32-le"), dtype=np.uint32
    ).astype(np.int64)
    ends = np.cumsum(lens)
    starts = ends - lens
    pos = np.arange(len(flat), dtype=np.int64) - np.repeat(starts, lens)
    revpos = np.repeat(lens, lens) - 1 - pos
    pw = _powers(base, int(lens.max()))[revpos]
    prod = (flat * pw) % P           # < 2^52 before mod: cp<2^21 * pow<2^31
    return np.add.reduceat(prod, starts) % P


def gram_hash_array(words: list[str], n: int = MH_SHINGLE) -> np.ndarray:
    """poly_hash() of every word-n-gram (words joined with GRAM_SEP, padded
    with GRAM_PAD below n words) — built from per-word hashes with the
    polynomial concat identity h(a||b) = h(a)*B^len(b) + h(b) (mod P), so
    the char-level work is one vectorized pass. Equals
    ``[poly_hash(g) for g in shingles(words, n)]`` (asserted in tests)."""
    if len(words) < n:
        words = words + [GRAM_PAD] * (n - len(words))
    hw = word_hash_array(words)
    lens = np.array([len(w) for w in words], dtype=np.int64)
    ptab = _powers(B1, int(lens.max()) + 1)
    pw = ptab[lens]                       # B^len(w) % P
    sep = ord(GRAM_SEP)
    g = hw[: len(words) - n + 1].copy()
    for j in range(1, n):
        hj = hw[j : len(words) - n + 1 + j]
        pj = pw[j : len(words) - n + 1 + j]
        # append SEP + word_j:  g = g*B^(1+len) + (sep*B^len + h(word_j))
        g = (g * ((pj * B1) % P) + ((sep * pj) % P + hj)) % P
    return g


def simhash62_batch(hs: np.ndarray) -> int:
    """simhash62 from precomputed 62-bit word hashes."""
    if len(hs) == 0:
        return 0
    bits = np.arange(SH_BITS, dtype=np.int64)
    votes = ((hs[:, None] >> bits[None, :]) & 1).sum(axis=0)
    return int(((votes * 2 > len(hs)).astype(np.int64) << bits).sum())


def _flatten_docs(docs_words: list[list[str]]):
    """(flat word list, per-doc word counts, per-doc start offsets)."""
    counts = np.array([len(w) for w in docs_words], dtype=np.int64)
    flat = [w for doc in docs_words for w in doc]
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    return flat, counts, starts


def gram_hash_flat(
    texts: list[str], n: int = MH_SHINGLE
) -> tuple[np.ndarray, np.ndarray]:
    """(flat shingle hashes, owning doc index) for a whole batch in one
    flat pass: pad short docs, hash every word once (codepoint reduceat),
    combine shingles with the polynomial concat identity, mask windows that
    cross doc boundaries. Every doc contributes >= 1 shingle (padding), and
    shingles are doc-contiguous in the output."""
    if not texts:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    docs_words = []
    for t in texts:
        w = tokens(t)
        if len(w) < n:
            w = w + [GRAM_PAD] * (n - len(w))
        docs_words.append(w)
    flat, counts, _ = _flatten_docs(docs_words)
    hw = word_hash_array(flat)
    lens = np.array([len(w) for w in flat], dtype=np.int64)
    pw = _powers(B1, int(lens.max()) + 1)[lens]
    doc_of = np.repeat(np.arange(len(texts), dtype=np.int64), counts)

    sep = ord(GRAM_SEP)
    upto = len(flat) - n + 1
    g = hw[:upto].copy()
    for j in range(1, n):
        hj = hw[j:upto + j]
        pj = pw[j:upto + j]
        g = (g * ((pj * B1) % P) + ((sep * pj) % P + hj)) % P
    valid = doc_of[:upto] == doc_of[n - 1:]
    return g[valid], doc_of[:upto][valid]


def gram_sets_docs(texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc SORTED-UNIQUE shingle-hash sets for a whole batch, as
    (values, int32 list offsets of len n_docs+1) — ready for
    pa.ListArray.from_arrays. One lexsort + mask instead of a per-doc
    np.unique loop."""
    g, gram_doc = gram_hash_flat(texts)
    order = np.lexsort((g, gram_doc))
    gs, gd = g[order], gram_doc[order]
    keep = np.r_[True, (gs[1:] != gs[:-1]) | (gd[1:] != gd[:-1])]
    values, vd = gs[keep], gd[keep]
    counts = np.bincount(vd, minlength=len(texts))
    offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    return values, offsets


def fingerprint_docs(texts: list[str]) -> np.ndarray:
    """(n_docs,) fingerprints for a whole batch in one flat pass: concat
    every doc's (padded) codepoints, one sliding-window polynomial over the
    flat array with cross-doc windows masked, per-doc min via
    np.minimum.reduceat. Equals [fingerprint(t) for t in texts]."""
    if not texts:
        return np.empty(0, dtype=np.int64)
    codes_per_doc = []
    for t in texts:
        c = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32).astype(
            np.int64
        )
        if len(c) < FP_K:
            c = np.pad(c, (0, FP_K - len(c)), constant_values=1)
        codes_per_doc.append(c)
    counts = np.array([len(c) for c in codes_per_doc], dtype=np.int64)
    flat = np.concatenate(codes_per_doc)
    doc_of = np.repeat(np.arange(len(texts), dtype=np.int64), counts)
    win = np.lib.stride_tricks.sliding_window_view(flat, FP_K)
    h = ((win * FP_POWERS[None, :]) % P).sum(axis=1) % P
    valid = doc_of[:len(h)] == doc_of[FP_K - 1:]
    h = h[valid]
    win_doc = doc_of[:len(valid)][valid]
    starts = np.concatenate(
        [[0], np.flatnonzero(win_doc[1:] != win_doc[:-1]) + 1]
    )
    return np.minimum.reduceat(h, starts)


def minhash_bands_docs(texts: list[str]) -> np.ndarray:
    """(n_docs, MH_BANDS) band keys for a whole batch of documents in ONE
    flat numpy pass — no per-document Python loop:

    - tokenize + pad short docs, flatten all words, hash them with a single
      word_hash_array call (codepoint-level reduceat);
    - build every doc's shingle hashes from the flat word-hash arrays with
      the polynomial concat identity, masking windows that cross doc
      boundaries;
    - signatures for ALL docs at once: (MH_NUM_PERM, n_grams) permuted
      matrix reduced per doc with np.minimum.reduceat (grams are
      doc-contiguous). ~64·8 bytes per gram of transient memory — ~60 MB
      for a 1024-doc batch, sized for map_batches defaults.

    The (MH_NUM_PERM, n_grams) permutation matrix is computed in gram
    CHUNKS of MH_GRAM_CHUNK columns (per-chunk reduceat minima folded into
    the signature), so transient memory is ~64·8·MH_GRAM_CHUNK bytes
    regardless of how long the batch's documents are — a batch of 10k-word
    docs no longer allocates grams×64 int64 at once.

    Equals the per-doc [band_hashes(minhash_signature(gram_hashes(t)))]
    path (asserted in tests, including across chunk boundaries)."""
    if not texts:
        return np.empty((0, MH_BANDS), dtype=np.int64)
    sig = minhash_sigs_docs(texts)
    slots = sig.reshape(MH_BANDS, MH_ROWS, -1)
    return ((((slots * MH_C[None, :, None]) % P).sum(axis=1)) % P).T


def minhash_sigs_docs(texts: list[str]) -> np.ndarray:
    """(MH_NUM_PERM, n_docs) MinHash signature matrix for a whole batch —
    the flat chunked-perm kernel minhash_bands_docs reduces over, exposed
    so signature-level operators (docs_minhash_sim_topk) share it. Column
    j equals minhash_signature(gram_hashes(texts[j]))."""
    if not texts:
        return np.empty((MH_NUM_PERM, 0), dtype=np.int64)
    g, gram_doc = gram_hash_flat(texts)
    # every doc has >= 1 gram (padding), and grams are doc-contiguous
    gram_starts = np.concatenate(
        [[0], np.flatnonzero(gram_doc[1:] != gram_doc[:-1]) + 1]
    )
    n_docs = len(texts)
    sig = np.full((MH_NUM_PERM, n_docs), P, dtype=np.int64)  # hashes < P
    # one worker-cached chunk buffer + out= kernels: repeated map_batches
    # calls never fault fresh pages for the perm matrix (large fresh
    # allocations are mmap-backed and surprisingly expensive to first-touch
    # on some hosts; the buffer also caps per-task transient memory)
    buf = _mh_chunk_buffer(MH_GRAM_CHUNK)
    for a in range(0, len(g), MH_GRAM_CHUNK):
        b = min(len(g), a + MH_GRAM_CHUNK)
        perms = buf[:, : b - a]
        np.multiply(MH_A[:, None], g[None, a:b], out=perms)
        np.add(perms, MH_B[:, None], out=perms)
        np.remainder(perms, P, out=perms)
        inner = gram_starts[(gram_starts > a) & (gram_starts < b)]
        starts = np.concatenate([[a], inner]) - a
        seg_docs = gram_doc[starts + a]  # unique within a chunk
        mins = np.minimum.reduceat(perms, starts, axis=1)
        sig[:, seg_docs] = np.minimum(sig[:, seg_docs], mins)
    return sig


def simhash62_docs(texts: list[str]) -> np.ndarray:
    """(n_docs,) simhash62 for a whole batch in one flat pass: flat 62-bit
    word hashes, bits unpacked via np.unpackbits on the little-endian byte
    view, per-doc bit votes with np.add.reduceat. Empty docs → 0. Equals
    the per-doc simhash62() path (asserted in tests)."""
    n_docs = len(texts)
    out = np.zeros(n_docs, dtype=np.int64)
    docs_words = [tokens(t) for t in texts]
    counts = np.array([len(w) for w in docs_words], dtype=np.int64)
    nonempty = np.flatnonzero(counts > 0)
    if len(nonempty) == 0:
        return out
    flat = [w for doc in docs_words for w in doc]
    hw = (word_hash_array(flat, B1)
          | (word_hash_array(flat, B2) << np.int64(31)))
    bits = np.unpackbits(
        hw.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
    )[:, :SH_BITS]
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])[nonempty]
    # dtype=int64 accumulates straight from the uint8 bit matrix — the
    # int64 copy it replaces was 8x the transient memory (n_words × 62 × 8B)
    votes = np.add.reduceat(bits, starts, axis=0, dtype=np.int64)
    sign = (votes * 2 > counts[nonempty, None]).astype(np.int64)
    weights = np.int64(1) << np.arange(SH_BITS, dtype=np.int64)
    out[nonempty] = (sign * weights[None, :]).sum(axis=1)
    return out


def prefix_length(m: int, num: int = JC_NUM, den: int = JC_DEN) -> int:
    """Jaccard prefix-filter length: m - ceil(t*m) + 1 (t = num/den).

    Exact-recall guarantee: if J(A,B) >= t then the globally smallest common
    shingle hash lies within both docs' prefixes, so every qualifying pair
    shares a prefix hash (Chaudhuri et al., SSJoin / PPJoin prefix filter).
    """
    ceil_tm = -((-num * m) // den)      # ceil(num*m/den) in exact int math
    return max(1, min(m, m - ceil_tm + 1))


def lsh_planes(dim: int, n_planes: int = LSH_N_PLANES,
               seed: int = LSH_SEED) -> np.ndarray:
    """Seeded random hyperplanes (dim, n_planes) — identical floats are
    embedded into the oracle SQL via :func:`sql_bucket_expr`."""
    return np.random.default_rng(seed).standard_normal((dim, n_planes))


def emb_nd_planes(dim: int) -> np.ndarray:
    """The embedding-near-dup blocking planes (dim, EMB_ND_PLANES)."""
    return lsh_planes(dim, EMB_ND_PLANES, EMB_ND_SEED)


# =============================================================================
# SQL side (DuckDB) — each generator mirrors one Python function above
# =============================================================================

def _sql_list(vals) -> str:
    return "[" + ", ".join(str(int(v)) for v in vals) + "]"


def sql_codepoints(expr: str) -> str:
    """Codepoint list of a string expression (1-based char indexing)."""
    return (f"list_transform(range(1, length({expr})+1), "
            f"i -> unicode({expr}[i])::BIGINT)")


def sql_poly_hash(expr: str, base: int = B1) -> str:
    """poly_hash() of a string expression; empty string → 0."""
    return (f"CASE WHEN length({expr}) = 0 THEN 0 ELSE "
            f"list_reduce({sql_codepoints(expr)}, "
            f"(acc, c) -> (acc*{base} + c) % {P}) END")


def sql_words(expr: str = "text") -> str:
    return rf"regexp_extract_all(lower({expr}), '\S+')"


def sql_gram_hashes_cte(table: str = "documents", prefix: str = "",
                        n: int = MH_SHINGLE) -> str:
    """CTE chain ``w → padded → grams → gh`` ending with
    {prefix}gh(doc_id, hs list<bigint>) — the per-doc word-``n``-gram hash
    list. ``prefix`` namespaces the CTEs so two chains can coexist in one
    query (used by the composed corpus_prep oracle)."""
    pad = ord(GRAM_PAD)
    sep = ord(GRAM_SEP)
    p = prefix
    gram_expr = f" || chr({sep}) || ".join(
        f"words[i+{j}]" if j else "words[i]" for j in range(n)
    )
    return f"""{p}w AS (
  SELECT doc_id, {sql_words()} AS words FROM {table}
), {p}padded AS (
  SELECT doc_id, CASE WHEN len(words) >= {n} THEN words
    ELSE list_concat(words,
                     list_transform(range(len(words), {n}), x -> chr({pad})))
    END AS words
  FROM {p}w
), {p}grams AS (
  SELECT doc_id,
         list_transform(range(1, len(words)-{n - 2}), i -> {gram_expr})
           AS grams
  FROM {p}padded
), {p}gh AS (
  SELECT doc_id, list_transform(grams, g -> {sql_poly_hash('g')}) AS hs
  FROM {p}grams
)"""


def sql_minhash_bands_cte(table: str = "documents", prefix: str = "") -> str:
    """CTE chain ending with {prefix}bands(doc_id, band, band_hash) — the
    exact rows MinHashBandStage emits. Permutation/mixer constants are
    embedded; ``prefix`` namespaces the CTEs."""
    a, b, c = _sql_list(MH_A), _sql_list(MH_B), _sql_list(MH_C)
    p = prefix
    mix = " + ".join(
        f"(sig[{MH_ROWS}*t.band+{i + 1}] * ({c})[{i + 1}]) % {P}"
        for i in range(MH_ROWS)
    )
    return f"""{sql_gram_hashes_cte(table, prefix)}, {p}sig_t AS (
  SELECT doc_id,
         list_transform(range(1, {MH_NUM_PERM + 1}), j ->
           list_min(list_transform(hs,
             h -> (({a})[j] * h + ({b})[j]) % {P}))) AS sig
  FROM {p}gh
), {p}bands AS (
  SELECT doc_id, t.band AS band, ({mix}) % {P} AS band_hash
  FROM {p}sig_t CROSS JOIN (SELECT unnest(range(0, {MH_BANDS})) AS band) t
)"""


def sql_simhash_cte(table: str = "documents") -> str:
    """CTE chain ending with sims(doc_id, simhash) — simhash62() per doc."""
    return f"""w AS (
  SELECT doc_id, {sql_words()} AS words FROM {table}
), wh AS (
  SELECT doc_id, len(words) AS n,
         list_transform(words, x ->
           ({sql_poly_hash('x', B1)})
           | (({sql_poly_hash('x', B2)}) << 31)) AS hs
  FROM w
), sims AS (
  SELECT doc_id, CASE WHEN n = 0 THEN 0 ELSE
    list_sum(list_transform(range(0, {SH_BITS}), i ->
      CASE WHEN 2 * list_sum(list_transform(hs, h -> (h >> i) & 1)) > n
           THEN (1::BIGINT << i) ELSE 0 END)) END AS simhash
  FROM wh
)"""


def sql_fingerprint_select(table: str = "documents") -> str:
    """Full SELECT matching fingerprint() per doc."""
    win = " + ".join(
        f"cp[j+{i}] * {int(FP_POWERS[i])}" if i else
        f"cp[j] * {int(FP_POWERS[i])}"
        for i in range(FP_K)
    )
    return f"""WITH raw AS (
  SELECT doc_id, {sql_codepoints('text')} AS lst, length(text) AS n
  FROM {table}
), cps AS (
  SELECT doc_id, CASE WHEN n >= {FP_K} THEN lst
    ELSE list_concat(lst, list_transform(range(n, {FP_K}), x -> 1)) END AS cp
  FROM raw
)
SELECT doc_id,
       list_min(list_transform(range(1, len(cp)-{FP_K - 2}), j ->
         ({win}) % {P})) % {P} AS fingerprint
FROM cps"""


def sql_bucket_expr(vec_expr: str, dim: int, n_planes: int,
                    seed: int) -> str:
    """Hyperplane bucket id of a list<float> expression: for each plane j,
    bit j is set iff dot(vec, plane_j) > 0 — dots in float64, each plane
    embedded as its own literal (no per-row plane-matrix rebuild).

    FP-boundary caveat (documented, accepted): the Python side computes
    dots with numpy BLAS (pairwise/blocked summation) while DuckDB's
    list_inner_product reduces sequentially. A dot within ~1 ulp of 0
    could therefore flip a bucket bit between pipeline and oracle. With
    seeded continuous-random planes the event has measure ~0 (never
    observed across the fuzz corpora); an epsilon guard would trade this
    for a different boundary at ±eps, so we document instead."""
    pl = lsh_planes(dim, n_planes, seed)
    terms = " + ".join(
        f"CASE WHEN list_inner_product(v.dv, {sql_float_list(pl[:, j])}) > 0 "
        f"THEN {1 << j} ELSE 0 END"
        for j in range(n_planes)
    )
    return (f"(SELECT {terms} FROM "
            f"(SELECT list_transform({vec_expr}, x -> x::DOUBLE) AS dv) v)")


def sql_lsh_bucket_expr(vec_expr: str, dim: int) -> str:
    """ANN-probe bucket id (LSH_N_PLANES planes, LSH_SEED)."""
    return sql_bucket_expr(vec_expr, dim, LSH_N_PLANES, LSH_SEED)


def sql_emb_nd_bucket_expr(vec_expr: str, dim: int) -> str:
    """Embedding-near-dup blocking bucket id (EMB_ND_PLANES planes)."""
    return sql_bucket_expr(vec_expr, dim, EMB_ND_PLANES, EMB_ND_SEED)


def sql_float_list(vals) -> str:
    return "[" + ", ".join(repr(float(x)) for x in vals) + "]"
