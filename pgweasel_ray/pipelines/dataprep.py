"""Training-data-pipeline operators over ``documents`` / ``embeddings``.

These go beyond the reference (which is scan-filter-aggregate only — SURVEY
§2.4) and cover what a large-scale corpus pipeline needs: exact and near
deduplication, similarity search, and text analysis. All are Ray-Data-first:
a vectorized/actor-pool ``map_batches`` per-doc stage, then pre-aggregated
``groupby`` for anything that must see groups.

Scale notes (10^12-doc design, tested at sf scale):
- exact dedup groups by a 128-bit content hash (two independent seeded
  xxhashes via polars), so the shuffle moves 24-byte keys, never document
  text; survivors = Min(doc_id) per group.
- MinHash-LSH emits (band, band_hash, doc_id) rows — b×rows of 24 bytes —
  and groups by band key; duplicate ids are collected and removed via a
  broadcast set here (small at test scale) — the documented scale path is a
  hash-bucket anti-join instead of the driver-side set.
- ANN keeps the query matrix broadcast (ray.put once) and does a numpy
  matmul per batch; top-k is a distributed sort+limit over (sim, vec_id).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset
from ray.data.aggregate import Min

from .common import grouped_count

STOPWORDS_PATTERN = r"\b(the|and|of|to|a|in|is|it)\b"
TOKEN_PATTERN = r"\S+"

LANG_STOPWORDS = {  # tiny per-language function-word sets (n-gram heuristic)
    "en": r"\b(the|and|of|to|in|is|that|it|for|with)\b",
    "de": r"\b(der|die|das|und|ist|nicht|mit|ein|eine|zu)\b",
    "fr": r"\b(le|la|les|et|est|une|pour|dans|que|des)\b",
    "es": r"\b(el|la|los|las|es|una|para|que|con|por)\b",
}


def _docs(sf_dir: str, columns: list[str]) -> Dataset:
    import ray.data

    return ray.data.read_parquet(
        str(Path(sf_dir) / "documents.parquet"), columns=columns
    )


def _embeddings(sf_dir: str, columns: list[str] | None = None) -> Dataset:
    import ray.data

    return ray.data.read_parquet(
        str(Path(sf_dir) / "embeddings.parquet"), columns=columns
    )


# --- exact dedup -------------------------------------------------------------

def _content_hash(batch: pa.Table) -> pa.Table:
    import polars as pl

    df = pl.from_arrow(batch.select(["doc_id", "text"]))
    h1 = df["text"].hash(seed=1).to_numpy().view(np.int64)
    h2 = df["text"].hash(seed=2).to_numpy().view(np.int64)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "h1": pa.array(h1, type=pa.int64()),
            "h2": pa.array(h2, type=pa.int64()),
        }
    )


def dedup_exact(sf_dir: str) -> Dataset:
    """Exact dedup: keep min doc_id per identical text (128-bit content-hash
    group key; the shuffle never carries text)."""
    hashed = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        _content_hash, batch_format="pyarrow", zero_copy_batch=True
    )
    survivors = hashed.groupby(["h1", "h2"]).aggregate(
        Min("doc_id", alias_name="doc_id")
    )
    return survivors.select_columns(["doc_id"])


# --- text analysis -----------------------------------------------------------

def _token_stats(batch: pa.Table) -> pa.Table:
    text = batch["text"]
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_chars": pc.cast(pc.utf8_length(text), pa.int64()),
            "n_tokens": pc.cast(
                pc.count_substring_regex(text, TOKEN_PATTERN), pa.int64()
            ),
        }
    )


def docs_token_stats(sf_dir: str) -> Dataset:
    """Char + whitespace-token counts per document (vectorized RE2)."""
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        _token_stats, batch_format="pyarrow", zero_copy_batch=True
    )


def _quality(batch: pa.Table) -> pa.Table:
    text = batch["text"]
    lower = pc.utf8_lower(text)
    n_tokens = pc.cast(pc.count_substring_regex(text, TOKEN_PATTERN), pa.int64())
    n_stop = pc.cast(
        pc.count_substring_regex(lower, STOPWORDS_PATTERN), pa.int64()
    )
    n_digits = pc.cast(pc.count_substring_regex(text, r"[0-9]"), pa.int64())
    nt = n_tokens.to_numpy(zero_copy_only=False).astype(np.float64)
    ns = n_stop.to_numpy(zero_copy_only=False).astype(np.float64)
    ratio = np.where(nt > 0, ns / np.where(nt > 0, nt, 1.0), np.nan)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": n_tokens,
            "n_stop": n_stop,
            "n_digits": n_digits,
            "stop_ratio": pa.array(ratio, type=pa.float64(), mask=np.isnan(ratio)),
        }
    )


BPE_ISH_PATTERN = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"


def _bpe_tokens(batch: pa.Table) -> pa.Table:
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_bpe_tokens": pc.cast(
                pc.count_substring_regex(batch["text"], BPE_ISH_PATTERN),
                pa.int64(),
            ),
        }
    )


def docs_bpe_tokens(sf_dir: str) -> Dataset:
    """BPE-ish token counting: alphanumeric runs + single punctuation marks
    (the pre-tokenizer shape most BPE vocabularies split on)."""
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        _bpe_tokens, batch_format="pyarrow", zero_copy_batch=True
    )


def docs_quality(sf_dir: str) -> Dataset:
    """Quality-scoring signals: token/stopword/digit counts + stopword ratio
    (int counts exact; the ratio is one int/int division — IEEE-identical to
    the oracle's)."""
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        _quality, batch_format="pyarrow", zero_copy_batch=True
    )


def _lang_id(batch: pa.Table) -> pa.Table:
    lower = pc.utf8_lower(batch["text"])
    scores = np.stack(
        [
            pc.count_substring_regex(lower, pat)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
            for pat in LANG_STOPWORDS.values()
        ],
        axis=1,
    )
    langs = np.array(list(LANG_STOPWORDS), dtype=object)
    pred = langs[np.argmax(scores, axis=1)]  # ties → first language in dict order
    pred[scores.max(axis=1) == 0] = "unknown"
    return pa.table(
        {"doc_id": batch["doc_id"], "lang_pred": pa.array(pred, type=pa.string())}
    )


QF_MIN_TOKENS = 30
QF_MAX_DIGIT_RATIO = 0.3


def _quality_filter(batch: pa.Table) -> pa.Table:
    q = _quality(batch)
    nt = q["n_tokens"].to_numpy(zero_copy_only=False).astype(np.float64)
    nd = q["n_digits"].to_numpy(zero_copy_only=False).astype(np.float64)
    keep = (nt >= QF_MIN_TOKENS) & (nd < QF_MAX_DIGIT_RATIO * np.maximum(nt, 1.0))
    return pa.table({"doc_id": q["doc_id"]}).filter(pa.array(keep))


def docs_quality_filter(sf_dir: str) -> Dataset:
    """The corpus quality FILTER (the primitive a training-data pipeline
    actually applies): keep doc_ids with ≥30 tokens and digit count below
    30% of tokens. Pure int comparisons ⇒ oracle-exact."""
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        _quality_filter, batch_format="pyarrow", zero_copy_batch=True
    )


def docs_lang_id(sf_dir: str) -> Dataset:
    """Language ID via per-language function-word hit counts (vectorized
    RE2); accuracy is asserted against the table's ``lang`` column in
    tests, not via SQL oracle."""
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        _lang_id, batch_format="pyarrow", zero_copy_batch=True
    )


# --- fingerprint (rolling hash) ---------------------------------------------

FP_K = 8           # rolling window (codepoints)
FP_BASE = np.uint64(1099511628211)


class FingerprintStage:
    """Winnowing-style fingerprint: min of k-gram rolling hashes over the
    codepoint sequence (uint64 wraparound arithmetic — deterministic across
    platforms). Stateful stage: the power vector is built once per actor."""

    def __init__(self, k: int = FP_K):
        self.k = k
        with np.errstate(over="ignore"):
            self.powers = FP_BASE ** np.arange(k - 1, -1, -1, dtype=np.uint64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        out = np.zeros(len(texts), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for i, t in enumerate(texts):
                codes = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32).astype(
                    np.uint64
                )
                if len(codes) < self.k:
                    codes = np.pad(codes, (0, self.k - len(codes)), constant_values=1)
                win = np.lib.stride_tricks.sliding_window_view(codes, self.k)
                hashes = (win * self.powers).sum(axis=1)
                out[i] = hashes.min()
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "fingerprint": pa.array(out.astype(np.int64), type=pa.int64()),
            }
        )


def docs_fingerprint(sf_dir: str) -> Dataset:
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        FingerprintStage, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=(1, 4),
    )


# --- MinHash-LSH near-dup ----------------------------------------------------

MH_NUM_PERM = 64
MH_BANDS = 16          # 16 bands × 4 rows
MH_SHINGLE = 3         # word 3-grams
_MERSENNE = np.uint64((1 << 61) - 1)


class MinHashBandStage:
    """doc → (band, band_hash, doc_id) rows. Signature: 64 universal-hash
    permutations over word-3-gram hashes; bands of 4 signature slots."""

    def __init__(self, num_perm: int = MH_NUM_PERM, bands: int = MH_BANDS,
                 shingle: int = MH_SHINGLE):
        rng = np.random.default_rng(12345)
        self.a = rng.integers(1, _MERSENNE, num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, num_perm, dtype=np.uint64)
        self.num_perm, self.bands, self.shingle = num_perm, bands, shingle
        self.rows_per_band = num_perm // bands

    def _shingle_hashes(self, text: str) -> np.ndarray:
        words = text.lower().split()
        if len(words) < self.shingle:
            words = words + ["\x00"] * (self.shingle - len(words))
        from hashlib import blake2b

        grams = {
            "\x1f".join(words[i : i + self.shingle])
            for i in range(len(words) - self.shingle + 1)
        }
        return np.frombuffer(
            b"".join(
                blake2b(g.encode(), digest_size=8).digest() for g in sorted(grams)
            ),
            dtype=np.uint64,
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        out_band, out_hash, out_doc = [], [], []
        with np.errstate(over="ignore"):
            for doc_id, text in zip(doc_ids, texts):
                sh = self._shingle_hashes(text)
                # (num_perm, n_shingles) universal hashing, min per row
                sig = ((self.a[:, None] * sh[None, :] + self.b[:, None])
                       % _MERSENNE).min(axis=1)
                bands = sig.reshape(self.bands, self.rows_per_band)
                bh = (bands * np.uint64(0x9E3779B97F4A7C15)).sum(axis=1)
                out_band.extend(range(self.bands))
                out_hash.extend(bh.astype(np.int64))
                out_doc.extend([doc_id] * self.bands)
        return pa.table(
            {
                "band": pa.array(out_band, type=pa.int32()),
                "band_hash": pa.array(out_hash, type=pa.int64()),
                "doc_id": pa.array(out_doc, type=pa.int64()),
            }
        )


def _emit_dominated(df: pd.DataFrame) -> pd.DataFrame:
    m = df["doc_id"].min()
    dup = df.loc[df["doc_id"] != m, ["doc_id"]].drop_duplicates()
    return dup if len(dup) else pd.DataFrame({"doc_id": pd.Series([], dtype="int64")})


def _anti_join_survivors(sf_dir: str, dups: Dataset,
                         id_col: str = "doc_id") -> pd.DataFrame:
    """Distributed survivors = ids LEFT ANTI JOIN dominated ids — the
    hash-partitioned join is the 10^12-scale path (no driver-side id set);
    only the final (small) survivor id list is collected."""
    table = "documents.parquet" if id_col == "doc_id" else "embeddings.parquet"
    import ray.data

    all_ids = ray.data.read_parquet(
        str(Path(sf_dir) / table), columns=[id_col]
    )
    # empty per-group outputs yield schema-less blocks that break the join's
    # key resolution — re-type every block explicitly
    dups = dups.map_batches(
        _coerce_id_schema, batch_format="pandas", fn_kwargs={"id_col": id_col}
    )
    n_dups = dups.count()
    if n_dups == 0:
        out = all_ids.to_pandas()[id_col]
    else:
        # empty right-side partitions break key resolution in Ray's hash
        # join, so partitions scale with the dup count (at 10^12-doc scale
        # every partition is dense and this is simply n_cpus-sized)
        survivors = all_ids.join(
            dups, join_type="left_anti",
            num_partitions=max(1, min(8, n_dups // 8)),
            on=(id_col,),
        )
        out = survivors.to_pandas()[id_col]
    return pd.DataFrame(
        {id_col: out.sort_values().reset_index(drop=True)}
    )


def _coerce_id_schema(df: pd.DataFrame, id_col: str) -> pa.Table:
    vals = df[id_col].to_numpy() if id_col in df.columns else []
    return pa.table({id_col: pa.array(vals, type=pa.int64())})


def dedup_minhash(sf_dir: str) -> pd.DataFrame:
    """MinHash-LSH near-dup removal: survivors = docs never sharing an LSH
    band bucket with a smaller doc_id, via a distributed left-anti join on
    the dominated-id set."""
    band_rows = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        MinHashBandStage, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=(1, 4),
    )
    dups = band_rows.groupby(["band", "band_hash"]).map_groups(
        _emit_dominated, batch_format="pandas"
    )
    return _anti_join_survivors(sf_dir, dups)


def _emit_pairs(df: pd.DataFrame) -> pd.DataFrame:
    """Candidate pairs (a < b) within one LSH band bucket."""
    ids = sorted(set(df["doc_id"]))
    if len(ids) < 2:
        return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                             "b": pd.Series([], dtype="int64")})
    return pd.DataFrame(
        [(ids[i], ids[j]) for i in range(len(ids)) for j in range(i + 1, len(ids))],
        columns=["a", "b"],
    )


def _word_ngrams(text: str, n: int) -> set[str]:
    words = text.lower().split()
    if len(words) < n:
        return {" ".join(words)} if words else set()
    return {" ".join(words[i : i + n]) for i in range(len(words) - n + 1)}


def dedup_ngram_jaccard(sf_dir: str, n: int = MH_SHINGLE,
                        threshold: float = 0.7) -> pd.DataFrame:
    """Verified near-dup removal: MinHash-LSH proposes candidate pairs, the
    exact word-n-gram Jaccard similarity verifies them; a doc is dropped iff
    J(doc, smaller-id doc) ≥ threshold for some verified pair. (The verify
    step is what plain LSH dedup lacks — no false-positive drops.)

    Scale path: the verification join ships candidate pairs (two int64s) to
    a hash-bucket join against the documents table keyed by doc_id; here the
    candidate set is collected and verified driver-side."""
    band_rows = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        MinHashBandStage, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=(1, 4),
    )
    pairs = band_rows.groupby(["band", "band_hash"]).map_groups(
        _emit_pairs, batch_format="pandas"
    ).to_pandas().drop_duplicates()
    all_docs = _docs(sf_dir, ["doc_id", "text"]).to_pandas()
    texts = dict(zip(all_docs["doc_id"], all_docs["text"]))
    grams: dict[int, set[str]] = {}

    def g(i: int) -> set[str]:
        if i not in grams:
            grams[i] = _word_ngrams(texts[i], n)
        return grams[i]

    dropped: set[int] = set()
    for a, b in sorted(zip(pairs["a"], pairs["b"])):
        ga, gb = g(int(a)), g(int(b))
        union = len(ga | gb)
        if union and len(ga & gb) / union >= threshold:
            dropped.add(int(b))
    out = all_docs["doc_id"][~all_docs["doc_id"].isin(dropped)]
    return pd.DataFrame({"doc_id": out.sort_values().reset_index(drop=True)})


# --- SimHash near-dup --------------------------------------------------------

SH_BANDS = 4  # 4 × 16-bit bands → catches hamming distance ≤ 3


class SimHashBandStage:
    """64-bit SimHash over word hashes; emits 16-bit band keys for blocking."""

    def __init__(self):
        self.bits = np.uint64(1) << np.arange(64, dtype=np.uint64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from hashlib import blake2b

        doc_ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        sims = np.zeros(len(texts), dtype=np.uint64)
        for i, t in enumerate(texts):
            words = t.lower().split()
            if not words:
                continue
            wh = np.frombuffer(
                b"".join(blake2b(w.encode(), digest_size=8).digest()
                         for w in words),
                dtype=np.uint64,
            )
            votes = ((wh[:, None] & self.bits[None, :]) != 0).sum(axis=0)
            sims[i] = np.uint64(
                ((votes * 2 > len(wh)).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum()
            )
        out_band, out_key, out_doc, out_sim = [], [], [], []
        for doc_id, s in zip(doc_ids, sims):
            s_signed = int(s.view(np.int64))  # int64 reinterpretation for Arrow
            for b in range(SH_BANDS):
                out_band.append(b)
                out_key.append(int((s >> np.uint64(16 * b)) & np.uint64(0xFFFF)))
                out_doc.append(doc_id)
                out_sim.append(s_signed)
        return pa.table(
            {
                "band": pa.array(out_band, type=pa.int32()),
                "band_hash": pa.array(out_key, type=pa.int64()),
                "doc_id": pa.array(out_doc, type=pa.int64()),
                "simhash": pa.array(out_sim, type=pa.int64()),
            }
        )


def _emit_simhash_dups(df: pd.DataFrame) -> pd.DataFrame:
    """Within a band bucket, dominated = hamming ≤ 3 to a smaller doc_id."""
    if len(df) < 2:
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64")})
    df = df.sort_values("doc_id")
    sims = df["simhash"].to_numpy().view(np.uint64)
    ids = df["doc_id"].to_numpy()
    x = sims[None, :] ^ sims[:, None]
    ham = np.zeros_like(x, dtype=np.int64)
    for _ in range(64):
        ham += (x & np.uint64(1)).astype(np.int64)
        x >>= np.uint64(1)
    close = ham <= 3
    dominated = [
        int(ids[j])
        for j in range(len(ids))
        for i in range(j)
        if close[i, j]
    ]
    return pd.DataFrame({"doc_id": pd.Series(sorted(set(dominated)), dtype="int64")})


def dedup_simhash(sf_dir: str) -> pd.DataFrame:
    band_rows = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        SimHashBandStage, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=(1, 4),
    )
    dom = band_rows.groupby(["band", "band_hash"]).map_groups(
        _emit_simhash_dups, batch_format="pandas"
    ).select_columns(["doc_id"])
    return _anti_join_survivors(sf_dir, dom)


# --- similarity search -------------------------------------------------------

def _query_vector(sf_dir: str) -> np.ndarray:
    import pyarrow.parquet as pq

    t = pq.read_table(
        Path(sf_dir) / "embeddings.parquet", columns=["vec_id", "embedding"]
    )
    row = t.filter(pc.equal(t["vec_id"], 0))
    return np.asarray(row["embedding"].to_pylist()[0], dtype=np.float64)


class CosineStage:
    """Brute-force cosine vs a broadcast query vector; per-batch numpy
    matmul over the zero-copy list<float> column."""

    def __init__(self, q):
        import ray

        if isinstance(q, ray.ObjectRef):
            q = ray.get(q)
        self.q = np.asarray(q, dtype=np.float64)
        self.qn = np.linalg.norm(self.q)

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = batch["embedding"]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        mat = np.asarray(emb.flatten(), dtype=np.float64).reshape(
            len(batch), -1
        )
        sims = (mat @ self.q) / (np.linalg.norm(mat, axis=1) * self.qn)
        return pa.table(
            {"vec_id": batch["vec_id"], "sim": pa.array(sims, type=pa.float64())}
        )


def ann_cosine_topk(sf_dir: str, k: int = 10) -> Dataset:
    """Exact top-k cosine neighbours of vec_id 0 (the ANN baseline):
    broadcast query, per-batch matmul, distributed sort+limit."""
    import ray

    q_ref = ray.put(_query_vector(sf_dir))
    sims = _embeddings(sf_dir, ["vec_id", "embedding"]).map_batches(
        CosineStage, batch_format="pyarrow", zero_copy_batch=True,
        fn_constructor_args=(q_ref,), concurrency=(1, 4),
    )
    top = sims.sort(["sim", "vec_id"], descending=[True, False]).limit(k)
    return top.select_columns(["vec_id"])


class LshBucketStage:
    """Random-hyperplane signatures (the scale path for ANN): vectors land
    in 2^n_planes buckets; only the query's bucket(s) are scanned."""

    def __init__(self, dim: int, n_planes: int = 8, seed: int = 777):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, n_planes))

    def signature(self, mat: np.ndarray) -> np.ndarray:
        bits = (mat @ self.planes) > 0
        return (bits * (1 << np.arange(bits.shape[1]))).sum(axis=1).astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = batch["embedding"]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        mat = np.asarray(emb.flatten(), dtype=np.float64).reshape(len(batch), -1)
        return batch.append_column(
            "bucket", pa.array(self.signature(mat), type=pa.int64())
        )


def ann_lsh_topk(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """Approximate top-k: filter to the query's LSH bucket, exact cosine on
    the survivors only. Recall vs ``ann_cosine_topk`` is asserted in tests."""
    import ray

    q = _query_vector(sf_dir)
    stage = LshBucketStage(dim=len(q))
    q_bucket = int(stage.signature(q[None, :])[0])
    q_ref = ray.put(q)
    ds = _embeddings(sf_dir, ["vec_id", "embedding"]).map_batches(
        LshBucketStage, batch_format="pyarrow", zero_copy_batch=True,
        fn_constructor_args=(len(q),), concurrency=(1, 4),
    )
    bucket = ds.map_batches(
        _filter_bucket, batch_format="pyarrow", zero_copy_batch=True,
        fn_kwargs={"bucket": q_bucket},
    )
    sims = bucket.map_batches(
        CosineStage, batch_format="pyarrow", zero_copy_batch=True,
        fn_constructor_args=(q_ref,), concurrency=(1, 2),
    )
    top = sims.sort(["sim", "vec_id"], descending=[True, False]).limit(k)
    return top.select_columns(["vec_id"]).to_pandas()


def _filter_bucket(batch: pa.Table, bucket: int) -> pa.Table:
    return batch.filter(pc.equal(batch["bucket"], bucket))


# --- IVF ANN (coarse k-means quantizer) --------------------------------------

IVF_NLIST = 16
IVF_NPROBE = 4


def _train_centroids(sf_dir: str, nlist: int, iters: int = 10) -> np.ndarray:
    """Deterministic spherical k-means over a driver-side sample (training
    data is a sample even at 10^12 scale; assignment is the distributed
    part). Returns L2-normalized centroids (nlist, dim)."""
    import pyarrow.parquet as pq

    t = pq.read_table(Path(sf_dir) / "embeddings.parquet",
                      columns=["embedding"])
    mat = np.stack(t["embedding"].to_pylist()).astype(np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    rng = np.random.default_rng(424242)
    centroids = mat[rng.choice(len(mat), size=min(nlist, len(mat)),
                               replace=False)]
    for _ in range(iters):
        assign = (mat @ centroids.T).argmax(axis=1)
        for c in range(len(centroids)):
            members = mat[assign == c]
            if len(members):
                v = members.sum(axis=0)
                centroids[c] = v / np.linalg.norm(v)
    return centroids


class IvfAssignStage:
    """vector → nearest-centroid list id (broadcast centroids, per-batch
    matmul) — the distributed IVF assignment."""

    def __init__(self, centroids):
        import ray

        if isinstance(centroids, ray.ObjectRef):
            centroids = ray.get(centroids)
        self.centroids = np.asarray(centroids, dtype=np.float64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = batch["embedding"]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        mat = np.asarray(emb.flatten(), dtype=np.float64).reshape(len(batch), -1)
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        lists = (mat @ self.centroids.T).argmax(axis=1)
        return batch.append_column(
            "ivf_list", pa.array(lists.astype(np.int64), type=pa.int64())
        )


def ann_ivf_topk(sf_dir: str, k: int = 10, nlist: int = IVF_NLIST,
                 nprobe: int = IVF_NPROBE) -> pd.DataFrame:
    """IVF ANN: spherical-k-means coarse quantizer, vectors assigned to
    inverted lists, the query probes its ``nprobe`` nearest lists and runs
    exact cosine only there. ``nprobe == nlist`` degenerates to exact
    brute force (asserted in tests); smaller nprobe trades recall for a
    ~nlist/nprobe scan reduction."""
    import ray

    q = _query_vector(sf_dir)
    centroids = _train_centroids(sf_dir, nlist)
    qn = q / np.linalg.norm(q)
    probed = np.argsort(-(centroids @ qn))[:nprobe]
    c_ref, q_ref = ray.put(centroids), ray.put(q)
    ds = _embeddings(sf_dir, ["vec_id", "embedding"]).map_batches(
        IvfAssignStage, batch_format="pyarrow", zero_copy_batch=True,
        fn_constructor_args=(c_ref,), concurrency=(1, 4),
    )
    probed_ds = ds.map_batches(
        _filter_ivf_lists, batch_format="pyarrow", zero_copy_batch=True,
        fn_kwargs={"lists": sorted(int(x) for x in probed)},
    )
    sims = probed_ds.map_batches(
        CosineStage, batch_format="pyarrow", zero_copy_batch=True,
        fn_constructor_args=(q_ref,), concurrency=(1, 2),
    )
    top = sims.sort(["sim", "vec_id"], descending=[True, False]).limit(k)
    return top.select_columns(["vec_id"]).to_pandas()


def _filter_ivf_lists(batch: pa.Table, lists: list[int]) -> pa.Table:
    mask = pc.is_in(batch["ivf_list"], value_set=pa.array(lists, type=pa.int64()))
    return batch.filter(pc.fill_null(mask, False))


def embed_neardup(sf_dir: str, threshold: float = 0.999) -> pd.DataFrame:
    """Embedding-cosine near-dup: block by LSH bucket, exact cosine within
    blocks, survivors = min vec_id per near-dup cluster edge."""
    ds = _embeddings(sf_dir, ["vec_id", "embedding"]).map_batches(
        LshBucketStage, batch_format="pyarrow", zero_copy_batch=True,
        fn_constructor_args=(_embedding_dim(sf_dir),), concurrency=(1, 4),
    )
    dom = ds.groupby("bucket").map_groups(
        _emit_cosine_dups, batch_format="pandas",
        fn_kwargs={"threshold": threshold},
    )
    return _anti_join_survivors(sf_dir, dom, id_col="vec_id")


def _embedding_dim(sf_dir: str) -> int:
    return len(_query_vector(sf_dir))


def _emit_cosine_dups(df: pd.DataFrame, threshold: float) -> pd.DataFrame:
    if len(df) < 2:
        return pd.DataFrame({"vec_id": pd.Series([], dtype="int64")})
    df = df.sort_values("vec_id")
    mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = mat @ mat.T
    ids = df["vec_id"].to_numpy()
    dominated = sorted(
        {int(ids[j]) for j in range(len(ids)) for i in range(j)
         if sims[i, j] > threshold}
    )
    return pd.DataFrame({"vec_id": pd.Series(dominated, dtype="int64")})
