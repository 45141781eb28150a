"""Text analysis + deduplication over the ``documents`` table.

Training-data-pipeline operators (SURVEY.md §2.7/§2.9 extensions):
token counting, quality scoring, md5 fingerprints, exact dedup,
exact n-gram-Jaccard near-dup (inverted-index plan), MinHash+LSH,
SimHash, and a stopword/charset language-ID heuristic.

Physical shapes:
- per-doc scalar features: one ``map_batches`` pass, Arrow kernels
  (the reference's string function library re-expressed —
  /root/reference/src/functions.c:160-445);
- exact dedup: hash-partition by a text digest, per-block group —
  first-wins by min doc_id (SURVEY.md §2.9);
- n-gram Jaccard: inverted index (gram → docs) → per-gram pair
  emission → pair-count combine → jaccard filter. No pruning here so
  the DuckDB oracle matches exactly; at 100 TB you'd df-prune grams
  above a document-frequency cap (changes recall, documented);
- MinHash/LSH: signatures per block (vectorized minimum over
  (grams × K) universal hashes), band-bucket shuffle, per-bucket
  candidate pairs — the sub-quadratic scale path.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data import Dataset

from turboxsl_ray.kernels.arrays import as_array
from turboxsl_ray.kernels.hashing import stable_hash64
from turboxsl_ray.stages.partitioning import map_partitions, partition_by_conv

JACCARD_THRESHOLD = 0.2
NGRAM = 3

_MERSENNE = np.uint64((1 << 61) - 1)


def read_documents(sf_dir: str, columns: list[str] | None = None) -> Dataset:
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


# --------------------------------------------------------------------------
# per-doc scalar features
# --------------------------------------------------------------------------

def q_token_stats(sf_dir: str) -> Dataset:
    """doc_id, n_chars (codepoints), n_tokens (whitespace-run split)."""
    ds = read_documents(sf_dir, ["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        text = t["text"]
        trimmed = pc.utf8_trim_whitespace(text)
        n_tokens = pc.add(pc.count_substring_regex(trimmed, r"\s+"), 1)
        return pa.table(
            {
                "doc_id": as_array(t["doc_id"]),
                "n_chars": as_array(pc.cast(pc.utf8_length(text), pa.int64())),
                "n_tokens": as_array(pc.cast(n_tokens, pa.int64())),
            }
        )

    return map_partitions(ds, fn)


def q_quality_score(sf_dir: str) -> Dataset:
    """Heuristic quality features: punctuation/digit counts + ratio +
    a keep/drop flag (the C4-style length & punctuation gates)."""
    ds = read_documents(sf_dir, ["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        text = t["text"]
        n_chars = pc.cast(pc.utf8_length(text), pa.int64())
        n_punct = pc.cast(pc.count_substring_regex(text, r"[.!?,]"), pa.int64())
        n_digits = pc.cast(pc.count_substring_regex(text, r"[0-9]"), pa.int64())
        trimmed = pc.utf8_trim_whitespace(text)
        n_tokens = pc.cast(pc.add(pc.count_substring_regex(trimmed, r"\s+"), 1), pa.int64())
        nc = n_chars.to_numpy(zero_copy_only=False).astype(np.float64)
        npv = n_punct.to_numpy(zero_copy_only=False).astype(np.float64)
        ratio = np.round(np.divide(npv, nc, out=np.zeros_like(npv), where=nc > 0), 6)
        ntok = n_tokens.to_numpy(zero_copy_only=False)
        is_quality = (ntok >= 5) & (ntok <= 2000) & (ratio < 0.1)
        return pa.table(
            {
                "doc_id": as_array(t["doc_id"]),
                "n_chars": as_array(n_chars),
                "n_tokens": as_array(n_tokens),
                "n_punct": as_array(n_punct),
                "n_digits": as_array(n_digits),
                "punct_ratio": pa.array(ratio, type=pa.float64()),
                "is_quality": pa.array(is_quality),
            }
        )

    return map_partitions(ds, fn)


def q_fingerprint(sf_dir: str) -> Dataset:
    """md5 hex fingerprint per document (byte-level identity), the
    reference's ltr:md5_hex (functions.c:886-906)."""
    ds = read_documents(sf_dir, ["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        texts = as_array(t["text"]).to_pylist()
        digests = [hashlib.md5(s.encode("utf-8")).hexdigest() for s in texts]
        return pa.table(
            {
                "doc_id": as_array(t["doc_id"]),
                "text_md5": pa.array(digests, type=pa.string()),
            }
        )

    return map_partitions(ds, fn)


def q_dedup_exact(sf_dir: str) -> Dataset:
    """Exact dedup: group by full text, keep min doc_id + copy count.

    Hash-partition on a 64-bit text digest (cheap shuffle key — the
    full text never needs to be the key), then per-block group. Digest
    collisions are resolved by grouping on the actual text within the
    block."""
    ds = read_documents(sf_dir, ["doc_id", "text"])

    def add_digest(t: pa.Table) -> pa.Table:
        return t.append_column("__h", pa.array(stable_hash64(t["text"]).astype(np.int64)))

    keyed = map_partitions(ds, add_digest)
    parts = partition_by_conv(keyed, 16, keys=["__h"])

    def dedup(t: pa.Table) -> pa.Table:
        df = t.select(["doc_id", "text"]).to_pandas()
        g = df.groupby("text", sort=False)["doc_id"]
        out = pd.DataFrame({"doc_id": g.min(), "n_copies": g.size()}).reset_index()
        out = out[["doc_id", "text", "n_copies"]]
        out["n_copies"] = out["n_copies"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    return map_partitions(parts, dedup)


# --------------------------------------------------------------------------
# n-gram shingles + exact Jaccard (inverted index)
# --------------------------------------------------------------------------

def _doc_shingles(texts: list[str], n: int = NGRAM):
    """Per-doc DISTINCT word-n-gram hash arrays (uint64) + sizes.

    Tokenization contract (== the SQL oracle): split trimmed text on
    whitespace runs; shingle = n consecutive words joined by ' '.
    """
    hashes = []
    sizes = np.empty(len(texts), dtype=np.int64)
    for i, s in enumerate(texts):
        ws = s.strip().split()
        if len(ws) < n:
            grams: set[bytes] = set()
        else:
            grams = {" ".join(ws[j : j + n]).encode() for j in range(len(ws) - n + 1)}
        h = np.fromiter(
            (int.from_bytes(hashlib.blake2b(g, digest_size=8).digest(), "little") for g in grams),
            dtype=np.uint64,
            count=len(grams),
        )
        hashes.append(h)
        sizes[i] = len(grams)
    return hashes, sizes


def _shingle_pairs_block(t: pa.Table) -> pa.Table:
    """documents block → (gram hash, doc_id) inverted-index rows."""
    texts = as_array(t["text"]).to_pylist()
    ids = as_array(t["doc_id"]).to_numpy()
    hashes, sizes = _doc_shingles(texts)
    g = np.concatenate(hashes) if hashes else np.empty(0, dtype=np.uint64)
    d = np.repeat(ids, sizes)
    return pa.table(
        {"g": pa.array(g.astype(np.int64)), "doc_id": pa.array(d, type=pa.int64())}
    )


def _doc_sizes_block(t: pa.Table) -> pa.Table:
    texts = as_array(t["text"]).to_pylist()
    ids = as_array(t["doc_id"]).to_numpy()
    _hashes, sizes = _doc_shingles(texts)
    return pa.table({"doc_id": pa.array(ids, type=pa.int64()), "n": pa.array(sizes)})


def _pairs_in_gram_groups(g: np.ndarray, d: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """All (a < b) doc pairs sharing a gram; input sorted by (g, doc)."""
    starts = np.flatnonzero(np.concatenate(([True], g[1:] != g[:-1])))
    ends = np.append(starts[1:], len(g))
    la, lb = [], []
    for s, e in zip(starts, ends):
        m = e - s
        if m < 2:
            continue
        docs = d[s:e]
        i, j = np.triu_indices(m, k=1)
        la.append(docs[i])
        lb.append(docs[j])
    if not la:
        z = np.empty(0, dtype=np.int64)
        return z, z
    return np.concatenate(la), np.concatenate(lb)


def q_ngram_jaccard(sf_dir: str, threshold: float = JACCARD_THRESHOLD) -> pd.DataFrame:
    """Exact 3-gram-shingle Jaccard near-dup pairs (j >= threshold).

    Plan: inverted index (gram → docs) shuffled by gram hash; per-block
    pair emission with partial pair counts; tiny final combine; jaccard
    against broadcast doc sizes. Unpruned, so it matches the SQL oracle
    bit-for-bit; the scale path adds a document-frequency cap on grams
    (and is what q_minhash_lsh approximates sub-quadratically)."""
    ds = read_documents(sf_dir, ["doc_id", "text"])

    sizes_df = (
        map_partitions(ds, _doc_sizes_block).to_pandas().groupby("doc_id")["n"].sum()
    )
    size_ids = sizes_df.index.to_numpy(np.int64)
    size_vals = sizes_df.to_numpy(np.int64)

    inv = map_partitions(ds, _shingle_pairs_block)
    by_gram = partition_by_conv(inv, 16, keys=["g"])

    def pair_counts(t: pa.Table) -> pa.Table:
        t = t.sort_by([("g", "ascending"), ("doc_id", "ascending")])
        g = as_array(t["g"]).to_numpy()
        d = as_array(t["doc_id"]).to_numpy()
        a, b = _pairs_in_gram_groups(g, d)
        if len(a) == 0:
            return pa.table(
                {"da": pa.array([], pa.int64()), "db": pa.array([], pa.int64()),
                 "c": pa.array([], pa.int64())}
            )
        df = pd.DataFrame({"da": a, "db": b})
        cnt = df.groupby(["da", "db"], sort=False).size().reset_index(name="c")
        return pa.Table.from_pandas(cnt, preserve_index=False)

    from turboxsl_ray.stages.aggregate import collect_tables

    partials = collect_tables(map_partitions(by_gram, pair_counts))
    if not partials:
        return pd.DataFrame(columns=["doc_a", "doc_b", "jaccard"])
    allp = pa.concat_tables(partials).to_pandas()
    agg = allp.groupby(["da", "db"], sort=False)["c"].sum().reset_index()

    pos_a = np.searchsorted(size_ids, agg["da"].to_numpy(np.int64))
    pos_b = np.searchsorted(size_ids, agg["db"].to_numpy(np.int64))
    na = size_vals[pos_a].astype(np.float64)
    nb = size_vals[pos_b].astype(np.float64)
    c = agg["c"].to_numpy(np.float64)
    jraw = c / (na + nb - c)
    out = pd.DataFrame(
        {"doc_a": agg["da"], "doc_b": agg["db"], "jaccard": np.round(jraw, 6)}
    )
    # filter on the UNROUNDED value — the SQL oracle's WHERE does too
    out = out[jraw >= threshold].reset_index(drop=True)
    out["doc_a"] = out["doc_a"].astype(np.int64)
    out["doc_b"] = out["doc_b"].astype(np.int64)
    return out


# --------------------------------------------------------------------------
# MinHash + LSH (sub-quadratic near-dup, the 100 TB path)
# --------------------------------------------------------------------------

MINHASH_K = 64
LSH_BANDS = 16  # 4 rows per band


def _minhash_params(seed: int = 7):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, (1 << 61) - 1, size=MINHASH_K, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, (1 << 61) - 1, size=MINHASH_K, dtype=np.uint64)
    return a, b


def _signatures(texts: list[str]):
    """(n_docs, K) uint64 MinHash signatures, vectorized per doc."""
    hashes, sizes = _doc_shingles(texts)
    a, b = _minhash_params()
    sigs = np.full((len(texts), MINHASH_K), np.iinfo(np.uint64).max, dtype=np.uint64)
    for i, h in enumerate(hashes):
        if len(h) == 0:
            continue
        # universal hash: (a*g + b) mod 2^64 (cheap, adequate spread)
        hv = h[:, None] * a[None, :] + b[None, :]
        sigs[i] = hv.min(axis=0)
    return sigs


def q_minhash_lsh(sf_dir: str, est_threshold: float = 0.5) -> pd.DataFrame:
    """MinHash(K=64) + LSH(16 bands × 4 rows) candidate pairs with
    estimated Jaccard >= est_threshold.

    Per-block signatures → band-bucket shuffle → per-bucket pairs
    carrying signatures (512 B/doc/band here; at scale you'd join
    signatures back by doc_id instead of carrying them) → estimated
    jaccard = fraction of equal signature components. Rows-only check
    (not SQL-expressible); accuracy is pinned by tests against
    q_ngram_jaccard on planted near-dups."""
    ds = read_documents(sf_dir, ["doc_id", "text"])

    def band_rows(t: pa.Table) -> pa.Table:
        texts = as_array(t["text"]).to_pylist()
        ids = as_array(t["doc_id"]).to_numpy()
        sigs = _signatures(texts)
        rows_per_band = MINHASH_K // LSH_BANDS
        n = len(ids)
        bucket = np.empty(n * LSH_BANDS, dtype=np.int64)
        doc = np.repeat(ids, LSH_BANDS)
        sig_bytes = [sigs[i].tobytes() for i in range(n) for _ in range(LSH_BANDS)]
        for bi in range(LSH_BANDS):
            seg = sigs[:, bi * rows_per_band : (bi + 1) * rows_per_band]
            h = np.full(n, np.uint64(bi + 1))
            for c in range(rows_per_band):
                h = h * np.uint64(0x100000001B3) + seg[:, c]
            bucket[bi::LSH_BANDS] = h.astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(bucket),
                "doc_id": pa.array(doc, type=pa.int64()),
                "sig": pa.array(sig_bytes, type=pa.binary()),
            }
        )

    banded = map_partitions(ds, band_rows)
    by_bucket = partition_by_conv(banded, 16, keys=["bucket"])

    def bucket_pairs(t: pa.Table) -> pa.Table:
        t = t.sort_by([("bucket", "ascending"), ("doc_id", "ascending")])
        bk = as_array(t["bucket"]).to_numpy()
        d = as_array(t["doc_id"]).to_numpy()
        sig_col = as_array(t["sig"])
        a_idx, b_idx = [], []
        starts = np.flatnonzero(np.concatenate(([True], bk[1:] != bk[:-1])))
        ends = np.append(starts[1:], len(bk))
        for s, e in zip(starts, ends):
            m = e - s
            if m < 2:
                continue
            i, j = np.triu_indices(m, k=1)
            a_idx.append(s + i)
            b_idx.append(s + j)
        if not a_idx:
            return pa.table(
                {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64()),
                 "est_jaccard": pa.array([], pa.float64())}
            )
        ai = np.concatenate(a_idx)
        bi = np.concatenate(b_idx)
        keep = d[ai] != d[bi]
        ai, bi = ai[keep], bi[keep]
        sa = np.frombuffer(b"".join(sig_col.take(pa.array(ai)).to_pylist()), dtype=np.uint64).reshape(-1, MINHASH_K)
        sb = np.frombuffer(b"".join(sig_col.take(pa.array(bi)).to_pylist()), dtype=np.uint64).reshape(-1, MINHASH_K)
        est = (sa == sb).mean(axis=1)
        da, db = d[ai], d[bi]
        lo = np.minimum(da, db)
        hi = np.maximum(da, db)
        return pa.table(
            {
                "doc_a": pa.array(lo, type=pa.int64()),
                "doc_b": pa.array(hi, type=pa.int64()),
                "est_jaccard": pa.array(np.round(est, 6)),
            }
        )

    cand = map_partitions(by_bucket, bucket_pairs).to_pandas()
    if cand.empty:
        return pd.DataFrame(columns=["doc_a", "doc_b", "est_jaccard"])
    out = (
        cand.groupby(["doc_a", "doc_b"], sort=False)["est_jaccard"].max().reset_index()
    )
    return out[out["est_jaccard"] >= est_threshold].reset_index(drop=True)


# --------------------------------------------------------------------------
# SimHash + language ID
# --------------------------------------------------------------------------

def q_simhash(sf_dir: str) -> Dataset:
    """64-bit SimHash per document over word tokens (hex string)."""
    ds = read_documents(sf_dir, ["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        texts = as_array(t["text"]).to_pylist()
        ids = as_array(t["doc_id"]).to_numpy()
        out = np.empty(len(texts), dtype=np.uint64)
        shifts = np.arange(64, dtype=np.uint64)
        for i, s in enumerate(texts):
            ws = s.split()
            if not ws:
                out[i] = 0
                continue
            hs = np.fromiter(
                (
                    int.from_bytes(hashlib.blake2b(w.encode(), digest_size=8).digest(), "little")
                    for w in ws
                ),
                dtype=np.uint64,
                count=len(ws),
            )
            bits = ((hs[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
            score = (2 * bits - 1).sum(axis=0)
            out[i] = np.bitwise_or.reduce(
                np.where(score >= 0, np.uint64(1) << shifts, np.uint64(0))
            )
        hexes = [f"{int(v):016x}" for v in out]
        return pa.table(
            {"doc_id": pa.array(ids, type=pa.int64()), "simhash": pa.array(hexes)}
        )

    return map_partitions(ds, fn)


_LANG_MARKERS = {
    "en": (" the ", " and ", " of ", " is "),
    "de": (" der ", " und ", " die ", " ist "),
    "fr": (" le ", " la ", " et ", " est "),
    "es": (" el ", " los ", " y ", " es "),
}


def q_lang_id(sf_dir: str) -> Dataset:
    """Stopword/charset language-ID heuristic (deterministic).

    CJK codepoint presence → zh; otherwise the language whose marker
    words hit most (ties → en). Rows-only check; mechanics (not
    accuracy on synthetic text) are what tests pin."""
    ds = read_documents(sf_dir, ["doc_id", "text"])
    langs = list(_LANG_MARKERS)

    def fn(t: pa.Table) -> pa.Table:
        text = t["text"]
        padded = pc.binary_join_element_wise(" ", text, " ")
        cjk = pc.count_substring_regex(padded, r"[一-鿿]").to_numpy(
            zero_copy_only=False
        )
        scores = np.zeros((t.num_rows, len(langs)), dtype=np.int64)
        for li, lang in enumerate(langs):
            for m in _LANG_MARKERS[lang]:
                scores[:, li] += pc.count_substring(padded, m).to_numpy(
                    zero_copy_only=False
                )
        best = np.argmax(scores, axis=1)  # ties → lowest index (en first)
        pred = np.array(langs, dtype=object)[best]
        pred = np.where(cjk > 0, "zh", pred)
        no_signal = (scores.max(axis=1) == 0) & (cjk == 0)
        pred = np.where(no_signal, "unknown", pred)
        return pa.table(
            {
                "doc_id": as_array(t["doc_id"]),
                "pred_lang": pa.array(pred, type=pa.string()),
                "marker_hits": pa.array(scores.max(axis=1), type=pa.int64()),
            }
        )

    return map_partitions(ds, fn)


# --------------------------------------------------------------------------
# scalar string-function library surface (functions/strings.py)
# --------------------------------------------------------------------------

def q_string_funcs(sf_dir: str) -> Dataset:
    """One projection exercising the XPath/ltr string library
    (functions/strings.py; reference functions.c:160-751) — every
    column has an exact DuckDB equivalent in the oracle."""
    from turboxsl_ray.functions import strings as F

    ds = read_documents(sf_dir, ["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        txt = t["text"]
        return pa.table(
            {
                "doc_id": as_array(t["doc_id"]),
                "prefix8": F.substring(txt, 1, 8),
                "before_sp": F.substring_before(txt, " "),
                "after_sp": F.substring_after(txt, " "),
                "has_agg": F.contains(txt, "agg"),
                "starts_key": F.starts_with(txt, "key"),
                "norm": F.normalize_space(txt),
                "n_cp": F.string_length(txt),
                "vowels_up": F.translate(txt, "aeiou", "AEIOU"),
                "upper": F.upper(txt),
                "len_r7": F.xpath_round(pc.divide(pc.cast(pc.utf8_length(txt), pa.float64()), 7.0)),
            }
        )

    return map_partitions(ds, fn)
