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
- n-gram Jaccard: ONE inverted-index pass (per-doc gram counts ride on
  the rows) → gram-keyed shuffle → vectorized per-gram pair emission +
  per-block partial counts → pair-keyed shuffle combine + jaccard.
  Uncapped matches the DuckDB oracle exactly; ``df_cap`` prunes
  stop-grams (bounded m² blow-up, documented recall trade);
- MinHash/LSH: signature table computed once, band-bucket shuffle over
  (bucket, doc_id) only, pair-keyed candidate dedup, signatures joined
  back by doc id — the sub-quadratic scale path with no driver-side
  combine anywhere.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data import Dataset

from turboxsl_ray.context import partitions_for_input
from turboxsl_ray.kernels.arrays import as_array
from turboxsl_ray.kernels.hashing import stable_hash64
from turboxsl_ray.stages.partitioning import map_partitions, partition_by_conv

JACCARD_THRESHOLD = 0.2
NGRAM = 3

_MERSENNE = np.uint64((1 << 61) - 1)


def _docs_path(sf_dir: str) -> str:
    return f"{sf_dir}/documents.parquet"


def read_documents(
    sf_dir: str, columns: list[str] | None = None, spread: bool = False
) -> Dataset:
    """``spread=True`` re-blocks few-file inputs so compute-heavy
    per-doc stages (shingling, minhashing) parallelize — a single
    parquet file otherwise reads as ONE block and serializes the whole
    stage on one worker. At real scale inputs are many-file and this
    is a no-op (guarded by the input file count)."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)
    if spread:
        try:
            n_files = len(ds.input_files())
        except Exception:
            n_files = 0
        if 0 < n_files < 8:
            ds = ds.repartition(16)
    return ds


# --------------------------------------------------------------------------
# per-doc scalar features
# --------------------------------------------------------------------------

# GPT-2-style pretokenizer classes, RE2 syntax: contraction suffixes,
# space-prefixed letter runs, digit runs, punctuation runs, whitespace.
# Arrow's count_substring_regex and DuckDB's regexp_* both run RE2, so
# the SQL oracle counts with the IDENTICAL engine semantics.
BPE_TOKEN_RE = r"'(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def q_token_stats(sf_dir: str) -> Dataset:
    """doc_id, n_chars (codepoints), n_tokens (whitespace-run split),
    n_bpe_tokens (BPE-ish pretokenizer match count)."""
    ds = read_documents(sf_dir, ["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        text = t["text"]
        trimmed = pc.utf8_trim_whitespace(text)
        n_tokens = pc.add(pc.count_substring_regex(trimmed, r"\s+"), 1)
        n_bpe = pc.count_substring_regex(text, BPE_TOKEN_RE)
        return pa.table(
            {
                "doc_id": as_array(t["doc_id"]),
                "n_chars": as_array(pc.cast(pc.utf8_length(text), pa.int64())),
                "n_tokens": as_array(pc.cast(n_tokens, pa.int64())),
                "n_bpe_tokens": as_array(pc.cast(n_bpe, pa.int64())),
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
    reference's ltr:md5_hex (functions.c:886-906).

    POLICY (md5 vs stable_hash64): md5 exists for ORACLE/IDENTITY
    PARITY — external systems and the reference compare md5 hex
    digests, so this query must produce them, and no vectorized md5
    kernel exists in Arrow/numpy/pandas (the per-row hashlib loop is a
    C-speed digest per row, same as ltr:md5_hex). Every ENGINE-internal
    fingerprint at scale (dedup digests, partition ids, shingle/gram
    hashes) instead uses kernels/hashing.stable_hash64, which is fully
    vectorized — a reader building a 100 TB fingerprint path should
    reach for stable_hash64 unless md5 compatibility is the point.
    The same note covers _winnow_doc's per-doc loop below: it
    amortizes to O(bytes) numpy per document, but its uint64 rolling
    hash (not md5) is already the scale-friendly choice."""
    ds = read_documents(sf_dir, ["doc_id", "text"], spread=True)

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
    parts = partition_by_conv(
        keyed, partitions_for_input(_docs_path(sf_dir)), keys=["__h"]
    )

    def dedup(t: pa.Table) -> pa.Table:
        g = t.select(["doc_id", "text"]).group_by("text", use_threads=False).aggregate(
            [("doc_id", "min"), ([], "count_all")]
        )
        return pa.table(
            {
                "doc_id": as_array(pc.cast(g["doc_id_min"], pa.int64())),
                "text": as_array(g["text"]),
                "n_copies": as_array(pc.cast(g["count_all"], pa.int64())),
            }
        )

    return map_partitions(parts, dedup)


# --------------------------------------------------------------------------
# n-gram shingles + exact Jaccard (inverted index)
# --------------------------------------------------------------------------

def _doc_shingles(t: pa.Table, n: int = NGRAM):
    """Per-doc DISTINCT word-n-gram hashes for a documents block,
    fully vectorized (no Python loop over docs or grams): one regex
    token split, one element-wise n-way join building every gram
    string, one pandas stable 64-bit hash over the flat gram column,
    then a (doc, hash) lexsort for per-doc distinctness.

    Returns ``(doc_ids, flat_hashes, sizes)`` where ``flat_hashes``
    (uint64) holds each doc's distinct gram hashes contiguously in doc
    order and ``sizes[i]`` is doc i's distinct-gram count.

    Tokenization contract (== the SQL oracle): split trimmed text on
    whitespace runs; shingle = n consecutive words joined by ' '.

    Gram hashing contract (== the SQL oracle): kernels/hashing
    ``poly_hash64`` — the SQL-replayable fold — so the minhash
    signatures built on these hashes are exactly reproducible in
    DuckDB (registry oracles for minhash_lsh / minhash_dedup). The
    callers that only need gram EQUALITY (inverted index, df caps,
    decontaminate overlap) are hash-agnostic; minhash is the one
    consumer whose output depends on the values. Switching from
    stable_hash64 (round 5) invalidated previously persisted
    signatures — recompute, don't mix.
    """
    from turboxsl_ray.kernels.hashing import poly_hash64

    ids = as_array(pc.cast(t["doc_id"], pa.int64())).to_numpy()
    trimmed = pc.utf8_trim_whitespace(t["text"])
    lists = as_array(pc.split_pattern_regex(trimmed, r"\s+"))
    lens = pc.list_value_length(lists).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = as_array(pc.list_flatten(lists))
    gcounts = np.maximum(lens - (n - 1), 0)
    total = int(gcounts.sum())
    if total == 0:
        return ids, np.empty(0, dtype=np.uint64), np.zeros(len(ids), np.int64)
    tok_starts = np.concatenate(([0], np.cumsum(lens[:-1])))
    gram_starts = np.concatenate(([0], np.cumsum(gcounts[:-1])))
    doc_rep = np.repeat(np.arange(len(ids), dtype=np.int64), gcounts)
    within = np.arange(total, dtype=np.int64) - np.repeat(gram_starts, gcounts)
    p = tok_starts[doc_rep] + within
    parts = [flat.take(pa.array(p + j)) for j in range(n)]
    gram = pc.binary_join_element_wise(*parts, " ")
    h = poly_hash64(gram)
    order = np.lexsort((h, doc_rep))
    d_s, h_s = doc_rep[order], h[order]
    first = np.concatenate(([True], (d_s[1:] != d_s[:-1]) | (h_s[1:] != h_s[:-1])))
    sizes = np.bincount(d_s[first], minlength=len(ids)).astype(np.int64)
    return ids, h_s[first], sizes


def _shingle_rows_block(t: pa.Table) -> pa.Table:
    """documents block → (gram hash, doc_id, doc gram count) rows.

    Each doc's distinct-gram count rides along on every inverted-index
    row (8 bytes/row), so the Jaccard denominator needs NO second
    shingle pass and NO driver-side sizes table."""
    ids, flat_h, sizes = _doc_shingles(t)
    d = np.repeat(ids, sizes)
    nd = np.repeat(sizes, sizes)
    return pa.table(
        {
            "g": pa.array(flat_h.astype(np.int64)),
            "doc_id": pa.array(d, type=pa.int64()),
            "nd": pa.array(nd, type=pa.int64()),
        }
    )


def _emit_gram_pairs(
    g: np.ndarray, df_cap: int | None
) -> tuple[np.ndarray, np.ndarray]:
    """Row-index pairs (i < j within each gram group), fully vectorized
    (no Python loop over groups). Input must be sorted by (g, doc_id).

    With ``df_cap`` set, grams shared by more than ``df_cap`` documents
    emit nothing — the document-frequency prune that bounds the m² hot
    -gram blow-up at scale (drops only stop-gram evidence; a recall
    trade documented on q_ngram_jaccard_capped)."""
    n = len(g)
    z = np.empty(0, dtype=np.int64)
    if n == 0:
        return z, z
    new = np.concatenate(([True], g[1:] != g[:-1]))
    gid = np.cumsum(new) - 1
    group_start = np.flatnonzero(new)
    m = np.diff(np.append(group_start, n))  # docs per gram
    m_row = m[gid]
    pos = np.arange(n) - group_start[gid]
    reps = m_row - 1 - pos  # pairs this row opens as the left element
    if df_cap is not None:
        reps = np.where(m_row > df_cap, 0, reps)
    total = int(reps.sum())
    if total == 0:
        return z, z
    a_idx = np.repeat(np.arange(n), reps)
    excl = np.concatenate(([0], np.cumsum(reps)))[:-1]
    b_idx = a_idx + (np.arange(total) - excl[a_idx]) + 1
    return a_idx, b_idx


_PAIR_PARTIAL_SCHEMA = pa.schema(
    [("da", pa.int64()), ("db", pa.int64()), ("c", pa.int64()),
     ("na", pa.int64()), ("nb", pa.int64())]
)
_PAIR_OUT_SCHEMA = pa.schema(
    [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("jaccard", pa.float64())]
)


def _make_pair_counts(df_cap):
    """Block fn shared by the shingle (q_ngram_jaccard) and winnowing
    (q_winnow_dedup) inverted indexes: within a gram/fingerprint-keyed
    block, emit per-(da, db) co-occurrence partial counts, vectorized
    (sort -> pair emission -> lexsort -> run-length count)."""

    def pair_counts(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _PAIR_PARTIAL_SCHEMA.empty_table()
        t = t.sort_by([("g", "ascending"), ("doc_id", "ascending")])
        g = as_array(t["g"]).to_numpy()
        d = as_array(t["doc_id"]).to_numpy()
        nd = as_array(t["nd"]).to_numpy()
        ai, bi = _emit_gram_pairs(g, df_cap)
        if len(ai) == 0:
            return _PAIR_PARTIAL_SCHEMA.empty_table()
        da, db, na, nb = d[ai], d[bi], nd[ai], nd[bi]
        order = np.lexsort((db, da))
        da, db, na, nb = da[order], db[order], na[order], nb[order]
        first = np.concatenate(([True], (da[1:] != da[:-1]) | (db[1:] != db[:-1])))
        idx = np.flatnonzero(first)
        c = np.diff(np.append(idx, len(da)))
        return pa.table(
            {"da": pa.array(da[idx]), "db": pa.array(db[idx]),
             "c": pa.array(c.astype(np.int64)),
             "na": pa.array(na[idx]), "nb": pa.array(nb[idx])},
            schema=_PAIR_PARTIAL_SCHEMA,
        )

    return pair_counts


def q_ngram_jaccard(
    sf_dir: str,
    threshold: float = JACCARD_THRESHOLD,
    df_cap: int | None = None,
) -> Dataset:
    """Exact 3-gram-shingle Jaccard near-dup pairs (j >= threshold).

    Plan (fully distributed — nothing materializes on the driver):
    ONE shingle pass emits (gram, doc, doc_gram_count) inverted-index
    rows; shuffle by gram; vectorized per-gram pair emission + partial
    per-block pair counts; second (tiny) shuffle by (da, db) combines
    the partials and computes jaccard per block. Uncapped it matches
    the SQL oracle bit-for-bit; ``df_cap`` prunes grams shared by more
    documents than the cap (q_ngram_jaccard_capped), which bounds the
    hot-gram m² pair blow-up at 100 TB at a documented recall cost."""
    ds = read_documents(sf_dir, ["doc_id", "text"], spread=True)

    inv = map_partitions(ds, _shingle_rows_block)
    # shingle rows are ~24 B per input word: decoded volume is a few x
    # the compressed text bytes
    by_gram = partition_by_conv(
        inv,
        partitions_for_input(_docs_path(sf_dir), factor=4.0, parallel=True),
        keys=["g"],
    )

    partials = map_partitions(by_gram, _make_pair_counts(df_cap))
    by_pair = partition_by_conv(
        partials, partitions_for_input(_docs_path(sf_dir)), keys=["da", "db"]
    )

    def finalize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _PAIR_OUT_SCHEMA.empty_table()
        gt = t.group_by(["da", "db"]).aggregate(
            [("c", "sum"), ("na", "min"), ("nb", "min")]
        )
        c = gt["c_sum"].to_numpy().astype(np.float64)
        na = gt["na_min"].to_numpy().astype(np.float64)
        nb = gt["nb_min"].to_numpy().astype(np.float64)
        jraw = c / (na + nb - c)
        # filter on the UNROUNDED value — the SQL oracle's WHERE does too
        keep = jraw >= threshold
        return pa.table(
            {
                "doc_a": as_array(gt["da"]).filter(pa.array(keep)),
                "doc_b": as_array(gt["db"]).filter(pa.array(keep)),
                "jaccard": pa.array(np.round(jraw[keep], 6), type=pa.float64()),
            },
            schema=_PAIR_OUT_SCHEMA,
        )

    return map_partitions(by_pair, finalize)


NGRAM_DF_CAP = 128


def q_ngram_jaccard_capped(sf_dir: str, df_cap: int = NGRAM_DF_CAP) -> Dataset:
    """Document-frequency-capped near-dup pairs — the 100 TB variant.

    Grams appearing in more than ``df_cap`` documents are pruned before
    pair emission: a stop-gram shared by m documents would otherwise
    emit m(m-1)/2 pairs into one block. Pruning loses only shared-gram
    EVIDENCE (intersection counts can undercount), so reported jaccard
    is a lower bound and very-common-boilerplate pairs may be missed —
    a subset of the uncapped result (pinned by tests). The cap is
    deterministic, so the registry carries a full SQL oracle (shared
    counts restricted to grams with df <= cap; sizes stay uncapped)."""
    return q_ngram_jaccard(sf_dir, df_cap=df_cap)


# --------------------------------------------------------------------------
# Winnowing (rolling-hash) document fingerprints — MOSS-style
# --------------------------------------------------------------------------

WINNOW_K = 12   # byte k-gram length for the rolling hash
WINNOW_W = 24   # winnowing window (guarantee: any shared substring of
                # length >= W + K - 1 yields at least one shared print)
_WINNOW_BASE = np.uint64(1099511628211)


def _winnow_doc(b: bytes) -> np.ndarray:
    """Selected (unique) rolling-hash fingerprints of one document:
    polynomial byte k-gram hashes, minimum per sliding window of W —
    the classic winnowing scheme, fully vectorized."""
    if len(b) < WINNOW_K:
        return np.empty(0, dtype=np.uint64)
    arr = np.frombuffer(b, dtype=np.uint8).astype(np.uint64)
    powers = _WINNOW_BASE ** np.arange(WINNOW_K - 1, -1, -1, dtype=np.uint64)
    grams = np.lib.stride_tricks.sliding_window_view(arr, WINNOW_K)
    h = (grams * powers[None, :]).sum(axis=1)  # uint64 wraparound hash
    if len(h) <= WINNOW_W:
        return np.unique(h.min(keepdims=True))
    mins = np.lib.stride_tricks.sliding_window_view(h, WINNOW_W).min(axis=1)
    return np.unique(mins)


def _winnow_block(t: pa.Table) -> pa.Table:
    """documents block → (fp, doc_id, n_fp) inverted fingerprint rows
    (same shape as the shingle inverted index)."""
    texts = as_array(t["text"]).to_pylist()
    ids = as_array(t["doc_id"]).to_numpy()
    fps = [_winnow_doc(s.encode("utf-8")) for s in texts]
    sizes = np.array([len(f) for f in fps], dtype=np.int64)
    g = np.concatenate(fps) if fps else np.empty(0, dtype=np.uint64)
    return pa.table(
        {
            "g": pa.array(g.astype(np.int64)),
            "doc_id": pa.array(np.repeat(ids, sizes), type=pa.int64()),
            "nd": pa.array(np.repeat(sizes, sizes), type=pa.int64()),
        }
    )


WINNOW_DF_CAP = 64


def q_winnow_dedup(
    sf_dir: str, min_shared: int = 2, df_cap: int = WINNOW_DF_CAP
) -> Dataset:
    """Rolling-hash fingerprint near-dup candidates: documents sharing
    >= ``min_shared`` winnowed fingerprints (plus the shared fraction
    of the smaller document's print set).

    Same physical plan as the exact n-gram path — fingerprint-keyed
    shuffle, vectorized pair emission (df-capped: a boilerplate print
    shared by everyone is evidence-free), pair-keyed combine — but the
    inverted index holds O(len/W) winnowed prints per doc instead of
    every shingle, an ~W× lighter index. The rolling hash is a
    deterministic uint64-wraparound polynomial, so the registry carries
    a full SQL oracle (HUGEINT arithmetic mod 2^64 over per-byte rows;
    valid while documents are ASCII — asserted by the oracle's
    encode() guard); the W+K-1 shared-substring guarantee is pinned by
    pytest."""
    ds = read_documents(sf_dir, ["doc_id", "text"], spread=True)

    inv = map_partitions(ds, _winnow_block)
    by_fp = partition_by_conv(
        inv,
        partitions_for_input(_docs_path(sf_dir), parallel=True),
        keys=["g"],
    )

    by_pair = partition_by_conv(
        map_partitions(by_fp, _make_pair_counts(df_cap)),
        partitions_for_input(_docs_path(sf_dir)),
        keys=["da", "db"],
    )

    out_schema = pa.schema(
        [("doc_a", pa.int64()), ("doc_b", pa.int64()),
         ("n_shared", pa.int64()), ("shared_frac", pa.float64())]
    )

    def finalize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        gt = t.group_by(["da", "db"]).aggregate(
            [("c", "sum"), ("na", "min"), ("nb", "min")]
        )
        c = gt["c_sum"].to_numpy().astype(np.int64)
        na = gt["na_min"].to_numpy().astype(np.float64)
        nb = gt["nb_min"].to_numpy().astype(np.float64)
        frac = c / np.minimum(na, nb)
        keep = pa.array(c >= min_shared)
        return pa.table(
            {
                "doc_a": as_array(gt["da"]).filter(keep),
                "doc_b": as_array(gt["db"]).filter(keep),
                "n_shared": pa.array(c[c >= min_shared]),
                "shared_frac": pa.array(np.round(frac[c >= min_shared], 6)),
            },
            schema=out_schema,
        )

    return map_partitions(by_pair, finalize)


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


def _signatures(t: pa.Table):
    """(n_docs, K) uint64 MinHash signatures for a documents block.

    Vectorized across the WHOLE block: the flat distinct-gram hashes
    from _doc_shingles go through K universal-hash lanes, each an
    O(grams) pass with a per-doc ``np.minimum.reduceat`` — no Python
    loop over docs, and never a (grams x K) matrix in memory."""
    _ids, flat_h, sizes = _doc_shingles(t)
    a, b = _minhash_params()
    n_docs = len(sizes)
    sigs = np.full((n_docs, MINHASH_K), np.iinfo(np.uint64).max, dtype=np.uint64)
    if len(flat_h) == 0:
        return sigs
    nz = sizes > 0
    seg_starts = np.concatenate(([0], np.cumsum(sizes[:-1])))[nz]
    for k in range(MINHASH_K):
        # universal hash: (a*g + b) mod 2^64 (cheap, adequate spread)
        hv = flat_h * a[k] + b[k]
        sigs[nz, k] = np.minimum.reduceat(hv, seg_starts)
    return sigs


def _sig_matrix(col, k: int = None) -> np.ndarray:
    """(n, K) uint64 matrix from a binary signature column, decoded
    from the Arrow buffers (no per-row Python objects)."""
    k = k or MINHASH_K
    a = as_array(col)
    n = len(a)
    if n == 0:
        return np.empty((0, k), dtype=np.uint64)
    offs = np.frombuffer(
        a.buffers()[1], dtype=np.int32, count=n + 1, offset=a.offset * 4
    ).astype(np.int64)
    data = np.frombuffer(a.buffers()[2], dtype=np.uint8)
    idx = offs[:-1, None] + np.arange(k * 8)[None, :]
    return np.ascontiguousarray(data[idx]).view(np.uint64).reshape(n, k)


_CAND_SCHEMA = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())])
_EST_SCHEMA = pa.schema(
    [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("est_jaccard", pa.float64())]
)


# Below this size the sig table rides the object store as ONE broadcast
# payload (Spark-AQE-style plan switch); above it, the join-back is two
# co-partitioned equi-joins. 256 MB ≈ 500k docs of 512 B signatures.
SIG_BROADCAST_BYTES = 256 << 20


def q_minhash_lsh(sf_dir: str, est_threshold: float = 0.5) -> Dataset:
    """MinHash(K=64) + LSH(16 bands × 4 rows) candidate pairs with
    estimated Jaccard >= est_threshold.

    Scale plan (no driver-side combine anywhere):
    1. ONE shingle+minhash pass → (doc_id, sig[64] uint64) table,
       materialized once (512 B/doc — band rows never carry it);
    2. band-bucket rows (bucket, doc_id) → shuffle by bucket →
       vectorized per-bucket candidate pairs;
    3. signatures joined back by doc id. The plan is chosen from the
       MEASURED sig-table size (AQE-style): under SIG_BROADCAST_BYTES
       the signatures broadcast once (``ray.put``) and candidates pay a
       single doc_a exchange (dedup + lookup + estimate fused into its
       block fn); at scale the broadcast is impossible and the path is
       two co-partitioned equi-joins with dedup riding the first join's
       doc_a exchange. Both paths dedup pairs on doc_a co-location, so
       results are identical; partition counts grow with the measured
       sizes (context.adaptive_partitions).
    Rows-only driver check (not SQL-expressible); recall vs exact
    jaccard is pinned by tests on planted near-dups."""
    ds = read_documents(sf_dir, ["doc_id", "text"], spread=True)
    K = MINHASH_K

    def sig_block(t: pa.Table) -> pa.Table:
        ids = as_array(pc.cast(t["doc_id"], pa.int64())).to_numpy()
        sigs = _signatures(t)
        # binary (not fixed_size_list): Arrow's hash join can't carry
        # list payloads, and 512-byte binaries decode zero-copy-ish.
        # Built straight from the contiguous (n, K) uint64 buffer —
        # fixed-width rows mean offsets are just an arange.
        n = len(ids)
        # offsets computed in int64 first: at K=64 an int32 arange
        # would silently wrap past ~4.19M docs/block, feeding corrupt
        # offsets to from_buffers. Blocks that large can't happen under
        # the block-size ceiling, so assert rather than chunk.
        offs64 = np.arange(n + 1, dtype=np.int64) * (K * 8)
        assert offs64[-1] <= np.iinfo(np.int32).max, (
            f"signature block too large for binary offsets ({n} docs); "
            "lower the block size"
        )
        sig_arr = pa.BinaryArray.from_buffers(
            pa.binary(), n,
            [None, pa.py_buffer(offs64.astype(np.int32)),
             pa.py_buffer(np.ascontiguousarray(sigs))],
        )
        return pa.table(
            {"doc_id": pa.array(ids, type=pa.int64()), "sig": sig_arr}
        )

    # computed once, reused by band emission AND the verify join-back
    sigs = map_partitions(ds, sig_block).materialize()

    def band_rows(t: pa.Table) -> pa.Table:
        ids = as_array(t["doc_id"]).to_numpy()
        n = len(ids)
        if n == 0:
            return pa.schema(
                [("bucket", pa.int64()), ("doc_id", pa.int64())]
            ).empty_table()
        s = _sig_matrix(t["sig"], K)
        rows_per_band = K // LSH_BANDS
        bucket = np.empty(n * LSH_BANDS, dtype=np.int64)
        for bi in range(LSH_BANDS):
            seg = s[:, bi * rows_per_band : (bi + 1) * rows_per_band]
            h = np.full(n, np.uint64(bi + 1))
            for c in range(rows_per_band):
                h = h * np.uint64(0x100000001B3) + seg[:, c].astype(np.uint64)
            bucket[bi::LSH_BANDS] = h.astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(bucket),
                "doc_id": pa.array(np.repeat(ids, LSH_BANDS), type=pa.int64()),
            }
        )

    from turboxsl_ray.context import adaptive_partitions

    sig_bytes = sigs.size_bytes() or 0
    # band rows are (int64, int64) pairs, LSH_BANDS per doc — tiny next
    # to the 512 B/doc signature payload they replace
    banded = map_partitions(sigs, band_rows)
    by_bucket = partition_by_conv(
        banded, adaptive_partitions(sig_bytes // 2), keys=["bucket"]
    )

    def bucket_pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _CAND_SCHEMA.empty_table()
        t = t.sort_by([("bucket", "ascending"), ("doc_id", "ascending")])
        bk = as_array(t["bucket"]).to_numpy()
        d = as_array(t["doc_id"]).to_numpy()
        ai, bi = _emit_gram_pairs(bk, None)  # same vectorized emitter
        if len(ai) == 0:
            return _CAND_SCHEMA.empty_table()
        da, db = d[ai], d[bi]
        keep = da != db
        da, db = da[keep], db[keep]
        # within-block dedup (cross-block dedup happens after the
        # pair-keyed shuffle below)
        order = np.lexsort((db, da))
        da, db = da[order], db[order]
        first = np.concatenate(([True], (da[1:] != da[:-1]) | (db[1:] != db[:-1])))
        return pa.table(
            {"doc_a": pa.array(da[first]), "doc_b": pa.array(db[first])},
            schema=_CAND_SCHEMA,
        )

    def distinct_pairs(t: pa.Table) -> pa.Table:
        # fused into the doc_a exchange (either path): duplicates of a
        # pair share doc_a, so doc_a co-partitioning makes this
        # block-local distinct globally exact — no dedup shuffle of its
        # own
        if t.num_rows == 0:
            return t
        return t.group_by(["doc_a", "doc_b"]).aggregate([]).cast(t.schema)

    if sig_bytes <= SIG_BROADCAST_BYTES:
        # broadcast path: sigs ride the object store once; the whole
        # candidate side is ONE streaming DAG with two exchanges
        # (bucket, then doc_a) — no materialize barrier needed
        from turboxsl_ray.stages.aggregate import broadcast, collect_tables, fetch

        parts = collect_tables(sigs)
        if not parts:
            return ray.data.from_arrow(_EST_SCHEMA.empty_table())
        sig_t = pa.concat_tables(parts)
        ids_np = sig_t["doc_id"].to_numpy()
        order = np.argsort(ids_np)
        sig_ref = broadcast((ids_np[order], _sig_matrix(sig_t["sig"], K)[order]))

        cand = map_partitions(by_bucket, bucket_pairs)
        by_a = partition_by_conv(
            cand, adaptive_partitions(sig_bytes // 8), keys=["doc_a"]
        )

        def estimate_bcast(t: pa.Table) -> pa.Table:
            t = distinct_pairs(t)
            if t.num_rows == 0 or "doc_a" not in t.column_names:
                return _EST_SCHEMA.empty_table()
            ids, mat = fetch(sig_ref)
            da = as_array(t["doc_a"]).to_numpy()
            db = as_array(t["doc_b"]).to_numpy()
            sa = mat[np.searchsorted(ids, da)]
            sb = mat[np.searchsorted(ids, db)]
            est = (sa == sb).mean(axis=1)
            keep = est >= est_threshold
            return pa.table(
                {
                    "doc_a": pa.array(da[keep], type=pa.int64()),
                    "doc_b": pa.array(db[keep], type=pa.int64()),
                    "est_jaccard": pa.array(np.round(est[keep], 6)),
                },
                schema=_EST_SCHEMA,
            )

        return map_partitions(by_a, estimate_bcast)

    # distributed path: materialize the (near-dup-sized) candidate set —
    # running three shuffle operators concurrently in one streaming DAG
    # makes their aggregator pools contend on a single node; the barrier
    # only ever holds candidate pairs, never input-scale data
    cand = map_partitions(by_bucket, bucket_pairs).materialize()
    np_join = adaptive_partitions(sig_bytes + (cand.size_bytes() or 0))

    from turboxsl_ray.stages.join import copartition_join

    sig_a = map_partitions(sigs, lambda t: t.rename_columns(["doc_a", "sig_a"]))
    sig_b = map_partitions(sigs, lambda t: t.rename_columns(["doc_b", "sig_b"]))
    j = copartition_join(cand, sig_a, on="doc_a", num_partitions=np_join,
                         left_block_prep=distinct_pairs)
    j = copartition_join(j, sig_b, on="doc_b", num_partitions=np_join)

    def estimate(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return _EST_SCHEMA.empty_table()
        sa = _sig_matrix(t["sig_a"], K)
        sb = _sig_matrix(t["sig_b"], K)
        est = (sa == sb).mean(axis=1)
        keep = pa.array(est >= est_threshold)
        return pa.table(
            {
                "doc_a": as_array(t["doc_a"]).filter(keep),
                "doc_b": as_array(t["doc_b"]).filter(keep),
                "est_jaccard": pa.array(
                    np.round(est[est >= est_threshold], 6), type=pa.float64()
                ),
            },
            schema=_EST_SCHEMA,
        )

    return map_partitions(j, estimate)


# --------------------------------------------------------------------------
# SimHash + language ID
# --------------------------------------------------------------------------

def q_simhash(sf_dir: str) -> Dataset:
    """64-bit SimHash per document over word tokens (hex string).

    Fully vectorized: one regex token split for the whole block, one
    SQL-replayable 64-bit hash (kernels/hashing.poly_hash64) over the
    flat token column, then 64 per-bit segment sums
    (``np.add.reduceat`` over doc boundaries) — no Python loop over
    documents or tokens. Memory stays O(tokens): the (tokens x 64) bit
    matrix is never materialized; each bit lane is an O(tokens) pass.

    Hash contract: poly_hash64 (not stable_hash64) precisely so DuckDB
    can replay the token hashes and bit-majority fold — the registry
    carries an exact SQL oracle since round 5; hex values persisted
    before the switch are not comparable."""
    from turboxsl_ray.kernels.hashing import poly_hash64

    ds = read_documents(sf_dir, ["doc_id", "text"], spread=True)

    def fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "simhash": pa.array([], pa.string())}
            )
        ids = as_array(pc.cast(t["doc_id"], pa.int64())).to_numpy()
        trimmed = pc.utf8_trim_whitespace(t["text"])
        lists = as_array(pc.split_pattern_regex(trimmed, r"\s+"))
        lens = pc.list_value_length(lists).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = as_array(pc.list_flatten(lists))
        # empty text splits to [""] — mask zero-length tokens out of
        # both the bit sums and the majority count (simhash 0, matching
        # the defined empty-document value)
        nonempty = (
            pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
            > 0
        ).astype(np.int64)
        hs = poly_hash64(flat)
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        n_tok = np.add.reduceat(nonempty, starts) if len(hs) else np.zeros(len(ids), np.int64)
        vals = np.zeros(len(ids), dtype=np.uint64)
        for b in range(64):
            bitcol = ((hs >> np.uint64(b)) & np.uint64(1)).astype(np.int64) * nonempty
            ones = np.add.reduceat(bitcol, starts)
            vals |= np.where(2 * ones >= n_tok, np.uint64(1) << np.uint64(b), np.uint64(0))
        vals[n_tok == 0] = 0
        # vectorized hex rendering: big-endian bytes -> one hexlify ->
        # fixed-width 16-char slices
        import binascii

        hx = binascii.hexlify(vals.astype(">u8").tobytes())
        hexes = np.frombuffer(hx, dtype="S16").astype("U16")
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
    words hit most (ties → en). SQL-expressible: the registry oracle
    reproduces the marker counts (non-overlapping substring counts via
    replace-length arithmetic) and the tie-broken argmax CASE chain."""
    ds = read_documents(sf_dir, ["doc_id", "text"])
    langs = list(_LANG_MARKERS)

    def fn(t: pa.Table) -> pa.Table:
        text = t["text"]
        # ' ' || text || ' ' (4th arg is the join separator) so markers
        # match at both string boundaries — mirrored by the SQL oracle
        padded = pc.binary_join_element_wise(" ", text, " ", "")
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
        ln = pc.cast(pc.utf8_length(txt), pa.float64())
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
                "len_r7": F.xpath_round(pc.divide(ln, 7.0)),
                # format-number picture grammar (functions/format_number.py);
                # grouping separators are pinned by pytest (DuckDB's fmt
                # can't thousand-separate floats, so the oracle covers
                # min-int padding / negative subpattern / percent)
                "fmt_padded": F.format_number(
                    pc.multiply(ln, 3.21), pattern="0000.00"
                ),
                "fmt_paren": F.format_number(
                    pc.multiply(pc.subtract(ln, 150.0), 1.5),
                    pattern="0.0;(0.0)",
                ),
                "fmt_pct": F.format_number(
                    pc.divide(ln, pc.add(ln, 200.0)), pattern="0.0%"
                ),
            }
        )

    return map_partitions(ds, fn)
