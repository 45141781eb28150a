"""Corpus-level token operators + near-dup clustering.

Training-data-pipeline operators over ``documents`` that work on the
token stream rather than per-doc scalars (pipelines/text.py):

- ``q_explode_tokens``: doc -> one row per token with its ordinal (the
  ``xsl:for-each`` over a tokenized node-set — the reference's
  str:tokenize extension shape, /root/reference/src/functions.c:160-239
  family — as a vectorized flat-map);
- ``q_top_terms``: distributed wordcount — per-block partial counts,
  ONE token-keyed shuffle of the partials (never the token stream),
  final combine + frequency floor;
- ``q_tfidf``: block-local TF (a document never spans blocks) + the
  ``top_terms`` DF plan + a co-partitioned join-back by token;
- ``q_scrub``: stop-token removal + whitespace re-normalization (the
  C4-style boilerplate scrub; same regexp_replace surface as PII
  redaction — swap the pattern for emails/phones/ids);
- ``q_near_dup_clusters``: connected components over the exact-Jaccard
  near-dup pair graph (pipelines/text.q_ngram_jaccard) via iterative
  distributed min-label propagation — the keep-one-per-cluster endgame
  of web-scale dedup;
- ``q_curate_corpus``: the COMPOSED curation pass (exact dedup ->
  quality gates -> stop-token scrub -> packed output) fused into one
  digest-keyed exchange — operator fusion demonstrated end-to-end;
- ``q_repetition``: Gopher-style repetitious-text signals (top-2-gram
  coverage, duplicate-5-gram fraction), block-local;
- ``q_decontaminate``: benchmark n-gram-overlap decontamination via a
  broadcast shingle set, zero shuffle;
- ``q_token_shards``: token-budget shard assignment for training-data
  packing via a distributed prefix sum (stages/global_sort).

Everything here is oracle-checked against DuckDB (the CC oracle is a
recursive CTE computing min-reachable-label per node).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from turboxsl_ray.context import partitions_for_input
from turboxsl_ray.kernels.arrays import as_array
from turboxsl_ray.pipelines.text import read_documents
from turboxsl_ray.stages.partitioning import map_partitions, partition_by_conv

TOKEN_SPLIT_RE = r"\s+"
TOP_TERMS_MIN_COUNT = 10
STOP_TOKEN_RE = r"\b(?:the|a)\b"  # swap for email/phone/id patterns to PII-redact


def _token_lists(t: pa.Table):
    """(doc_ids int64, lens int64, flat tokens) for a documents block.

    Tokenization contract shared with the SQL oracles (and with
    text.q_token_stats, whose n_tokens the driver already verifies):
    split trimmed text on whitespace runs. Empty text yields the
    single empty token, exactly like DuckDB's string_split_regex.
    """
    trimmed = pc.utf8_trim_whitespace(t["text"])
    lists = as_array(pc.split_pattern_regex(trimmed, TOKEN_SPLIT_RE))
    lens = pc.list_value_length(lists).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = as_array(pc.list_flatten(lists))
    ids = as_array(pc.cast(t["doc_id"], pa.int64())).to_numpy()
    return ids, lens, flat


_EXPLODE_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("tok_idx", pa.int64()), ("token", pa.string())]
)


def q_explode_tokens(sf_dir: str) -> Dataset:
    """Flat-map explode: one row per (doc_id, 1-based token ordinal,
    token). Fully vectorized — repeat/cumsum arithmetic builds the
    parent index and the ordinal, never a Python loop over rows."""
    ds = read_documents(sf_dir, ["doc_id", "text"], spread=True)

    def explode(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _EXPLODE_SCHEMA.empty_table()
        ids, lens, flat = _token_lists(t)
        starts = np.concatenate(([0], np.cumsum(lens[:-1])))
        tok_idx = np.arange(int(lens.sum()), dtype=np.int64) - np.repeat(starts, lens) + 1
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, lens)),
                "tok_idx": pa.array(tok_idx),
                "token": flat,
            },
            schema=_EXPLODE_SCHEMA,
        )

    return map_partitions(ds, explode)


_TERMS_SCHEMA = pa.schema([("token", pa.string()), ("n", pa.int64())])


def q_top_terms(sf_dir: str, min_count: int = TOP_TERMS_MIN_COUNT) -> Dataset:
    """Distributed wordcount with a frequency floor.

    Per-block partial counts combine BEFORE the exchange, so the
    shuffle moves O(blocks x vocab) partial rows, never the
    O(total tokens) stream — the canonical combiner plan."""
    exploded = q_explode_tokens(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _TERMS_SCHEMA.empty_table()
        g = t.group_by("token", use_threads=False).aggregate([([], "count_all")])
        return pa.table(
            {"token": as_array(g["token"]),
             "n": as_array(pc.cast(g["count_all"], pa.int64()))},
            schema=_TERMS_SCHEMA,
        )

    parts = partition_by_conv(
        map_partitions(exploded, partial),
        partitions_for_input(f"{sf_dir}/documents.parquet", factor=4.0),
        keys=["token"],
    )

    def final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _TERMS_SCHEMA.empty_table()
        g = t.group_by("token", use_threads=False).aggregate([("n", "sum")])
        out = pa.table(
            {"token": as_array(g["token"]),
             "n": as_array(pc.cast(g["n_sum"], pa.int64()))},
            schema=_TERMS_SCHEMA,
        )
        return out.filter(pc.greater_equal(out["n"], min_count))

    return map_partitions(parts, final)


_TFIDF_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("token", pa.string()),
        ("tf", pa.int64()),
        ("df", pa.int64()),
        ("tfidf", pa.float64()),
    ]
)


def q_tfidf(sf_dir: str) -> Dataset:
    """Per-(doc, token) TF-IDF: tf * ln(N / df), rounded to 6 digits.

    Physical plan:
    1. TF is block-local (a document never spans blocks) — no shuffle;
    2. DF = per-block distinct (doc, token) -> per-token partials ->
       ONE token-keyed shuffle -> final sums (wordcount-shaped);
    3. TF rows join DF by token through the co-partitioned equi-join
       (stages/join.py) — one more exchange over (doc, token) pairs,
       never full text;
    4. N (corpus size) is a driver scalar from a count aggregate.
    """
    from turboxsl_ray.stages.join import copartition_join

    ds = read_documents(sf_dir, ["doc_id", "text"], spread=True)
    n_docs = ds.count()

    def tf_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema(
                [("doc_id", pa.int64()), ("token", pa.string()), ("tf", pa.int64())]
            ).empty_table()
        ids, lens, flat = _token_lists(t)
        pairs = pa.table({"doc_id": pa.array(np.repeat(ids, lens)), "token": flat})
        g = pairs.group_by(["doc_id", "token"], use_threads=False).aggregate(
            [([], "count_all")]
        )
        return pa.table(
            {
                "doc_id": as_array(g["doc_id"]),
                "token": as_array(g["token"]),
                "tf": as_array(pc.cast(g["count_all"], pa.int64())),
            }
        )

    # tf feeds BOTH the df derivation and the final join; without
    # materializing, the lazy plan would re-read + re-tokenize the
    # whole corpus once per consumer
    tf = map_partitions(ds, tf_block).materialize()

    def df_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema([("token", pa.string()), ("df", pa.int64())]).empty_table()
        g = t.group_by("token", use_threads=False).aggregate([([], "count_all")])
        return pa.table(
            {"token": as_array(g["token"]),
             "df": as_array(pc.cast(g["count_all"], pa.int64()))}
        )

    # tf rows are already one per distinct (doc, token): their per-token
    # counts ARE document frequencies
    df_parts = partition_by_conv(
        map_partitions(tf, df_partial),
        partitions_for_input(f"{sf_dir}/documents.parquet", factor=4.0),
        keys=["token"],
    )

    def df_final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema([("token", pa.string()), ("df", pa.int64())]).empty_table()
        g = t.group_by("token", use_threads=False).aggregate([("df", "sum")])
        return pa.table(
            {"token": as_array(g["token"]),
             "df": as_array(pc.cast(g["df_sum"], pa.int64()))}
        )

    df = map_partitions(df_parts, df_final)
    joined = copartition_join(
        tf,
        df,
        on="token",
        how="inner",
        num_partitions=partitions_for_input(
            f"{sf_dir}/documents.parquet", factor=4.0
        ),
        left_schema=pa.schema(
            [("doc_id", pa.int64()), ("token", pa.string()), ("tf", pa.int64())]
        ),
        right_schema=pa.schema([("token", pa.string()), ("df", pa.int64())]),
    )

    def score(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "doc_id" not in t.column_names:
            return _TFIDF_SCHEMA.empty_table()
        tfv = as_array(t["tf"]).to_numpy(zero_copy_only=False).astype(np.float64)
        dfv = as_array(t["df"]).to_numpy(zero_copy_only=False).astype(np.float64)
        tfidf = np.round(tfv * np.log(n_docs / dfv), 6)
        return pa.table(
            {
                "doc_id": as_array(pc.cast(t["doc_id"], pa.int64())),
                "token": as_array(t["token"]),
                "tf": as_array(pc.cast(t["tf"], pa.int64())),
                "df": as_array(pc.cast(t["df"], pa.int64())),
                "tfidf": pa.array(tfidf, type=pa.float64()),
            },
            schema=_TFIDF_SCHEMA,
        )

    return map_partitions(joined, score)


def q_scrub(sf_dir: str) -> Dataset:
    """Token scrub: delete stop tokens, re-normalize whitespace, count
    removals. One vectorized RE2 pass per block; the same shape (with
    an email/phone/account-number alternation) is the PII-redaction
    stage of a training-data pipeline."""
    ds = read_documents(sf_dir, ["doc_id", "text"])

    def scrub(t: pa.Table) -> pa.Table:
        text = t["text"]
        n_stop = pc.cast(pc.count_substring_regex(text, STOP_TOKEN_RE), pa.int64())
        removed = pc.replace_substring_regex(text, STOP_TOKEN_RE, "")
        clean = pc.utf8_trim_whitespace(
            pc.replace_substring_regex(removed, r"\s+", " ")
        )
        return pa.table(
            {
                "doc_id": as_array(pc.cast(t["doc_id"], pa.int64())),
                "clean_text": as_array(clean),
                "n_stop": as_array(n_stop),
            }
        )

    return map_partitions(ds, scrub)


# --------------------------------------------------------------------------
# near-dup connected components
# --------------------------------------------------------------------------

_CLUSTER_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("cluster_id", pa.int64()), ("is_canonical", pa.bool_())]
)
def q_near_dup_clusters(sf_dir: str, df_cap: int | None = None) -> Dataset:
    """Connected components over the near-dup pair graph: every doc
    gets the MIN doc_id reachable through exact-Jaccard pairs
    (pipelines/text.q_ngram_jaccard, threshold-filtered) as its
    cluster id; ``is_canonical`` marks the one doc per cluster a
    keep-one dedup retains.

    ``df_cap`` bounds the hot-gram m² pair blow-up upstream (grams in
    more than df_cap documents are pruned before pair emission — see
    q_ngram_jaccard_capped); the DEFAULT pipeline entry point
    (q_near_dup_clusters_capped) sets it, and the uncapped call exists
    only for the SQL-oracle registry entry, where bit-exact parity
    with the recursive-CTE oracle requires the full pair graph.

    The iteration runs on the BSP actor engine (stages/cc.py): edges
    shard ONCE into stateful actors, rounds exchange only label
    updates — a Dataset-loop formulation would re-shuffle the whole
    edge list every round. The label table is near-dup-scale, NOT
    corpus-scale; docs outside the pair graph never enter the loop —
    they join the labels at the end (left join + fill-own-id)."""
    from turboxsl_ray.pipelines.text import q_ngram_jaccard

    pairs = q_ngram_jaccard(sf_dir, df_cap=df_cap).materialize()
    return _cluster_docs(sf_dir, pairs)


def _cluster_docs(sf_dir: str, pairs: Dataset) -> Dataset:
    """Shared cluster assembly: BSP connected components over a
    materialized (doc_a, doc_b, ...) pair Dataset, then a left join
    back onto the full documents id set (docs outside the pair graph
    label themselves). An empty pair graph needs no special case: the
    CC stage returns an empty (node, comp) table, the left join keeps
    every doc with a null cluster_id, and ``finish`` coalesces to
    own-id — no blocking driver round-trip anywhere on this path."""
    from turboxsl_ray.stages.cc import connected_components
    from turboxsl_ray.stages.join import copartition_join

    docs = read_documents(sf_dir, ["doc_id"])

    labels = connected_components(pairs, a_col="doc_a", b_col="doc_b")
    clusters = map_partitions(
        labels, lambda t: t.rename_columns(["doc_id", "cluster_id"])
    )
    out = copartition_join(
        docs,
        clusters,
        on="doc_id",
        how="left",
        # declared (not probed): also what keeps the join well-typed
        # when the pair graph — and therefore clusters — is empty
        right_schema=pa.schema([("doc_id", pa.int64()), ("cluster_id", pa.int64())]),
        num_partitions=partitions_for_input(
            f"{sf_dir}/documents.parquet", factor=0.25
        ),
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "doc_id" not in t.column_names:
            return _CLUSTER_SCHEMA.empty_table()
        ids = as_array(pc.cast(t["doc_id"], pa.int64()))
        comp = pc.coalesce(pc.cast(t["cluster_id"], pa.int64()), ids)
        return pa.table(
            {
                "doc_id": ids,
                "cluster_id": as_array(comp),
                "is_canonical": as_array(pc.equal(comp, ids)),
            },
            schema=_CLUSTER_SCHEMA,
        )

    return map_partitions(out, finish)


def q_minhash_dedup(sf_dir: str) -> Dataset:
    """Keep-one near-dup dedup over the MinHash+LSH candidate graph —
    the composition a 100 TB curation pipeline actually runs: the
    exact inverted-index Jaccard is the oracle-grade path, LSH is the
    linear-cost one (signature pass + band-bucket shuffle, no gram
    index). Same BSP connected-components engine and keep-one contract
    as q_near_dup_clusters. Rows-only driver check; recall of the LSH
    clusters vs the exact clusters is pinned by pytest on planted
    near-dups."""
    from turboxsl_ray.pipelines.text import q_minhash_lsh

    pairs = q_minhash_lsh(sf_dir).materialize()
    return _cluster_docs(sf_dir, pairs)


def q_near_dup_clusters_capped(sf_dir: str) -> Dataset:
    """The 100 TB-default near-dup keep-one dedup: connected
    components over the DF-CAPPED pair graph (text.NGRAM_DF_CAP).
    Capping drops only evidence from grams shared by more documents
    than the cap, so every capped edge is a real near-dup edge and
    each capped cluster is contained in an exact cluster (refinement
    pinned by pytest). The cap is deterministic, so this entry carries
    its own recursive-CTE SQL oracle (capped shared counts, uncapped
    sizes) alongside the uncapped ``near_dup_clusters`` one."""
    from turboxsl_ray.pipelines.text import NGRAM_DF_CAP

    return q_near_dup_clusters(sf_dir, df_cap=NGRAM_DF_CAP)


QUALITY_MIN_TOKENS, QUALITY_MAX_TOKENS, QUALITY_MAX_PUNCT = 5, 2000, 0.1

_CURATE_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("n_copies", pa.int64()),
        ("n_tokens", pa.int64()),
        ("clean_text", pa.string()),
    ]
)


def q_curate_corpus(sf_dir: str) -> Dataset:
    """The composed curation pass a training-data pipeline actually
    runs: exact dedup -> quality gates -> stop-token scrub -> packed
    output, as ONE physical plan. Everything after the dedup exchange
    rides the same block: the digest shuffle is the only data
    movement, the gates and the scrub are free riders on the deduped
    block (operator FUSION is the point — running dedup_exact,
    quality_score, and scrub as separate queries would scan and
    shuffle the corpus three times)."""
    from turboxsl_ray.pipelines.text import _docs_path, stable_hash64

    ds = read_documents(sf_dir, ["doc_id", "text"])

    def add_digest(t: pa.Table) -> pa.Table:
        return t.append_column(
            "__h", pa.array(stable_hash64(t["text"]).astype(np.int64))
        )

    parts = partition_by_conv(
        map_partitions(ds, add_digest),
        partitions_for_input(f"{sf_dir}/documents.parquet"),
        keys=["__h"],
    )

    def curate(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _CURATE_SCHEMA.empty_table()
        # 1. dedup: keep min doc_id per exact text, count copies
        g = t.select(["doc_id", "text"]).group_by("text", use_threads=False).aggregate(
            [("doc_id", "min"), ([], "count_all")]
        )
        text = g["text"]
        # 2. quality gates (same expressions as q_quality_score)
        n_chars = pc.cast(pc.utf8_length(text), pa.int64()).to_numpy(
            zero_copy_only=False
        ).astype(np.float64)
        n_punct = pc.cast(
            pc.count_substring_regex(text, r"[.!?,]"), pa.int64()
        ).to_numpy(zero_copy_only=False).astype(np.float64)
        trimmed = pc.utf8_trim_whitespace(text)
        n_tokens = (
            pc.cast(pc.add(pc.count_substring_regex(trimmed, r"\s+"), 1), pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        ratio = np.round(
            np.divide(n_punct, n_chars, out=np.zeros_like(n_punct), where=n_chars > 0),
            6,
        )
        keep = (
            (n_tokens >= QUALITY_MIN_TOKENS)
            & (n_tokens <= QUALITY_MAX_TOKENS)
            & (ratio < QUALITY_MAX_PUNCT)
        )
        g = pa.table(
            {
                "doc_id": as_array(pc.cast(g["doc_id_min"], pa.int64())),
                "n_copies": as_array(pc.cast(g["count_all"], pa.int64())),
                "n_tokens": pa.array(n_tokens, type=pa.int64()),
                "text": as_array(text),
            }
        ).filter(pa.array(keep))
        # 3. scrub survivors only (cheapest last: fewest rows)
        clean = pc.utf8_trim_whitespace(
            pc.replace_substring_regex(
                pc.replace_substring_regex(g["text"], STOP_TOKEN_RE, ""), r"\s+", " "
            )
        )
        return pa.table(
            {
                "doc_id": g["doc_id"],
                "n_copies": g["n_copies"],
                "n_tokens": g["n_tokens"],
                "clean_text": as_array(clean),
            },
            schema=_CURATE_SCHEMA,
        )

    return map_partitions(parts, curate)


_LM_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("n_bigrams", pa.int64()), ("lm_score", pa.float64())]
)

# composite bigram key separator: unit separator \x1f — NUL is unusable
# here because numpy's fixed-width unicode arrays treat trailing NULs as
# padding and silently drop them
_SEP = "\x1f"


def q_lm_score(sf_dir: str) -> Dataset:
    """Bigram-LM quality scoring (the CCNet-style LM filter): every
    document scored by the mean log-probability of its bigrams under
    the corpus's own MLE bigram model, score = avg ln(C(w1,w2)/C(w1)).

    Scale-honest plan — count tables are wordcount-shaped (per-block
    partials, ONE keyed exchange each), never broadcast (bigram vocab
    at web scale is billions of rows):
    1. per-block partial bigram counts -> bigram-keyed combine (C2);
    2. per-block partial unigram counts -> token-keyed combine (C1);
    3. C2 joins C1 by w1 (count-table x count-table, vocab-scale)
       producing the log-prob table bigram -> ln(c2/c1);
    4. bigram INSTANCES join the lp table through one co-partitioned
       exchange (the only instance-scale shuffle);
    5. per-block partial (doc, sum_lp, n) -> doc-keyed combine.
    Documents with <2 tokens have no bigrams and are absent, exactly
    like the SQL oracle."""
    from turboxsl_ray.stages.join import copartition_join

    docs_path = f"{sf_dir}/documents.parquet"
    ds = read_documents(sf_dir, ["doc_id", "text"], spread=True)

    def bigram_instances(t: pa.Table) -> pa.Table:
        empty = pa.schema(
            [("doc_id", pa.int64()), ("bg", pa.string()), ("w1", pa.string())]
        ).empty_table()
        if t.num_rows == 0:
            return empty
        ids, lens, flat = _token_lists(t)
        toks = flat.to_numpy(zero_copy_only=False)
        if len(toks) == 0:
            return empty
        starts = np.concatenate(([0], np.cumsum(lens[:-1])))
        # mask out the cross-document seam: last token of each doc has
        # no following bigram
        keep = np.ones(len(toks), dtype=bool)
        keep[np.cumsum(lens) - 1] = False
        w1 = toks[:-1][keep[:-1]]
        w2 = toks[1:][keep[:-1]]
        doc = np.repeat(ids, lens)[:-1][keep[:-1]]
        bg = np.char.add(np.char.add(w1.astype(str), _SEP), w2.astype(str))
        return pa.table(
            {
                "doc_id": pa.array(doc, type=pa.int64()),
                "bg": pa.array(bg, type=pa.string()),
                "w1": pa.array(w1, type=pa.string()),
            }
        )

    # instances feed the c2 counts AND the final per-instance join;
    # materialize once so the corpus is read + tokenized one time
    instances = map_partitions(ds, bigram_instances).materialize()

    def _counts(src: Dataset, key: str, out: str) -> Dataset:
        schema = pa.schema([(key, pa.string()), (out, pa.int64())])

        def partial(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return schema.empty_table()
            g = t.select([key]).group_by(key, use_threads=False).aggregate(
                [([], "count_all")]
            )
            return pa.table(
                {key: as_array(g[key]),
                 out: as_array(pc.cast(g["count_all"], pa.int64()))},
                schema=schema,
            )

        parts = partition_by_conv(
            map_partitions(src, partial),
            partitions_for_input(docs_path, factor=2.0),
            keys=[key],
        )

        def final(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return schema.empty_table()
            g = t.group_by(key, use_threads=False).aggregate([(out, "sum")])
            return pa.table(
                {key: as_array(g[key]),
                 out: as_array(pc.cast(g[f"{out}_sum"], pa.int64()))},
                schema=schema,
            )

        return map_partitions(parts, final)

    # C2 keyed by the composite bigram string; keep w1 for the C1 join
    c2 = _counts(instances, "bg", "c2")

    def re_split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema(
                [("bg", pa.string()), ("c2", pa.int64()), ("w1", pa.string())]
            ).empty_table()
        w1 = pc.list_element(pc.split_pattern(t["bg"], _SEP, max_splits=1), 0)
        return t.append_column("w1", as_array(w1))

    c2 = map_partitions(c2, re_split)
    # unigram counts over ALL token instances (including doc-final
    # tokens): project w1 from instances PLUS the dropped seam tokens…
    # simpler and oracle-identical: recount from the token stream
    toks = map_partitions(
        ds,
        lambda t: pa.table(
            {"w1": _token_lists(t)[2]}
        ) if t.num_rows else pa.schema([("w1", pa.string())]).empty_table(),
    )
    c1 = _counts(toks, "w1", "c1")

    lp_tbl = copartition_join(
        c2,
        c1,
        on="w1",
        how="inner",
        num_partitions=partitions_for_input(docs_path, factor=2.0),
        left_schema=pa.schema(
            [("bg", pa.string()), ("c2", pa.int64()), ("w1", pa.string())]
        ),
        right_schema=pa.schema([("w1", pa.string()), ("c1", pa.int64())]),
    )

    def to_lp(t: pa.Table) -> pa.Table:
        schema = pa.schema([("bg", pa.string()), ("lp", pa.float64())])
        if t.num_rows == 0 or "bg" not in t.column_names:
            return schema.empty_table()
        c2v = as_array(t["c2"]).to_numpy(zero_copy_only=False).astype(np.float64)
        c1v = as_array(t["c1"]).to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {"bg": as_array(t["bg"]), "lp": pa.array(np.log(c2v / c1v))},
            schema=schema,
        )

    lp = map_partitions(lp_tbl, to_lp)

    scored = copartition_join(
        lp,
        map_partitions(instances, lambda t: t.select(["bg", "doc_id"])),
        on="bg",
        how="inner",
        num_partitions=partitions_for_input(docs_path, factor=4.0),
        left_schema=pa.schema([("bg", pa.string()), ("lp", pa.float64())]),
        right_schema=pa.schema([("bg", pa.string()), ("doc_id", pa.int64())]),
    )

    def doc_partial(t: pa.Table) -> pa.Table:
        schema = pa.schema(
            [("doc_id", pa.int64()), ("s", pa.float64()), ("n", pa.int64())]
        )
        if t.num_rows == 0 or "doc_id" not in t.column_names:
            return schema.empty_table()
        g = t.group_by("doc_id", use_threads=False).aggregate(
            [("lp", "sum"), ([], "count_all")]
        )
        return pa.table(
            {
                "doc_id": as_array(pc.cast(g["doc_id"], pa.int64())),
                "s": as_array(pc.cast(g["lp_sum"], pa.float64())),
                "n": as_array(pc.cast(g["count_all"], pa.int64())),
            },
            schema=schema,
        )

    parts = partition_by_conv(
        map_partitions(scored, doc_partial),
        partitions_for_input(docs_path, factor=1.0),
        keys=["doc_id"],
    )

    def doc_final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _LM_SCHEMA.empty_table()
        g = t.group_by("doc_id", use_threads=False).aggregate(
            [("s", "sum"), ("n", "sum")]
        )
        s = as_array(g["s_sum"]).to_numpy(zero_copy_only=False)
        n = as_array(pc.cast(g["n_sum"], pa.int64())).to_numpy()
        return pa.table(
            {
                "doc_id": as_array(pc.cast(g["doc_id"], pa.int64())),
                "n_bigrams": pa.array(n),
                "lm_score": pa.array(np.round(s / n, 6)),
            },
            schema=_LM_SCHEMA,
        )

    return map_partitions(parts, doc_final)


def _word_grams(flat: pa.Array, row: np.ndarray, k: int):
    """(row_idx, gram string) for all word k-grams that stay in-row:
    k slices of the flat token stream joined element-wise (a gram is
    valid when its first and last token share a row) — no Python loop
    over tokens."""
    n = len(row)
    if n < k:
        return np.empty(0, dtype=np.int64), pa.array([], type=pa.string())
    valid = row[: n - k + 1] == row[k - 1 :]
    vmask = pa.array(valid)
    pieces = [flat.slice(j, n - k + 1).filter(vmask) for j in range(k)]
    joined = pc.binary_join_element_wise(*pieces, " ")
    return row[: n - k + 1][valid], joined


_REP_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("n_tokens", pa.int64()),
        ("top_2gram_frac", pa.float64()),
        ("dup_5gram_frac", pa.float64()),
    ]
)


def q_repetition(sf_dir: str) -> Dataset:
    """Gopher-style repetition quality signals (Rae et al. 2021 §A1.1,
    the public "repetitious text" filters) per document:

    - ``top_2gram_frac``: fraction of tokens covered by occurrences of
      the single most frequent word 2-gram (2 * max count / n_tokens);
    - ``dup_5gram_frac``: fraction of word 5-grams that are repeats of
      an earlier 5-gram in the same document (1 - distinct/total).

    Fully vectorized per block: n-grams are built by slicing the flat
    token stream against itself (a gram is valid when its first and
    last token share a row), per-(row, gram) counts come from one Arrow
    hash aggregate, and per-row maxima/distinct counts from a second
    tiny aggregate — no Python loop touches tokens. A document never
    spans blocks (one row = one document), so everything is
    block-local: zero shuffle, embarrassingly parallel at 100 TB."""
    ds = read_documents(sf_dir, ["doc_id", "text"], spread=True)
    grams = _word_grams

    def per_row_stats(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _REP_SCHEMA.empty_table()
        ids, lens, flat = _token_lists(t)
        nrows = len(lens)
        row = np.repeat(np.arange(nrows, dtype=np.int64), lens)

        def counts(k: int) -> pa.Table:
            r, g = grams(flat, row, k)
            tb = pa.table({"r": pa.array(r), "g": g})
            return tb.group_by(["r", "g"], use_threads=False).aggregate(
                [([], "count_all")]
            )

        # top 2-gram count per row
        c2 = counts(2)
        top2 = np.zeros(nrows, dtype=np.int64)
        if c2.num_rows:
            m2 = c2.group_by("r", use_threads=False).aggregate(
                [("count_all", "max")]
            )
            top2[as_array(m2["r"]).to_numpy()] = as_array(
                pc.cast(m2["count_all_max"], pa.int64())
            ).to_numpy()

        # distinct vs total 5-grams per row
        c5 = counts(5)
        uniq5 = np.zeros(nrows, dtype=np.int64)
        tot5 = np.zeros(nrows, dtype=np.int64)
        if c5.num_rows:
            d5 = c5.group_by("r", use_threads=False).aggregate(
                [("count_all", "sum"), ([], "count_all")]
            )
            rr = as_array(d5["r"]).to_numpy()
            tot5[rr] = as_array(pc.cast(d5["count_all_sum"], pa.int64())).to_numpy()
            uniq5[rr] = as_array(pc.cast(d5["count_all"], pa.int64())).to_numpy()

        with np.errstate(divide="ignore", invalid="ignore"):
            # overlapping occurrences ("x x x x") can push 2*count past
            # n_tokens — clamp to the [0, 1] a coverage fraction means
            top2_frac = np.minimum(np.where(lens >= 2, 2.0 * top2 / lens, 0.0), 1.0)
            dup5_frac = np.where(tot5 > 0, 1.0 - uniq5 / np.maximum(tot5, 1), 0.0)
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "n_tokens": pa.array(lens),
                "top_2gram_frac": pa.array(np.round(top2_frac, 6)),
                "dup_5gram_frac": pa.array(np.round(dup5_frac, 6)),
            },
            schema=_REP_SCHEMA,
        )

    return map_partitions(ds, per_row_stats)


DECON_BENCH_MOD = 100  # doc_id % MOD == 0 designates the benchmark set
DECON_K = 8            # shingle width (chars of an eval example ~ 8 words)

_DECON_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("is_bench", pa.bool_()),
        ("n_overlap", pa.int64()),
        ("contaminated", pa.bool_()),
    ]
)


def q_decontaminate(sf_dir: str) -> Dataset:
    """Benchmark decontamination (the public n-gram-overlap rule used
    for LLM training corpora, e.g. GPT-3 appendix C / Gopher §A1.2):
    flag training documents that share any word ``DECON_K``-gram with
    a designated benchmark set (here: docs with ``doc_id %
    DECON_BENCH_MOD == 0``, a deterministic stand-in for an eval set).

    Plan: the benchmark set is SMALL by definition, so its distinct
    shingle set is collected once (per-block distinct grams of bench
    docs -> tiny driver union) and broadcast via ``ray.put``; the full
    corpus then streams through one ``map_batches`` doing a vectorized
    ``is_in`` probe per gram + a per-(row, gram) distinct count — zero
    shuffle, embarrassingly parallel at 100 TB."""
    import ray

    from turboxsl_ray.stages.aggregate import broadcast, collect_tables

    docs = read_documents(sf_dir, ["doc_id", "text"], spread=True)

    def bench_grams(t: pa.Table) -> pa.Table:
        ids64 = pc.cast(t["doc_id"], pa.int64())
        mod = pc.subtract(
            ids64, pc.multiply(pc.divide(ids64, DECON_BENCH_MOD), DECON_BENCH_MOD)
        )
        sub = t.filter(pc.equal(mod, 0))
        if sub.num_rows == 0:
            return pa.table({"g": pa.array([], pa.string())})
        _ids, lens, flat = _token_lists(sub)
        row = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        _r, g = _word_grams(flat, row, DECON_K)
        return pa.table({"g": pc.unique(g)})

    parts = collect_tables(map_partitions(docs, bench_grams))
    gram_tables = [t for t in parts if t.num_rows]
    if gram_tables:
        bench_set = pc.unique(pa.concat_tables(gram_tables)["g"])
    else:
        bench_set = pa.array([], pa.string())
    ref = broadcast(bench_set)

    def probe(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _DECON_SCHEMA.empty_table()
        bench = ray.get(ref)
        ids, lens, flat = _token_lists(t)
        nrows = len(lens)
        row = np.repeat(np.arange(nrows, dtype=np.int64), lens)
        r, g = _word_grams(flat, row, DECON_K)
        n_overlap = np.zeros(nrows, dtype=np.int64)
        if len(g) and len(bench):
            hit = pc.is_in(g, value_set=bench)
            hit_np = hit.to_numpy(zero_copy_only=False)
            if hit_np.any():
                tb = pa.table(
                    {"r": pa.array(r[hit_np]), "g": g.filter(hit)}
                )
                d = (
                    tb.group_by(["r", "g"], use_threads=False)
                    .aggregate([([], "count_all")])
                    .group_by("r", use_threads=False)
                    .aggregate([([], "count_all")])
                )
                n_overlap[as_array(d["r"]).to_numpy()] = as_array(
                    pc.cast(d["count_all"], pa.int64())
                ).to_numpy()
        is_bench = ids % DECON_BENCH_MOD == 0
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "is_bench": pa.array(is_bench),
                "n_overlap": pa.array(n_overlap),
                "contaminated": pa.array((n_overlap >= 1) & ~is_bench),
            },
            schema=_DECON_SCHEMA,
        )

    return map_partitions(docs, probe)


SHARD_TOKEN_BUDGET = 1024

_SHARD_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("n_tokens", pa.int64()), ("shard_id", pa.int64())]
)


def q_token_shards(sf_dir: str, budget: int = SHARD_TOKEN_BUDGET) -> Dataset:
    """Token-budget shard assignment for training-data packing: under
    global doc_id order, a document goes to shard ``floor(tokens-
    before-it / budget)`` — contiguous ~budget-token output shards,
    deterministic and resume-stable.

    The "tokens before it" is a DISTRIBUTED PREFIX SUM
    (stages/global_sort.sorted_with_prefix_sum): sampled range bounds,
    per-range token totals -> exact global offsets (tiny numbers move),
    then one range exchange of (doc_id, n_tokens) pairs — the fat text
    never shuffles. The prefix-sum stage scans its input three times
    (sample, weight-count, place), so the expensive tokenize runs ONCE
    and only the two-int-column weight table (~1-2 % of corpus bytes;
    object store spills if needed) is materialized for the re-scans."""
    docs = read_documents(sf_dir, ["doc_id", "text"], spread=True)

    def weigh(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema(
                [("doc_id", pa.int64()), ("n_tokens", pa.int64())]
            ).empty_table()
        ids, lens, _flat = _token_lists(t)
        return pa.table({"doc_id": pa.array(ids), "n_tokens": pa.array(lens)})

    weights = map_partitions(docs, weigh).materialize()

    from turboxsl_ray.stages.global_sort import sorted_with_prefix_sum

    ranked = sorted_with_prefix_sum(
        lambda: weights, key="doc_id", weight="n_tokens"
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _SHARD_SCHEMA.empty_table()
        prefix = as_array(t["prefix"]).to_numpy()
        return pa.table(
            {
                "doc_id": as_array(pc.cast(t["doc_id"], pa.int64())),
                "n_tokens": as_array(pc.cast(t["n_tokens"], pa.int64())),
                "shard_id": pa.array(prefix // budget),
            },
            schema=_SHARD_SCHEMA,
        )

    return map_partitions(ranked, finish)


_PACK_SCHEMA = pa.schema(
    [
        ("shard_id", pa.int64()),
        ("n_docs", pa.int64()),
        ("n_tokens", pa.int64()),
        ("packed_text", pa.string()),
    ]
)


def q_pack_sequences(sf_dir: str, budget: int = SHARD_TOKEN_BUDGET) -> Dataset:
    """Sequence packing for LLM training: concatenate each token-budget
    shard's documents (doc-id order) into one ~budget-token training
    sequence.

    Plan: the (doc_id, shard_id) assignment comes from q_token_shards'
    distributed prefix sum (two-int rows — the text never enters that
    exchange); the fat text then moves exactly twice — a co-partitioned
    equi-join back onto documents by doc_id, then one shard_id exchange
    — and each shard's string is built with the zero-copy
    ListArray + binary_join idiom (one C++ concat per block, no Python
    row loop). Broadcast would be wrong here: the assignment table is
    ~16 B/doc, i.e. tens of GB at 10^12 tokens."""
    from turboxsl_ray.stages.join import copartition_join

    shards = q_token_shards(sf_dir, budget=budget).materialize()
    docs = read_documents(sf_dir, ["doc_id", "text"], spread=True)
    np_join = partitions_for_input(f"{sf_dir}/documents.parquet")
    joined = copartition_join(docs, shards, on="doc_id", num_partitions=np_join)
    by_shard = partition_by_conv(joined, np_join, keys=["shard_id"])

    def pack(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "shard_id" not in t.column_names:
            return _PACK_SCHEMA.empty_table()
        t = t.sort_by([("shard_id", "ascending"), ("doc_id", "ascending")])
        sid = as_array(pc.cast(t["shard_id"], pa.int64())).to_numpy()
        starts = np.flatnonzero(np.concatenate(([True], sid[1:] != sid[:-1])))
        offsets = np.append(starts, t.num_rows).astype(np.int32)
        lists = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), as_array(t["text"])
        )
        ntok = as_array(pc.cast(t["n_tokens"], pa.int64())).to_numpy()
        csum = np.concatenate(([0], np.cumsum(ntok)))
        return pa.table(
            {
                "shard_id": pa.array(sid[starts]),
                "n_docs": pa.array(np.diff(offsets).astype(np.int64)),
                "n_tokens": pa.array(csum[offsets[1:]] - csum[offsets[:-1]]),
                "packed_text": as_array(pc.binary_join(lists, " ")),
            },
            schema=_PACK_SCHEMA,
        )

    return map_partitions(by_shard, pack)
