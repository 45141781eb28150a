"""Corpus-level operators: explode/TF-IDF invariants and near-dup
connected components vs a brute-force union-find on planted chains."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _chain_docs(seed: int = 11) -> pa.Table:
    """Docs with a planted near-dup CHAIN (a~b, b~c, c~d by one-word
    edits) plus unrelated docs — clustering must be TRANSITIVE even
    where the chain ends are below the pair threshold themselves."""
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(50)]
    texts, ids = [], []
    for i in range(25):
        texts.append(" ".join(rng.choice(vocab, size=30)))
        ids.append(i)
    # each step edits 5 fresh positions: consecutive docs stay above
    # the pair threshold, the chain ENDS fall below it — only the CC's
    # transitive closure links them
    chain = texts[0].split()
    for step, positions in enumerate(((2, 8, 14, 20, 26), (5, 11, 17, 23, 29))):
        chain = list(chain)
        for p in positions:
            chain[p] = f"EDIT{step}_{p}"
        texts.append(" ".join(chain))
        ids.append(100 + step)
    # one exact-duplicate family
    texts.append(texts[5])
    ids.append(300)
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(texts, pa.string())})


@pytest.fixture(scope="module")
def chain_dir(tmp_path_factory):
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("chaindocs")
    pq.write_table(_chain_docs(), str(d / "documents.parquet"))
    return str(d)


def _union_find_clusters(pairs, all_ids):
    parent = {int(i): int(i) for i in all_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min doc id per component
    comp = {}
    for i in all_ids:
        r = find(int(i))
        comp.setdefault(r, []).append(int(i))
    return {i: min(m) for r, m in comp.items() for i in m}


def test_near_dup_clusters_match_union_find(ray_session, chain_dir):
    from turboxsl_ray.pipelines.corpus import q_near_dup_clusters
    from turboxsl_ray.pipelines.text import q_ngram_jaccard

    pairs = q_ngram_jaccard(chain_dir).to_pandas()
    got = q_near_dup_clusters(chain_dir).to_pandas()
    expected = _union_find_clusters(
        pairs[["doc_a", "doc_b"]].to_numpy(), got["doc_id"].to_numpy()
    )
    for _, row in got.iterrows():
        assert expected[int(row["doc_id"])] == int(row["cluster_id"])
        assert bool(row["is_canonical"]) == (row["doc_id"] == row["cluster_id"])
    # the planted chain is one transitive cluster rooted at doc 0 ...
    chain_cluster = {
        int(r["cluster_id"]) for _, r in got.iterrows() if r["doc_id"] in (0, 100, 101)
    }
    assert chain_cluster == {0}
    # ... which only transitivity produces: the chain ends share no edge
    direct = {tuple(p) for p in pairs[["doc_a", "doc_b"]].to_numpy()}
    assert (0, 100) in direct and (100, 101) in direct
    assert (0, 101) not in direct
    # exact duplicate family collapses to the min id
    assert int(got.set_index("doc_id").loc[300, "cluster_id"]) == 5
    # exactly one canonical doc per cluster
    canon_per_cluster = got.groupby("cluster_id")["is_canonical"].sum()
    assert (canon_per_cluster == 1).all()


def test_near_dup_clusters_capped_refines_exact(ray_session, chain_dir):
    """The DF-capped scale path loses only hot-gram EVIDENCE, never
    invents edges: every capped cluster must sit inside one exact
    cluster (refinement), and at a cap above the corpus size the two
    are identical."""
    from turboxsl_ray.pipelines.corpus import (
        q_near_dup_clusters,
        q_near_dup_clusters_capped,
    )

    exact = (
        q_near_dup_clusters(chain_dir).to_pandas().set_index("doc_id")["cluster_id"]
    )
    # default cap (128) exceeds the 28-doc fixture: identical output
    capped_default = (
        q_near_dup_clusters_capped(chain_dir)
        .to_pandas()
        .set_index("doc_id")["cluster_id"]
    )
    assert capped_default.sort_index().equals(exact.sort_index())
    # an aggressive cap prunes edges — clusters may split, never merge
    tight = (
        q_near_dup_clusters(chain_dir, df_cap=3)
        .to_pandas()
        .set_index("doc_id")["cluster_id"]
    )
    for cid, members in tight.groupby(tight).groups.items():
        exact_cids = {int(exact[d]) for d in members}
        assert len(exact_cids) == 1, f"capped cluster {cid} spans exact clusters"


def test_explode_tokens_round_trip(ray_session, chain_dir):
    """Tokens re-joined in ordinal order reproduce the normalized
    text — the explode is lossless up to whitespace runs."""
    import pyarrow.parquet as pq

    from turboxsl_ray.pipelines.corpus import q_explode_tokens

    df = q_explode_tokens(chain_dir).to_pandas()
    rebuilt = (
        df.sort_values(["doc_id", "tok_idx"])
        .groupby("doc_id")["token"]
        .agg(" ".join)
    )
    src = pq.read_table(f"{chain_dir}/documents.parquet").to_pandas()
    for _, row in src.iterrows():
        norm = " ".join(row["text"].split())
        assert rebuilt[row["doc_id"]] == norm
    # ordinals are 1..n dense per doc
    g = df.groupby("doc_id")["tok_idx"]
    assert (g.min() == 1).all()
    assert (g.max() == g.count()).all()


def test_tfidf_invariants(ray_session, chain_dir):
    from turboxsl_ray.pipelines.corpus import q_tfidf

    df = q_tfidf(chain_dir).to_pandas()
    n_docs = df["doc_id"].nunique()
    # a token present in every doc has idf 0 => tfidf exactly 0
    ubiquitous = df.groupby("token")["df"].first()
    everywhere = ubiquitous[ubiquitous == 30].index  # 30 docs in fixture
    if len(everywhere):
        assert (df[df["token"].isin(everywhere)]["tfidf"] == 0.0).all()
    # df is consistent: token row count == df value
    per_token_rows = df.groupby("token")["doc_id"].nunique()
    per_token_df = df.groupby("token")["df"].first()
    assert (per_token_rows == per_token_df).all()
    # tf sums back to the token totals of the explode
    from turboxsl_ray.pipelines.corpus import q_explode_tokens

    tok = q_explode_tokens(chain_dir).to_pandas()
    assert df["tf"].sum() == len(tok)
    assert n_docs == tok["doc_id"].nunique()


def test_cc_engine_deep_chain_and_single_shard(ray_session):
    """Direct BSP engine check: a 40-node path graph needs ~20+ rounds
    of min-label propagation (diameter-bound), plus isolated self-pairs
    and the n_shards=1 code path."""
    import ray.data

    from turboxsl_ray.stages.cc import connected_components

    n = 40
    a = list(range(n - 1)) + [500]
    b = list(range(1, n)) + [501]
    pairs = ray.data.from_arrow(
        pa.table({"doc_a": pa.array(a, pa.int64()),
                  "doc_b": pa.array(b, pa.int64())})
    ).repartition(4)

    for shards in (1, 8):
        lab = (
            connected_components(pairs, n_shards=shards, max_rounds=64)
            .to_pandas()
            .set_index("node")["comp"]
        )
        assert len(lab) == n + 2
        assert (lab.loc[list(range(n))] == 0).all()
        assert lab.loc[500] == 500 and lab.loc[501] == 500

    with pytest.raises(Exception, match="did not converge"):
        connected_components(pairs, n_shards=2, max_rounds=3)


def test_connected_components_deep_chain_pointer_jumping(ray_session):
    """A 600-node path graph has diameter 600: hash-min alone needs
    ~600 rounds, pointer jumping must converge in O(log n) — well
    inside max_rounds=20 — with every node labeled by the chain min."""
    import ray.data

    from turboxsl_ray.stages.cc import connected_components

    n = 600
    pairs = pa.table({
        "doc_a": pa.array(np.arange(n - 1), pa.int64()),
        "doc_b": pa.array(np.arange(1, n), pa.int64()),
    })
    labels = (
        connected_components(
            ray.data.from_arrow(pairs).repartition(4), n_shards=4, max_rounds=20
        )
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    assert len(labels) == n
    assert (labels["comp"] == 0).all()


def test_repetition_signals_on_crafted_docs(tmp_path):
    """Pin the Gopher-style repetition metric semantics on hand-checked
    documents (the oracle pins parity; this pins meaning)."""
    import pyarrow.parquet as pq

    from turboxsl_ray.pipelines.corpus import q_repetition

    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    # "a b" occurs 3x in 6 tokens -> top2 = 2*3/6 = 1.0;
                    # 5-grams: "a b a b a", "b a b a b" distinct -> dup 0
                    "a b a b a b",
                    # one token repeated: overlapping "x x" 5x -> clamp 1.0;
                    # 5-grams: 2 total, 1 distinct -> dup 0.5
                    "x x x x x x",
                    # no repeated 2-gram: top2 = 2*1/5 = 0.4; <5 tokens? no:
                    # 5 tokens -> one 5-gram, distinct -> dup 0
                    "v w y z q",
                    # short doc: no 2-grams, no 5-grams
                    "solo",
                ],
                pa.string(),
            ),
        }
    )
    d = tmp_path / "repdocs"
    d.mkdir()
    pq.write_table(docs, str(d / "documents.parquet"))
    out = (
        q_repetition(str(d))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["n_tokens"].tolist() == [6, 6, 5, 1]
    assert out["top_2gram_frac"].tolist() == [1.0, 1.0, 0.4, 0.0]
    assert out["dup_5gram_frac"].tolist() == [0.0, 0.5, 0.0, 0.0]


def test_decontaminate_flags_planted_overlap(tmp_path):
    """A doc sharing an 8-gram with a benchmark doc is contaminated;
    an 7-gram-only overlap is not; bench docs are never flagged."""
    import pyarrow.parquet as pq

    from turboxsl_ray.pipelines.corpus import q_decontaminate

    bench_text = "q1 q2 q3 q4 q5 q6 q7 q8 q9 q10"
    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    bench_text,                      # id 0 -> benchmark (0 % 100 == 0)
                    "x " + bench_text + " y",        # full 8-gram overlap -> contaminated
                    "q1 q2 q3 q4 q5 q6 q7 zz done",  # only a 7-gram prefix -> clean
                    "totally unrelated words here",  # clean
                ],
                pa.string(),
            ),
        }
    )
    d = tmp_path / "decon"
    d.mkdir()
    pq.write_table(docs, str(d / "documents.parquet"))
    out = (
        q_decontaminate(str(d))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["is_bench"].tolist() == [True, False, False, False]
    assert out["contaminated"].tolist() == [False, True, False, False]
    # doc 1 contains q1..q10 contiguous -> 3 distinct bench 8-grams
    assert out["n_overlap"].tolist()[1] == 3
    assert out["n_overlap"].tolist()[2] == 0
