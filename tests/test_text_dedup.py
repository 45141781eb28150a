"""Dedup / similarity operators on fixtures with PLANTED duplicates —
covers what the sf oracles can't (recall of the approximate paths)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _docs_with_dups(seed: int = 3) -> pa.Table:
    """60 base docs + exact copies + near-dups (one word changed)."""
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(40)]
    texts, ids = [], []
    for i in range(60):
        words = list(rng.choice(vocab, size=30))
        texts.append(" ".join(words))
        ids.append(i)
    # exact duplicates of docs 0..4
    for j in range(5):
        texts.append(texts[j])
        ids.append(100 + j)
    # near-duplicates of docs 10..14: change one middle word
    for j in range(5):
        words = texts[10 + j].split()
        words[15] = "CHANGED"
        texts.append(" ".join(words))
        ids.append(200 + j)
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(texts, pa.string())})


@pytest.fixture(scope="module")
def dup_dir(tmp_path_factory):
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("dupdocs")
    pq.write_table(_docs_with_dups(), str(d / "documents.parquet"))
    return str(d)


def test_dedup_exact_planted(ray_session, dup_dir):
    from turboxsl_ray.pipelines.text import q_dedup_exact

    df = q_dedup_exact(dup_dir).to_pandas()
    # 70 docs, 5 exact dup pairs -> 65 distinct texts
    assert len(df) == 65
    dups = df[df["n_copies"] > 1]
    assert len(dups) == 5
    # first-wins: min doc_id kept
    assert set(dups["doc_id"]) == {0, 1, 2, 3, 4}
    assert (dups["n_copies"] == 2).all()


def test_ngram_jaccard_finds_near_dups(ray_session, dup_dir):
    from turboxsl_ray.pipelines.text import q_ngram_jaccard

    pairs = q_ngram_jaccard(dup_dir, threshold=0.5).to_pandas()
    got = {tuple(p) for p in pairs[["doc_a", "doc_b"]].to_numpy()}
    # exact copies have jaccard 1.0; near-dups ~ (28-3*2)/28-ish > 0.5
    for j in range(5):
        assert (j, 100 + j) in got
    for j in range(5):
        assert (10 + j, 200 + j) in got
    ones = pairs[pairs["jaccard"] >= 0.999]
    assert {tuple(p) for p in ones[["doc_a", "doc_b"]].to_numpy()} >= {
        (j, 100 + j) for j in range(5)
    }


def test_minhash_lsh_recall_vs_exact(ray_session, dup_dir):
    """LSH must recover every exact-jaccard pair >= 0.7 (16 bands x 4
    rows: detection probability at j=0.7 is ~1 - (1-0.24)^16 ~ 0.99)."""
    from turboxsl_ray.pipelines.text import q_minhash_lsh, q_ngram_jaccard

    exact = q_ngram_jaccard(dup_dir, threshold=0.7).to_pandas()
    truth = {tuple(p) for p in exact[["doc_a", "doc_b"]].to_numpy()}
    assert truth, "fixture must contain high-jaccard pairs"
    est = q_minhash_lsh(dup_dir, est_threshold=0.5).to_pandas()
    got = {tuple(p) for p in est[["doc_a", "doc_b"]].to_numpy()}
    missed = truth - got
    assert not missed, f"LSH missed {missed}"
    # estimates for exact copies must be 1.0
    perfect = est[est["doc_a"].isin(range(5)) & (est["doc_b"] >= 100)]
    assert (perfect["est_jaccard"] == 1.0).all()


def test_ngram_jaccard_df_cap(ray_session, dup_dir):
    """A cap above every gram's document frequency changes nothing; a
    tight cap yields a subset with jaccard lower bounds (pruning only
    drops shared-gram evidence) while still catching exact copies."""
    from turboxsl_ray.pipelines.text import q_ngram_jaccard

    full = q_ngram_jaccard(dup_dir).to_pandas()
    same = q_ngram_jaccard(dup_dir, df_cap=10_000).to_pandas()
    key = ["doc_a", "doc_b"]
    assert full.sort_values(key).reset_index(drop=True).equals(
        same.sort_values(key).reset_index(drop=True)
    )
    capped = q_ngram_jaccard(dup_dir, df_cap=2).to_pandas()
    truth = {(a, b): j for a, b, j in full[[*key, "jaccard"]].to_numpy()}
    for a, b, j in capped[[*key, "jaccard"]].to_numpy():
        assert (int(a), int(b)) in truth
        assert j <= truth[(int(a), int(b))] + 1e-9
    # exact copies (df=2 grams) survive even the tightest useful cap
    got = {(int(a), int(b)) for a, b in capped[key].to_numpy()}
    assert {(j, 100 + j) for j in range(5)} <= got


def test_winnow_kernel_guarantee():
    """The winnowing guarantee: two byte strings sharing a substring of
    length >= W + K - 1 share at least one selected fingerprint; and a
    doc always shares ALL fingerprints with itself."""
    import numpy as np

    from turboxsl_ray.pipelines.text import WINNOW_K, WINNOW_W, _winnow_doc

    rng = np.random.default_rng(11)

    def rand_bytes(n):
        return bytes(rng.integers(97, 123, n, dtype=np.uint8))

    shared = rand_bytes(WINNOW_W + WINNOW_K - 1)
    a = rand_bytes(50) + shared + rand_bytes(50)
    b = rand_bytes(40) + shared + rand_bytes(60)
    fa, fb = _winnow_doc(a), _winnow_doc(b)
    assert len(np.intersect1d(fa, fb)) >= 1
    np.testing.assert_array_equal(_winnow_doc(a), fa)  # deterministic
    assert len(_winnow_doc(b"")) == 0
    assert len(_winnow_doc(b"x" * (WINNOW_K - 1))) == 0


def test_winnow_dedup_planted(ray_session, dup_dir):
    """Exact copies rank top by shared fraction; near-dups found."""
    from turboxsl_ray.pipelines.text import q_winnow_dedup

    df = q_winnow_dedup(dup_dir).to_pandas()
    got = {tuple(p) for p in df[["doc_a", "doc_b"]].to_numpy()}
    for j in range(5):
        assert (j, 100 + j) in got  # exact copies
    exact = df[(df["doc_a"] < 5) & (df["doc_b"] >= 100)]
    assert (exact["shared_frac"] == 1.0).all()
    near = {(10 + j, 200 + j) for j in range(5)}
    assert len(near & got) >= 4  # near-dups (one word changed)


def test_simhash_near_dup_hamming(ray_session, dup_dir):
    """SimHash of near-dups differs in few bits; random pairs in many."""
    from turboxsl_ray.pipelines.text import q_simhash

    df = q_simhash(dup_dir).to_pandas().set_index("doc_id")["simhash"]
    def ham(a, b):
        return bin(int(a, 16) ^ int(b, 16)).count("1")

    for j in range(5):
        assert ham(df[j], df[100 + j]) == 0            # exact copy
        assert ham(df[10 + j], df[200 + j]) <= 16      # near-dup
    rand = [ham(df[i], df[i + 30]) for i in range(5)]
    assert np.mean(rand) > 10                          # unrelated docs differ


def test_lang_id_markers(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from turboxsl_ray.pipelines.text import q_lang_id

    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": pa.array([
            "the cat and the dog is here",
            "der hund und die katze ist da",
            "le chat et la maison est grande",
            "你好 世界",
            "zzz qqq xxx",
        ]),
    })
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    df = q_lang_id(str(tmp_path)).to_pandas().set_index("doc_id")["pred_lang"]
    assert df[1] == "en" and df[2] == "de" and df[3] == "fr"
    assert df[4] == "zh" and df[5] == "unknown"


def test_embedding_lsh_recall(ray_session, tmp_path):
    """Hyperplane LSH finds planted near-identical vectors (tiny angle)."""
    import pyarrow.parquet as pq

    from turboxsl_ray.pipelines.vectors import q_ann_lsh_buckets, q_embedding_pairs

    rng = np.random.default_rng(5)
    base = rng.normal(size=(40, 16)).astype(np.float32)
    near = base[:5] + rng.normal(scale=0.01, size=(5, 16)).astype(np.float32)
    mat = np.vstack([base, near])
    tbl = pa.table({
        "vec_id": pa.array(np.arange(45), pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(mat.reshape(-1)), 16).cast(pa.list_(pa.float32())),
        "label": pa.array(np.zeros(45, dtype=np.int32)),
    })
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    exact = q_embedding_pairs(str(tmp_path), threshold=0.99).to_pandas()
    truth = {tuple(p) for p in exact[["vec_a", "vec_b"]].to_numpy()}
    assert {(j, 40 + j) for j in range(5)} <= truth
    approx = q_ann_lsh_buckets(str(tmp_path), threshold=0.99).to_pandas()
    got = {tuple(p) for p in approx[["vec_a", "vec_b"]].to_numpy()}
    # near-identical vectors share every hyperplane side (w.h.p.)
    assert {(j, 40 + j) for j in range(5)} <= got


def test_ann_ivf_full_probe_equals_brute_force(ray_session):
    """nprobe == ncentroids must reproduce exact brute-force top-k."""
    from turboxsl_ray.pipelines.vectors import q_ann_ivf, q_ann_topk

    sf = "/root/testdata/sf0.001"
    exact = q_ann_topk(sf)
    full = q_ann_ivf(sf, nprobe=16, ncentroids=16)
    pd_exact = exact.sort_values(["qid", "vec_id"]).reset_index(drop=True)
    pd_full = full.sort_values(["qid", "vec_id"]).reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(pd_exact, pd_full)


def test_ann_ivf_partial_probe_recall(ray_session):
    """Partial probing keeps decent recall on the synthetic embeddings."""
    from turboxsl_ray.pipelines.vectors import q_ann_ivf, q_ann_topk

    sf = "/root/testdata/sf0.001"
    exact = q_ann_topk(sf)
    approx = q_ann_ivf(sf, nprobe=8, ncentroids=16)
    truth = {tuple(p) for p in exact[["qid", "vec_id"]].to_numpy()}
    got = {tuple(p) for p in approx[["qid", "vec_id"]].to_numpy()}
    recall = len(truth & got) / len(truth)
    assert recall >= 0.5, f"recall {recall:.2f}"


def test_minhash_lsh_broadcast_equals_distributed(ray_session, dup_dir, monkeypatch):
    """The AQE-style plan switch must be invisible: forcing the
    at-scale path (co-partitioned sig joins) yields exactly the
    broadcast path's pairs and estimates."""
    import turboxsl_ray.pipelines.text as text

    bcast = (
        text.q_minhash_lsh(dup_dir)
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    monkeypatch.setattr(text, "SIG_BROADCAST_BYTES", -1)
    dist = (
        text.q_minhash_lsh(dup_dir)
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    assert len(bcast) > 0
    import pandas.testing as pdt

    pdt.assert_frame_equal(bcast, dist)


def test_embed_dedup_transitive_chain(ray_session, tmp_path):
    """a~b and b~c above threshold but a!~c: CC must still cluster all
    three (transitive closure), canonical = min vec_id; isolated
    vectors stay their own singleton clusters."""
    import pyarrow.parquet as pq

    from turboxsl_ray.pipelines.vectors import q_embed_dedup

    rng = np.random.default_rng(9)
    # planted chain: rotate a base vector ~35 degrees per step so
    # adjacent sims (~0.82) pass threshold 0.6 but ends (~0.34) fail
    base = np.zeros(16); base[0] = 1.0
    step = np.zeros(16); step[1] = 1.0
    ang = np.deg2rad(35)
    chain = [base,
             np.cos(ang) * base + np.sin(ang) * step,
             np.cos(2 * ang) * base + np.sin(2 * ang) * step]
    iso = rng.normal(size=(3, 16))
    iso -= (iso @ base)[:, None] * base  # orthogonal to the chain plane
    iso -= (iso @ step)[:, None] * step
    mat = np.vstack(chain + [iso]).astype(np.float32)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(6), pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(mat.reshape(-1)), 16).cast(pa.list_(pa.float32())),
        "label": pa.array(np.zeros(6, dtype=np.int32)),
    })
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    got = (
        q_embed_dedup(str(tmp_path), threshold=0.6)
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    assert got["cluster_id"].tolist()[:3] == [0, 0, 0]
    assert got["cluster_id"].tolist()[3:] == [3, 4, 5]
    assert got["is_canonical"].tolist() == [True, False, False, True, True, True]


def test_minhash_dedup_planted(ray_session, dup_dir):
    """LSH-candidate keep-one dedup: exact copies must collapse to the
    min id; every cluster edge it asserts must be a real near-dup (no
    false merges on the 60 unrelated base docs)."""
    from turboxsl_ray.pipelines.corpus import q_minhash_dedup

    df = q_minhash_dedup(dup_dir).to_pandas().set_index("doc_id")
    # exact copies: identical signatures land in every band bucket
    for j in range(5):
        assert int(df.loc[100 + j, "cluster_id"]) == j
        assert not bool(df.loc[100 + j, "is_canonical"])
        assert bool(df.loc[j, "is_canonical"])
    # near-dups (1 of 30 words changed, est jaccard ~0.9): LSH with
    # 16 bands x 4 rows finds essentially all of them
    found = sum(int(df.loc[200 + j, "cluster_id"]) == 10 + j for j in range(5))
    assert found >= 4
    # no false merges: unrelated base docs stay their own cluster
    base = df.loc[[i for i in range(60) if i not in range(10, 15)]]
    assert (base["cluster_id"] == base.index).all()
    # exactly one canonical per cluster
    assert (df.groupby("cluster_id")["is_canonical"].sum() == 1).all()
