"""Similarity search + embedding near-dup over ``embeddings``.

- ``q_ann_topk``: brute-force cosine top-k — the baseline ANN: the
  query matrix is broadcast once (``ray.put``), each block does one
  numpy matmul and emits only its LOCAL top-k per query, the driver
  merges the tiny partials. At 100 TB this plan moves O(blocks × q × k)
  rows, never the embeddings.
- ``q_embedding_pairs``: all-pairs cosine near-dup (i < j) against a
  broadcast normalized matrix — exact, matches the SQL oracle. The
  sub-quadratic scale path is ``q_ann_lsh_buckets`` (random-hyperplane
  LSH), which buckets vectors so only same-bucket pairs are compared.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data import Dataset

from turboxsl_ray.context import partitions_for_input
from turboxsl_ray.kernels.arrays import as_array
from turboxsl_ray.stages.aggregate import broadcast
from turboxsl_ray.stages.partitioning import map_partitions, partition_by_conv

ANN_K = 5
ANN_NUM_QUERIES = 8
PAIR_THRESHOLD = 0.35
LSH_PLANES = 12


def read_embeddings(sf_dir: str, columns: list[str] | None = None) -> Dataset:
    return ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=columns)


def _block_matrix(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(ids, float64 matrix) from an embeddings block, zero-copy-ish."""
    ids = as_array(t["vec_id"]).to_numpy()
    emb = as_array(t["embedding"])
    flat = emb.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    dim = len(flat) // max(len(ids), 1)
    return ids, flat.reshape(len(ids), dim)


def _load_queries(sf_dir: str, n_queries: int) -> tuple[np.ndarray, np.ndarray]:
    """The tiny query-side read: predicate + projection pushed down to
    the parquet scan, so only matching row groups / columns are read
    (never the full table)."""
    import pyarrow.parquet as pq

    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", n_queries)],
    )
    return _block_matrix(t)


def q_ann_topk(sf_dir: str, k: int = ANN_K, n_queries: int = ANN_NUM_QUERIES) -> pd.DataFrame:
    """Top-k cosine neighbors (excluding self) for each query vector."""
    qids, qmat = _load_queries(sf_dir, n_queries)
    qnorm = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    ref = broadcast({"qids": qids, "q": qnorm})

    ds = read_embeddings(sf_dir)

    def local_topk(t: pa.Table) -> pa.Table:
        side = ray.get(ref)
        ids, x = _block_matrix(t)
        if len(ids) == 0:
            return pa.table({"qid": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        xn = x / np.linalg.norm(x, axis=1, keepdims=True)
        sims = side["q"] @ xn.T  # (nq, block)
        out_q, out_v, out_s = [], [], []
        for qi, qid in enumerate(side["qids"]):
            s = sims[qi].copy()
            s[ids == qid] = -np.inf  # exclude self
            kk = min(k, len(s))
            top = np.argpartition(-s, kk - 1)[:kk]
            keep = np.isfinite(s[top])
            out_q.append(np.full(keep.sum(), qid, dtype=np.int64))
            out_v.append(ids[top][keep])
            out_s.append(s[top][keep])
        return pa.table(
            {
                "qid": pa.array(np.concatenate(out_q)),
                "vec_id": pa.array(np.concatenate(out_v), type=pa.int64()),
                "sim": pa.array(np.concatenate(out_s), type=pa.float64()),
            }
        )

    partials = map_partitions(ds, local_topk).to_pandas()
    if partials.empty:
        return pd.DataFrame(columns=["qid", "vec_id", "sim"])
    # tiny final merge: per query, global top-k (ties → smaller vec_id)
    partials = partials.sort_values(
        ["qid", "sim", "vec_id"], ascending=[True, False, True], kind="stable"
    )
    out = partials.groupby("qid", sort=True).head(k).reset_index(drop=True)
    out["sim"] = out["sim"].round(4)
    return out[["qid", "vec_id", "sim"]]


EMB_TILE_ROWS = 8192

_EMB_PAIR_SCHEMA = pa.schema(
    [("vec_a", pa.int64()), ("vec_b", pa.int64()), ("sim", pa.float64())]
)


@ray.remote
def _pair_tile(ta: pa.Table, tb: pa.Table, same: bool, threshold: float) -> pa.Table:
    """Compare two row tiles (block × block cosine matmul); emit only
    pairs >= threshold, each unordered pair exactly once."""
    ids_a, xa = _block_matrix(ta)
    ids_b, xb = _block_matrix(tb)
    if len(ids_a) == 0 or len(ids_b) == 0:
        return _EMB_PAIR_SCHEMA.empty_table()
    an = xa / np.linalg.norm(xa, axis=1, keepdims=True)
    bn = xb / np.linalg.norm(xb, axis=1, keepdims=True)
    sims = an @ bn.T
    if same:
        # one tile against itself: id order dedups (vec_ids are unique)
        ii, jj = np.nonzero((sims >= threshold) & (ids_a[:, None] < ids_b[None, :]))
        lo, hi = ids_a[ii], ids_b[jj]
    else:
        ii, jj = np.nonzero(sims >= threshold)
        lo = np.minimum(ids_a[ii], ids_b[jj])
        hi = np.maximum(ids_a[ii], ids_b[jj])
    if len(ii) == 0:
        return _EMB_PAIR_SCHEMA.empty_table()
    return pa.table(
        {
            "vec_a": pa.array(lo, type=pa.int64()),
            "vec_b": pa.array(hi, type=pa.int64()),
            "sim": pa.array(np.round(sims[ii, jj], 4), type=pa.float64()),
        },
        schema=_EMB_PAIR_SCHEMA,
    )


def q_embedding_pairs(
    sf_dir: str, threshold: float = PAIR_THRESHOLD, tile_rows: int = EMB_TILE_ROWS
) -> Dataset:
    """Exact cosine near-dup pairs (vec_a < vec_b, sim >= threshold).

    Tiled all-pairs: the table is split into row tiles that live in the
    object store; one Ray task per tile pair (i <= j) does the
    block × block matmul and emits only passing pairs. No full-matrix
    broadcast and no driver materialization — each tile ships from the
    object store to at most T-1 consumers. (Raw Ray tasks here because
    a self-cross-product is the one shape ``map_batches`` can't
    express.) Exact all-pairs is inherently O(N²) flops; the
    sub-quadratic gates at scale are q_ann_lsh_buckets / q_ann_ivf —
    this is the SQL-oracle-checked exact baseline."""
    ds = read_embeddings(sf_dir, columns=["vec_id", "embedding"])
    n = ds.count()
    if n == 0:
        return ray.data.from_arrow(_EMB_PAIR_SCHEMA.empty_table())
    tiles = max(1, -(-n // tile_rows))
    refs = ds.repartition(tiles).to_arrow_refs()
    out = [
        _pair_tile.remote(refs[i], refs[j], i == j, threshold)
        for i in range(len(refs))
        for j in range(i, len(refs))
    ]
    return ray.data.from_arrow_refs(out)


def q_ann_lsh_buckets(sf_dir: str, threshold: float = PAIR_THRESHOLD) -> Dataset:
    """Random-hyperplane LSH near-dup: the sub-quadratic scale path.

    Sign-bit signatures over LSH_PLANES seeded hyperplanes → bucket id;
    one shuffle by bucket; exact cosine only within buckets. Misses
    cross-bucket pairs by design (recall measured in tests vs
    q_embedding_pairs); rows-only driver check."""
    ds = read_embeddings(sf_dir)

    def assign(t: pa.Table) -> pa.Table:
        ids, x = _block_matrix(t)
        if len(ids) == 0:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "embedding": t["embedding"]})
        dim = x.shape[1]
        pl = np.random.default_rng(1234).normal(size=(dim, LSH_PLANES))
        bits = (x @ pl) >= 0
        bucket = (bits * (1 << np.arange(LSH_PLANES))).sum(axis=1).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(bucket),
                "vec_id": pa.array(ids, type=pa.int64()),
                "embedding": as_array(t["embedding"]),
            }
        )

    by_bucket = partition_by_conv(
        map_partitions(ds, assign),
        partitions_for_input(f"{sf_dir}/embeddings.parquet", parallel=True),
        keys=["bucket"],
    )

    def bucket_pairs(t: pa.Table) -> pa.Table:
        empty = pa.table({"vec_a": pa.array([], pa.int64()),
                          "vec_b": pa.array([], pa.int64()),
                          "sim": pa.array([], pa.float64())})
        if t.num_rows == 0:
            return empty
        t = t.sort_by([("bucket", "ascending"), ("vec_id", "ascending")])
        bk = as_array(t["bucket"]).to_numpy()
        ids, x = _block_matrix(t.select(["vec_id", "embedding"]))
        xn = x / np.linalg.norm(x, axis=1, keepdims=True)
        la, lb, ls = [], [], []
        starts = np.flatnonzero(np.concatenate(([True], bk[1:] != bk[:-1])))
        ends = np.append(starts[1:], len(bk))
        for s, e in zip(starts, ends):
            m = e - s
            if m < 2:
                continue
            sims = xn[s:e] @ xn[s:e].T
            i, j = np.triu_indices(m, k=1)
            keep = sims[i, j] >= threshold
            la.append(ids[s + i[keep]])
            lb.append(ids[s + j[keep]])
            ls.append(sims[i[keep], j[keep]])
        if not la:
            return empty
        return pa.table(
            {
                "vec_a": pa.array(np.concatenate(la), type=pa.int64()),
                "vec_b": pa.array(np.concatenate(lb), type=pa.int64()),
                "sim": pa.array(np.round(np.concatenate(ls), 4), type=pa.float64()),
            }
        )

    cand = map_partitions(by_bucket, bucket_pairs)
    # cross-bucket dedup via a pair-keyed shuffle (same sim on every
    # duplicate — min is just a deterministic pick), not on the driver
    by_pair = partition_by_conv(
        cand,
        partitions_for_input(f"{sf_dir}/embeddings.parquet", factor=0.5),
        keys=["vec_a", "vec_b"],
    )

    def distinct(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _EMB_PAIR_SCHEMA.empty_table()
        g = t.group_by(["vec_a", "vec_b"]).aggregate([("sim", "min")])
        return g.rename_columns(["vec_a", "vec_b", "sim"]).cast(_EMB_PAIR_SCHEMA)

    return map_partitions(by_pair, distinct)


# --------------------------------------------------------------------------
# embedding-cosine near-dup dedup (keep-one-per-cluster)
# --------------------------------------------------------------------------

EMBED_DEDUP_THRESHOLD = 0.6

_EMB_DEDUP_SCHEMA = pa.schema(
    [("vec_id", pa.int64()), ("cluster_id", pa.int64()), ("is_canonical", pa.bool_())]
)


def q_embed_dedup(
    sf_dir: str, threshold: float = EMBED_DEDUP_THRESHOLD
) -> Dataset:
    """Embedding-cosine near-dup dedup: connected components over the
    exact cosine pair graph (``q_embedding_pairs`` at a dedup-grade
    threshold), every vector labeled with the MIN vec_id reachable;
    ``is_canonical`` marks the one vector per cluster a keep-one dedup
    retains. The corpus-text twin is ``corpus.q_near_dup_clusters``;
    this closes the dedup family on the embedding side.

    Scale shape: pair generation is the tiled exact plan (swap in
    ``q_ann_lsh_buckets`` candidates when n² flops stop being
    affordable — same downstream), the CC iteration runs on the BSP
    actor engine (stages/cc.py) over pair-graph nodes only, and
    vectors outside the pair graph never enter the loop — they join
    the labels at the end (left join + fill-own-id)."""
    from turboxsl_ray.context import partitions_for_input
    from turboxsl_ray.stages.cc import connected_components
    from turboxsl_ray.stages.join import copartition_join

    ids_ds = read_embeddings(sf_dir, columns=["vec_id"])
    pairs = q_embedding_pairs(sf_dir, threshold=threshold).materialize()

    def own_label(t: pa.Table) -> pa.Table:
        ids = as_array(pc.cast(t["vec_id"], pa.int64()))
        return pa.table(
            {"vec_id": ids, "cluster_id": ids,
             "is_canonical": pa.array(np.ones(len(ids), dtype=bool))},
            schema=_EMB_DEDUP_SCHEMA,
        )

    if pairs.count() == 0:
        return map_partitions(ids_ds, own_label)

    labels = connected_components(pairs, a_col="vec_a", b_col="vec_b")
    clusters = map_partitions(
        labels, lambda t: t.rename_columns(["vec_id", "cluster_id"])
    )
    out = copartition_join(
        ids_ds,
        clusters,
        on="vec_id",
        num_partitions=partitions_for_input(
            f"{sf_dir}/embeddings.parquet", factor=0.25
        ),
        how="left",
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "vec_id" not in t.column_names:
            return _EMB_DEDUP_SCHEMA.empty_table()
        ids = as_array(pc.cast(t["vec_id"], pa.int64()))
        comp = pc.coalesce(pc.cast(t["cluster_id"], pa.int64()), ids)
        return pa.table(
            {
                "vec_id": ids,
                "cluster_id": as_array(comp),
                "is_canonical": as_array(pc.equal(comp, ids)),
            },
            schema=_EMB_DEDUP_SCHEMA,
        )

    return map_partitions(out, finish)


# --------------------------------------------------------------------------
# IVF (inverted-file) ANN: the structured scale path
# --------------------------------------------------------------------------

IVF_CENTROIDS = 16
IVF_NPROBE = 6
IVF_ITERS = 4


def _kmeans_partial(t: pa.Table, cents: np.ndarray) -> pa.Table:
    """Per-block k-means partial: per-centroid vector sum + count."""
    ids, x = _block_matrix(t)
    if len(ids) == 0:
        return pa.table({"cid": pa.array([], pa.int64()),
                         "n": pa.array([], pa.int64()),
                         "vsum": pa.array([], pa.list_(pa.float64()))})
    assign = np.argmax(x @ cents.T, axis=1)
    k, dim = cents.shape
    sums = np.zeros((k, dim))
    np.add.at(sums, assign, x)
    counts = np.bincount(assign, minlength=k).astype(np.int64)
    present = np.flatnonzero(counts)
    return pa.table(
        {
            "cid": pa.array(present, type=pa.int64()),
            "n": pa.array(counts[present]),
            "vsum": pa.array(list(sums[present])),
        }
    )


TRAIN_SAMPLE_CAP = 65_536


def train_centroids(
    sf_dir: str,
    k: int = IVF_CENTROIDS,
    iters: int = IVF_ITERS,
    sample_cap: int = TRAIN_SAMPLE_CAP,
    tol: float = 1e-4,
) -> np.ndarray:
    """Distributed Lloyd iterations: per-block partial sums + tiny
    driver combine per round (the data never leaves the workers).
    Deterministic: init = the first k vectors by vec_id, cosine metric
    (centroids renormalized each round).

    Scale shape: training runs over a bounded DETERMINISTIC hash
    sample (<= ``sample_cap`` expected rows) materialized ONCE — the
    100 TB path never re-scans the full table per Lloyd round; only
    the single final assignment pass (in the caller) touches every
    vector. Rounds early-stop when the max centroid movement drops
    below ``tol`` (k-means converges in 2-3 rounds at k=16)."""
    import pyarrow.parquet as pq

    from turboxsl_ray.stages.aggregate import broadcast, collect_tables

    init = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", k)],
    ).sort_by("vec_id")
    if init.num_rows < k:  # ids not dense from 0: fall back to full scan
        init = (
            pq.read_table(
                f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
            )
            .sort_by("vec_id")
            .slice(0, k)
        )
    _ids, cents = _block_matrix(init)
    if cents.size == 0:  # empty embeddings table: nothing to train on
        return cents
    cents = cents / np.linalg.norm(cents, axis=1, keepdims=True)

    # footer-only row count -> deterministic hash-sample fraction
    n_total = pq.ParquetFile(f"{sf_dir}/embeddings.parquet").metadata.num_rows
    ds = read_embeddings(sf_dir)
    if n_total > sample_cap:
        thresh = np.uint64(
            int(sample_cap / n_total * float(np.iinfo(np.uint64).max))
        )

        def hash_sample(t: pa.Table) -> pa.Table:
            from turboxsl_ray.kernels.hashing import stable_hash64

            h = stable_hash64(pc.cast(t["vec_id"], pa.int64()))
            return t.filter(pa.array(h <= thresh))

        ds = map_partitions(ds, hash_sample)
    # bounded sample: materializing it is a small-result collect, not
    # a full-dataset materialization; every Lloyd round re-reads these
    # object-store blocks instead of re-scanning parquet
    sample = ds.materialize()

    for _ in range(iters):
        ref = broadcast(cents)
        partials = map_partitions(
            sample, lambda t: _kmeans_partial(t, ray.get(ref))
        )
        sums = np.zeros_like(cents)
        counts = np.zeros(len(cents), dtype=np.int64)
        for tbl in collect_tables(partials):
            cid = tbl["cid"].to_numpy()
            counts[cid] += tbl["n"].to_numpy()
            vs = np.array(tbl["vsum"].to_pylist())
            sums[cid] += vs
        nz = counts > 0
        prev = cents
        cents = cents.copy()
        cents[nz] = sums[nz] / counts[nz, None]
        cents = cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
        if float(np.abs(cents - prev).max()) < tol:
            break
    return cents


def q_ann_ivf(
    sf_dir: str,
    k: int = ANN_K,
    n_queries: int = ANN_NUM_QUERIES,
    nprobe: int = IVF_NPROBE,
    ncentroids: int = IVF_CENTROIDS,
) -> pd.DataFrame:
    """IVF ANN top-k: train centroids distributed, probe only the
    ``nprobe`` closest inverted lists per query. With nprobe ==
    ncentroids this EQUALS brute force (pinned by tests); smaller
    nprobe trades recall for a 1/ncentroids-ish compute cut — the
    path that matters when n² flops stop being affordable."""
    cents = train_centroids(sf_dir, k=ncentroids)
    qids, qmat = _load_queries(sf_dir, n_queries)
    qn = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    probes = np.argsort(-(qn @ cents.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    from turboxsl_ray.stages.aggregate import broadcast

    ref = broadcast({"qids": qids, "q": qn, "cents": cents, "probes": probes})

    ds = read_embeddings(sf_dir)

    def local_topk(t: pa.Table) -> pa.Table:
        side = ray.get(ref)
        ids, x = _block_matrix(t)
        empty = pa.table({"qid": pa.array([], pa.int64()),
                          "vec_id": pa.array([], pa.int64()),
                          "sim": pa.array([], pa.float64())})
        if len(ids) == 0:
            return empty
        xn = x / np.linalg.norm(x, axis=1, keepdims=True)
        assign = np.argmax(xn @ side["cents"].T, axis=1)
        out_q, out_v, out_s = [], [], []
        for qi, qid in enumerate(side["qids"]):
            probe_mask = np.isin(assign, side["probes"][qi])
            probe_mask &= ids != qid
            if not probe_mask.any():
                continue
            cand = np.flatnonzero(probe_mask)
            s = xn[cand] @ side["q"][qi]
            kk = min(k, len(s))
            top = np.argpartition(-s, kk - 1)[:kk]
            out_q.append(np.full(kk, qid, dtype=np.int64))
            out_v.append(ids[cand[top]])
            out_s.append(s[top])
        if not out_q:
            return empty
        return pa.table(
            {
                "qid": pa.array(np.concatenate(out_q)),
                "vec_id": pa.array(np.concatenate(out_v), type=pa.int64()),
                "sim": pa.array(np.concatenate(out_s), type=pa.float64()),
            }
        )

    partials = map_partitions(ds, local_topk).to_pandas()
    if partials.empty:
        return pd.DataFrame(columns=["qid", "vec_id", "sim"])
    partials = partials.sort_values(
        ["qid", "sim", "vec_id"], ascending=[True, False, True], kind="stable"
    )
    out = partials.groupby("qid", sort=True).head(k).reset_index(drop=True)
    out["sim"] = out["sim"].round(4)
    return out[["qid", "vec_id", "sim"]]
