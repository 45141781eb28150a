"""Unit tests: co-partitioned large-large join and global sort/rank."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def test_copartition_join_inner_and_left(ray_session):
    import ray.data

    from turboxsl_ray.stages.join import copartition_join

    left = pa.table({"k": pa.array([1, 2, 3, 4], pa.int64()),
                     "lv": pa.array(["a", "b", "c", "d"])})
    right = pa.table({"k": pa.array([2, 2, 3, 9], pa.int64()),
                      "rv": pa.array([20.0, 21.0, 30.0, 90.0])})

    inner = copartition_join(
        ray.data.from_arrow(left), ray.data.from_arrow(right), on="k",
        num_partitions=4,
    ).to_pandas().sort_values(["k", "rv"]).reset_index(drop=True)
    assert inner["k"].tolist() == [2, 2, 3]
    assert inner["rv"].tolist() == [20.0, 21.0, 30.0]

    lj = copartition_join(
        ray.data.from_arrow(left), ray.data.from_arrow(right), on="k",
        how="left", num_partitions=4,
    ).to_pandas().sort_values(["k", "rv"]).reset_index(drop=True)
    assert len(lj) == 5  # 1 and 4 survive with null rv
    assert lj[lj["k"] == 1]["rv"].isna().all()


def test_copartition_join_rejects_overlap(ray_session):
    import ray.data

    from turboxsl_ray.stages.join import copartition_join

    t = pa.table({"k": pa.array([1], pa.int64()), "v": pa.array([1.0])})
    with pytest.raises(ValueError, match="overlapping"):
        copartition_join(ray.data.from_arrow(t), ray.data.from_arrow(t), on="k")


def test_sorted_with_rank_matches_pandas(ray_session):
    import ray.data

    from turboxsl_ray.stages.global_sort import sorted_with_rank

    rng = np.random.default_rng(9)
    vals = np.round(rng.normal(50, 10, size=5000), 2)  # plenty of ties
    tbl = pa.table({"id": pa.array(np.arange(5000), pa.int64()),
                    "v": pa.array(vals)})

    out = sorted_with_rank(
        lambda: ray.data.from_arrow(tbl), key="v", tiebreak="id",
        descending=True, num_ranges=6,
    ).to_pandas()
    expect = tbl.to_pandas().sort_values(
        ["v", "id"], ascending=[False, True], kind="stable"
    ).reset_index(drop=True)
    expect["rank"] = np.arange(1, len(expect) + 1)
    got = out.sort_values("rank").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["id", "v", "rank"]], expect[["id", "v", "rank"]])


def test_sorted_with_rank_ascending(ray_session):
    import ray.data

    from turboxsl_ray.stages.global_sort import sorted_with_rank

    tbl = pa.table({"id": pa.array([3, 1, 2, 0], pa.int64()),
                    "v": pa.array([5.0, 5.0, 1.0, 9.0])})
    out = sorted_with_rank(
        lambda: ray.data.from_arrow(tbl), key="v", tiebreak="id",
        descending=False, num_ranges=2,
    ).to_pandas().sort_values("rank")
    assert out["id"].tolist() == [2, 1, 3, 0]
    assert out["rank"].tolist() == [1, 2, 3, 4]


def test_order_lineitem_join_plan_parity(ray_session):
    """The AQE broadcast-dimension plan and the forced co-partitioned
    large x large plan must be result-identical."""
    from turboxsl_ray.pipelines.relational import q_order_lineitem_join

    sf = "/root/testdata/sf0.001"
    a = (
        q_order_lineitem_join(sf).to_pandas()
        .sort_values("o_orderkey").reset_index(drop=True)
    )
    b = (
        q_order_lineitem_join(sf, force_copartition=True).to_pandas()
        .sort_values("o_orderkey").reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)


def test_copartition_join_hot_key_salting_parity(ray_session):
    """A Zipf-hot key salted over 4 buckets must produce exactly the
    unsalted join's rows (inner AND left), including correct
    multiplicity where the hot key has several right rows."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from turboxsl_ray.stages.join import copartition_join

    rng = np.random.default_rng(3)
    # left: key 7 is hot (1000 rows), keys 0..49 sparse; key 99 has no right row
    lkeys = np.concatenate([np.full(1000, 7), rng.integers(0, 50, 400), [99]])
    left = pa.table({"k": pa.array(lkeys, pa.int64()),
                     "lv": pa.array(np.arange(len(lkeys), dtype=np.int64))})
    # right: hot key has 3 rows (multiplicity!), others 0-2 rows
    rkeys = np.concatenate([[7, 7, 7], rng.integers(0, 50, 60)])
    right = pa.table({"k": pa.array(rkeys, pa.int64()),
                      "rv": pa.array(np.arange(len(rkeys), dtype=np.int64))})

    def run(how, hot, num_partitions=8):
        return (
            copartition_join(
                ray.data.from_arrow(left).repartition(4),
                ray.data.from_arrow(right).repartition(2),
                on="k", how=how, num_partitions=num_partitions,
                hot_keys={7: 4} if hot else None,
            )
            .to_pandas()
            .sort_values(["k", "lv", "rv"], na_position="last")
            .reset_index(drop=True)
        )

    # num_partitions < buckets forces several salt buckets of the hot
    # key into ONE partition — the case where joining on the key alone
    # would duplicate rows (regression: salt must stay a join key)
    for num_partitions in (2, 3, 5, 8):
        for how in ("inner", "left"):
            plain = run(how, False, num_partitions)
            salted = run(how, True, num_partitions)
            pd.testing.assert_frame_equal(plain, salted)
    # sanity: inner multiplicity for the hot key is n_left(7) x n_right(7)
    expected = int((lkeys == 7).sum()) * int((rkeys == 7).sum())
    assert int((run("inner", True, 2)["k"] == 7).sum()) == expected


def test_copartition_join_full_outer(ray_session):
    """FULL OUTER parity vs pandas merge(how='outer'): left-only rows
    carry null right columns, right-only rows appear with null left
    columns, and the key column coalesces."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from turboxsl_ray.stages.join import copartition_join

    left = pa.table({"k": pa.array([1, 2, 2, 5], pa.int64()),
                     "lv": pa.array([10, 20, 21, 50], pa.int64())})
    right = pa.table({"k": pa.array([2, 3, 5, 5], pa.int64()),
                      "rv": pa.array([200, 300, 500, 501], pa.int64())})
    got = (
        copartition_join(
            ray.data.from_arrow(left).repartition(2),
            ray.data.from_arrow(right).repartition(2),
            on="k", how="full", num_partitions=4,
        )
        .to_pandas()
        .sort_values(["k", "lv", "rv"], na_position="last")
        .reset_index(drop=True)
        .astype({"lv": "Int64", "rv": "Int64"})
    )
    exp = (
        left.to_pandas().merge(right.to_pandas(), on="k", how="outer")
        .sort_values(["k", "lv", "rv"], na_position="last")
        .reset_index(drop=True)
        .astype({"lv": "Int64", "rv": "Int64"})
    )
    pd.testing.assert_frame_equal(got[["k", "lv", "rv"]], exp[["k", "lv", "rv"]])
    import pytest

    with pytest.raises(ValueError):
        copartition_join(
            ray.data.from_arrow(left), ray.data.from_arrow(right),
            on="k", how="full", hot_keys={2: 2},
        )


def test_bloom_no_false_negatives_and_prunes(ray_session):
    """Every build key passes the mask (no false negatives — a miss
    would drop a real join row); keys far outside the build set are
    mostly pruned (the filter actually filters)."""
    import ray.data

    from turboxsl_ray.stages.bloom import bloom_mask, build_bloom

    keys = np.arange(0, 200_000, 2, dtype=np.int64)  # 100k even keys
    ds = ray.data.from_arrow(pa.table({"k": pa.array(keys)})).repartition(4)
    bloom = build_bloom(ds, "k")
    assert bloom_mask(pa.array(keys), bloom).all()
    probe = np.arange(1_000_001, 1_100_001, dtype=np.int64)  # disjoint range
    fp = bloom_mask(pa.array(probe), bloom).mean()
    assert fp < 0.05, f"false-positive rate {fp:.3f}"
    # string keys: same contract
    sds = ray.data.from_arrow(
        pa.table({"k": pa.array([f"id{i}" for i in range(5000)])})
    ).repartition(2)
    sbloom = build_bloom(sds, "k")
    assert bloom_mask(pa.array([f"id{i}" for i in range(5000)]), sbloom).all()
    sfp = bloom_mask(pa.array([f"zz{i}" for i in range(5000)]), sbloom).mean()
    assert sfp < 0.05


def test_urgent_order_revenue_bloom_parity(ray_session):
    """Bloom pruning must be invisible in the result."""
    import pandas as pd

    from turboxsl_ray.pipelines.relational import q_urgent_order_revenue

    sf = "/root/testdata/sf0.001"
    a = (
        q_urgent_order_revenue(sf, bloom=True).to_pandas()
        .sort_values("o_orderkey").reset_index(drop=True)
    )
    b = (
        q_urgent_order_revenue(sf, bloom=False).to_pandas()
        .sort_values("o_orderkey").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0


def test_hot_keys_rejects_left_block_prep(ray_session):
    """Salting spreads a key's left rows over buckets, so a fused
    block-local left op would silently lose its whole-key guarantee —
    the combination must refuse loudly."""
    import pyarrow as pa
    import ray.data

    from turboxsl_ray.stages.join import copartition_join

    t = pa.table({"k": pa.array([1], pa.int64()), "v": pa.array([1.0])})
    u = pa.table({"k": pa.array([1], pa.int64()), "w": pa.array([2.0])})
    with pytest.raises(ValueError, match="left_block_prep"):
        copartition_join(
            ray.data.from_arrow(t), ray.data.from_arrow(u), on="k",
            hot_keys={1: 2}, left_block_prep=lambda x: x,
        )


def test_distributed_prefix_sum_matches_pandas(ray_session):
    """sorted_with_prefix_sum must equal a single-node cumsum under
    global key order, regardless of input block order (keys arrive
    scrambled across blocks)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from turboxsl_ray.stages.global_sort import sorted_with_prefix_sum

    rng = np.random.default_rng(17)
    n = 5000
    ids = rng.permutation(n).astype(np.int64)  # scrambled arrival order
    w = rng.integers(0, 200, size=n).astype(np.int64)
    tbl = pa.table({"doc_id": pa.array(ids), "n_tokens": pa.array(w)})

    out = (
        sorted_with_prefix_sum(
            lambda: rd.from_arrow(tbl).repartition(13),
            key="doc_id",
            weight="n_tokens",
            num_ranges=5,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = (
        pd.DataFrame({"doc_id": ids, "n_tokens": w})
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want["prefix"] = want["n_tokens"].cumsum().shift(1).fillna(0).astype(np.int64)
    assert (out["prefix"].to_numpy() == want["prefix"].to_numpy()).all()
    assert (out["doc_id"].to_numpy() == want["doc_id"].to_numpy()).all()


def test_bloom_null_keys_survive_unpruned(ray_session):
    """Null probe keys must pass the bloom filter unpruned (the join's
    own null semantics decide), and null build keys set no bits —
    regression for an IndexError on nullable string keys."""
    import pyarrow as pa
    import ray.data

    from turboxsl_ray.stages.bloom import bloom_mask, build_bloom

    build = pa.table({"k": pa.array(["a", None, "b"])})
    bloom = build_bloom(ray.data.from_arrow(build), "k")
    keep = bloom_mask(pa.array(["a", None, "zzz-not-present"]), bloom)
    assert keep[0]          # present value kept
    assert keep[1]          # null passes through
    assert not keep[2]      # absent value pruned (no false negative risk)
