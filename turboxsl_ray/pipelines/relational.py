"""General relational operator coverage over the TPC-H-ish tables.

These re-express the reference's transform vocabulary (SURVEY.md §2.2,
§2.4-2.6) as Ray Data pipelines with 100 TB-shaped physical plans:

- projections/filters: ``map_batches`` over zero-copy Arrow with
  ``pyarrow.compute`` kernels only (xsl:value-of / xsl:if analogs,
  /root/reference/src/instructions.c:367-382, 210-232);
- low-cardinality aggregates: partial-per-block + tiny final
  (stages/aggregate.py), never a row-scale shuffle;
- joins against small dimensions: broadcast via ``ray.put`` once,
  vectorized probe per batch (the reference's ``document()``/``key()``
  lookup, functions.c:806-836, 1115-1165);
- top-k: per-block prune then tiny global sort (xsl:sort +
  ``[position() <= k]``, xpath.c:484-576, 178-188);
- semi/anti join: broadcast key set + ``is_in`` mask (the existential
  nodeset comparison, rvalue.c:278-294).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data import Dataset

from turboxsl_ray.kernels.arrays import as_array
from turboxsl_ray.stages.aggregate import (
    broadcast,
    distinct_small,
    groupby_small,
    topk,
)
from turboxsl_ray.stages.partitioning import map_partitions

SHIP_CUTOFF = np.datetime64("1998-09-02T00:00:00.000000")


def read_table(sf_dir: str, name: str, columns: list[str] | None = None) -> Dataset:
    return ray.data.read_parquet(f"{sf_dir}/{name}.parquet", columns=columns)


def small_table(sf_dir: str, name: str, columns: list[str]) -> pa.Table:
    """Driver-side load of a small dimension table (broadcast side)."""
    import pyarrow.parquet as pq

    return pq.read_table(f"{sf_dir}/{name}.parquet", columns=columns)


def q_pricing_summary(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q1-shaped group-by: 6 groups out of the whole lineitem."""
    ds = read_table(
        sf_dir,
        "lineitem",
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_shipdate",
        ],
    )

    def prep(t: pa.Table) -> pa.Table:
        keep = pc.less_equal(t["l_shipdate"], pa.scalar(SHIP_CUTOFF))
        t = t.filter(keep)
        disc_price = pc.multiply(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        )
        return pa.table(
            {
                "l_returnflag": as_array(t["l_returnflag"]),
                "l_linestatus": as_array(t["l_linestatus"]),
                "l_quantity": as_array(t["l_quantity"]),
                "l_extendedprice": as_array(t["l_extendedprice"]),
                "disc_price": as_array(disc_price),
            }
        )

    prepped = map_partitions(ds, prep)
    return groupby_small(
        prepped,
        keys=["l_returnflag", "l_linestatus"],
        specs={
            "sum_qty": ("l_quantity", "sum"),
            "sum_base_price": ("l_extendedprice", "sum"),
            "sum_disc_price": ("disc_price", "sum"),
            "avg_qty": ("l_quantity", "mean"),
            "count_order": (None, "count"),
        },
        round_digits={"sum_qty": 2, "sum_base_price": 2, "sum_disc_price": 2, "avg_qty": 4},
        int_cols=("count_order",),
    )


def q_filter_project(sf_dir: str) -> Dataset:
    """Row filter + computed column, exact floats (no aggregation)."""
    ds = read_table(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_linenumber", "l_extendedprice", "l_discount", "l_shipdate"],
    )
    lo = np.datetime64("1995-01-01T00:00:00.000000")

    def fn(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater_equal(t["l_shipdate"], pa.scalar(lo)),
            pc.greater(t["l_discount"], pa.scalar(0.05)),
        )
        t = t.filter(keep)
        revenue = pc.multiply(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        )
        return pa.table(
            {
                "l_orderkey": as_array(t["l_orderkey"]),
                "l_linenumber": as_array(t["l_linenumber"]),
                "revenue": as_array(revenue),
            }
        )

    return map_partitions(ds, fn)


def q_top_orders(sf_dir: str) -> pd.DataFrame:
    """Global top-10 orders by total price (per-block prune first)."""
    ds = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])
    return topk(ds, keys=["o_totalprice", "o_orderkey"], descending=[True, False], k=10)


def q_orders_by_segment(sf_dir: str) -> pd.DataFrame:
    """orders ⋈ customer (broadcast small side) → per-segment rollup."""
    cust = small_table(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    keys = cust["c_custkey"].to_numpy()
    order_idx = np.argsort(keys, kind="stable")
    seg_codes_arr = cust["c_mktsegment"].combine_chunks().dictionary_encode()
    ref = broadcast(
        {
            "keys": keys[order_idx],
            "codes": seg_codes_arr.indices.to_numpy(zero_copy_only=False)[order_idx],
            "dict": seg_codes_arr.dictionary.to_pylist(),
        }
    )

    ds = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def probe(t: pa.Table) -> pa.Table:
        side = ray.get(ref)
        ck = as_array(t["o_custkey"]).to_numpy()
        pos = np.searchsorted(side["keys"], ck)
        pos = np.clip(pos, 0, len(side["keys"]) - 1)
        found = side["keys"][pos] == ck
        seg = np.array(side["dict"], dtype=object)[side["codes"][pos]]
        t2 = pa.table(
            {
                "c_mktsegment": pa.array(seg, type=pa.string()),
                "o_totalprice": as_array(t["o_totalprice"]),
            }
        )
        return t2.filter(pa.array(found))

    probed = map_partitions(ds, probe)
    return groupby_small(
        probed,
        keys=["c_mktsegment"],
        specs={"n_orders": (None, "count"), "sum_total": ("o_totalprice", "sum")},
        round_digits={"sum_total": 2},
        int_cols=("n_orders",),
    )


def q_customer_nation_region(sf_dir: str) -> pd.DataFrame:
    """customer ⋈ nation ⋈ region: chained broadcast joins + rollup."""
    nat = small_table(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    reg = small_table(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    dim = nat.merge(reg, left_on="n_regionkey", right_on="r_regionkey")
    dim = dim.sort_values("n_nationkey").reset_index(drop=True)
    ref = broadcast(
        {
            "keys": dim["n_nationkey"].to_numpy(np.int64),
            "n_name": dim["n_name"].to_numpy(object),
            "r_name": dim["r_name"].to_numpy(object),
        }
    )

    ds = read_table(sf_dir, "customer", columns=["c_nationkey", "c_acctbal"])

    def probe(t: pa.Table) -> pa.Table:
        side = ray.get(ref)
        nk = as_array(t["c_nationkey"]).to_numpy().astype(np.int64)
        pos = np.searchsorted(side["keys"], nk)
        pos = np.clip(pos, 0, len(side["keys"]) - 1)
        found = side["keys"][pos] == nk
        out = pa.table(
            {
                "r_name": pa.array(side["r_name"][pos], type=pa.string()),
                "n_name": pa.array(side["n_name"][pos], type=pa.string()),
                "c_acctbal": as_array(t["c_acctbal"]),
            }
        )
        return out.filter(pa.array(found))

    probed = map_partitions(ds, probe)
    return groupby_small(
        probed,
        keys=["r_name", "n_name"],
        specs={"n_customers": (None, "count"), "sum_acctbal": ("c_acctbal", "sum")},
        round_digits={"sum_acctbal": 2},
        int_cols=("n_customers",),
    )


def q_distinct_flags(sf_dir: str) -> pd.DataFrame:
    """DISTINCT over low-cardinality columns."""
    ds = read_table(sf_dir, "lineitem", columns=["l_returnflag", "l_linestatus"])
    return distinct_small(ds, ["l_returnflag", "l_linestatus"])


BIG_ORDER_CUTOFF = 300_000.0


def q_customers_without_orders(sf_dir: str) -> Dataset:
    """Anti join: customers with no big (>300k) order (broadcast key set).

    At 100 TB the broadcast side would first be shrunk by a distinct
    pre-aggregate of o_custkey (bounded by customer cardinality);
    here the distinct runs per-block then on the driver."""
    okeys_ds = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    okeys_ds = map_partitions(
        okeys_ds,
        lambda t: t.filter(
            pc.greater(t["o_totalprice"], pa.scalar(BIG_ORDER_CUTOFF))
        ).select(["o_custkey"]),
    )
    okeys = distinct_small(okeys_ds, ["o_custkey"])["o_custkey"].to_numpy(np.int64)
    okeys.sort()
    ref = broadcast(okeys)

    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_name"])

    def anti(t: pa.Table) -> pa.Table:
        keys = np.sort(ray.get(ref))
        ck = as_array(t["c_custkey"]).to_numpy()
        pos = np.clip(np.searchsorted(keys, ck), 0, max(len(keys) - 1, 0))
        has = keys[pos] == ck if len(keys) else np.zeros(len(ck), dtype=bool)
        return t.filter(pa.array(~has))

    return map_partitions(cust, anti)


def q_event_counts(sf_dir: str) -> pd.DataFrame:
    """Per-event-type rollup of the events stream table."""
    ds = read_table(sf_dir, "events", columns=["event_type", "value"])
    return groupby_small(
        ds,
        keys=["event_type"],
        specs={
            "n": (None, "count"),
            "sum_value": ("value", "sum"),
            "avg_value": ("value", "mean"),
        },
        round_digits={"sum_value": 3, "avg_value": 4},
        int_cols=("n",),
    )
