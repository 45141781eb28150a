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

from turboxsl_ray.context import partitions_for_input
from turboxsl_ray.kernels.arrays import as_array, to_cents
from turboxsl_ray.stages.aggregate import (
    broadcast,
    distinct_small,
    groupby_small,
    probe_sorted,
    topk,
)
from turboxsl_ray.stages.partitioning import map_partitions, partition_by_conv

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
        # money math in integer cents: float sums of ~1e7 carry a
        # summation-order error LARGER than the 2-decimal rounding
        # granularity, so only exact integer sums can match the oracle
        qty = as_array(t["l_quantity"]).to_numpy(zero_copy_only=False)
        price = as_array(t["l_extendedprice"]).to_numpy(zero_copy_only=False)
        disc = as_array(t["l_discount"]).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_returnflag": as_array(t["l_returnflag"]),
                "l_linestatus": as_array(t["l_linestatus"]),
                "qty_c": pa.array(to_cents(qty)),
                "base_c": pa.array(to_cents(price)),
                "disc_c": pa.array(to_cents(price * (1 - disc))),
            }
        )

    prepped = map_partitions(ds, prep)
    agg = groupby_small(
        prepped,
        keys=["l_returnflag", "l_linestatus"],
        specs={
            "sum_qty_c": ("qty_c", "sum"),
            "sum_base_c": ("base_c", "sum"),
            "sum_disc_c": ("disc_c", "sum"),
            "count_order": (None, "count"),
        },
        int_cols=("count_order", "sum_qty_c", "sum_base_c", "sum_disc_c"),
    )
    return pd.DataFrame(
        {
            "l_returnflag": agg["l_returnflag"],
            "l_linestatus": agg["l_linestatus"],
            "sum_qty": agg["sum_qty_c"] / 100.0,
            "sum_base_price": agg["sum_base_c"] / 100.0,
            "sum_disc_price": agg["sum_disc_c"] / 100.0,
            "avg_qty": agg["sum_qty_c"] / (agg["count_order"] * 100.0),
            "count_order": agg["count_order"],
        }
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


def q_ci_topk(sf_dir: str) -> pd.DataFrame:
    """Collation-aware xsl:sort: case-INSENSITIVE text order (the
    reference's ``xml_strcasecmp`` comparator, xpath.c:547) over a
    mixed-case column, tiebreak binary. The alt_case derivation forces
    rows whose binary order differs from their CI order."""
    ds = read_table(sf_dir, "events", columns=["event_id", "event_type"])

    def derive(t: pa.Table) -> pa.Table:
        eid = as_array(pc.cast(t["event_id"], pa.int64()))
        even = pc.equal(pc.bit_wise_and(eid, 1), 0)
        alt = pc.if_else(even, pc.utf8_upper(t["event_type"]), t["event_type"])
        return pa.table({"event_id": eid, "alt_case": as_array(alt)})

    return topk(
        map_partitions(ds, derive),
        keys=["alt_case", "event_id"],
        descending=[False, False],
        k=20,
        collations=["ci", "binary"],
    )


def q_sort_nulls_last(sf_dir: str) -> pd.DataFrame:
    """Missing-key sentinel policy on sort (the reference coerces
    missing numeric sort keys to a sentinel, xpath.c:520-523): tool
    DESC with NULLS LAST — nullable keys never float to the top."""
    from turboxsl_ray.pipelines.transcript_features import transcripts_pipeline

    def project(t: pa.Table) -> pa.Table:
        return t.select(["conv_id", "turn_idx", "tool"])

    # column-pruned derive: only the 4 events columns the derivation of
    # these 3 output columns needs ever leave the parquet scan
    ds = transcripts_pipeline(
        sf_dir, project, columns=["event_id", "ts", "user_id", "event_type"]
    )
    return topk(
        ds,
        keys=["tool", "conv_id", "turn_idx"],
        descending=[True, False, False],
        k=15,
        nulls="last",
    )


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
        pos, found = probe_sorted(side["keys"], ck)
        seg = np.array(side["dict"], dtype=object)[side["codes"][pos]]
        tp = as_array(t["o_totalprice"]).to_numpy(zero_copy_only=False)
        t2 = pa.table(
            {
                "c_mktsegment": pa.array(seg, type=pa.string()),
                "total_c": pa.array(to_cents(tp)),
            }
        )
        return t2.filter(pa.array(found))

    probed = map_partitions(ds, probe)
    agg = groupby_small(
        probed,
        keys=["c_mktsegment"],
        specs={"n_orders": (None, "count"), "sum_total_c": ("total_c", "sum")},
        int_cols=("n_orders", "sum_total_c"),
    )
    agg["sum_total"] = agg.pop("sum_total_c") / 100.0
    return agg


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
        pos, found = probe_sorted(side["keys"], nk)
        bal = as_array(t["c_acctbal"]).to_numpy(zero_copy_only=False)
        out = pa.table(
            {
                "r_name": pa.array(side["r_name"][pos], type=pa.string()),
                "n_name": pa.array(side["n_name"][pos], type=pa.string()),
                "bal_c": pa.array(to_cents(bal)),
            }
        )
        return out.filter(pa.array(found))

    probed = map_partitions(ds, probe)
    agg = groupby_small(
        probed,
        keys=["r_name", "n_name"],
        specs={"n_customers": (None, "count"), "sum_bal_c": ("bal_c", "sum")},
        int_cols=("n_customers", "sum_bal_c"),
    )
    agg["sum_acctbal"] = agg.pop("sum_bal_c") / 100.0
    return agg


def q_check_rights(sf_dir: str) -> Dataset:
    """chk:check_rights as a named column op (functions/rights.py):
    every customer annotated with membership in the big-spender rights
    set (distilled once from orders, broadcast, vectorized probe)."""
    from turboxsl_ray.functions.rights import build_rights, check_rights

    okeys_ds = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    okeys_ds = map_partitions(
        okeys_ds,
        lambda t: t.filter(
            pc.greater(t["o_totalprice"], pa.scalar(BIG_ORDER_CUTOFF))
        ).select(["o_custkey"]),
    )
    rights = build_rights(
        distinct_small(okeys_ds, ["o_custkey"])["o_custkey"].to_numpy(np.int64)
    )

    cust = read_table(sf_dir, "customer", columns=["c_custkey"])

    def annotate(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": as_array(pc.cast(t["c_custkey"], pa.int64())),
                "has_rights": check_rights(t["c_custkey"], rights),
            }
        )

    return map_partitions(cust, annotate)


def q_url_code(sf_dir: str) -> Dataset:
    """``ltr:url_code`` (the reference's hottest function — 2132
    production calls, functions.c:1345) as a driver-checked query: a
    read-through cached lookup (stages/cached_lookup.py) resolving a
    deterministic 8-hex code per user through per-actor LRU → sharded
    store actors → compute fn. The compute fn runs once per DISTINCT
    missing key (events repeat users heavily, so the cache levels do
    real work); the oracle computes the same code directly.

    Store lifetime: the 2-shard pool is a lazily-created per-process
    singleton (cached_lookup.get_store_pool) — repeated q_url_code
    plans in one process (bench loops, pytest) REUSE the same actors
    instead of stranding one per plan, and the pool dies with the
    driver process (or on release_store_pool())."""
    import hashlib

    from turboxsl_ray.stages.cached_lookup import CachedLookupStage, get_store_pool

    ds = read_table(sf_dir, "events", columns=["event_id", "user_id"])
    store = get_store_pool(2)

    def compute(keys: list) -> list:
        return [hashlib.md5(f"u{k}".encode()).hexdigest()[:8] for k in keys]

    out = ds.map_batches(
        CachedLookupStage,
        fn_constructor_kwargs=dict(
            key_col="user_id", out_col="url_code",
            compute_fn=compute, store=store,
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=2,
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": as_array(pc.cast(t["event_id"], pa.int64())),
                "user_id": as_array(pc.cast(t["user_id"], pa.int64())),
                "url_code": as_array(t["url_code"]),
            }
        )

    return map_partitions(out, finish)


LOC_FORMS = ("item-one", "item-few", "item-many")


def q_localized_counts(sf_dir: str) -> Dataset:
    """``ltr:__ln`` plural-aware localization as a driver-checked
    query: each event's count (event_id % 105 — covers every Slavic
    plural class incl. the 11-14 teens) picks one of three message
    forms via the vectorized 3-form rule
    (functions/localization.plural_ru) and the label is assembled with
    Arrow kernels ("{n} form"). The oracle mirrors the rule as a CASE
    cascade."""
    from turboxsl_ray.functions.localization import plural_ru

    ds = read_table(sf_dir, "events", columns=["event_id"])
    forms = np.array(LOC_FORMS)

    def localize(t: pa.Table) -> pa.Table:
        eid = as_array(pc.cast(t["event_id"], pa.int64())).to_numpy()
        n = eid % 105
        form = plural_ru(n)
        label = pc.binary_join_element_wise(
            pa.array(n.astype(str)), pa.array(forms[form]), " "
        )
        return pa.table(
            {
                "event_id": pa.array(eid),
                "n": pa.array(n),
                "label": as_array(label),
            }
        )

    return map_partitions(ds, localize)


VERISTAT_CONFIG = {"click": 1.5, "view": 0.25, "purchase": 10.0}


def q_veristat(sf_dir: str) -> Dataset:
    """ltr:veristat as a named op (functions/veristat.py): every event
    scored by a per-type coefficient from a job config broadcast once
    (unknown types get the default 1.0)."""
    from turboxsl_ray.functions.veristat import load_veristat, veristat

    ref = load_veristat(VERISTAT_CONFIG)
    ds = read_table(sf_dir, "events", columns=["event_id", "event_type", "value"])

    def score(t: pa.Table) -> pa.Table:
        coeff = veristat(t["event_type"], ref, default=1.0)
        return pa.table(
            {
                "event_id": as_array(pc.cast(t["event_id"], pa.int64())),
                "vscore": as_array(
                    pc.multiply(pc.cast(t["value"], pa.float64()), coeff)
                ),
            }
        )

    return map_partitions(ds, score)


def q_sample_hash(sf_dir: str, method: str = "md5") -> Dataset:
    """Deterministic hash sampling (SURVEY §2.4 sampling, made
    oracle-checkable): keep an event iff the first hex digit of
    md5(event_id) is 0 or 1 (exact 1/8 expected rate, stable across
    runs/partitionings — the only sampling that can survive a resume).

    ``method="fast"`` swaps the per-row md5 digest for the vectorized
    ``hash_sample_mask`` (one SipHash pass, same 2/16 rate, same
    stability contract) — the documented 100 TB default; md5 remains
    the registry default ONLY because DuckDB can recompute it, making
    the exact keep set driver-verifiable in SQL."""
    from turboxsl_ray.kernels.hashing import hash_sample_mask, md5_first_hex_digit

    ds = read_table(sf_dir, "events", columns=["event_id", "event_type", "value"])

    def sample(t: pa.Table) -> pa.Table:
        ids = as_array(pc.cast(t["event_id"], pa.int64())).to_numpy()
        if method == "fast":
            keep = hash_sample_mask(ids, 2, 16)
        else:
            keep = md5_first_hex_digit(ids) < 2
        out = t.filter(pa.array(keep))
        return pa.table(
            {
                "event_id": as_array(pc.cast(out["event_id"], pa.int64())),
                "event_type": as_array(out["event_type"]),
                "value": as_array(pc.cast(out["value"], pa.float64())),
            }
        )

    return map_partitions(ds, sample)


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
        _pos, has = probe_sorted(keys, ck)
        return t.filter(pa.array(~has))

    return map_partitions(cust, anti)


_SET_SCHEMA = pa.schema([("user_id", pa.int64())])

# both set-op sides are "big" (> this value) events of one type — the
# cutoff keeps INTERSECT and EXCEPT non-degenerate at every test scale
SET_OP_CUTOFF = 200.0


def _user_type_flags(sf_dir: str, a: str, b: str) -> Dataset:
    """(user_id, saw-big-a, saw-big-b) via per-block boolean-any
    partials → one user_id exchange → final any. The rows never
    shuffle — only (int64, bool, bool) partials bounded by
    distinct-users × blocks; this is the distributed INTERSECT/EXCEPT
    building block (the reference's existential nodeset ``=``,
    rvalue.c:278-294, done as set algebra instead of an O(N) rescan)."""
    ds = read_table(sf_dir, "events", columns=["user_id", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        big = pc.greater(t["value"], pa.scalar(SET_OP_CUTOFF))
        flags = pa.table(
            {
                "user_id": as_array(pc.cast(t["user_id"], pa.int64())),
                "a": as_array(pc.and_(pc.equal(t["event_type"], a), big)),
                "b": as_array(pc.and_(pc.equal(t["event_type"], b), big)),
            }
        )
        g = flags.group_by("user_id").aggregate([("a", "any"), ("b", "any")])
        return g.rename_columns(["user_id", "a", "b"])

    parts = partition_by_conv(
        map_partitions(ds, partial),
        partitions_for_input(f"{sf_dir}/events.parquet", factor=0.25),
        keys=["user_id"],
    )

    def final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        g = t.group_by("user_id").aggregate([("a", "any"), ("b", "any")])
        return g.rename_columns(["user_id", "a", "b"])

    return map_partitions(parts, final)


def q_users_intersect(sf_dir: str) -> Dataset:
    """Distinct INTERSECT: users with both a big click AND a big
    purchase (big = value > SET_OP_CUTOFF)."""
    flags = _user_type_flags(sf_dir, "click", "purchase")

    def keep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "a" not in t.column_names:
            return _SET_SCHEMA.empty_table()
        return t.filter(pc.and_(t["a"], t["b"])).select(["user_id"])

    return map_partitions(flags, keep)


def q_users_except(sf_dir: str) -> Dataset:
    """Distinct EXCEPT: users with a big click but no big purchase."""
    flags = _user_type_flags(sf_dir, "click", "purchase")

    def keep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "a" not in t.column_names:
            return _SET_SCHEMA.empty_table()
        return t.filter(
            pc.and_(t["a"], pc.invert(t["b"]))
        ).select(["user_id"])

    return map_partitions(flags, keep)


def q_event_counts(sf_dir: str) -> pd.DataFrame:
    """Per-event-type rollup of the events stream table (cents-exact)."""
    ds = read_table(sf_dir, "events", columns=["event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        v = as_array(t["value"]).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_type": as_array(t["event_type"]),
                "value_c": pa.array(to_cents(v)),
            }
        )

    agg = groupby_small(
        map_partitions(ds, prep),
        keys=["event_type"],
        specs={"n": (None, "count"), "sum_c": ("value_c", "sum")},
        int_cols=("n", "sum_c"),
    )
    agg["sum_value"] = agg["sum_c"] / 100.0
    agg["avg_value"] = agg["sum_c"] / (agg["n"] * 100.0)
    return agg.drop(columns=["sum_c"])


def q_props_extract(sf_dir: str) -> Dataset:
    """Parse a text payload column into typed values (the
    exsl:node-set "string -> tree" analog, functions.c:1084-1099):
    events.props carries '{"k": N}' JSON — extract k as int64 with a
    vectorized regex kernel, then derive a bucket label."""
    ds = read_table(sf_dir, "events", columns=["event_id", "props"])

    def fn(t: pa.Table) -> pa.Table:
        ex = pc.extract_regex(t["props"], r'"k": (?P<k>\d+)')
        k = pc.cast(pc.struct_field(ex, "k"), pa.int64())
        bucket = pc.if_else(
            pc.greater_equal(k, 50), "high", pc.if_else(pc.greater_equal(k, 20), "mid", "low")
        )
        return pa.table(
            {
                "event_id": as_array(t["event_id"]),
                "k": as_array(k),
                "k_bucket": as_array(bucket),
            }
        )

    return map_partitions(ds, fn)


def q_props_json(sf_dir: str) -> "pd.DataFrame":
    """Full ``exsl:node-set`` analog (functions.c:1084-1099): parse the
    serialized payload column into a genuine Arrow **struct** column
    with the vectorized C++ JSON reader (one parse per block, no
    per-row loop), navigate it with child-axis field access
    (``pc.struct_field``), then aggregate over the extracted values.
    Distinct from q_props_extract, which regex-scrapes one field: here
    the whole payload becomes typed nested data first."""
    from turboxsl_ray.functions.nested import parse_json_struct

    ds = read_table(sf_dir, "events", columns=["event_type", "props"])
    schema = pa.schema([("k", pa.int64())])

    def prep(t: pa.Table) -> pa.Table:
        st = parse_json_struct(t["props"], explicit_schema=schema)
        k = pc.struct_field(st, "k")
        return pa.table(
            {
                "event_type": as_array(t["event_type"]),
                "k_mod": as_array(pc.cast(pc.subtract(k, pc.multiply(pc.divide(k, 10), 10)), pa.int64())),
                "k": as_array(k),
            }
        )

    from turboxsl_ray.stages.aggregate import groupby_small

    agg = groupby_small(
        map_partitions(ds, prep),
        keys=["event_type", "k_mod"],
        specs={"n": (None, "count"), "sum_k": ("k", "sum"), "max_k": ("k", "max")},
        int_cols=("n", "sum_k", "max_k"),
    )
    return agg.sort_values(["event_type", "k_mod"]).reset_index(drop=True)


def q_union_streams(sf_dir: str) -> Dataset:
    """Stream union (xsl selection union '|', xpath.c:600-619 — concat
    without dedup): click events ∪ purchase events as one Dataset."""
    def filtered(kind: str) -> Dataset:
        ds = read_table(sf_dir, "events", columns=["event_id", "event_type", "value"])
        return map_partitions(
            ds, lambda t, k=kind: t.filter(pc.equal(t["event_type"], k))
        )

    return filtered("click").union(filtered("purchase"))


# dimension side of a join broadcasts below this COMPRESSED on-disk
# size (≈2x decoded; every worker holds one copy, so the cap is a
# worker-heap budget, not a cluster budget)
JOIN_BROADCAST_MAX_BYTES = 256 << 20

_OLJ_SCHEMA = pa.schema(
    [("o_orderkey", pa.int64()), ("o_orderpriority", pa.string()),
     ("n_lines", pa.int64()), ("revenue", pa.float64())]
)


def q_order_lineitem_join(sf_dir: str, force_copartition: bool = False) -> Dataset:
    """orders ⋈ lineitem → per-order rollup, with an AQE-style plan
    switch on the MEASURED size of the orders side:

    - orders fits a broadcast (compressed bytes <=
      JOIN_BROADCAST_MAX_BYTES): per-block partial rollup of lineitem
      (the combiner — ~4 lines/order collapse before any exchange),
      ONE shuffle of the partials by orderkey, final combine + probe
      the broadcast ``orderkey -> priority`` array (sorted keys +
      searchsorted, dictionary-encoded priorities). Inner-join
      semantics via the probe's found-mask.
    - orders is fact-sized too: co-partitioned large x large plan
      (stages/join.py — one exchange, per-block C hash join), rollup
      block-local after the join.

    Both plans are oracle-identical (parity pinned by a test that
    forces the co-partitioned path)."""
    from turboxsl_ray.context import on_disk_nbytes
    from turboxsl_ray.kernels.arrays import to_cents

    orders_bytes = on_disk_nbytes(f"{sf_dir}/orders.parquet")
    if force_copartition or orders_bytes is None or orders_bytes > JOIN_BROADCAST_MAX_BYTES:
        return _order_lineitem_copartition(sf_dir)

    dim = small_table(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    keys = dim["o_orderkey"].cast(pa.int64()).to_numpy()
    order_idx = np.argsort(keys, kind="stable")
    prio = dim["o_orderpriority"].combine_chunks().dictionary_encode()
    ref = broadcast(
        {
            "keys": keys[order_idx],
            "codes": prio.indices.to_numpy(zero_copy_only=False)[order_idx],
            "dict": prio.dictionary.to_pylist(),
        }
    )

    li = read_table(
        sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"]
    )

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.schema(
            [("o_orderkey", pa.int64()), ("n", pa.int64()), ("rev_c", pa.int64())]
        ).empty_table()
        if t.num_rows == 0:
            return empty
        price = as_array(t["l_extendedprice"]).to_numpy(zero_copy_only=False)
        disc = as_array(t["l_discount"]).to_numpy(zero_copy_only=False)
        tbl = pa.table(
            {
                "o_orderkey": as_array(pc.cast(t["l_orderkey"], pa.int64())),
                "rev_c": pa.array(to_cents(price * (1 - disc))),
            }
        )
        g = tbl.group_by("o_orderkey", use_threads=False).aggregate(
            [("rev_c", "count"), ("rev_c", "sum")]
        )
        return pa.table(
            {
                "o_orderkey": as_array(g["o_orderkey"]),
                "n": as_array(pc.cast(g["rev_c_count"], pa.int64())),
                "rev_c": as_array(pc.cast(g["rev_c_sum"], pa.int64())),
            }
        )

    parts = partition_by_conv(
        map_partitions(li, partial),
        partitions_for_input(f"{sf_dir}/orders.parquet"),
        keys=["o_orderkey"],
    )

    def final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _OLJ_SCHEMA.empty_table()
        g = t.group_by("o_orderkey", use_threads=False).aggregate(
            [("n", "sum"), ("rev_c", "sum")]
        )
        side = ray.get(ref)
        ok = as_array(g["o_orderkey"]).to_numpy()
        pos, found = probe_sorted(side["keys"], ok)
        prio_str = np.array(side["dict"], dtype=object)[side["codes"][pos]]
        out = pa.table(
            {
                "o_orderkey": pa.array(ok, type=pa.int64()),
                "o_orderpriority": pa.array(prio_str, type=pa.string()),
                "n_lines": as_array(pc.cast(g["n_sum"], pa.int64())),
                "revenue": as_array(
                    pc.divide(pc.cast(g["rev_c_sum"], pa.float64()), 100.0)
                ),
            },
            schema=_OLJ_SCHEMA,
        )
        return out.filter(pa.array(found))

    return map_partitions(parts, final)


def _order_lineitem_copartition(sf_dir: str) -> Dataset:
    """LARGE x LARGE path: orders ⋈ lineitem co-partitioned by
    orderkey (stages/join.py — one exchange, per-block C hash join),
    then a block-local per-order rollup (keys are already co-located,
    so no second shuffle). Money in integer cents (oracle-exact)."""
    from turboxsl_ray.kernels.arrays import to_cents
    from turboxsl_ray.stages.join import copartition_join

    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])

    li = read_table(
        sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"]
    )

    def li_prep(t: pa.Table) -> pa.Table:
        price = as_array(t["l_extendedprice"]).to_numpy(zero_copy_only=False)
        disc = as_array(t["l_discount"]).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "o_orderkey": as_array(pc.cast(t["l_orderkey"], pa.int64())),
                "rev_c": pa.array(to_cents(price * (1 - disc))),
            }
        )

    joined = copartition_join(
        orders,
        map_partitions(li, li_prep),
        on="o_orderkey",
        how="inner",
        num_partitions=partitions_for_input(
            f"{sf_dir}/orders.parquet", f"{sf_dir}/lineitem.parquet"
        ),
        left_schema=pa.schema(
            [("o_orderkey", pa.int64()), ("o_orderpriority", pa.string())]
        ),
        right_schema=pa.schema(
            [("o_orderkey", pa.int64()), ("rev_c", pa.int64())]
        ),
    )

    def rollup(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _OLJ_SCHEMA.empty_table()
        g = t.group_by(["o_orderkey", "o_orderpriority"]).aggregate(
            [("rev_c", "count"), ("rev_c", "sum")]
        )
        return pa.table(
            {
                "o_orderkey": as_array(pc.cast(g["o_orderkey"], pa.int64())),
                "o_orderpriority": as_array(g["o_orderpriority"]),
                "n_lines": as_array(pc.cast(g["rev_c_count"], pa.int64())),
                "revenue": as_array(
                    pc.divide(pc.cast(g["rev_c_sum"], pa.float64()), 100.0)
                ),
            },
            schema=_OLJ_SCHEMA,
        )

    return map_partitions(joined, rollup)


def q_distinct_parts_by_flag(sf_dir: str) -> pd.DataFrame:
    """High-cardinality COUNT(DISTINCT): per-block distinct pairs →
    one shuffle by the distinct key → per-block distinct again →
    partial counts → tiny driver sum. The full rows never shuffle,
    only the (flag, partkey) pair stream."""
    ds = read_table(sf_dir, "lineitem", columns=["l_returnflag", "l_partkey"])

    def local_distinct(t: pa.Table) -> pa.Table:
        return t.group_by(["l_returnflag", "l_partkey"]).aggregate([])

    pairs = map_partitions(ds, local_distinct)
    parts = partition_by_conv(
        pairs,
        partitions_for_input(f"{sf_dir}/lineitem.parquet", factor=0.5),
        keys=["l_partkey"],
    )

    def count_partial(t: pa.Table) -> pa.Table:
        d = t.group_by(["l_returnflag", "l_partkey"]).aggregate([])
        g = d.group_by("l_returnflag").aggregate([("l_partkey", "count")])
        return g.rename_columns(["l_returnflag", "n"])

    from turboxsl_ray.stages.aggregate import collect_tables

    acc: dict[str, int] = {}
    for t in collect_tables(map_partitions(parts, count_partial)):
        for k, n in zip(t["l_returnflag"].to_pylist(), t["n"].to_pylist()):
            acc[k] = acc.get(k, 0) + int(n)
    out = pd.DataFrame(
        {"l_returnflag": list(acc), "n_parts": np.array(list(acc.values()), np.int64)}
    )
    return out


def q_global_rank(sf_dir: str) -> Dataset:
    """Global total order with exact ranks (stages/global_sort.py):
    every event ranked by value DESC (ties by event_id) via
    sample → exact range counts → range shuffle → per-range rank."""
    from turboxsl_ray.stages.global_sort import sorted_with_rank

    return sorted_with_rank(
        lambda: read_table(sf_dir, "events", columns=["event_id", "value"]),
        key="value",
        tiebreak="event_id",
        descending=True,
    )


HOUR_US = 3_600_000_000


def q_hourly_user_stats(sf_dir: str) -> Dataset:
    """Tumbling time-window aggregate: per (user, hour) rollup of the
    events stream — the windowed-aggregate operator over event time.
    One shuffle by user; hour bucketing + rollup are block-local
    (a user's whole timeline is co-located)."""
    from turboxsl_ray.kernels.arrays import to_cents

    ds = read_table(sf_dir, "events", columns=["user_id", "ts", "value"])
    parts = partition_by_conv(
        ds, partitions_for_input(f"{sf_dir}/events.parquet"), keys=["user_id"]
    )

    def rollup(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "hour": pa.array([], pa.timestamp("us")),
                             "n_events": pa.array([], pa.int64()),
                             "sum_value": pa.array([], pa.float64())})
        ts_us = as_array(t["ts"].cast(pa.int64())).to_numpy()
        hour = (ts_us // HOUR_US) * HOUR_US
        uid = as_array(t["user_id"]).to_numpy()
        v = as_array(t["value"]).to_numpy(zero_copy_only=False)
        cents = to_cents(v)
        order = np.lexsort((hour, uid))
        uid, hour, cents = uid[order], hour[order], cents[order]
        starts = np.concatenate(([True], (uid[1:] != uid[:-1]) | (hour[1:] != hour[:-1])))
        bounds = np.flatnonzero(starts)
        sizes = np.diff(np.append(bounds, len(uid)))
        sums = np.add.reduceat(cents, bounds)
        return pa.table(
            {
                "user_id": pa.array(uid[bounds], type=pa.int64()),
                "hour": pa.array(hour[bounds], type=pa.int64()).cast(pa.timestamp("us")),
                "n_events": pa.array(sizes, type=pa.int64()),
                "sum_value": pa.array(sums / 100.0, type=pa.float64()),
            }
        )

    return map_partitions(parts, rollup)


def q_approx_distinct_parts(sf_dir: str) -> pd.DataFrame:
    """Approximate COUNT(DISTINCT l_partkey) via HyperLogLog: one
    register array per block (a few KB), elementwise-max merge on the
    driver — no shuffle at all. The registers are keyed on the
    SQL-replayable poly_hash64 of the decimal key string, so the
    estimate carries an EXACT DuckDB oracle (registry) despite being
    approximate; the error bound (~1.04/sqrt(2^p) ≈ 1.6% at p=12) is
    additionally pinned by tests against the exact count. Half-up
    rounding (floor(est + 0.5)) on both sides — Python round() is
    banker's and SQL ROUND() is half-away, so neither is used."""
    from turboxsl_ray.kernels.sketches import hll_estimate, hll_merge, hll_partial
    from turboxsl_ray.stages.aggregate import collect_tables

    ds = read_table(sf_dir, "lineitem", columns=["l_partkey"])

    def partial(t: pa.Table) -> pa.Table:
        regs = hll_partial(t["l_partkey"])
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    blobs = []
    for t in collect_tables(map_partitions(ds, partial)):
        blobs.extend(np.frombuffer(b, dtype=np.uint8) for b in t["regs"].to_pylist())
    est = hll_estimate(hll_merge(blobs)) if blobs else 0.0
    return pd.DataFrame(
        {"approx_n_parts": np.array([np.floor(est + 0.5)], dtype=np.int64)}
    )


def sample_dataset(ds: Dataset, fraction: float, seed: int = 42) -> Dataset:
    """Seeded row sampling (bench subsets; the reference has no
    sampling operator, SURVEY.md §2.4)."""
    return ds.random_sample(fraction, seed=seed)


QUANTILE_BINS = 512
QUANTILE_QS = (0.25, 0.5, 0.9, 0.99)


def q_approx_quantiles(sf_dir: str, bins: int = QUANTILE_BINS) -> pd.DataFrame:
    """Approximate quantiles of l_extendedprice via a two-pass
    histogram sketch: pass 1 = per-block (min, max) partials; pass 2 =
    per-block equal-width bin counts (one int64 vector per block,
    merged by ADD on the driver). Deterministic; absolute error
    <= (max-min)/bins, pinned by tests against exact quantiles.
    Rows-only driver check (approximate by construction)."""
    from turboxsl_ray.kernels.sketches import hist_partial, hist_quantiles
    from turboxsl_ray.stages.aggregate import collect_tables

    col = "l_extendedprice"
    ds_factory = lambda: read_table(sf_dir, "lineitem", columns=[col])

    def mm(t: pa.Table) -> pa.Table:
        v = as_array(t[col]).to_numpy(zero_copy_only=False)
        if len(v) == 0:  # an empty shard among non-empty ones
            return pa.table({"lo": pa.array([], pa.float64()),
                             "hi": pa.array([], pa.float64())})
        return pa.table({"lo": pa.array([float(v.min())]),
                         "hi": pa.array([float(v.max())])})

    lo, hi = np.inf, -np.inf
    for t in collect_tables(map_partitions(ds_factory(), mm)):
        if t.num_rows == 0:
            continue
        lo = min(lo, t["lo"][0].as_py())
        hi = max(hi, t["hi"][0].as_py())

    def hp(t: pa.Table) -> pa.Table:
        v = as_array(t[col]).to_numpy(zero_copy_only=False)
        counts = hist_partial(v, lo, hi, bins)
        return pa.table({"h": pa.array([counts.tobytes()], pa.binary())})

    merged = np.zeros(bins, dtype=np.int64)
    for t in collect_tables(map_partitions(ds_factory(), hp)):
        for b in t["h"].to_pylist():
            merged += np.frombuffer(b, dtype=np.int64)

    est = hist_quantiles(merged, lo, hi, QUANTILE_QS)
    return pd.DataFrame(
        {"q": np.array(QUANTILE_QS, np.float64),
         "value_est": np.round(est, 4)}
    )


HH_K = 10


def q_heavy_hitters(sf_dir: str, k: int = HH_K) -> pd.DataFrame:
    """Top-k most frequent users via count-min + per-block candidates:
    each block emits its CMS partial (merged by ADD — sizes are fixed
    KBs) plus its exact local top-k as candidates (any global heavy
    hitter is heavy in at least one block at this skew). Estimates
    only ever OVER-count; containment of the exact top-k is pinned by
    tests. Rows-only driver check."""
    from turboxsl_ray.kernels.sketches import cms_estimate, cms_partial
    from turboxsl_ray.stages.aggregate import collect_tables

    ds = read_table(sf_dir, "events", columns=["user_id"])

    def partial(t: pa.Table) -> pa.Table:
        ids = as_array(pc.cast(t["user_id"], pa.int64()))
        sk = cms_partial(ids)
        g = pa.table({"u": ids}).group_by("u").aggregate([([], "count_all")])
        cnt = g["count_all"].to_numpy()
        top = np.argsort(-cnt, kind="stable")[: 4 * k]
        cand = g["u"].to_numpy()[top]
        return pa.table(
            {
                "sketch": pa.array([sk.tobytes()] + [None] * len(cand), pa.binary()),
                "cand": pa.array(
                    np.concatenate(([0], cand)), type=pa.int64()
                ),
                "is_sketch": pa.array([True] + [False] * len(cand)),
            }
        )

    sketch = None
    cands: list[int] = []
    for t in collect_tables(map_partitions(ds, partial)):
        for blob, cand, is_sk in zip(
            t["sketch"].to_pylist(), t["cand"].to_pylist(), t["is_sketch"].to_pylist()
        ):
            if is_sk:
                part = np.frombuffer(blob, dtype=np.int64).reshape(4, -1)
                sketch = part.copy() if sketch is None else sketch + part
            else:
                cands.append(int(cand))
    if sketch is None:
        return pd.DataFrame({"user_id": [], "est_count": []})
    uniq = np.unique(np.array(cands, dtype=np.int64))
    est = cms_estimate(sketch, pa.array(uniq, pa.int64()))
    order = np.lexsort((uniq, -est))[:k]
    return pd.DataFrame(
        {"user_id": uniq[order], "est_count": est[order].astype(np.int64)}
    )


GROUP_TOPK_K = 3

_GROUP_TOPK_SCHEMA = pa.schema(
    [
        ("l_orderkey", pa.int64()),
        ("l_linenumber", pa.int64()),
        ("l_extendedprice", pa.float64()),
        ("rn", pa.int64()),
    ]
)


def q_group_topk(sf_dir: str, k: int = GROUP_TOPK_K) -> Dataset:
    """Per-GROUP top-k (vs the global topk of stages/aggregate.py):
    the k most expensive lineitems of EVERY order. One orderkey-keyed
    exchange, then block-local sort + segmented rank — the windowed
    ``ROW_NUMBER() OVER (PARTITION BY ...) <= k`` as a two-step plan
    (xsl:sort inside xsl:for-each over a keyed group, the reference's
    per-group sort shape, /root/reference/src/xpath.c:484-576)."""
    from turboxsl_ray.kernels.windows import cumcount, segment_starts

    ds = read_table(
        sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber", "l_extendedprice"]
    )
    parts = partition_by_conv(
        ds, partitions_for_input(f"{sf_dir}/lineitem.parquet"), keys=["l_orderkey"]
    )

    def block_topk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _GROUP_TOPK_SCHEMA.empty_table()
        t = t.sort_by(
            [
                ("l_orderkey", "ascending"),
                ("l_extendedprice", "descending"),
                ("l_linenumber", "ascending"),
            ]
        )
        ok = as_array(t["l_orderkey"]).to_numpy()
        rn = cumcount(segment_starts(ok)) + 1
        out = pa.table(
            {
                "l_orderkey": as_array(pc.cast(t["l_orderkey"], pa.int64())),
                "l_linenumber": as_array(pc.cast(t["l_linenumber"], pa.int64())),
                "l_extendedprice": as_array(pc.cast(t["l_extendedprice"], pa.float64())),
                "rn": pa.array(rn + 0, type=pa.int64()),
            },
            schema=_GROUP_TOPK_SCHEMA,
        )
        return out.filter(pc.less_equal(out["rn"], k))

    return map_partitions(parts, block_topk)


PIVOT_TYPES = ("click", "view", "purchase")

_PIVOT_SCHEMA = pa.schema(
    [("user_id", pa.int64())]
    + [(f"n_{k}", pa.int64()) for k in PIVOT_TYPES]
    + [(f"sum_{k}", pa.float64()) for k in PIVOT_TYPES]
)


def q_pivot_event_types(sf_dir: str) -> Dataset:
    """Pivot (long -> wide conditional aggregate): per user, count and
    cents-exact value sum for each event type as COLUMNS. One
    user-keyed exchange, then a single block-local grouped pass over
    conditional columns (the xsl:choose-inside-xsl:for-each rollup
    shape). Unpivoted types fall into no column by design."""
    ds = read_table(sf_dir, "events", columns=["user_id", "event_type", "value"])
    parts = partition_by_conv(
        ds, partitions_for_input(f"{sf_dir}/events.parquet"), keys=["user_id"]
    )

    def pivot(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _PIVOT_SCHEMA.empty_table()
        v = as_array(t["value"]).to_numpy(zero_copy_only=False)
        cents = to_cents(v)
        et = as_array(t["event_type"])
        cols = {"user_id": pc.cast(t["user_id"], pa.int64())}
        aggs = []
        work = {}
        for kind in PIVOT_TYPES:
            mask = pc.equal(et, kind).to_numpy(zero_copy_only=False)
            work[f"__n_{kind}"] = pa.array(mask.astype(np.int64))
            work[f"__s_{kind}"] = pa.array(np.where(mask, cents, 0))
            aggs += [(f"__n_{kind}", "sum"), (f"__s_{kind}", "sum")]
        g = pa.table({**cols, **work}).group_by("user_id", use_threads=False).aggregate(aggs)
        out = {"user_id": as_array(g["user_id"])}
        for kind in PIVOT_TYPES:
            out[f"n_{kind}"] = as_array(pc.cast(g[f"__n_{kind}_sum"], pa.int64()))
        for kind in PIVOT_TYPES:
            out[f"sum_{kind}"] = as_array(
                pc.divide(pc.cast(g[f"__s_{kind}_sum"], pa.float64()), 100.0)
            )
        return pa.table(out, schema=_PIVOT_SCHEMA)

    return map_partitions(parts, pivot)


_GRP_QUANT_SCHEMA = pa.schema(
    [
        ("event_type", pa.string()),
        ("n", pa.int64()),
        ("median_value", pa.float64()),
        ("p90_value", pa.float64()),
    ]
)


def q_grp_median(sf_dir: str) -> Dataset:
    """EXACT per-group quantiles (median + p90) of event value: keyed
    exchange by group, block-local sort + linear-interpolated
    percentiles (numpy 'linear' == SQL quantile_cont). The exact
    counterpart of the histogram-sketch q_approx_quantiles — use the
    sketch when a group's values can't fit one partition."""
    ds = read_table(sf_dir, "events", columns=["event_type", "value"])
    parts = partition_by_conv(
        ds,
        partitions_for_input(f"{sf_dir}/events.parquet", factor=1.0),
        keys=["event_type"],
    )

    def quant(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _GRP_QUANT_SCHEMA.empty_table()
        et = as_array(t["event_type"]).to_numpy(zero_copy_only=False)
        v = as_array(t["value"]).to_numpy(zero_copy_only=False).astype(np.float64)
        order = np.argsort(et, kind="stable")
        et, v = et[order], v[order]
        starts = np.concatenate(([True], et[1:] != et[:-1]))
        bounds = np.flatnonzero(starts)
        names, meds, p90s, ns = [], [], [], []
        for i, b in enumerate(bounds):
            e = bounds[i + 1] if i + 1 < len(bounds) else len(et)
            seg = v[b:e]
            q50, q90 = np.percentile(seg, [50.0, 90.0], method="linear")
            names.append(et[b])
            ns.append(e - b)
            meds.append(round(float(q50), 6))
            p90s.append(round(float(q90), 6))
        return pa.table(
            {
                "event_type": pa.array(names, type=pa.string()),
                "n": pa.array(ns, type=pa.int64()),
                "median_value": pa.array(meds, type=pa.float64()),
                "p90_value": pa.array(p90s, type=pa.float64()),
            },
            schema=_GRP_QUANT_SCHEMA,
        )

    return map_partitions(parts, quant)


def q_rollup_pricing(sf_dir: str) -> pd.DataFrame:
    """Multi-level rollup (GROUP BY ROLLUP analog): lineitem counts and
    cents-exact quantity sums at (flag, status), (flag), and grand
    total. The coarser levels are DERIVED from the finest partials on
    the driver — one scan, one partial-aggregate pass, zero extra
    shuffles (the cube trick: higher levels are sums of lower ones)."""
    ds = read_table(sf_dir, "lineitem", columns=["l_returnflag", "l_linestatus", "l_quantity"])

    def prep(t: pa.Table) -> pa.Table:
        q = as_array(t["l_quantity"]).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_returnflag": as_array(t["l_returnflag"]),
                "l_linestatus": as_array(t["l_linestatus"]),
                "q_c": pa.array(to_cents(q)),
            }
        )

    fine = groupby_small(
        map_partitions(ds, prep),
        keys=["l_returnflag", "l_linestatus"],
        specs={"n": (None, "count"), "q_c": ("q_c", "sum")},
        int_cols=("n", "q_c"),
    )
    mid = fine.groupby("l_returnflag", as_index=False)[["n", "q_c"]].sum()
    mid["l_linestatus"] = None
    top = pd.DataFrame(
        {"l_returnflag": [None], "l_linestatus": [None],
         "n": [fine["n"].sum()], "q_c": [fine["q_c"].sum()]}
    )
    out = pd.concat([fine, mid, top], ignore_index=True)
    out["sum_qty"] = out["q_c"] / 100.0
    out["n"] = out["n"].astype(np.int64)
    return out[["l_returnflag", "l_linestatus", "n", "sum_qty"]]


FUNNEL_STAGES = ("view", "click", "purchase")


def q_funnel(sf_dir: str) -> Dataset:
    """Sequence/funnel detection (MATCH_RECOGNIZE-lite): per user, the
    earliest strictly-ordered view -> click -> purchase chain, plus the
    furthest stage reached. The reference analog is a chained
    following-axis selection with predicates — ``following::click[1]``
    after a ``view`` (following axis /root/reference/src/xpath.c:409-428
    + positional filter xpath.c:178-188) — re-expressed as per-user
    vectorized stage scans.

    Physical plan: project 3 columns at the read, ONE shuffle by
    user_id, then block-local numpy: per-stage conditional minima via
    ``np.minimum.at`` over the factorized user index — no per-user
    Python loop, no sort (conditional min doesn't need order)."""
    ds = read_table(sf_dir, "events", columns=["user_id", "ts", "event_type"])
    parts = partition_by_conv(
        ds, partitions_for_input(f"{sf_dir}/events.parquet"), keys=["user_id"]
    )

    def stages(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "view_ts": pa.array([], pa.timestamp("us")),
                "click_ts": pa.array([], pa.timestamp("us")),
                "purchase_ts": pa.array([], pa.timestamp("us")),
                "stage": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        uid = as_array(t["user_id"]).to_numpy()
        ts = as_array(t["ts"].cast(pa.int64())).to_numpy()
        etype = as_array(t["event_type"])
        users, inv = np.unique(uid, return_inverse=True)
        sentinel = np.iinfo(np.int64).max
        mins = []
        prev = np.full(len(users), -1, dtype=np.int64)  # stage 0: no lower bound
        for si, name in enumerate(FUNNEL_STAGES):
            cur = np.full(len(users), sentinel, dtype=np.int64)
            mask = pc.equal(etype, name).to_numpy(zero_copy_only=False)
            mask &= ts > prev[inv]  # strictly after the previous stage
            np.minimum.at(cur, inv[mask], ts[mask])
            mins.append(cur)
            prev = cur
        t1, t2, t3 = mins
        entered = t1 != sentinel  # funnel population = users with a view
        stage = 1 + (t2[entered] != sentinel) + (t3[entered] != sentinel)

        def ts_col(v: np.ndarray) -> pa.Array:
            return pc.if_else(
                pa.array(v[entered] != sentinel),
                pa.array(v[entered], type=pa.int64()).cast(pa.timestamp("us")),
                pa.scalar(None, pa.timestamp("us")),
            )

        return pa.table(
            {
                "user_id": pa.array(users[entered], type=pa.int64()),
                "view_ts": ts_col(t1),
                "click_ts": ts_col(t2),
                "purchase_ts": ts_col(t3),
                "stage": pa.array(stage, type=pa.int64()),
            }
        )

    return map_partitions(parts, stages)


def q_click_purchase_full(sf_dir: str) -> Dataset:
    """FULL OUTER merge of per-user click counts vs purchase counts —
    users with only clicks carry a NULL purchase count and vice versa
    (the union-of-keys semantics ``copartition_join(how='full')``
    provides for raw streams). Here both sides derive from the same
    events table, so the plan FUSES them: per-block partial counts of
    both types, ONE user-keyed exchange of the partials, block-local
    combine + pivot. Two aggregate pipelines + a 3rd join exchange
    would move the same rows three times."""
    ds = read_table(sf_dir, "events", columns=["user_id", "event_type"])

    _P_SCHEMA = pa.schema(
        [("user_id", pa.int64()), ("event_type", pa.string()), ("n", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _P_SCHEMA.empty_table()
        t = t.filter(
            pc.is_in(t["event_type"], value_set=pa.array(["click", "purchase"]))
        )
        g = t.group_by(["user_id", "event_type"], use_threads=False).aggregate(
            [([], "count_all")]
        )
        return pa.table(
            {
                "user_id": as_array(pc.cast(g["user_id"], pa.int64())),
                "event_type": as_array(g["event_type"]),
                "n": as_array(pc.cast(g["count_all"], pa.int64())),
            },
            schema=_P_SCHEMA,
        )

    parts = partition_by_conv(
        map_partitions(ds, partial),
        partitions_for_input(f"{sf_dir}/events.parquet", factor=0.5),
        keys=["user_id"],
    )

    out_schema = pa.schema(
        [("user_id", pa.int64()), ("n_clicks", pa.int64()), ("n_purchases", pa.int64())]
    )

    def combine(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        g = t.group_by(["user_id", "event_type"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        uid = as_array(g["user_id"]).to_numpy()
        et = as_array(g["event_type"])
        n = as_array(pc.cast(g["n_sum"], pa.int64())).to_numpy()
        users, inv = np.unique(uid, return_inverse=True)
        sides = {}
        for name in ("click", "purchase"):
            v = np.full(len(users), -1, dtype=np.int64)
            m = pc.equal(et, name).to_numpy(zero_copy_only=False)
            v[inv[m]] = n[m]
            sides[name] = pc.if_else(
                pa.array(v >= 0), pa.array(v, type=pa.int64()),
                pa.scalar(None, pa.int64()),
            )
        return pa.table(
            {
                "user_id": pa.array(users, type=pa.int64()),
                "n_clicks": sides["click"],
                "n_purchases": sides["purchase"],
            },
            schema=out_schema,
        )

    return map_partitions(parts, combine)


def q_cube_pricing(sf_dir: str) -> pd.DataFrame:
    """Full CUBE over (returnflag, linestatus): all four grouping sets
    — (flag, status), (flag), (status), () — derived from ONE scan's
    finest-level partials on the driver (higher levels are sums of
    lower ones; the result is low-cardinality by construction, so the
    derivation is a few-row pandas pass, never a second exchange)."""
    ds = read_table(sf_dir, "lineitem", columns=["l_returnflag", "l_linestatus", "l_quantity"])

    def prep(t: pa.Table) -> pa.Table:
        q = as_array(t["l_quantity"]).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_returnflag": as_array(t["l_returnflag"]),
                "l_linestatus": as_array(t["l_linestatus"]),
                "q_c": pa.array(to_cents(q)),
            }
        )

    fine = groupby_small(
        map_partitions(ds, prep),
        keys=["l_returnflag", "l_linestatus"],
        specs={"n": (None, "count"), "q_c": ("q_c", "sum")},
        int_cols=("n", "q_c"),
    )
    by_flag = fine.groupby("l_returnflag", as_index=False)[["n", "q_c"]].sum()
    by_flag["l_linestatus"] = None
    by_status = fine.groupby("l_linestatus", as_index=False)[["n", "q_c"]].sum()
    by_status["l_returnflag"] = None
    top = pd.DataFrame(
        {"l_returnflag": [None], "l_linestatus": [None],
         "n": [fine["n"].sum()], "q_c": [fine["q_c"].sum()]}
    )
    out = pd.concat([fine, by_flag, by_status, top], ignore_index=True)
    out["sum_qty"] = out["q_c"] / 100.0
    out["n"] = out["n"].astype(np.int64)
    return out[["l_returnflag", "l_linestatus", "n", "sum_qty"]]


def q_urgent_order_revenue(sf_dir: str, bloom: bool = True) -> Dataset:
    """Selective-build join with Bloom pruning: only 1-URGENT orders
    (~20% of the table) join lineitem, so ~80% of the fact side would
    shuffle just to be dropped by the per-block hash join. The
    build side's keys summarize into a 512 KiB Bloom filter
    (stages/bloom.py) that prunes fact rows BEFORE the exchange —
    the shuffle then moves only might-match rows; false positives
    are dropped by the join exactly as before (parity pinned by a
    test with bloom disabled)."""
    from turboxsl_ray.kernels.arrays import to_cents
    from turboxsl_ray.stages.join import copartition_join

    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])

    def urgent(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["o_orderpriority"], "1-URGENT"))
        return pa.table({"o_orderkey": as_array(pc.cast(t["o_orderkey"], pa.int64()))})

    li = read_table(
        sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"]
    )

    def li_prep(t: pa.Table) -> pa.Table:
        price = as_array(t["l_extendedprice"]).to_numpy(zero_copy_only=False)
        disc = as_array(t["l_discount"]).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "o_orderkey": as_array(pc.cast(t["l_orderkey"], pa.int64())),
                "rev_c": pa.array(to_cents(price * (1 - disc))),
            }
        )

    joined = copartition_join(
        map_partitions(orders, urgent),
        map_partitions(li, li_prep),
        on="o_orderkey",
        how="inner",
        num_partitions=partitions_for_input(f"{sf_dir}/lineitem.parquet", factor=0.5),
        left_schema=pa.schema([("o_orderkey", pa.int64())]),
        right_schema=pa.schema([("o_orderkey", pa.int64()), ("rev_c", pa.int64())]),
        bloom_prune_right=bloom,
    )

    out_schema = pa.schema(
        [("o_orderkey", pa.int64()), ("n_lines", pa.int64()), ("revenue", pa.float64())]
    )

    def rollup(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "o_orderkey" not in t.column_names:
            return out_schema.empty_table()
        g = t.group_by("o_orderkey", use_threads=False).aggregate(
            [("rev_c", "count"), ("rev_c", "sum")]
        )
        return pa.table(
            {
                "o_orderkey": as_array(pc.cast(g["o_orderkey"], pa.int64())),
                "n_lines": as_array(pc.cast(g["rev_c_count"], pa.int64())),
                "revenue": as_array(
                    pc.divide(pc.cast(g["rev_c_sum"], pa.float64()), 100.0)
                ),
            },
            schema=out_schema,
        )

    return map_partitions(joined, rollup)


# per-event_type keep rates expressed as "first md5 hex digit < n/16"
# (md5 of the row id on BOTH sides, so the oracle is exact and the
# sample is stable across partitionings, retries, and resumes)
STRATA_HEX = {"view": 2, "click": 4, "signup": 8, "purchase": 16, "error": 16}


def q_stratified_sample(sf_dir: str) -> Dataset:
    """Stratified deterministic sampling: per-class keep rates (keep
    all rare purchase/error rows, downsample the bulky view/click
    classes) — the class-rebalancing pass of a training-data pipeline,
    as a pure filter (no shuffle, no state, resume-stable)."""
    from turboxsl_ray.kernels.hashing import md5_first_hex_digit

    ds = read_table(sf_dir, "events", columns=["event_id", "event_type", "value"])

    def sample(t: pa.Table) -> pa.Table:
        ids = as_array(pc.cast(t["event_id"], pa.int64())).to_numpy()
        digit = md5_first_hex_digit(ids)
        et = as_array(t["event_type"])
        limit = np.zeros(len(ids), dtype=np.int64)
        for name, n in STRATA_HEX.items():
            m = pc.equal(et, name).to_numpy(zero_copy_only=False)
            limit[m] = n
        out = t.filter(pa.array(digit < limit))
        return pa.table(
            {
                "event_id": as_array(pc.cast(out["event_id"], pa.int64())),
                "event_type": as_array(out["event_type"]),
                "value": as_array(pc.cast(out["value"], pa.float64())),
            }
        )

    return map_partitions(ds, sample)
