"""Property-based tests (hypothesis): the as-of kernel and the window
kernels against pandas oracles on arbitrary generated inputs — the
test discipline the reference never had (SURVEY.md §5.1: golden corpus
only, no randomized testing)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings, strategies as st


@st.composite
def keyed_series(draw, max_keys=5, max_rows=60):
    """Sorted (key_codes, ts) arrays with duplicates allowed."""
    n = draw(st.integers(0, max_rows))
    keys = draw(
        st.lists(st.integers(0, max_keys - 1), min_size=n, max_size=n)
    )
    ts = draw(st.lists(st.integers(0, 50), min_size=n, max_size=n))
    arr = sorted(zip(keys, ts))
    k = np.array([a for a, _ in arr], dtype=np.int64)
    t = np.array([b for _, b in arr], dtype=np.int64)
    return k, t


@given(left=keyed_series(), right=keyed_series())
@settings(max_examples=200, deadline=None)
def test_asof_kernel_matches_merge_asof(left, right):
    from turboxsl_ray.kernels.asof import asof_backward_indices

    lk, lt = left
    rk, rt = right
    idx = asof_backward_indices(lk, lt, rk, rt)

    ldf = pd.DataFrame({"k": lk, "ts": lt})
    rdf = pd.DataFrame({"k": rk, "ts": rt, "ridx": np.arange(len(rk))})
    if len(ldf) == 0:
        assert len(idx) == 0
        return
    merged = pd.merge_asof(
        ldf.sort_values("ts", kind="stable"),
        rdf.sort_values("ts", kind="stable"),
        by="k", on="ts", direction="backward",
    ).sort_values(["k", "ts"], kind="stable")
    expect = merged["ridx"].to_numpy()
    got = np.where(idx >= 0, idx.astype(float), np.nan)
    # pandas picks the LAST duplicate-(k, ts) right row, as does the
    # kernel; compare the VALUES the indices point to (ts equality),
    # since equal rows may have different positions under stable sorts
    ok_mask = ~np.isnan(expect)
    assert (np.isnan(got) == np.isnan(expect)).all()
    if ok_mask.any():
        assert (rt[idx[ok_mask].astype(int)] == rt[expect[ok_mask].astype(int)]).all()
        assert (rk[idx[ok_mask].astype(int)] == rk[expect[ok_mask].astype(int)]).all()


@given(data=keyed_series(max_keys=4, max_rows=80),
       gap=st.integers(1, 20))
@settings(max_examples=150, deadline=None)
def test_session_index_matches_pandas(data, gap):
    from turboxsl_ray.kernels import windows as W

    k, t = data
    if len(k) == 0:
        return
    starts = W.segment_starts(k)
    _new, sess = W.session_index(starts, t, gap)

    df = pd.DataFrame({"k": k, "ts": t})
    g = df.groupby("k", sort=False)["ts"]
    new = g.diff().gt(gap) | g.diff().isna()
    expect = (new.groupby(df["k"]).cumsum() - 1).astype(np.int64)
    np.testing.assert_array_equal(sess, expect.to_numpy())


@given(data=keyed_series(max_keys=4, max_rows=80), k_lag=st.integers(1, 5))
@settings(max_examples=150, deadline=None)
def test_lag_matches_pandas(data, k_lag):
    from turboxsl_ray.kernels import windows as W

    keys, ts = data
    if len(keys) == 0:
        return
    starts = W.segment_starts(keys)
    idx = W.lag_indices(starts, k_lag)
    vals = W.take_with_null(pa.array(ts), idx).to_pandas()

    df = pd.DataFrame({"k": keys, "v": ts})
    expect = df.groupby("k", sort=False)["v"].shift(k_lag)
    pd.testing.assert_series_equal(
        vals.astype("float64"), expect.astype("float64"),
        check_names=False, check_index=False,
    )


def test_localization_plural_rules_and_po():
    from turboxsl_ray.functions.localization import Catalog, load_po, plural_ru

    po = '''
msgid "book"
msgid_plural "books"
msgstr[0] "книга"
msgstr[1] "книги"
msgstr[2] "книг"

msgid "hello"
msgstr "привет {name}"
'''
    cat = load_po(po, "ru")
    n = pa.array([1, 2, 5, 11, 21, 22, 111], pa.int64())
    out = cat.ngettext(pa.array(["book"] * 7), n).to_pylist()
    assert out == ["книга", "книги", "книг", "книг", "книга", "книги", "книг"]
    hello = cat.gettext(pa.array(["hello", "missing"]), name="мир").to_pylist()
    assert hello == ["привет мир", "missing"]
    np.testing.assert_array_equal(
        plural_ru(np.array([1, 3, 7, 12, 101])), [0, 1, 2, 2, 0]
    )


def test_format_number_fixed_decimals():
    from turboxsl_ray.functions import strings as F

    out = F.format_number(pa.array([1.005, 2.0, -3.14159]), decimals=2)
    assert out.to_pylist() == ["1.00", "2.00", "-3.14"]  # 1.005 stored as 1.00499...


def test_format_number_full_patterns():
    """functions.c:449-709 picture grammar: grouping, min-int digits,
    optional fraction digits, %, negative subpattern, NaN/inf,
    decimal-format symbol overrides (transform.c:363-369)."""
    from turboxsl_ray.functions.format_number import (
        format_number,
        register_decimal_format,
    )

    arr = pa.array([1234567.891, 0.5, -1234.5, 0.0, float("nan"), float("inf")])
    assert format_number(arr, "#,##0.00").to_pylist() == [
        "1,234,567.89", "0.50", "-1,234.50", "0.00", "NaN", "Infinity",
    ]
    assert format_number(arr, "#,##0.0;(#,##0.0)").to_pylist() == [
        "1,234,567.9", "0.5", "(1,234.5)", "0.0", "NaN", "Infinity",
    ]
    assert format_number(pa.array([0.256, -0.04]), "0.0%").to_pylist() == [
        "25.6%", "-4.0%",
    ]
    assert format_number(pa.array([3.14159, 2.0]), "00.#").to_pylist() == [
        "03.1", "02",
    ]
    assert format_number(pa.array([2.0, 2.5, None]), "0.##").to_pylist() == [
        "2", "2.5", None,
    ]
    register_decimal_format(
        "de", decimal_separator=",", grouping_separator=".", minus_sign="−"
    )
    assert format_number(
        pa.array([1234567.891, -3.5]), "#.##0,00", format_name="de"
    ).to_pylist() == ["1.234.567,89", "−3,50"]


@given(
    groups=st.lists(st.integers(1, 7), min_size=0, max_size=10),
    df_cap=st.one_of(st.none(), st.integers(1, 5)),
)
@settings(max_examples=200, deadline=None)
def test_emit_gram_pairs_matches_bruteforce(groups, df_cap):
    """Vectorized per-group pair emission == per-group triu brute force
    (with and without the document-frequency cap)."""
    from turboxsl_ray.pipelines.text import _emit_gram_pairs

    g = np.repeat(np.arange(len(groups), dtype=np.int64), groups)
    ai, bi = _emit_gram_pairs(g, df_cap)
    want = []
    start = 0
    for m in groups:
        if df_cap is None or m <= df_cap:
            for i in range(m):
                for j in range(i + 1, m):
                    want.append((start + i, start + j))
        start += m
    got = sorted(zip(ai.tolist(), bi.tolist()))
    assert got == sorted(want)


@given(
    n=st.integers(0, 20),
    offset=st.integers(0, 5),
)
@settings(max_examples=100, deadline=None)
def test_sig_matrix_matches_naive_decode(n, offset):
    """Buffer-math signature decode == per-row python decode, incl. on
    sliced arrays (nonzero Arrow offsets)."""
    from turboxsl_ray.pipelines.text import MINHASH_K, _sig_matrix

    rng = np.random.default_rng(n * 31 + offset)
    sigs = rng.integers(0, 2**63, size=(n + offset, MINHASH_K), dtype=np.uint64)
    arr = pa.array([sigs[i].tobytes() for i in range(n + offset)], type=pa.binary())
    sliced = arr.slice(offset, n)
    got = _sig_matrix(sliced, MINHASH_K)
    np.testing.assert_array_equal(got, sigs[offset:])


@given(
    w=st.integers(1, 12), h=st.integers(1, 12), seed=st.integers(0, 1000)
)
@settings(max_examples=100, deadline=None)
def test_ppm_roundtrip_property(w, h, seed):
    from turboxsl_ray.pipelines.multimodal import decode_ppm, encode_ppm

    px = np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
    np.testing.assert_array_equal(decode_ppm(encode_ppm(px)), px)


@given(x=st.floats(allow_nan=False, allow_infinity=False, width=64,
                   min_value=-1e12, max_value=1e12))
@settings(max_examples=300, deadline=None)
def test_format_number_fixed_pattern_matches_printf(x):
    """The '0.00' picture == C printf %.2f semantics for any finite
    double (sign, rounding, carry)."""
    from turboxsl_ray.functions.format_number import compile_pattern, format_value

    cp = compile_pattern("0.00")
    assert format_value(x, cp) == f"{x:.2f}".replace("-0.00", "-0.00")


@given(left=keyed_series(), right=keyed_series(), w=st.integers(1, 15))
@settings(max_examples=200, deadline=None)
def test_range_count_sum_matches_bruteforce(left, right, w):
    """Trailing-interval join kernel == O(n*m) brute force: count/sum
    of right rows with same key and ts' in (ts - w, ts]."""
    from turboxsl_ray.kernels.asof import range_count_sum

    lk, lt = left
    rk, rt = right
    rv = (rt * 7 + rk).astype(np.int64)  # deterministic values
    n, s = range_count_sum(lk, lt, rk, rt, rv, w)
    for i in range(len(lk)):
        mask = (rk == lk[i]) & (rt > lt[i] - w) & (rt <= lt[i])
        assert n[i] == mask.sum()
        assert s[i] == rv[mask].sum()


@given(left=keyed_series(), right=keyed_series())
@settings(max_examples=200, deadline=None)
def test_asof_forward_matches_merge_asof(left, right):
    from turboxsl_ray.kernels.asof import asof_forward_indices

    lk, lt = left
    rk, rt = right
    idx = asof_forward_indices(lk, lt, rk, rt)
    ldf = pd.DataFrame({"k": lk, "ts": lt})
    rdf = pd.DataFrame({"k": rk, "ts": rt, "ridx": np.arange(len(rk))})
    if len(ldf) == 0:
        assert len(idx) == 0
        return
    merged = pd.merge_asof(
        ldf.sort_values("ts", kind="stable"),
        rdf.sort_values("ts", kind="stable"),
        by="k", on="ts", direction="forward",
    ).sort_values(["k", "ts"], kind="stable")
    expect = merged["ridx"].to_numpy()
    assert ((idx >= 0) == ~np.isnan(expect)).all()
    ok = idx >= 0
    if ok.any():
        assert (rt[idx[ok]] == rt[expect[ok].astype(int)]).all()
        assert (rk[idx[ok]] == rk[expect[ok].astype(int)]).all()


@given(left=keyed_series(), right=keyed_series())
@settings(max_examples=200, deadline=None)
def test_asof_nearest_matches_merge_asof(left, right):
    from turboxsl_ray.kernels.asof import asof_nearest_indices

    lk, lt = left
    rk, rt = right
    idx = asof_nearest_indices(lk, lt, rk, rt)
    ldf = pd.DataFrame({"k": lk, "ts": lt})
    rdf = pd.DataFrame({"k": rk, "ts": rt, "ridx": np.arange(len(rk))})
    if len(ldf) == 0:
        assert len(idx) == 0
        return
    merged = pd.merge_asof(
        ldf.sort_values("ts", kind="stable"),
        rdf.sort_values("ts", kind="stable"),
        by="k", on="ts", direction="nearest",
    ).sort_values(["k", "ts"], kind="stable")
    expect = merged["ridx"].to_numpy()
    assert ((idx >= 0) == ~np.isnan(expect)).all()
    ok = idx >= 0
    if ok.any():
        # compare the DISTANCE achieved (tie direction may differ in
        # index position but never in |ts'-ts|)
        got_d = np.abs(rt[idx[ok]] - lt[ok])
        want_d = np.abs(rt[expect[ok].astype(int)] - lt[ok])
        assert (got_d == want_d).all()
        assert (rk[idx[ok]] == lk[ok]).all()
