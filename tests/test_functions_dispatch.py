"""Unit tests: scalar function library (XPath semantics), UDF
registry dispatcher order, rule dispatch, and the stateful streaming
window stage (ring buffers across batch boundaries)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


# ---------------------------------------------------------------- functions

def test_substring_one_based_codepoints():
    from turboxsl_ray.functions import strings as F

    a = pa.array(["héllo wörld", "ab"])
    assert F.substring(a, 2, 4).to_pylist() == ["éllo", "b"]
    assert F.substring(a, 1, 1).to_pylist() == ["h", "a"]


def test_substring_before_after_absent_sep():
    from turboxsl_ray.functions import strings as F

    a = pa.array(["a-b-c", "nodash"])
    assert F.substring_before(a, "-").to_pylist() == ["a", ""]
    assert F.substring_after(a, "-").to_pylist() == ["b-c", ""]


def test_normalize_space_and_length():
    from turboxsl_ray.functions import strings as F

    a = pa.array(["  a  \t b\n", "é中"])
    assert F.normalize_space(a).to_pylist() == ["a b", "é中"]
    assert F.string_length(a).to_pylist() == [9, 2]


def test_translate_deletes_unmapped():
    from turboxsl_ray.functions import strings as F

    a = pa.array(["banana"])
    # 'a'->'A'; 'n' has no counterpart -> deleted (functions.c:711-751)
    assert F.translate(a, "an", "A").to_pylist() == ["bAAA"]


def test_xpath_round_is_floor_plus_half():
    from turboxsl_ray.functions import strings as F

    a = pa.array([2.5, -2.5, 2.4, 2.6])
    # XPath: round(2.5)=3, round(-2.5)=-2 (floor(x+0.5))
    assert F.xpath_round(a).to_pylist() == [3.0, -2.0, 2.0, 3.0]


def test_number_boolean_coercions():
    from turboxsl_ray.functions import strings as F

    n = F.number(pa.array(["12", " 3.5 ", "abc", ""]))
    vals = n.to_pylist()
    assert vals[0] == 12.0 and vals[1] == 3.5
    assert np.isnan(vals[2]) and np.isnan(vals[3])
    b = F.boolean(pa.array(["x", "", None]))
    assert b.to_pylist() == [True, False, False]
    bn = F.boolean(pa.array([0.0, 2.5, None]))
    assert bn.to_pylist() == [False, True, False]


def test_registry_user_overrides_builtin():
    from turboxsl_ray.functions import call, register

    assert call("string-length", pa.array(["ab"])).to_pylist() == [2]
    register("string-length", lambda a: "overridden")
    try:
        assert call("string-length", pa.array(["ab"])) == "overridden"
    finally:
        from turboxsl_ray.functions.registry import _USER

        _USER.pop("string-length", None)


def test_md5_and_url_encode():
    from turboxsl_ray.functions import strings as F

    import hashlib

    assert F.md5_hex(pa.array(["abc"])).to_pylist() == [hashlib.md5(b"abc").hexdigest()]
    assert F.url_encode(pa.array(["a b/c"])).to_pylist() == ["a%20b%2Fc"]


# ---------------------------------------------------------------- dispatch

def _rule_table():
    return pa.table(
        {
            "role": pa.array(["purchase", "purchase", "error", "view"]),
            "value": pa.array([100.0, 10.0, 5.0, 1.0]),
        }
    )


def test_rule_dispatch_priority_and_default():
    import pyarrow.compute as pc

    from turboxsl_ray.stages.dispatch import RuleSet

    rs = (
        RuleSet(default_action=lambda t: np.zeros(t.num_rows))
        .add("big", lambda t: pc.and_(pc.equal(t["role"], "purchase"),
                                      pc.greater(t["value"], 60.0)),
             lambda t: pc.multiply(t["value"].combine_chunks(), 2.0), priority=10)
        .add("buy", lambda t: pc.equal(t["role"], "purchase"),
             lambda t: t["value"].combine_chunks(), priority=5)
        .add("err", lambda t: pc.equal(t["role"], "error"),
             lambda t: np.full(t.num_rows, -1.0), priority=5)
    )
    out = rs.apply(_rule_table(), out_col="rule", value_col="score")
    assert out["rule"].to_pylist() == ["big", "buy", "err", "default"]
    assert out["score"].to_pylist() == [200.0, 10.0, -1.0, 0.0]


def test_rule_dispatch_no_default_gives_null():
    import pyarrow.compute as pc

    from turboxsl_ray.stages.dispatch import RuleSet

    rs = RuleSet().add(
        "buy", lambda t: pc.equal(t["role"], "purchase"),
        lambda t: t["value"].combine_chunks(), priority=1)
    out = rs.apply(_rule_table(), value_col="score")
    assert out["score"].to_pylist() == [100.0, 10.0, None, None]


# ------------------------------------------------------- streaming window

def test_streaming_window_matches_stateless(ray_session):
    """Ring-buffer carry: tiny batch_size slices conversations across
    many batches; results must equal the block-local stateless path."""
    import ray.data

    from turboxsl_ray.sources.transcripts import synth_transcripts
    from turboxsl_ray.stages.partitioning import sort_block
    from turboxsl_ray.stages.streaming_window import StreamingWindowStage
    from turboxsl_ray.stages.window_stage import WindowSpec, make_window_fn

    spec = WindowSpec(
        lags=(("value", 1), ("value", 3), ("role", 1)),
        gap=True,
        session_gap_us=15 * 60 * 1_000_000,
        ffill_cols=("tool",),
        rolling=(("value", 5, "mean"),),
    )
    tbl = sort_block(synth_transcripts(n_convs=7, mean_turns=40, seed=21))
    expected = make_window_fn(spec, presorted=True)(tbl).to_pandas()

    ds = ray.data.from_arrow(tbl)
    got = (
        ds.map_batches(
            StreamingWindowStage,
            fn_constructor_kwargs={"spec": spec},
            batch_size=17,  # deliberately tiny: many cross-batch carries
            batch_format="pyarrow",
            concurrency=1,
        )
        .to_pandas()
        .sort_values(["conv_id", "ts", "turn_idx"], kind="stable")
        .reset_index(drop=True)
    )
    expected = expected.sort_values(
        ["conv_id", "ts", "turn_idx"], kind="stable"
    ).reset_index(drop=True)
    assert list(got.columns) == list(expected.columns)
    for c in expected.columns:
        a, b = got[c], expected[c]
        if a.dtype.kind == "f":
            np.testing.assert_allclose(a.to_numpy(), b.to_numpy(),
                                       equal_nan=True, err_msg=c)
        else:
            same = (a.astype(str) == b.astype(str)) | (a.isna() & b.isna())
            assert same.all(), f"{c}: {int(np.flatnonzero(~same)[0])}"


def test_streaming_window_rejects_leads():
    from turboxsl_ray.stages.streaming_window import StreamingWindowStage
    from turboxsl_ray.stages.window_stage import WindowSpec

    with pytest.raises(ValueError, match="anti-causal"):
        StreamingWindowStage(spec=WindowSpec(leads=(("value", 1),)))


def test_streaming_window_enforces_contiguity():
    """VERDICT r1 #6: a conversation reappearing after the actor closed
    it must raise, not silently produce wrong state-carried features."""
    import pyarrow as pa

    from turboxsl_ray.stages.streaming_window import StreamingWindowStage
    from turboxsl_ray.stages.window_stage import WindowSpec

    def batch(rows):
        return pa.table(
            {
                "conv_id": pa.array([c for c, _ in rows]),
                "ts": pa.array(
                    [t * 1_000_000 for _, t in rows], pa.timestamp("us")
                ),
                "turn_idx": pa.array([t for _, t in rows], pa.int64()),
                "value": pa.array([float(t) for _, t in rows]),
            }
        )

    spec = WindowSpec(lags=(("value", 1),))
    stage = StreamingWindowStage(spec=spec)
    stage(batch([("a", 0), ("a", 1), ("b", 0)]))  # closes "a"
    with pytest.raises(ValueError, match="contract violated"):
        stage(batch([("a", 2)]))  # "a" reappears non-contiguously

    # within-batch non-adjacent runs also violate the sort contract
    stage2 = StreamingWindowStage(spec=spec)
    with pytest.raises(ValueError, match="contract violated"):
        stage2(batch([("a", 0), ("b", 0), ("a", 1)]))

    # a clean contiguous continuation still works
    stage3 = StreamingWindowStage(spec=spec)
    stage3(batch([("a", 0), ("a", 1)]))
    out = stage3(batch([("a", 2), ("b", 0)]))
    assert out["lag_value_1"].to_pylist() == [1.0, None]


def test_rule_dispatch_null_typed_action_promotes():
    """A rule whose action emits only None (null-typed array — e.g. a
    spec rule without 'emit') must blend with typed rules instead of
    raising an incompatible-types error (review regression)."""
    import numpy as np
    import pyarrow as pa

    from turboxsl_ray.stages.dispatch import Rule, RuleSet

    tbl = pa.table({"x": pa.array([1.0, 5.0, 9.0])})
    rs = RuleSet(
        [
            Rule("f", lambda t: np.array([True, False, False]),
                 lambda t: pa.array([1.5] * t.num_rows)),
            Rule("n", lambda t: np.array([False, True, False]),
                 lambda t: pa.array([None] * t.num_rows)),
        ]
    )
    out = rs.apply(tbl, value_col="v")
    assert out["v"].to_pylist() == [1.5, None, None]
    assert out["rule"].to_pylist() == ["f", "n", "default"]
