"""Declarative spec → processor compile phase (the XSLTNewProcessor
analog, ref transform.c:507-557): include-merge, validation, rule
compilation, and a spec-driven flagship run byte-identical to the
code-configured one."""

from __future__ import annotations

import json

import pandas as pd
import pyarrow as pa
import pytest

from turboxsl_ray.engine import EngineConfig
from turboxsl_ray.spec import (
    SpecError,
    compile_engine_config,
    compile_rules,
    compile_window_spec,
    load_spec,
)

SPEC = {
    "version": 1,
    "engine": {
        "num_partitions": 8,
        "session_gap_minutes": 15,
        "salt_threshold_rows": 100,
    },
    "features": {
        "lags": [["value", 1], ["value", 2], ["role", 1]],
        "leads": [["value", 1]],
        "rolling": [["value", 10, "mean"]],
        "ffill": ["tool"],
    },
}


def test_compile_engine_config():
    cfg = compile_engine_config(SPEC)
    assert cfg == EngineConfig(
        num_partitions=8, session_gap_minutes=15, salt_threshold_rows=100,
        lags=(("value", 1), ("value", 2), ("role", 1)),
        leads=(("value", 1),), rolling=(("value", 10, "mean"),),
        ffill_cols=("tool",),
    )
    ws = compile_window_spec(SPEC)
    assert ws.session_gap_us == 15 * 60 * 1_000_000
    assert ws.lags == (("value", 1), ("value", 2), ("role", 1))


def test_spec_validation_errors():
    with pytest.raises(SpecError, match="unknown spec sections"):
        load_spec({"enginee": {}})
    with pytest.raises(SpecError, match="unknown engine keys"):
        compile_engine_config({"engine": {"num_parts": 3}})
    with pytest.raises(SpecError, match="bad rolling"):
        compile_engine_config({"features": {"rolling": [["value", 3, "median"]]}})
    with pytest.raises(SpecError, match="unknown predicate op"):
        compile_rules({"rules": {"entries": [
            {"name": "x", "when": {"col": "a", "op": "~", "value": 1}}
        ]}})


def test_include_merge(tmp_path):
    base = {"engine": {"num_partitions": 4, "salt_threshold_rows": 50}}
    (tmp_path / "base.json").write_text(json.dumps(base))
    child = {
        "include": ["base.json"],
        "engine": {"num_partitions": 16},  # later wins, threshold kept
    }
    path = tmp_path / "child.json"
    path.write_text(json.dumps(child))
    cfg = compile_engine_config(load_spec(str(path)))
    assert cfg.num_partitions == 16
    assert cfg.salt_threshold_rows == 50


def test_compiled_rules_match_handwritten():
    spec = {
        "rules": {
            "default": "default",
            "default_emit": {"const": 0.0},
            "entries": [
                {"name": "big_purchase", "priority": 2,
                 "when": {"all": [
                     {"col": "role", "op": "==", "value": "purchase"},
                     {"col": "value", "op": ">", "value": 60},
                 ]},
                 "emit": {"scale": ["value", 2.0]}},
                {"name": "purchase", "priority": 1,
                 "when": {"col": "role", "op": "==", "value": "purchase"},
                 "emit": {"col": "value"}},
                {"name": "error",
                 "when": {"col": "role", "op": "==", "value": "error"},
                 "emit": {"const": -1.0}},
            ],
        }
    }
    rs = compile_rules(spec)
    tbl = pa.table({
        "role": ["purchase", "purchase", "error", "other"],
        "value": [100.0, 10.0, 5.0, 7.0],
    })
    out = rs.apply(tbl, value_col="score")
    assert out["rule"].to_pylist() == [
        "big_purchase", "purchase", "error", "default"]
    assert out["score"].to_pylist() == [200.0, 10.0, -1.0, 0.0]


def test_rule_modes_registry():
    """xsl:apply-templates mode= analog: one compiled rule table per
    named pass, selected at apply time."""
    from turboxsl_ray.spec import compile_rule_modes

    spec = {
        "rules": {
            "modes": {
                "score": {
                    "entries": [
                        {"name": "hot", "when": {"col": "v", "op": ">", "value": 5},
                         "emit": {"const": 1.0}},
                    ],
                    "default_emit": {"const": 0.0},
                },
                "label": {
                    "entries": [
                        {"name": "neg", "when": {"col": "v", "op": "<", "value": 0},
                         "emit": {"const": "neg"}},
                    ],
                    "default_emit": {"const": "pos"},
                },
            }
        }
    }
    reg = compile_rule_modes(spec)
    tbl = pa.table({"v": [10.0, -3.0, 2.0]})
    s = reg.apply(tbl, mode="score", value_col="out")
    assert s["out"].to_pylist() == [1.0, 0.0, 0.0]
    l = reg.apply(tbl, mode="label", value_col="out")
    assert l["out"].to_pylist() == ["pos", "neg", "pos"]
    with pytest.raises(KeyError, match="no rule set for mode"):
        reg.apply(tbl, mode="nope")


def test_stage_registry():
    """instruction_add analog: named stage factories, user shadows
    builtin."""
    from turboxsl_ray.stages.stage_registry import (
        available_stages,
        make_stage,
        register_stage,
    )
    from turboxsl_ray.stages.streaming_window import StreamingWindowStage
    from turboxsl_ray.stages.window_stage import WindowSpec

    assert {"streaming_window", "cached_lookup", "window"} <= set(available_stages())
    st = make_stage("streaming_window", spec=WindowSpec(lags=(("value", 1),)))
    assert isinstance(st, StreamingWindowStage)
    fn = make_stage("window", lags=(("value", 1),))
    out = fn(pa.table({
        "conv_id": ["a", "a"],
        "ts": pa.array([1, 2], pa.timestamp("us")),
        "turn_idx": pa.array([0, 1], pa.int64()),
        "value": [1.0, 2.0],
    }))
    assert out["lag_value_1"].to_pylist() == [None, 1.0]
    register_stage("window", lambda **kw: "shadowed")
    try:
        assert make_stage("window") == "shadowed"
    finally:
        from turboxsl_ray.stages import stage_registry as SR

        SR._USER.pop("window", None)
    with pytest.raises(KeyError, match="no stage registered"):
        make_stage("definitely_missing")


def test_check_rights_function():
    from turboxsl_ray.functions.registry import call
    from turboxsl_ray.functions.rights import build_rights, check_rights

    ref = build_rights([5, 2, 9, 2])
    out = check_rights(pa.array([1, 2, 5, 9, 10], pa.int64()), ref)
    assert out.to_pylist() == [False, True, True, True, False]
    # registered under the reference's namespaced name
    out2 = call("chk:check_rights", pa.array([2, 3], pa.int64()), ref)
    assert out2.to_pylist() == [True, False]


def test_spec_driven_flagship_identical(ray_session, tmp_path):
    """A spec-file run must be byte-identical to the code-configured
    run (the processor-compile contract)."""
    import glob

    import pyarrow.parquet as pq
    import ray.data as rd

    from turboxsl_ray.engine import Engine
    from turboxsl_ray.sources.transcripts import synth_asof_side, synth_transcripts

    left = synth_transcripts(n_convs=30, mean_turns=12, seed=71)
    right = synth_asof_side(left, seed=72, rows_per_conv=4)

    spec_path = tmp_path / "spec.json"
    spec_path.write_text(json.dumps(SPEC))

    def run(cfg, out):
        Engine(cfg).run(rd.from_arrow(left), rd.from_arrow(right), str(out))
        files = sorted(glob.glob(str(out / "part=*.parquet")))
        df = pd.concat([pq.read_table(f).to_pandas() for f in files])
        return df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)

    cfg_spec = compile_engine_config(load_spec(str(spec_path)))
    cfg_code = EngineConfig(
        num_partitions=8, session_gap_minutes=15, salt_threshold_rows=100,
        lags=(("value", 1), ("value", 2), ("role", 1)),
        leads=(("value", 1),), rolling=(("value", 10, "mean"),),
        ffill_cols=("tool",),
    )
    a = run(cfg_spec, tmp_path / "a")
    b = run(cfg_code, tmp_path / "b")
    pd.testing.assert_frame_equal(a, b)
