"""ext/onnx_mini.py: dependency-free ONNX load + execute.

Golden strategy: the wire-format reader is pinned against HAND-PACKED
protobuf bytes (independent of the module's own writer), the writer is
round-tripped through the reader, and the executed scores are pinned
bit-for-bit against ext/numeric_scorer's proven engine-exact forward
pass and against DuckDB evaluating the SQL mirror."""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
import pytest

from tulflow_spark.ext.onnx_mini import (
    Model,
    Node,
    OnnxError,
    OnnxScorer,
    build_logistic_onnx,
    build_mlp_onnx,
    mlp_score_sql_expr,
    parse_model,
    run_model,
)


# ---------------------------------------------------------------------------
# wire format (hand-packed bytes, not the module's writer)
# ---------------------------------------------------------------------------


def _vint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def test_parse_model_hand_packed():
    """A ModelProto hand-assembled byte by byte: one Identity node, one
    double initializer, graph input/output names."""
    w = np.asarray([1.5, -2.0], dtype="<f8")
    tensor = (
        _vint(1 << 3) + _vint(2)                    # dims: 2
        + _vint(2 << 3) + _vint(11)                 # data_type DOUBLE
        + _vint((8 << 3) | 2) + _vint(1) + b"W"     # name
        + _vint((9 << 3) | 2) + _vint(16) + w.tobytes()  # raw_data
    )
    node = (
        _vint((1 << 3) | 2) + _vint(1) + b"x"       # input
        + _vint((2 << 3) | 2) + _vint(1) + b"y"     # output
        + _vint((4 << 3) | 2) + _vint(8) + b"Identity"
    )
    vi = lambda name: _vint((1 << 3) | 2) + _vint(len(name)) + name  # noqa: E731
    graph = (
        _vint((1 << 3) | 2) + _vint(len(node)) + node
        + _vint((5 << 3) | 2) + _vint(len(tensor)) + tensor
        + _vint((11 << 3) | 2) + _vint(len(vi(b"x"))) + vi(b"x")
        + _vint((12 << 3) | 2) + _vint(len(vi(b"y"))) + vi(b"y")
    )
    model_bytes = _vint(1 << 3) + _vint(8) \
        + _vint((7 << 3) | 2) + _vint(len(graph)) + graph
    m = parse_model(model_bytes)
    assert [n.op_type for n in m.nodes] == ["Identity"]
    assert m.inputs == ["x"] and m.outputs == ["y"]
    assert np.array_equal(m.initializers["W"], np.asarray([1.5, -2.0]))
    out = run_model(m, {"x": np.asarray([3.0])})
    assert out["y"].tolist() == [3.0]


def test_typed_errors():
    with pytest.raises(OnnxError, match="field 7 missing"):
        parse_model(b"")
    with pytest.raises(OnnxError, match="truncated varint"):
        parse_model(b"\xff")
    # unsupported op in the registry
    m = Model([Node("Conv", ["x"], ["y"])], {}, ["x"], ["y"])
    with pytest.raises(OnnxError, match="op 'Conv' not in the executor"):
        run_model(m, {"x": np.zeros((1, 1))})
    # dangling input
    m = Model([Node("Relu", ["nope"], ["y"])], {}, [], ["y"])
    with pytest.raises(OnnxError, match="not produced/fed"):
        run_model(m, {})
    # missing output
    m = Model([], {}, [], ["y"])
    with pytest.raises(OnnxError, match="never produced"):
        run_model(m, {})


def test_byte_flip_fuzz_typed_or_clean():
    """Every single-byte corruption of a real model parses+runs cleanly
    or fails with a typed OnnxError — never an anonymous exception or a
    hang (numpy broadcast errors etc. must be caught at the boundary)."""
    stream = bytearray(build_mlp_onnx())
    x = np.asarray([[1.0, 2.0, 2.0, 0.5]])
    for pos in range(len(stream)):
        mutated = bytearray(stream)
        mutated[pos] ^= 0xFF
        try:
            m = parse_model(bytes(mutated))
            run_model(m, {"x": x})
        except OnnxError:
            pass
        except Exception as exc:  # noqa: BLE001 — the assertion itself
            pytest.fail(f"byte {pos}: non-typed {type(exc).__name__}: {exc}")


# ---------------------------------------------------------------------------
# executor semantics
# ---------------------------------------------------------------------------


def test_gemm_seeds_bias_first():
    """Gemm must accumulate ((((c + t0) + t1) + t2) ...) — the SQL
    mirror's order — not bias-after-sum.  Values chosen so the two
    orders differ in the last ulp."""
    a = np.asarray([[1.0, 1.0]])
    b = np.asarray([[0.2], [0.3]])
    c = np.asarray([0.1])
    m = Model(
        [Node("Gemm", ["a", "b", "c"], ["y"],
              {"alpha": 1.0, "beta": 1.0})],
        {"b": b, "c": c}, ["a"], ["y"],
    )
    got = run_model(m, {"a": a})["y"][0, 0]
    want = (0.1 + 0.2) + 0.3       # 0.6000000000000001
    other = 0.1 + (0.2 + 0.3)      # 0.6
    assert got == want
    assert got != other  # the orders genuinely differ on this input


def test_op_registry_small_graph():
    m = Model(
        [
            Node("Neg", ["x"], ["nx"]),
            Node("Relu", ["nx"], ["r"]),
            Node("Sub", ["x", "r"], ["s"]),
            Node("Tanh", ["s"], ["t"]),
            Node("Clip", ["t", "lo", "hi"], ["y"]),
        ],
        {"lo": np.asarray(-0.5), "hi": np.asarray(0.5)},
        ["x"], ["y"],
    )
    x = np.asarray([-2.0, 0.0, 3.0])
    got = run_model(m, {"x": x})["y"]
    want = np.clip(np.tanh(x - np.maximum(-x, 0.0)), -0.5, 0.5)
    assert np.allclose(got, want)


# ---------------------------------------------------------------------------
# bit parity: ONNX execution == NumericScorer == DuckDB SQL
# ---------------------------------------------------------------------------

_Q = pd.Series(["alpha beta gamma", "delta epsilon", "alpha alpha beta",
                "", "x y z w v u t s", "one two three four five six"])
_D = pd.Series(["alpha beta", "zeta eta theta iota", "beta gamma delta",
                "alpha", "x y", "one two"])


def test_logistic_onnx_matches_numeric_scorer_bitwise():
    from tulflow_spark.ext.numeric_scorer import NumericScorer

    sc = OnnxScorer(parse_model(build_logistic_onnx(
        NumericScorer().weights, NumericScorer().bias)))
    assert sc(_Q, _D) == NumericScorer()(_Q, _D)


def test_mlp_onnx_matches_duckdb_sql_bitwise():
    import duckdb

    sc = OnnxScorer(parse_model(build_mlp_onnx()))
    got = sc(_Q, _D)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join(f"('{a}', '{b}')" for a, b in zip(_Q, _D))
        + ") v(qt, dt)"
    )
    sql = f"""
    WITH toked AS (
      SELECT CASE WHEN trim(qt) = '' THEN CAST([] AS VARCHAR[])
                  ELSE list_distinct(string_split_regex(trim(qt), '\\s+'))
             END AS tq,
             CASE WHEN trim(dt) = '' THEN CAST([] AS VARCHAR[])
                  ELSE list_distinct(string_split_regex(trim(dt), '\\s+'))
             END AS td
      FROM t)
    SELECT {mlp_score_sql_expr("tq", "td")} AS score FROM toked
    """
    exp = [r[0] for r in con.execute(sql).fetchall()]
    assert got == exp


def test_writer_reader_roundtrip_tensors():
    m = parse_model(build_mlp_onnx())
    assert m.initializers["W1"].shape == (4, 3)
    assert m.initializers["W2"].shape == (3, 1)
    assert m.initializers["B1"].tolist() == [-0.3, 0.1, -0.05]
    assert float(m.initializers["c1e9"]) == 1e9
    ops = [n.op_type for n in m.nodes]
    assert ops.count("Gemm") == 2 and ops.count("Sigmoid") == 1
    g = next(n for n in m.nodes if n.op_type == "Gemm")
    assert g.attrs["alpha"] == 1.0 and g.attrs["beta"] == 1.0


def test_load_onnx_scorer_from_path(tmp_path):
    p = tmp_path / "m.onnx"
    p.write_bytes(build_mlp_onnx())
    from tulflow_spark.ext.onnx_mini import load_onnx_scorer

    sc = load_onnx_scorer(str(p))
    direct = OnnxScorer(parse_model(build_mlp_onnx()))
    assert sc(_Q, _D) == direct(_Q, _D)


def test_negative_int_attribute_roundtrips():
    """r8 review: protobuf encodes negative int64 as 10-byte two's
    complement — the writer must terminate and the reader must decode
    the sign (the naive varint loop hung forever)."""
    from tulflow_spark.ext.onnx_mini import _n_node, _parse_attr, _fields

    node_bytes = _n_node("Gemm", ["a"], ["y"], {"transA": -1})
    attrs = [v for f, _w, v in _fields(node_bytes) if f == 5]
    assert len(attrs) == 1
    name, val = _parse_attr(attrs[0])
    assert (name, val) == ("transA", -1)


def test_extended_op_registry():
    """Exp/Log/Sqrt/Softmax/ReduceSum/Concat/Flatten — the remaining ops
    small exported MLP scorers commonly carry."""
    x = np.asarray([[1.0, 2.0], [3.0, 4.0]])
    m = Model(
        [
            Node("Exp", ["x"], ["e"]),
            Node("Log", ["e"], ["l"]),              # == x
            Node("Sqrt", ["l"], ["sq"]),
            Node("Softmax", ["sq"], ["sm"], {"axis": -1}),
            Node("Concat", ["sm", "sm"], ["cc"], {"axis": 1}),
            Node("ReduceSum", ["cc"], ["rs"], {"keepdims": 1}),
            Node("Flatten", ["rs"], ["y"], {"axis": 1}),
        ],
        {}, ["x"], ["y"],
    )
    out = run_model(m, {"x": x})["y"]
    # softmax rows sum to 1; duplicated and fully reduced -> 2 per row,
    # 4 total... keepdims+no-axes reduces ALL dims to (1,1)
    assert out.shape == (1, 1)
    assert out[0, 0] == pytest.approx(4.0)
    # ReduceSum with axes as an opset-13 input tensor
    m2 = Model(
        [Node("ReduceSum", ["x", "ax"], ["y"], {"keepdims": 0})],
        {"ax": np.asarray([1])}, ["x"], ["y"],
    )
    got = run_model(m2, {"x": x})["y"]
    assert np.allclose(got, [3.0, 7.0])
