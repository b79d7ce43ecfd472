"""Property-based tests (hypothesis): serializer/parser round-trips and
rule-compiler equivalence against a pure-Python reference evaluation.
The reference repo has no property tests (SURVEY §5.7) — these harden the
parsing surface beyond its fixture matrix."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tulflow_spark.model.xml_parse import marc_to_xml, parse_marc
from tulflow_spark.validation.rules import Rule

# XML 1.0-safe text without control chars; keep it ASCII-ish for focus
_text = st.text(
    alphabet=st.characters(
        whitelist_categories=("L", "N", "P", "Zs"), max_codepoint=0x2FF
    ),
    min_size=0,
    max_size=20,
)
_tag = st.text(alphabet="0123456789", min_size=3, max_size=3)
_code = st.sampled_from("abcdefghijklmnopqrstuvwxyz")

_subfield = st.fixed_dictionaries({"code": _code, "value": _text})
_controlfield = st.fixed_dictionaries({"tag": _tag, "value": _text})
_datafield = st.fixed_dictionaries(
    {
        "tag": _tag,
        "ind1": st.sampled_from([" ", "0", "1"]),
        "ind2": st.sampled_from([" ", "0", "1"]),
        "subfields": st.lists(_subfield, max_size=4),
    }
)
_marc = st.fixed_dictionaries(
    {
        "leader": _text,
        "controlfields": st.lists(_controlfield, max_size=5),
        "datafields": st.lists(_datafield, max_size=4),
    }
)


def _norm(value):
    """ElementTree stores empty text as None; '' and None round-trip the
    same, so compare under that equivalence."""
    if isinstance(value, dict):
        return {k: _norm(v) for k, v in value.items()}
    if isinstance(value, list):
        return [_norm(v) for v in value]
    return None if value == "" else value


@given(_marc)
@settings(max_examples=200, deadline=None)
def test_marc_serialize_parse_roundtrip(marc):
    assert _norm(parse_marc(marc_to_xml(marc))) == _norm(marc)


# --- rule compiler vs pure-Python reference --------------------------------

_fields = st.dictionaries(
    st.sampled_from(["dcterms:title", "dcterms:rights", "edm:isShownAt"]),
    st.lists(st.sampled_from(["", "  ", "x", "http://a", "ftp://b", " http "]),
             max_size=3),
    max_size=3,
)

RULES = [
    Rule("R1", "required", "dcterms:title", "no title"),
    Rule("R2", "required", "dcterms:rights", "no rights",
         alt_field="edm:isShownAt"),
    Rule("T1", "non_empty", "dcterms:title", "empty title"),
    Rule("U1", "starts_with", "edm:isShownAt", "bad url", arg="http"),
]


def _py_violations(fields: dict[str, list[str]]) -> list[str]:
    """Pure-Python oracle for the rule semantics."""
    import re

    def norm(s):
        return re.sub(r"\s+", " ", s).strip()

    out = []
    for r in RULES:
        vals = fields.get(r.field, [])
        if r.kind == "required":
            ok = bool(vals) or (r.alt_field and fields.get(r.alt_field))
        elif r.kind == "non_empty":
            ok = all(norm(v) != "" for v in vals)
        else:  # starts_with
            ok = all(norm(v).startswith(r.arg) for v in vals)
        if not ok:
            out.append(r.message)
    return out


@given(st.lists(_fields, min_size=1, max_size=8))
@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_rule_compiler_matches_python_reference(spark, batches):
    import pyspark.sql.functions as F

    from tulflow_spark.validation.rules import violations_column

    df = spark.createDataFrame(
        [(i, fields) for i, fields in enumerate(batches)],
        "i int, fields map<string,array<string>>",
    )
    got = {
        r.i: list(r.v)
        for r in df.select(
            "i", violations_column(RULES, F.col("fields")).alias("v")
        ).collect()
    }
    want = {i: _py_violations(fields) for i, fields in enumerate(batches)}
    assert got == want
