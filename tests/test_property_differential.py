"""Property-based differential test: hypothesis-generated events and RULE SPECS
must validate identically under the Spark compiler and the pure-Python oracle.

Events are generated in one batch and validated in ONE Spark job (per-example
Spark jobs would be pathologically slow), so hypothesis drives diversity while
Spark cost stays constant.
"""

import json

from hypothesis import given, settings, strategies as st

from events_validator_spark.js_oracle import check_with_schema
from events_validator_spark.operators.validation import validate_json

FIELDS = ["alpha", "beta", "gamma", "delta", ""]

# float range where JS, Java (Spark cast), and Python repr all print plain
# decimal with shortest-unique digits — number-toString fidelity outside
# [1e-3, 1e16) is a documented limitation (Java goes scientific earlier)
scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-1_000_000, max_value=1_000_000),
    st.floats(allow_nan=False, allow_infinity=False,
              min_value=-1e6, max_value=1e6)
    .filter(lambda v: v == 0 or abs(v) >= 1e-3),
    st.text(alphabet="ab c_1.ü", max_size=8),
)

values = st.recursive(
    scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(st.sampled_from(FIELDS), children, max_size=4)),
    max_leaves=10)

events = st.dictionaries(st.sampled_from(FIELDS), values, max_size=5)


def rule_strategy(depth=0):
    base = {
        "type": st.sampled_from(["string", "number", "boolean", "array",
                                 "object", "weird"]),
        "optional": st.booleans(),
        "required": st.booleans(),
        "value": scalars,
        "length": st.integers(min_value=0, max_value=5),
        "regex": st.sampled_from(["^a", "b+c", "[0-9]{2}", "^$", "\\d"]),
        "enum": st.lists(scalars, min_size=1, max_size=3),
    }
    opt = {k: st.one_of(st.none(), v) for k, v in base.items()}
    d = st.fixed_dictionaries({}, optional=opt).map(
        lambda r: {k: v for k, v in r.items() if v is not None})
    if depth < 1:
        def add_nested(r):
            return r
        nested = st.dictionaries(st.sampled_from(FIELDS), rule_strategy(depth + 1),
                                 max_size=2)
        d = st.tuples(d, st.one_of(st.none(), nested)).map(
            lambda t: {**t[0], **({"nestedSchema": t[1]} if t[1] else {})})
    return d


rules_strategy = st.dictionaries(
    st.sampled_from(FIELDS + ["version"]), rule_strategy(), max_size=4)


@settings(max_examples=60, deadline=None, derandomize=True)
@given(st.lists(st.tuples(events, rules_strategy), min_size=1, max_size=6))
def _collect_cases(acc, cases):
    acc.extend(cases)


def test_hypothesis_differential(spark):
    cases: list[tuple[dict, dict]] = []
    _collect_cases(cases)  # hypothesis fills this deterministically
    assert len(cases) > 100

    # group cases by rule spec (compile once per spec, one job per spec batch)
    by_rules: dict[str, tuple[dict, list[tuple[int, dict]]]] = {}
    for i, (ev, rules) in enumerate(cases):
        key = json.dumps(rules, sort_keys=True)
        by_rules.setdefault(key, (rules, []))[1].append((i, ev))

    n_checked = 0
    for rules, evs in by_rules.values():
        df = spark.createDataFrame(
            [(i, json.dumps(ev)) for i, ev in evs], ["i", "props"])
        got = {r["i"]: [tuple(x) for x in r["violations"]]
               for r in validate_json(df, rules, "props").collect()}
        for i, ev in evs:
            expected = check_with_schema(rules, ev)
            assert got[i] == expected, (
                f"MISMATCH\nrules: {rules!r}\nevent: {ev!r}\n"
                f"spark: {got[i]!r}\noracle: {expected!r}")
            n_checked += 1
    assert n_checked == len(cases)
