"""Exact JS Number::toString fidelity over the FULL double range — the
Column implementation (js_number_to_string), the pure-Python mirror
(py_js_number_repr), and hand-pinned ECMAScript outputs must all agree.
Boundary semantics: decimal notation for -6 < k+1 <= 21, scientific with
'e+'/'e-' outside; NaN/Infinity; -0 prints '0'.
"""

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from events_validator_spark.functions.js_compat import (
    js_number_to_string, py_js_number_repr,
)

# (input double, String(input) as printed by ECMAScript)
JS_PINNED = [
    (1e21, "1e+21"),
    (1.5e21, "1.5e+21"),
    (2.5e22, "2.5e+22"),          # Java 17 Double.toString is NON-shortest here
    (1e20, "100000000000000000000"),
    (1.1e20, "110000000000000000000"),
    (1.2345678901234568e20, "123456789012345680000"),
    (1e16, "10000000000000000"),
    (12345678.5, "12345678.5"),
    (123.456, "123.456"),
    (0.5, "0.5"),
    (1e-6, "0.000001"),
    (0.00012345, "0.00012345"),
    (1e-7, "1e-7"),
    (1.2e-7, "1.2e-7"),
    (5e-324, "5e-324"),
    (1.7976931348623157e308, "1.7976931348623157e+308"),
    (-1e21, "-1e+21"),
    (-42.0, "-42"),
    (0.0, "0"),
    (-0.0, "0"),
    (float("nan"), "NaN"),
    (float("inf"), "Infinity"),
    (float("-inf"), "-Infinity"),
]


def test_python_mirror_matches_pinned_js():
    for v, want in JS_PINNED:
        assert py_js_number_repr(v) == want, v


def test_column_impl_matches_pinned_js(spark):
    df = spark.createDataFrame([(i, v) for i, (v, _) in enumerate(JS_PINNED)],
                               "i int, d double")
    got = {r["i"]: r["s"]
           for r in df.select("i", js_number_to_string(F.col("d"))
                              .alias("s")).collect()}
    for i, (v, want) in enumerate(JS_PINNED):
        assert got[i] == want, v


@settings(max_examples=300, deadline=None, derandomize=True)
@given(st.floats(allow_nan=False, allow_infinity=False))
def _collect_floats(acc, v):
    acc.append(v)


def test_column_impl_matches_python_mirror_full_range(spark):
    vals: list[float] = []
    _collect_floats(vals)
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)],
                               "i int, d double")
    got = {r["i"]: r["s"]
           for r in df.select("i", js_number_to_string(F.col("d"))
                              .alias("s")).collect()}
    for i, v in enumerate(vals):
        assert got[i] == py_js_number_repr(v), repr(v)


def test_sql_text_formatter_matches_tree(spark):
    """The SQL-text twin (js_number_to_string_sql, the textual staging
    path) must agree with the Column tree on specials + a deterministic
    bit-pattern double corpus."""
    import random
    import struct
    from events_validator_spark.functions.js_compat import js_number_to_string_sql
    random.seed(20240817)
    vals = [0.0, -0.0, 1.5, 0.1, 1e16, 1e16 - 2, 1e21, 2.5e22, 1e-6, 1e-7,
            5e-324, 1.7976931348623157e308, 123456789012345678.0,
            float("inf"), float("-inf"), float("nan"), None]
    vals += [struct.unpack("<d", struct.pack("<Q", random.getrandbits(64)))[0]
             for _ in range(2000)]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    bad = (df.select(F.expr(js_number_to_string_sql("x")).alias("u"),
                     js_number_to_string(F.col("x")).alias("t"))
           .where("NOT (u <=> t)"))
    assert bad.count() == 0


def test_sql_text_variant_tostring_matches_tree(spark):
    """The textual variant toString (validation_sql.variant_to_string_sql)
    must agree with the Column tree across every variant shape, including
    nested arrays at the depth limit."""
    from events_validator_spark.operators.validation import _variant_to_string
    from events_validator_spark.operators.validation_sql import variant_to_string_sql
    payloads = ['1.5', '"s"', '[1,2.25,"a",[3,[4,5],"x"],true]', 'null',
                'true', 'false', '{"a":1}', '1e300', '0.1', '[[[1]]]', '[]',
                '-2.5e-8', '""', '[null,1]', '9007199254740993']
    df = spark.createDataFrame([('{"k":' + s + '}',) for s in payloads],
                               "props string")
    v = F.try_variant_get(F.try_parse_json(F.col("props")), '$["k"]', "variant")
    txt = variant_to_string_sql(
        "try_variant_get(try_parse_json(`props`), '$[\"k\"]', 'variant')")
    bad = (df.select(F.expr(txt).alias("u"),
                     _variant_to_string(v).alias("t"))
           .where("NOT (u <=> t)"))
    assert bad.count() == 0
