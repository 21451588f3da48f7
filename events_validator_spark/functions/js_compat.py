"""JS-semantics compatibility shims as pure Column expressions.

The reference engine runs in Node.js, so its observable outputs (violation rows)
carry JS coercion artifacts: ``typeof null === 'object'``, ``String(1.0) === '1'``,
``[1,null,2].toString() === '1,,2'``, unanchored ``RegExp.test``. These helpers
reproduce those artifacts with built-in Spark SQL functions only (JVM-side,
whole-stage-codegen friendly) — no Python UDFs.

Reference: /root/reference/validator_src/helpers/validationHelpers.js:7,17,108,124
and loggingHelpers.js:13-14.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Static (compile-time) typeof for typed columns
# ---------------------------------------------------------------------------

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def static_js_actual(dtype: T.DataType) -> str:
    """``Array.isArray(v) ? 'array' : typeof v`` for a statically-typed column."""
    if isinstance(dtype, T.ArrayType):
        return "array"
    return static_js_typeof(dtype)


def static_js_typeof(dtype: T.DataType) -> str:
    """Plain JS ``typeof`` for a statically-typed (non-null) column value."""
    if isinstance(dtype, T.StringType):
        return "string"
    if isinstance(dtype, T.BooleanType):
        return "boolean"
    if isinstance(dtype, _NUMERIC):
        return "number"
    # arrays, structs, maps, binary, timestamps… — JSON-side these are objects
    return "object"


# ---------------------------------------------------------------------------
# JS toString for typed columns
# ---------------------------------------------------------------------------

def js_number_to_string(col: Column) -> Column:
    """JS ``String(number)``: integral doubles drop the decimal (1.0 → '1')."""
    d = col.cast("double")
    return (
        F.when(d.isNull(), F.lit(None).cast("string"))
        .when((d == F.floor(d)) & (F.abs(d) < F.lit(1e16)),
              d.cast("long").cast("string"))
        .otherwise(d.cast("string"))
    )


def js_to_string(col: Column, dtype: T.DataType, depth: int = 2) -> Column:
    """JS ``v?.toString()`` for a typed column (null → NULL, matching ``?.``)."""
    if isinstance(dtype, T.StringType):
        return col
    if isinstance(dtype, T.BooleanType):
        return F.when(col.isNull(), F.lit(None).cast("string")).otherwise(
            F.when(col, "true").otherwise("false"))
    if isinstance(dtype, _NUMERIC):
        if isinstance(dtype, (T.FloatType, T.DoubleType, T.DecimalType)):
            return js_number_to_string(col)
        return col.cast("string")
    if isinstance(dtype, T.ArrayType):
        if depth <= 0:
            return F.lit("")  # pathological nesting — JS would keep flattening
        elem = dtype.elementType
        # JS Array.prototype.toString: elements joined by ',', null/undefined → ''
        return F.when(col.isNull(), F.lit(None).cast("string")).otherwise(
            F.array_join(
                F.transform(col, lambda x: F.coalesce(
                    js_to_string(x, elem, depth - 1), F.lit(""))),
                ","))
    if isinstance(dtype, (T.StructType, T.MapType)):
        return F.when(col.isNull(), F.lit(None).cast("string")).otherwise(
            F.lit("[object Object]"))
    return col.cast("string")


def py_js_to_string(v: object) -> str | None:
    """Driver-side JS toString for rule-spec literals (expected values)."""
    if v is None:
        return None
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return str(int(v)) if v == int(v) and abs(v) < 1e21 else repr(v)
    if isinstance(v, list):
        return ",".join(
            "" if x is None else (py_js_to_string(x) or "") for x in v)
    if isinstance(v, dict):
        return "[object Object]"
    return str(v)


# ---------------------------------------------------------------------------
# Regex dialect
# ---------------------------------------------------------------------------

def js_regex_to_java(pattern: str) -> str:
    """Translate a JS RegExp source string to Java regex for ``rlike``.

    The common grammar (char classes, anchors, quantifiers, groups, ``\\d \\w \\s``)
    is identical between the dialects. ``rlike`` is already an unanchored *search*,
    matching ``RegExp.test`` (validationHelpers.js:124). The one translation we do:
    JS allows a literal ``/`` escaped as ``\\/``; Java treats ``\\/`` as an error in
    some contexts — unescape it.

    Accepted subset (validated by :func:`validate_java_regex` at rule-compile
    time): everything legal in BOTH dialects. Known JS-only constructs that are
    rejected rather than mistranslated: dangling ``{`` / lone ``]`` literals,
    class range escapes like ``[a-\\d]``, ``\\cX`` control escapes beyond
    [a-zA-Z], and ES2018 ``(?<name>…)`` uses the identical Java syntax so it
    passes through.
    """
    return pattern.replace("\\/", "/")


def validate_java_regex(pattern: str) -> str | None:
    """Driver-side compile check for a translated pattern; None when OK.

    Uses the real ``java.util.regex`` via the active session's JVM when
    available (exactly what ``rlike`` will run), falling back to Python's
    ``re`` (a close dialect) when no JVM is up.
    """
    try:
        from pyspark.sql import SparkSession
        s = SparkSession.getActiveSession()
        jvm = getattr(s, "_jvm", None) if s is not None else None
        if jvm is not None:
            try:
                jvm.java.util.regex.Pattern.compile(pattern)
                return None
            except Exception as e:  # py4j wraps PatternSyntaxException
                return str(e).splitlines()[0][:200]
    except Exception:
        pass
    import re
    try:
        re.compile(pattern)
        return None
    except re.error as e:
        return str(e)
