"""Rule-metadata operators: the reference's repo/schemas relational structure.

Maps SURVEY.md §2.3 J2/J3:

* J2 ``find_impacted_schemas`` — the parameter repository's reverse index
  (param → usedInSchemas, streamlit_ev/app/helpers/updater.py:85-93) as an
  exploded DataFrame + equi-join.
* J3 schema health check — per-param field-wise comparison of a schema against
  the repository (updater.py:151-217) as a join with ``F.when`` diff columns.
  Reference parity: params absent from the repo are SKIPPED (updater.py:
  164-165), 'Any'/'' pinned values normalise to null, numeric values compare
  float-tolerantly (0.0 == 0, F9), and array nestedSchema drift compares the
  key set + per-key type/description via a canonical signature column.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession, functions as F

_VALUE_SENTINELS = ("Any", "")


def _canon_value(spec: dict) -> str | None:
    v = spec.get("value")
    if v is None or v in _VALUE_SENTINELS:
        return None
    return str(v)


def _nested_sig(spec: dict) -> str | None:
    """Canonical signature of an array rule's nestedSchema: sorted
    {key: [type, description]} — exactly the fields updater.py:198-212
    compares (value drift inside nested is NOT part of the reference check)."""
    nested = spec.get("nestedSchema")
    if not isinstance(nested, dict):
        return None
    return json.dumps(
        {k: [p.get("type", ""), p.get("description", "")]
         for k, p in sorted(nested.items())},
        sort_keys=True)


def params_table(spark: SparkSession, repo: dict) -> DataFrame:
    """repo.json → (param, type, description, value, nested_sig, used_in).

    The repo side is passed through the export-format construction
    (schema_sync.construct_schema_definition) first — the reference compares
    a schema against the CONSTRUCTED definition, not the raw repo entry."""
    from events_validator_spark.operators.schema_sync import (
        construct_schema_definition,
    )
    rows = []
    for name, spec in repo.items():
        built = construct_schema_definition(spec)
        rows.append((
            name,
            str(built.get("type")) if built.get("type") is not None else None,
            built.get("description", ""),
            _canon_value(built),
            _nested_sig(built),
            list(spec.get("usedInSchemas", []))))
    return spark.createDataFrame(
        rows, "param string, type string, description string, value string, "
              "nested_sig string, used_in array<string>")


def schemas_table(spark: SparkSession, rules_by_name: dict[str, dict]) -> DataFrame:
    """All rule specs flattened →
    (event_name, param, type, description, value, nested_sig)."""
    rows = []
    for event_name, rules in rules_by_name.items():
        for param, rule in rules.items():
            if param in ("version", "event_name") or not isinstance(rule, dict):
                continue
            rows.append((
                event_name, param,
                str(rule.get("type")) if rule.get("type") is not None else None,
                rule.get("description", ""),
                _canon_value(rule),
                _nested_sig(rule)))
    return spark.createDataFrame(
        rows, "event_name string, param string, type string, "
              "description string, value string, nested_sig string")


def impacted_schemas(params: DataFrame, param_name: str) -> DataFrame:
    """J2: schemas using a param, from the reverse index."""
    return (params.where(F.col("param") == param_name)
            .select(F.explode("used_in").alias("event_name"))
            .distinct().orderBy("event_name"))


def impacted_schemas_full(params: DataFrame,
                          schemas: DataFrame) -> DataFrame:
    """J2 as a real join: (param, event_name) pairs where the schema actually
    declares the param — the ground truth the reverse index caches."""
    return (schemas.select("param", "event_name")
            .join(params.select("param"), "param")
            .distinct())


def schema_health(schemas: DataFrame, params: DataFrame) -> DataFrame:
    """J3: per (event_name, param) drift classification vs the repository.

    Reference parity (updater.py:151-217): params NOT in the repo are
    skipped entirely (inner join — updater.py:164-165); severity:
    'critical' — type mismatch; 'minor' — description drift, pinned-value
    drift (float-tolerant for numbers, sentinel-normalised), or array
    nestedSchema drift; 'ok' — in sync.
    """
    s = schemas.alias("s")
    p = params.alias("p")
    j = s.join(p, F.col("s.param") == F.col("p.param"), "inner")

    # float-tolerant numeric compare (0.0 == 0 == '0'); sentinel values are
    # already normalised to NULL by the table builders. When either side is a
    # non-castable string the reference's except-fallback compares RAW values
    # (updater.py:186-192: two different junk strings are drift, identical
    # ones are not) — try_cast alone would map both to NULL and call them
    # equal, hiding the drift.
    sv, pv = F.col("s.value"), F.col("p.value")
    num = F.col("s.type") == "number"
    s_num, p_num = sv.try_cast("double"), pv.try_cast("double")
    cast_fail = ((sv.isNotNull() & s_num.isNull())
                 | (pv.isNotNull() & p_num.isNull()))
    num_equal = F.when(cast_fail, sv.eqNullSafe(pv)).otherwise(
        s_num.eqNullSafe(p_num))
    value_drift = F.when(num, ~num_equal).otherwise(~sv.eqNullSafe(pv))

    desc_drift = ~F.coalesce("s.description", F.lit("")).eqNullSafe(
        F.coalesce("p.description", F.lit("")))
    # nested drift counts only when the EXPECTED definition has a nestedSchema
    nested_drift = (F.col("p.nested_sig").isNotNull()
                    & ~F.col("p.nested_sig").eqNullSafe(F.col("s.nested_sig")))
    type_drift = ~F.col("s.type").eqNullSafe(F.col("p.type"))

    return j.select(
        F.col("s.event_name").alias("event_name"),
        F.col("s.param").alias("param"),
        F.when(type_drift, "critical")
        .when(desc_drift | value_drift | nested_drift, "minor")
        .otherwise("ok").alias("severity"),
        F.when(type_drift,
               F.concat(F.lit("type "), F.coalesce("s.type", F.lit("null")),
                        F.lit(" != "), F.coalesce("p.type", F.lit("null"))))
        .when(desc_drift, F.lit("description drift"))
        .when(value_drift, F.lit("value drift"))
        .when(nested_drift, F.lit("nestedSchema drift"))
        .otherwise(F.lit("in sync")).alias("detail"),
    )
