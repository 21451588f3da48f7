"""Rule-metadata operators: the reference's repo/schemas relational structure.

Maps SURVEY.md §2.3 J2/J3:

* J2 ``find_impacted_schemas`` — the parameter repository's reverse index
  (param → usedInSchemas, streamlit_ev/app/helpers/updater.py:85-93) as an
  exploded DataFrame + equi-join.
* J3 schema health check — per-param field-wise comparison of a schema against
  the repository (updater.py:151-217) as a full-outer join with ``F.when``
  diff columns: ``critical`` = type mismatch or unknown param, ``minor`` =
  description/value drift.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession, functions as F


def params_table(spark: SparkSession, repo: dict) -> DataFrame:
    """repo.json → (param, type, description, value, used_in array)."""
    rows = [
        (name,
         str(spec.get("type")) if spec.get("type") is not None else None,
         spec.get("description"),
         None if spec.get("value") is None else str(spec.get("value")),
         list(spec.get("usedInSchemas", [])))
        for name, spec in repo.items()
    ]
    return spark.createDataFrame(
        rows, "param string, type string, description string, value string, "
              "used_in array<string>")


def schemas_table(spark: SparkSession, rules_by_name: dict[str, dict]) -> DataFrame:
    """All rule specs flattened → (event_name, param, type, description, value)."""
    rows = []
    for event_name, rules in rules_by_name.items():
        for param, rule in rules.items():
            if param == "version" or not isinstance(rule, dict):
                continue
            rows.append((
                event_name, param,
                str(rule.get("type")) if rule.get("type") is not None else None,
                rule.get("description"),
                None if rule.get("value") is None else str(rule.get("value"))))
    return spark.createDataFrame(
        rows, "event_name string, param string, type string, "
              "description string, value string")


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

    severity: 'critical' — type mismatch or param absent from the repo;
              'minor'    — description or pinned-value drift;
              'ok'       — in sync.
    """
    s = schemas.alias("s")
    p = params.alias("p")
    j = s.join(p, F.col("s.param") == F.col("p.param"), "left_outer")
    return j.select(
        F.col("s.event_name").alias("event_name"),
        F.col("s.param").alias("param"),
        F.when(F.col("p.param").isNull(), "critical")          # unknown param
        .when(~F.col("s.type").eqNullSafe(F.col("p.type")), "critical")
        .when(~F.col("s.description").eqNullSafe(F.col("p.description")), "minor")
        .when(~F.col("s.value").eqNullSafe(F.col("p.value")), "minor")
        .otherwise("ok").alias("severity"),
        F.when(F.col("p.param").isNull(), "param not in repo")
        .when(~F.col("s.type").eqNullSafe(F.col("p.type")),
              F.concat(F.lit("type "), F.coalesce("s.type", F.lit("null")),
                       F.lit(" != "), F.coalesce("p.type", F.lit("null"))))
        .when(~F.col("s.description").eqNullSafe(F.col("p.description")),
              F.lit("description drift"))
        .when(~F.col("s.value").eqNullSafe(F.col("p.value")), F.lit("value drift"))
        .otherwise(F.lit("in sync")).alias("detail"),
    )
