from events_validator_spark.functions import js_compat  # noqa: F401
