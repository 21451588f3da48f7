"""End-to-end validation run: violations + verdicts + per-partition metrics,
with checkpoint/resume (SURVEY.md §7.1 M5, FIXTURES.md §4-5).

The reference emits per-event verdicts over HTTP and fire-and-forgets log rows
into BigQuery (/root/reference/validator_src/index.js:54-75,
helpers/cloudHelpers.js:25-44). Here a run is a deterministic batch job over a
partitioned table:

  docs ──validate (1 projection)──► violations rows  ──append──► violations/
                                  ► verdict rows     ──append──► verdicts/
                                  ► metrics row/part ──append──► metrics/ + manifest

Resume: partitions are processed in deterministic buckets; each completed
bucket is recorded in a JSON manifest (the sandbox stand-in for Iceberg
snapshot ids — the API carries a ``snapshot_id`` everywhere so an Iceberg
catalog can be swapped in). A re-run with the same run_id skips completed
buckets — no duplicate rows, verified by tests/test_pipeline.py.

Scale note: pass ``bucket_col`` (the table's partition column, e.g. date_utc)
so every bucket scan partition-prunes to exactly its own files — resume
granularity then costs zero redundant IO (PartitionFilters in the scan,
verified by tests/test_pipeline.py). The hash-of-doc_id fallback
(``bucket_col=None``) re-filters the full source per bucket — acceptable only
for unpartitioned inputs.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from events_validator_spark.operators.validation import validate_typed

VERDICT_COLS = ["doc_id", "event_name", "passed", "n_violations",
                "partition_id", "snapshot_id"]


def _bucket(col, n):  # deterministic partition bucketing of doc ids
    return F.pmod(F.xxhash64(col), F.lit(n))


def verdict_rows(part: DataFrame, event_name: str, partition_id: str,
                 snapshot_id: str) -> DataFrame:
    """Per-document verdict rows (VERDICT_COLS shape) from a validated df."""
    return part.select(
        "doc_id",
        F.lit(event_name).alias("event_name"),
        (F.size("violations") == 0).alias("passed"),
        F.size("violations").alias("n_violations"),
        F.lit(partition_id).alias("partition_id"),
        F.lit(snapshot_id).alias("snapshot_id"),
    )


def violation_rows(part: DataFrame, source_columns: list[str], rules: dict,
                   event_name: str, partition_id: str, snapshot_id: str,
                   log_payload_when_error: bool = False,
                   log_valid_fields: bool = False) -> DataFrame:
    """Violation log rows from a validated df — the SINGLE builder both the
    batch pipeline and the streaming foreachBatch sink use (round-3 verdict
    items 5+7: stream/batch flag parity by construction, and the emitted
    schema is a superset of the reference's declared BQ schema,
    terraform_backend/src/bq_schema/bq_schema.json:1-62).

    Declared-superset columns: ``source_event``/``type`` are declared but
    never written by the reference (loggingHelpers.js writes neither) →
    typed nulls; ``value`` is written ONLY on valid-field rows as
    ``JSON.stringify(value)`` (loggingHelpers.js:39) → filled there, null on
    error rows.
    """
    payload = (F.to_json(F.struct(*[c for c in source_columns]))
               if log_payload_when_error else F.lit(None).cast("string"))
    null_s = F.lit(None).cast("string")
    out = (
        part.select("doc_id", F.explode("violations").alias("v"),
                    payload.alias("event_data"))
        .select(
            F.lit(event_name).alias("event_name"),
            F.col("doc_id").alias("event_id"),
            "v.field", "v.error_type", "v.expected", "v.actual",
            F.current_timestamp().alias("timestamp"),
            null_s.alias("source_event"),
            F.lit("error").alias("status"),
            F.current_date().alias("date_utc"),
            "event_data",
            null_s.alias("value"),
            null_s.alias("type"),
            F.lit(partition_id).alias("partition_id"),
            F.lit(snapshot_id).alias("snapshot_id"),
        ))
    if log_valid_fields:
        # per top-level rule key with no violation on this doc → 'valid' row
        rule_keys = [k for k in rules if k != "version"]
        keys_arr = F.array(*[F.lit(k) for k in rule_keys])
        # nested paths (spans[0].kind) roll up to their top-level key
        violated = F.transform(
            F.col("violations"),
            lambda v: F.regexp_extract(v["field"], r"^[^.\[]+", 0))
        # JSON.stringify(event[field]) per rule key (loggingHelpers.js:39):
        # to_json needs a struct root, so serialize {"x": v} and strip the
        # 5-char '{"x":' prefix and '}' suffix; a null/absent field
        # serializes to '{}' → NULL (JSON.stringify(undefined) is undefined)
        value_expr = null_s
        for k in rule_keys:
            if k not in part.columns:
                continue
            j = F.to_json(F.struct(F.col(k).alias("x")))
            jv = F.when(j == "{}", null_s).otherwise(
                j.substr(F.lit(6), F.length(j) - 6))
            value_expr = F.when(F.col("field") == k, jv).otherwise(value_expr)
        valid_rows = (
            part.select(
                "doc_id",
                *[c for c in part.columns if c in rule_keys and c != "doc_id"],
                F.explode(F.array_except(keys_arr, violated)).alias("field"))
            .select(
                F.lit(event_name).alias("event_name"),
                F.col("doc_id").alias("event_id"),
                "field",
                null_s.alias("error_type"),
                null_s.alias("expected"),
                null_s.alias("actual"),
                F.current_timestamp().alias("timestamp"),
                null_s.alias("source_event"),
                F.lit("valid").alias("status"),
                F.current_date().alias("date_utc"),
                null_s.alias("event_data"),
                value_expr.alias("value"),
                null_s.alias("type"),
                F.lit(partition_id).alias("partition_id"),
                F.lit(snapshot_id).alias("snapshot_id"),
            ))
        out = out.unionByName(valid_rows)
    return out


def run_validation(docs: DataFrame, rules: dict, out_dir: str,
                   event_name: str = "interleaved_doc",
                   n_buckets: int = 8, run_id: str | None = None,
                   snapshot_id: str | None = None,
                   bucket_col: str | None = None,
                   log_payload_when_error: bool = False,
                   log_valid_fields: bool = False) -> dict:
    """Validate ``docs`` bucket by bucket with manifest-based resume.

    ``bucket_col``: name of the table's PARTITION column (e.g. date_utc) —
    buckets are its distinct values and each bucket's scan partition-prunes
    to its own files (the Iceberg-shaped resume unit). When None, buckets
    fall back to ``pmod(xxhash64(doc_id), n_buckets)`` (full rescan per
    bucket — unpartitioned inputs only).

    ``log_payload_when_error`` mirrors the reference's LOG_PAYLOAD_WHEN_ERROR
    flag (loggingHelpers.js:18): violation rows carry the full event as JSON.
    ``log_valid_fields`` mirrors LOG_VALID_FIELDS (loggingHelpers.js:33-45):
    rows with status='valid' are emitted for schema fields that produced no
    violation on that document.

    Returns the manifest dict (run_id, per-bucket metrics, completed buckets).
    """
    spark = docs.sparkSession
    run_id = run_id or uuid.uuid4().hex[:12]
    snapshot_id = snapshot_id or "snap-" + run_id
    os.makedirs(out_dir, exist_ok=True)
    manifest_path = os.path.join(out_dir, f"manifest_{run_id}.json")

    if bucket_col is None:
        buckets = list(range(n_buckets))
        validated = validate_typed(docs, rules).withColumn(
            "__bucket", _bucket(F.col("doc_id"), n_buckets))

        def bucket_filter(b):
            return (F.col("__bucket") == b)
    else:
        # distinct partition values: on a partitioned source this is metadata
        # listing, not a data scan. On an UNPARTITIONED source it is a full
        # scan+shuffle just to enumerate labels — pass bucket_col only when
        # it is (or is derived from) a physical partition column; otherwise
        # leave it None and take the hash-bucket path, whose only extra cost
        # is the documented per-bucket re-scan. Manifest keys are string
        # labels; the filter uses the NATIVE typed value so the comparison
        # lands in the scan's PartitionFilters (a cast around the column
        # would defeat pruning).
        vals = {str(r[0]): r[0]
                for r in docs.select(bucket_col).distinct().collect()}
        buckets = sorted(vals)
        validated = validate_typed(docs, rules)

        def bucket_filter(b):
            return (F.col(bucket_col) == F.lit(vals[b]))

    manifest = {"run_id": run_id, "snapshot_id": snapshot_id,
                "n_buckets": len(buckets), "bucket_col": bucket_col,
                "completed": [], "metrics": []}
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            manifest = json.load(f)

    for b in buckets:
        if b in manifest["completed"]:
            continue
        t0 = time.monotonic()
        part = validated.where(bucket_filter(b))
        if bucket_col is None:
            part = part.drop("__bucket")
        part = part.cache()
        verdicts = verdict_rows(part, event_name, str(b), snapshot_id)
        violations = violation_rows(
            part, docs.columns, rules, event_name, str(b), snapshot_id,
            log_payload_when_error=log_payload_when_error,
            log_valid_fields=log_valid_fields)
        (violations.write.mode("overwrite")
         .parquet(os.path.join(out_dir, "violations", f"bucket={b}")))
        (verdicts.write.mode("overwrite")
         .parquet(os.path.join(out_dir, "verdicts", f"bucket={b}")))
        agg = verdicts.agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum("n_violations").alias("violations"),
            F.sum(F.col("passed").cast("long")).alias("passed")).collect()[0]
        part.unpersist()
        manifest["metrics"].append({
            "partition_id": str(b), "rows": agg["rows"],
            "violations": int(agg["violations"] or 0),
            "passed": int(agg["passed"] or 0),
            "wall_ms": int((time.monotonic() - t0) * 1000),
            "snapshot_id": snapshot_id, "run_id": run_id,
        })
        manifest["completed"].append(b)
        with open(manifest_path, "w") as f:  # atomic-enough for local FS
            json.dump(manifest, f)
    return manifest


def read_outputs(spark: SparkSession, out_dir: str) -> tuple[DataFrame, DataFrame]:
    violations = spark.read.parquet(os.path.join(out_dir, "violations"))
    verdicts = spark.read.parquet(os.path.join(out_dir, "verdicts"))
    return violations, verdicts


def _committed_snapshot_for(lakehouse, table: str, cursor: str,
                            meta_key: str = "source_cursor") -> str | None:
    """Snapshot id of the commit stamped with ``meta[meta_key] == cursor``,
    scanning the FULL snapshot log (newest first — the crash-rerun case is
    almost always the last commit). None if no commit carries the stamp.
    Shared by the batch pipeline (``source_cursor``) and the streaming
    dedup loop (``stream_batch``) — ONE implementation of the
    crash-recovery probe."""
    for snap in reversed(lakehouse.snapshots(table)):
        if (snap.get("meta") or {}).get(meta_key) == cursor:
            return snap["snapshot_id"]
    return None


def run_incremental(lakehouse, source_table: str, rules: dict, out_dir: str,
                    event_name: str = "interleaved_doc",
                    cursor: str | None = None,
                    log_payload_when_error: bool = False,
                    log_valid_fields: bool = False) -> dict:
    """One tick of a continuously-resumable validation loop over an
    Iceberg-shaped table: validate ONLY the rows appended since ``cursor``
    (``Lakehouse.read_since``), append violations/verdicts back to the
    lakehouse, and persist the new cursor in a manifest — crash-and-rerun
    with the same manifest re-reads nothing (exactly-once per append,
    pinned by tests/test_pipeline.py).

    Exactly-once holds ACROSS CRASHES, not just clean reruns (ADVICE r3):
    each output append is committed with the source cursor stamped in its
    snapshot metadata, so a rerun that re-reads the same source window
    (crash after append, before the manifest ``os.replace``) detects the
    already-committed batch on each output table independently and skips
    re-appending it — the crash window between the two appends and between
    append and manifest write are both covered.

    Returns {"cursor", "rows", "violations", "snapshot_id"}; rows == 0 means
    the table was unchanged and nothing was written.
    """
    manifest_path = os.path.join(out_dir, "incremental_manifest.json")
    os.makedirs(out_dir, exist_ok=True)
    if cursor is None and os.path.exists(manifest_path):
        with open(manifest_path) as f:
            cursor = json.load(f).get("cursor")

    new_df, new_cursor = lakehouse.read_since(source_table, cursor)
    if new_df is None:
        return {"cursor": cursor, "rows": 0, "violations": 0,
                "snapshot_id": None}

    validated = validate_typed(new_df, rules).cache()
    part_id = f"inc-{new_cursor}"
    violations = violation_rows(
        validated, new_df.columns, rules, event_name, part_id, new_cursor,
        log_payload_when_error=log_payload_when_error,
        log_valid_fields=log_valid_fields)
    verdicts = verdict_rows(validated, event_name, part_id, new_cursor)
    stamp = {"source_cursor": new_cursor}
    viol_table = f"{source_table}_violations"
    verd_table = f"{source_table}_verdicts"
    # idempotence probe per output table: a previous run that crashed after
    # committing this batch left its cursor stamp on SOME snapshot. Scan the
    # whole snapshot log, not just the newest entry (ADVICE r4): another
    # append to the output table between the crash and the rerun — a second
    # pipeline instance, a manual append — would bury the stamp and make a
    # newest-only probe re-append the batch. (Iceberg: the same scan over
    # the .snapshots metadata table's summary properties.)
    v_snap = _committed_snapshot_for(lakehouse, viol_table, new_cursor)
    if v_snap is None:
        v_snap = lakehouse.append(viol_table, violations, meta=stamp)
    if _committed_snapshot_for(lakehouse, verd_table, new_cursor) is None:
        lakehouse.append(verd_table, verdicts, meta=stamp)
    n_rows = validated.count()
    n_viol = int(validated.agg(
        F.sum(F.size("violations"))).collect()[0][0] or 0)
    validated.unpersist()

    tmp = manifest_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"cursor": new_cursor, "rows": n_rows,
                   "violations": n_viol, "snapshot_id": v_snap}, f)
    os.replace(tmp, manifest_path)
    return {"cursor": new_cursor, "rows": n_rows, "violations": n_viol,
            "snapshot_id": v_snap}
