"""Uniqueness constraint: duplicate-key detection with explicit skew defusal.

The north rule mandates salted two-phase aggregation: a hot ``doc_id`` (the
synthetic table puts ~5% of all rows on one key) would otherwise hash every
duplicate into a single reducer. Phase 1 aggregates on (key, salt) — the hot
key's rows spread over ``n_salts`` reducers — phase 2 merges the per-salt
partial counts. For plain counts Spark's map-side partial aggregation already
helps; the explicit salt also covers aggregates that are NOT algebraic
(collect of examples, first-seen payloads) and makes the shuffle key
cardinality explicit and tunable. AQE skew-join handling stays on as backstop
(session.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _task_salt(n_salts: int) -> Column:
    """Deterministic task-local salt in [0, n_salts).

    ``spark_partition_id()`` is a pure function of the task's partition
    index: a map task recomputed after a fetch failure gets the SAME index,
    so rows route to the same phase-1 reducers — unlike
    ``monotonically_increasing_id``/``rand``, whose values depend on
    within-partition row order (nondeterministic after an upstream shuffle)
    and can duplicate or drop rows on a stage retry (SPARK-23207 class;
    ADVICE r4). The projection references NO payload columns — column
    pruning reaches the scan.

    CAVEAT: on input CLUSTERED by the key (e.g. parquet sorted by it), a
    hot key occupies few partitions and gets few distinct salts. That is
    fine for algebraic aggregates (count/sum partially aggregate map-side,
    so a reducer receives at most one row per (key, map-task) regardless of
    the salt), but NOT for :func:`salted_collect` — which therefore salts
    on row CONTENT instead (see its docstring).
    """
    return F.pmod(F.spark_partition_id(), F.lit(n_salts)).alias("__salt")


def duplicate_keys(df: DataFrame, keys: list[str],
                   n_salts: int = 32) -> DataFrame:
    """Keys appearing more than once → (keys..., dup_count).

    Two-phase salted aggregation with a deterministic task-local salt
    (:func:`_task_salt`). The salt only routes rows between phase-1
    reducers; the phase-2 SUM makes the output identical for ANY salt
    assignment, so results stay deterministic across reruns, resume, and
    parallelism (pinned by the determinism audit).
    """
    salt = _task_salt(n_salts)
    phase1 = (df.select(*keys, salt)
              .groupBy(*keys, "__salt")
              .agg(F.count(F.lit(1)).alias("__partial")))
    return (phase1.groupBy(*keys)
            .agg(F.sum("__partial").alias("dup_count"))
            .where(F.col("dup_count") > 1))


def duplicate_rows(df: DataFrame, keys: list[str],
                   n_salts: int = 32) -> DataFrame:
    """All rows whose key is duplicated, annotated with dup_count.

    No hard broadcast hint (VERDICT r3 #3): the dup-key set is usually tiny,
    but on a pathological table it is O(distinct keys). AQE broadcasts it
    when it fits (session.py's 64 MB threshold) and otherwise shuffles on the
    key columns — never a fact-table self-join either way.
    """
    dups = duplicate_keys(df, keys, n_salts)
    return df.join(dups, on=keys, how="inner")


def salted_collect(df: DataFrame, keys: list[str], payload_col: str,
                   n_salts: int = 32, seed: int = 7) -> DataFrame:
    """Skew-safe ``groupBy(keys).collect_list(payload)``.

    collect_list has no map-side combine: with a hot key, ONE reducer
    receives every duplicate row's payload (the synthetic table routes 5% of
    all rows to ``doc_hot``). Phase 1 collects per (key, salt) — the hot key
    spreads over ``n_salts`` reducers — phase 2 flattens the per-salt pieces,
    shuffling pre-compacted arrays instead of raw rows.

    The salt hashes ROW CONTENT (keys + payload — the payload is being
    collected, so it is read either way): deterministic under stage retry
    AND independent of physical layout, so a hot key still spreads over
    ``n_salts`` reducers even on input parquet CLUSTERED by the key, where
    a partition-id salt would collapse to one value (the grouped_digests
    pattern; only fully-identical duplicate rows share a salt, the same
    documented trade).
    """
    from pyspark.sql import types as T
    ptype = df.schema[payload_col].dataType
    if isinstance(ptype, (T.MapType, T.VariantType)):
        # xxhash64 cannot hash map/variant — fall back to key-hash plus the
        # task-local component (layout-independent only up to partitioning).
        # pmod BEFORE adding the partition id (ADVICE r5): xxhash64 can
        # return values near Long.MAX_VALUE, and under ANSI mode (Spark 4
        # default) the raw `hash + pid` add would then throw at runtime —
        # ~n_partitions/2^64 per row, but free to close at 10^12-row scale
        h = (F.pmod(F.xxhash64(*[F.col(k) for k in keys], F.lit(seed)),
                    F.lit(n_salts))
             + F.spark_partition_id())
    else:
        h = F.xxhash64(*[F.col(k) for k in keys], F.col(payload_col),
                       F.lit(seed))
    salt = F.pmod(h, F.lit(n_salts)).alias("__salt")
    phase1 = (df.select(*keys, F.col(payload_col), salt)
              .groupBy(*keys, "__salt")
              .agg(F.collect_list(payload_col).alias("__part")))
    return (phase1.groupBy(*keys)
            .agg(F.flatten(F.collect_list("__part")).alias(f"{payload_col}s")))


def naive_collect(df: DataFrame, keys: list[str],
                  payload_col: str) -> DataFrame:
    """The skew-prone baseline (for the skew benchmark — do not use at scale)."""
    return (df.groupBy(*keys)
            .agg(F.collect_list(payload_col).alias(f"{payload_col}s")))


def uniqueness_violations(df: DataFrame, keys: list[str],
                          n_salts: int = 32) -> DataFrame:
    """Duplicate keys in the engine's violation-row shape (error_type='unique')."""
    dups = duplicate_keys(df, keys, n_salts)
    key_str = F.concat_ws("|", *[F.col(k).cast("string") for k in keys])
    return dups.select(
        key_str.alias("field"),
        F.lit("unique").alias("error_type"),
        F.lit("1").alias("expected"),
        F.col("dup_count").cast("string").alias("actual"),
    )
