"""Single-pass per-column statistics (SURVEY.md §2.4 north-rule additions).

All aggregates for all profiled columns are assembled into ONE ``df.agg(*exprs)``
so the table is scanned exactly once (Catalyst will not fuse separate actions).
Distinct counts use HyperLogLog (``approx_count_distinct``) — mergeable, constant
memory, the only sane choice at 10^12 rows; quantiles use ``percentile_approx``
(GK sketch, also mergeable). Exact variants exist for small-scale oracle checks.

Output is long-format — one row per column — so the profile itself is a table
that can be stored, diffed (drift baseline), and queried.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

_NUMERIC = (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
            T.FloatType, T.DoubleType, T.DecimalType)


def profile(df: DataFrame, columns: list[str] | None = None,
            rsd: float = 0.05, approx: bool = True,
            quantiles: tuple[float, ...] = (0.25, 0.5, 0.75)) -> DataFrame:
    """One-scan profile: count / nulls / min / max / distinct (+ quantiles for
    numeric columns), one output row per column.

    ``approx=True`` (the 10^12-row path): HLL distinct + GK quantiles.
    ``approx=False`` (oracle-comparable): exact count(distinct) and exact
    interpolated percentiles.
    """
    cols = columns or [f.name for f in df.schema.fields
                       if not isinstance(f.dataType, (T.ArrayType, T.StructType,
                                                      T.MapType, T.BinaryType,
                                                      T.VariantType))]
    if not approx:
        num = [c for c in cols if isinstance(df.schema[c].dataType, _NUMERIC)]
        other = [c for c in cols if c not in num]
        parts = []
        if num:
            parts.append(exact_profile(df, num, quantiles))
        if other:
            parts.append(_wide_profile(df, other, rsd, approx=False,
                                       quantiles=quantiles))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out
    return _wide_profile(df, cols, rsd, approx=True, quantiles=quantiles)


def _wide_profile(df: DataFrame, cols: list[str], rsd: float, approx: bool,
                  quantiles: tuple[float, ...]) -> DataFrame:
    """One wide ``df.agg`` over all columns, unpivoted to long format. The
    approx path (sketches compose in a single pass) and the exact path for
    NON-numeric columns (no quantiles; exact countDistinct pays one Expand)."""
    aggs = []
    for c in cols:
        col = F.col(c)
        dt = df.schema[c].dataType
        aggs += [
            F.count(col).alias(f"{c}__count"),
            F.coalesce(F.sum(col.isNull().cast("long")), F.lit(0))
            .alias(f"{c}__nulls"),
            F.min(col).cast("string").alias(f"{c}__min"),
            F.max(col).cast("string").alias(f"{c}__max"),
            (F.approx_count_distinct(col, rsd) if approx
             else F.countDistinct(col)).alias(f"{c}__distinct"),
        ]
        if approx and isinstance(dt, _NUMERIC):
            q = (F.percentile_approx(col, list(quantiles))
                 .cast("array<double>"))
        else:
            q = F.lit(None).cast("array<double>")
        aggs.append(q.alias(f"{c}__quantiles"))
    wide = df.agg(*aggs)

    # unpivot the single wide row into one row per column
    row_structs = [
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"{c}__count").alias("count"),
            F.col(f"{c}__nulls").alias("nulls"),
            F.col(f"{c}__min").alias("min"),
            F.col(f"{c}__max").alias("max"),
            F.col(f"{c}__distinct").alias("distinct"),
            F.col(f"{c}__quantiles").alias("quantiles"),
        ) for c in cols
    ]
    return (wide.select(F.explode(F.array(*row_structs)).alias("s"))
            .select("s.*"))


def exact_profile(df: DataFrame, columns: list[str],
                  quantiles: tuple[float, ...] = (0.25, 0.5, 0.75),
                  n_partitions: int | None = None) -> DataFrame:
    """EXACT profile of numeric columns in ONE scan of ``df`` — count/nulls/
    min/max/distinct AND exact interpolated quantiles, no Expand, no
    single-task value-map merge (VERDICT r3 #4: the old exact path paid
    countDistinct's Expand over n_cols× input plus a second scan whose
    ``F.percentile`` merges all partials in one reducer).

    Shape: melt the columns into (col, value) rows (column-pruned single
    scan), pre-aggregate ties with ``groupBy(col, value)`` (map-side combine
    shrinks the shuffle to distinct values), then derive EVERYTHING from
    that one distinct-value table:

      * count/nulls     — sums of group counts;
      * min/max         — ``min_by``/``max_by`` on the string repr, so the
                          output formats values exactly like the original
                          column type would (``min(col).cast('string')``);
      * distinct        — the number of non-null groups (exact, no Expand:
                          grouping IS the distinct);
      * quantiles       — the distributed CDF prefix-sum of
                          :func:`exact_quantiles`, generalized to run
                          per-column over (col, x) range partitions.

    Grouping keys use the STRING repr (injective for numeric types) so two
    original values never collapse through a double cast; ordering uses the
    double. The distinct-value table is ``localCheckpoint``-ed: it feeds
    both the stats agg and the CDF, and the range partitioning it carries
    must be one stable fact (ADVICE r3 on :func:`exact_quantiles`).
    """
    from pyspark.sql import Window

    melt = df.select(F.explode(F.array(*[
        F.struct(F.lit(c).alias("col"),
                 F.col(c).cast("double").alias("xd"),
                 F.col(c).cast("string").alias("xs"))
        for c in columns])).alias("s")).select("s.*")
    g = (melt.groupBy("col", "xs")
         .agg(F.count(F.lit(1)).alias("c"), F.min("xd").alias("xd"))
         # lazy: materialized once by the final action, then reused by both
         # the stats agg and the CDF — no blocking driver round trip
         .localCheckpoint(eager=False))

    st = g.groupBy("col").agg(
        F.coalesce(F.sum(F.when(F.col("xs").isNotNull(), F.col("c"))),
                   F.lit(0)).alias("count"),
        F.coalesce(F.sum(F.when(F.col("xs").isNull(), F.col("c"))),
                   F.lit(0)).alias("nulls"),
        # ordering key is (xd, xs): values wider than a double (longs >
        # 2^53, wide decimals) can tie on the double cast, and min_by on xd
        # alone would then return an arbitrary, run-to-run nondeterministic
        # tie member (ADVICE r4). The xs tiebreak makes the choice
        # deterministic; WHICH tie member is "the" min/max is a documented
        # contract limit of the profile (double-precision collapse — the
        # reported extreme is exact only up to double resolution).
        # (the WHEN guard keeps null/uncastable rows ignored, as a bare-xd
        # ordering did — a struct with null fields is itself non-null and
        # would otherwise sort first and hijack the min)
        F.min_by("xs", F.when(F.col("xd").isNotNull(),
                              F.struct("xd", "xs"))).alias("min"),
        F.max_by("xs", F.when(F.col("xd").isNotNull(),
                              F.struct("xd", "xs"))).alias("max"),
        F.count(F.col("xs")).alias("distinct"))

    # distributed CDF over the distinct-value table, per column
    gq = g.where(F.col("xd").isNotNull())
    if n_partitions is None:
        n_partitions = int(df.sparkSession.conf.get(
            "spark.sql.shuffle.partitions"))
    r = (gq.repartitionByRange(n_partitions, "col", "xd")
         .withColumn("pid", F.spark_partition_id())
         .localCheckpoint(eager=False))
    wp = (Window.partitionBy("col", "pid").orderBy("xd")
          .rowsBetween(Window.unboundedPreceding, 0))
    local = r.select("col", "xd", "pid", F.sum("c").over(wp).alias("lc"))
    totals = r.groupBy("col", "pid").agg(F.sum("c").alias("tc"))
    wo = (Window.partitionBy("col").orderBy("pid")
          .rowsBetween(Window.unboundedPreceding, -1))
    offsets = totals.select(
        "col", "pid", F.coalesce(F.sum("tc").over(wo), F.lit(0)).alias("off"))
    grand = totals.groupBy("col").agg(F.sum("tc").alias("n"))
    cum = (local.join(F.broadcast(offsets), ["col", "pid"])
           .select("col", "xd", (F.col("lc") + F.col("off")).alias("cum"))
           .join(F.broadcast(grand), "col"))
    q_aggs = []
    for i, q in enumerate(quantiles):
        rank = F.lit(float(q)) * (F.col("n") - 1)
        lo, hi = F.floor(rank), F.ceil(rank)
        q_aggs += [
            F.min(F.when(F.col("cum") > lo, F.col("xd"))).alias(f"vlo_{i}"),
            F.min(F.when(F.col("cum") > hi, F.col("xd"))).alias(f"vhi_{i}"),
            F.min(rank - lo).alias(f"frac_{i}")]
    qrow = cum.groupBy("col").agg(*q_aggs).select(
        "col",
        F.array(*[
            (F.col(f"vlo_{i}")
             + F.col(f"frac_{i}") * (F.col(f"vhi_{i}") - F.col(f"vlo_{i}")))
            for i in range(len(quantiles))]).alias("quantiles"))

    # column spine: an EMPTY input must still yield one row per column
    # (count=0), matching the wide-agg contract — a groupBy over zero rows
    # would otherwise emit nothing
    spine = df.sparkSession.range(1).select(
        F.explode(F.array(*[F.lit(c) for c in columns])).alias("col"))
    return (spine.join(st, "col", "left").join(qrow, "col", "left")
            .select(F.col("col").alias("column"),
                    F.coalesce("count", F.lit(0)).alias("count"),
                    F.coalesce("nulls", F.lit(0)).alias("nulls"),
                    "min", "max",
                    F.coalesce("distinct", F.lit(0)).alias("distinct"),
                    "quantiles"))


def histogram(df: DataFrame, column: str, nbins: int = 20,
              lo: float | None = None, hi: float | None = None) -> DataFrame:
    """Equi-width histogram sketch of a numeric column → (bucket, cnt).

    With explicit bounds (the drift path: bounds come from the baseline profile)
    this is a single groupBy scan. Without bounds an extra min/max scan runs
    first — fine for profiling, avoid in the hot loop.

    Bucket ids are clamped to [0, nbins-1]; NULLs are dropped (they are counted
    by :func:`profile`).
    """
    col = F.col(column).cast("double")
    if lo is None or hi is None:
        b = df.agg(F.min(col).alias("lo"), F.max(col).alias("hi")).collect()[0]
        lo = float(b["lo"]) if b["lo"] is not None else 0.0
        hi = float(b["hi"]) if b["hi"] is not None else 1.0
    width = (hi - lo) / nbins or 1.0
    bucket = F.least(F.greatest(F.floor((col - F.lit(lo)) / F.lit(width)),
                                F.lit(0)), F.lit(nbins - 1)).cast("int")
    return (df.where(col.isNotNull())
            .groupBy(bucket.alias("bucket"))
            .agg(F.count(F.lit(1)).alias("cnt")))


def group_histogram(df: DataFrame, column: str, group_col: str,
                    nbins: int, lo: float, hi: float) -> DataFrame:
    """(group, bucket, cnt) — the building block for PSI across cohorts."""
    col = F.col(column).cast("double")
    width = (hi - lo) / nbins or 1.0
    bucket = F.least(F.greatest(F.floor((col - F.lit(lo)) / F.lit(width)),
                                F.lit(0)), F.lit(nbins - 1)).cast("int")
    return (df.where(col.isNotNull())
            .groupBy(F.col(group_col).alias("grp"), bucket.alias("bucket"))
            .agg(F.count(F.lit(1)).alias("cnt")))


def exact_quantiles(df: DataFrame, column: str,
                    qs: tuple[float, ...] = (0.25, 0.5, 0.75),
                    n_partitions: int | None = None) -> DataFrame:
    """EXACT linear-interpolated quantiles, fully distributed — the 10^12-row
    exact path. One row: (q0, q1, ...) matching ``F.percentile`` /
    DuckDB ``quantile_cont`` bit-for-bit (pinned by tests/test_operators.py).

    ``F.percentile`` (and the exact path of :func:`profile`) builds a
    value→count map per partial and merges ALL partials in a single final
    task — on a high-cardinality column at 10^12 rows that merge is a
    single-task memory/time wall. This operator instead reuses the
    distributed prefix-sum shape of ``drift.ks_two_sample``:

      1. ``groupBy(x)`` pre-aggregates ties (input shrinks to distinct
         values, map-side combine);
      2. ``repartitionByRange(x)`` gives each partition a contiguous value
         interval;
      3. per-partition cumulative counts via a window partitioned by the
         range partition id (all partitions in parallel);
      4. per-partition totals (P rows) prefix-sum in one tiny window and
         join back as offsets — the only serial step touches P rows;
      5. for each q, rank = q·(n−1); the values at floor/ceil rank are read
         off the global CDF with two conditional-min aggregates and
         interpolated.

    Locally (sf0.1, 600k rows, 32 cores) this measures ~1.2× slower than the
    fused map-merge — the shuffle costs more than the merge saves at small
    scale; it exists because the merge does not survive large scale and this
    does. Use ``profile(approx=True)`` when sketch accuracy suffices.
    """
    from pyspark.sql import Window

    d = (df.select(F.col(column).cast("double").alias("x"))
         .where(F.col("x").isNotNull()))
    g = d.groupBy("x").agg(F.count("*").alias("c"))
    if n_partitions is None:
        n_partitions = int(df.sparkSession.conf.get(
            "spark.sql.shuffle.partitions"))
    # PIN the partition assignment (ADVICE r3): `local` and `totals` both
    # derive from r, and repartitionByRange SAMPLES its boundaries per
    # execution — without materialization, correctness would silently depend
    # on Catalyst reusing the exchange (broken by exchangeReuse=false, AQE
    # replan, or a stage retry), joining pid-keyed offsets against a
    # DIFFERENT partitioning. localCheckpoint makes pid a stable fact
    # (lazy: materialized once by the first action, then reused).
    r = (g.repartitionByRange(n_partitions, "x")
         .withColumn("pid", F.spark_partition_id())
         .localCheckpoint(eager=False))
    wp = (Window.partitionBy("pid").orderBy("x")
          .rowsBetween(Window.unboundedPreceding, 0))
    local = r.select("x", "pid", F.sum("c").over(wp).alias("lc"))
    totals = r.groupBy("pid").agg(F.sum("c").alias("tc"))
    wo = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "pid", F.coalesce(F.sum("tc").over(wo), F.lit(0)).alias("off"))
    grand = totals.agg(F.sum("tc").alias("n"))
    cum = (local.join(F.broadcast(offsets), "pid")
           .select("x", (F.col("lc") + F.col("off")).alias("cum"))
           .crossJoin(F.broadcast(grand)))
    aggs = []
    for i, q in enumerate(qs):
        rank = F.lit(float(q)) * (F.col("n") - 1)
        lo, hi = F.floor(rank), F.ceil(rank)
        aggs += [F.min(F.when(F.col("cum") > lo, F.col("x"))).alias(f"vlo_{i}"),
                 F.min(F.when(F.col("cum") > hi, F.col("x"))).alias(f"vhi_{i}"),
                 F.first(rank - lo).alias(f"frac_{i}")]
    wide = cum.agg(*aggs)
    return wide.select(*[
        (F.col(f"vlo_{i}")
         + F.col(f"frac_{i}") * (F.col(f"vhi_{i}") - F.col(f"vlo_{i}")))
        .alias(f"q{i}") for i in range(len(qs))])
