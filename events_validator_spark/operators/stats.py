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
    aggs = []
    q_aggs = []
    for c in cols:
        col = F.col(c)
        dt = df.schema[c].dataType
        aggs += [
            F.count(col).alias(f"{c}__count"),
            F.sum(col.isNull().cast("long")).alias(f"{c}__nulls"),
            F.min(col).cast("string").alias(f"{c}__min"),
            F.max(col).cast("string").alias(f"{c}__max"),
            (F.approx_count_distinct(col, rsd) if approx
             else F.countDistinct(col)).alias(f"{c}__distinct"),
        ]
        if isinstance(dt, _NUMERIC):
            q = (F.percentile_approx(col, list(quantiles)) if approx
                 else F.percentile(col, list(quantiles)))
            q = q.cast("array<double>").alias(f"{c}__quantiles")
        else:
            q = F.lit(None).cast("array<double>").alias(f"{c}__quantiles")
        if approx:
            aggs.append(q)       # sketches compose fine in the single pass
        else:
            q_aggs.append(q)
    wide = df.agg(*aggs)
    if q_aggs:
        # exact percentiles build value→count maps per aggregate; fused with
        # countDistinct they run over the Expand-multiplied input (rows ×
        # n_distinct_aggs) and merge in one reducer — 10-30x slower. The exact
        # (oracle) path pays one extra pruned scan instead.
        wide = wide.crossJoin(df.agg(*q_aggs))

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
    # DIFFERENT partitioning. localCheckpoint makes pid a stable fact.
    r = (g.repartitionByRange(n_partitions, "x")
         .withColumn("pid", F.spark_partition_id())
         .localCheckpoint())
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
