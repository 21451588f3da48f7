"""Distribution-drift checks: histogram/PSI, KS, t-digest quantile profiles.

Shape follows the reference's schema-health check (compare current vs baseline,
/root/reference/streamlit_ev/app/helpers/updater.py:151-217) generalized from
schema drift to DATA drift per the north rule:

* numeric columns → t-digest quantile profile (GROUPED_AGG pandas UDAF — the
  only executor-side Python, Arrow-vectorized) or built-in histogram sketches;
* categorical columns → bucketed counts;
* comparison → PSI (Population Stability Index) on histograms, KS statistic on
  CDFs — both computed as DataFrame aggregations over (column, bucket) rows, or
  in one ``applyInPandas`` for the per-column sketch-compare path.

Thresholded results are emitted in the engine's violation-row format
(error_type='drift') so they land in the same violations table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window, functions as F
from pyspark.sql.functions import pandas_udf

from events_validator_spark.functions.tdigest import TDigest
from events_validator_spark.operators.stats import group_histogram


# ---------------------------------------------------------------------------
# t-digest quantile profiles (mergeable; the 10^12-row quantile path)
# ---------------------------------------------------------------------------

def tdigest_udaf(delta: int = 100):
    """GROUPED_AGG pandas UDAF: column values → serialized t-digest bytes."""
    @pandas_udf("binary")
    def agg(v: pd.Series) -> bytes:
        return TDigest.from_values(v.to_numpy(dtype=np.float64), delta).serialize()
    return agg


def quantile_profile(df: DataFrame, column: str, group_col: str,
                     qs: tuple[float, ...] = (0.1, 0.25, 0.5, 0.75, 0.9),
                     delta: int = 100) -> DataFrame:
    """(grp, quantiles array) per group via the t-digest UDAF.

    Partial digests are built per Arrow batch on executors and merged by the
    aggregation — constant memory per group regardless of group size.
    """
    agg = tdigest_udaf(delta)
    spark = df.sparkSession
    digests = (df.groupBy(F.col(group_col).alias("grp"))
               .agg(agg(F.col(column).cast("double")).alias("digest")))

    @pandas_udf("array<double>")
    def read_q(blobs: pd.Series) -> pd.Series:
        return pd.Series([TDigest.deserialize(b).quantiles(qs) for b in blobs])

    return digests.select("grp", read_q("digest").alias("quantiles"))


# ---------------------------------------------------------------------------
# PSI — histogram compare, pure DataFrame algebra
# ---------------------------------------------------------------------------

def psi_from_histograms(cur: DataFrame, base: DataFrame,
                        eps: float = 1e-6) -> DataFrame:
    """PSI between two (bucket, cnt) histograms → one row {psi}.

    psi = Σ (p_i − q_i) · ln(p_i / q_i), with ε-smoothing for empty buckets.
    """
    cc = cur.select(F.col("bucket"), F.col("cnt").alias("c_cnt"))
    bb = base.select(F.col("bucket"), F.col("cnt").alias("b_cnt"))
    j = cc.join(bb, "bucket", "full_outer").fillna(0, ["c_cnt", "b_cnt"])
    tot = j.agg(F.sum("c_cnt").alias("ct"), F.sum("b_cnt").alias("bt"))
    j = j.crossJoin(F.broadcast(tot))
    p = F.greatest(F.col("c_cnt") / F.greatest(F.col("ct"), F.lit(1)), F.lit(eps))
    q = F.greatest(F.col("b_cnt") / F.greatest(F.col("bt"), F.lit(1)), F.lit(eps))
    return j.agg(F.round(F.sum((p - q) * F.log(p / q)), 8).alias("psi"))


def psi_two_cohorts(df: DataFrame, column: str, cohort: F.Column,
                    nbins: int = 20, lo: float | None = None,
                    hi: float | None = None, eps: float = 1e-6) -> DataFrame:
    """PSI of ``column`` between cohort=True (current) and False (baseline),
    in ONE scan: groupBy (cohort, bucket) then reshape."""
    if lo is None or hi is None:
        b = df.agg(F.min(F.col(column).cast("double")).alias("lo"),
                   F.max(F.col(column).cast("double")).alias("hi")).collect()[0]
        lo, hi = float(b["lo"]), float(b["hi"])
    hist = group_histogram(df.withColumn("__cohort", cohort),
                           column, "__cohort", nbins, lo, hi)
    wide = (hist.groupBy("bucket")
            .agg(F.sum(F.when(F.col("grp"), F.col("cnt")).otherwise(0)).alias("c_cnt"),
                 F.sum(F.when(~F.col("grp"), F.col("cnt")).otherwise(0)).alias("b_cnt")))
    tot = wide.agg(F.sum("c_cnt").alias("ct"), F.sum("b_cnt").alias("bt"))
    j = wide.crossJoin(F.broadcast(tot))
    p = F.greatest(F.col("c_cnt") / F.greatest(F.col("ct"), F.lit(1)), F.lit(eps))
    q = F.greatest(F.col("b_cnt") / F.greatest(F.col("bt"), F.lit(1)), F.lit(eps))
    return j.agg(F.round(F.sum((p - q) * F.log(p / q)), 8).alias("psi"))


# ---------------------------------------------------------------------------
# KS — exact two-sample statistic as window algebra (small/medium path),
#      and sketch-based compare via applyInPandas (scale path)
# ---------------------------------------------------------------------------

def ks_two_sample(df: DataFrame, column: str, cohort: F.Column) -> DataFrame:
    """Exact two-sample KS statistic between cohort=True and cohort=False.

    Window over a global sort — exact but single-reducer for the final max;
    use :func:`ks_from_digests` at 10^12 scale. → one row {ks}.
    """
    d = df.select(F.col(column).cast("double").alias("x"),
                  cohort.cast("int").alias("in_a"))
    d = d.where(F.col("x").isNotNull())
    # pre-aggregate ties: deterministic CDF regardless of row order, and the
    # window input shrinks to the distinct-value count
    g = d.groupBy("x").agg(F.sum("in_a").alias("a"),
                           F.sum(1 - F.col("in_a")).alias("b"))
    tot = g.agg(F.sum("a").alias("na"), F.sum("b").alias("nb"))
    w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    cum = g.select(
        (F.sum("a").over(w)).alias("ca"),
        (F.sum("b").over(w)).alias("cb"))
    cum = cum.crossJoin(F.broadcast(tot))
    return cum.agg(F.round(F.max(F.abs(
        F.col("ca") / F.greatest(F.col("na"), F.lit(1)) -
        F.col("cb") / F.greatest(F.col("nb"), F.lit(1)))), 8).alias("ks"))


def ks_from_digests(df: DataFrame, column: str, group_col: str,
                    n_points: int = 200, delta: int = 200) -> DataFrame:
    """Approximate pairwise KS between all groups from t-digest profiles.

    One scan builds a digest per group (mergeable UDAF); the tiny digest table
    is then compared in a single ``applyInPandas`` — CDFs are evaluated on a
    shared grid and the max gap taken. Output: (grp_a, grp_b, ks)."""
    agg = tdigest_udaf(delta)
    digests = (df.groupBy(F.col(group_col).cast("string").alias("grp"))
               .agg(agg(F.col(column).cast("double")).alias("digest")))

    def compare(pdf: pd.DataFrame) -> pd.DataFrame:
        items = [(r.grp, TDigest.deserialize(r.digest))
                 for r in pdf.itertuples()]
        rows = []
        qs = np.linspace(0.005, 0.995, n_points)
        inv = {g: np.array(d.quantiles(qs)) for g, d in items}
        for i, (ga, _) in enumerate(items):
            for gb, _ in items[i + 1:]:
                # KS via inverse-CDF gap: sup |F_a(x) - F_b(x)| evaluated on
                # the union of both quantile grids
                grid = np.union1d(inv[ga], inv[gb])
                fa = np.searchsorted(inv[ga], grid, side="right") / n_points
                fb = np.searchsorted(inv[gb], grid, side="right") / n_points
                rows.append((ga, gb, float(np.abs(fa - fb).max())))
        return pd.DataFrame(rows, columns=["grp_a", "grp_b", "ks"])

    return (digests.withColumn("__one", F.lit(1))
            .groupBy("__one")
            .applyInPandas(compare, "grp_a string, grp_b string, ks double")
            .drop("__one"))


def drift_violations(psi_df: DataFrame, column: str,
                     threshold: float = 0.2) -> DataFrame:
    """PSI result → violation rows (error_type='drift') above threshold."""
    return (psi_df.where(F.col("psi") > threshold)
            .select(F.lit(column).alias("field"),
                    F.lit("drift").alias("error_type"),
                    F.lit(f"psi<={threshold}").alias("expected"),
                    F.col("psi").cast("string").alias("actual")))
