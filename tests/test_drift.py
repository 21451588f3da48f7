"""Drift operators: t-digest quantiles, PSI, KS — against numpy ground truth."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from events_validator_spark.functions.tdigest import TDigest
from events_validator_spark.operators import drift, stats


def test_tdigest_quantiles_accurate():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(50_000)
    d = TDigest.from_values(x, delta=100)
    for q in (0.01, 0.25, 0.5, 0.75, 0.99):
        assert d.quantile(q) == pytest.approx(np.quantile(x, q), abs=0.02)


def test_tdigest_merge_matches_whole():
    rng = np.random.default_rng(1)
    a, b = rng.standard_normal(20_000), 2 + rng.standard_normal(20_000)
    merged = TDigest.from_values(a).merge(TDigest.from_values(b))
    whole = np.concatenate([a, b])
    for q in (0.1, 0.5, 0.9):
        assert merged.quantile(q) == pytest.approx(np.quantile(whole, q), abs=0.05)
    rt = TDigest.deserialize(merged.serialize())
    assert rt.quantile(0.5) == merged.quantile(0.5)


def test_quantile_profile_udaf(spark):
    rng = np.random.default_rng(2)
    rows = ([("a", float(v)) for v in rng.standard_normal(4000)] +
            [("b", float(v)) for v in 5 + rng.standard_normal(4000)])
    df = spark.createDataFrame(rows, ["grp", "x"])
    out = {r["grp"]: r["quantiles"]
           for r in drift.quantile_profile(df, "x", "grp").collect()}
    assert out["a"][2] == pytest.approx(0.0, abs=0.1)   # median of N(0,1)
    assert out["b"][2] == pytest.approx(5.0, abs=0.1)   # median of N(5,1)


def test_psi_same_vs_shifted(spark):
    rng = np.random.default_rng(3)
    same = [(False, float(v)) for v in rng.standard_normal(5000)] + \
           [(True, float(v)) for v in rng.standard_normal(5000)]
    df = spark.createDataFrame(same, ["cur", "x"])
    psi0 = drift.psi_two_cohorts(df, "x", F.col("cur"), nbins=10).collect()[0]["psi"]
    assert psi0 < 0.05

    shifted = [(False, float(v)) for v in rng.standard_normal(5000)] + \
              [(True, float(v)) for v in 1.5 + rng.standard_normal(5000)]
    df2 = spark.createDataFrame(shifted, ["cur", "x"])
    psi1 = drift.psi_two_cohorts(df2, "x", F.col("cur"), nbins=10).collect()[0]["psi"]
    assert psi1 > 0.25
    v = drift.drift_violations(
        drift.psi_two_cohorts(df2, "x", F.col("cur"), nbins=10), "x").collect()
    assert len(v) == 1 and v[0]["error_type"] == "drift"


def test_ks_exact_and_digest(spark):
    rng = np.random.default_rng(4)
    a = rng.standard_normal(3000)
    b = 1.0 + rng.standard_normal(3000)
    rows = [(True, float(v)) for v in a] + [(False, float(v)) for v in b]
    df = spark.createDataFrame(rows, ["cur", "x"])
    ks = drift.ks_two_sample(df, "x", F.col("cur")).collect()[0]["ks"]

    # exact two-sample KS via numpy for ground truth
    def np_ks(x, y):
        allv = np.sort(np.concatenate([x, y]))
        fa = np.searchsorted(np.sort(x), allv, side="right") / len(x)
        fb = np.searchsorted(np.sort(y), allv, side="right") / len(y)
        return np.abs(fa - fb).max()
    assert ks == pytest.approx(np_ks(a, b), abs=1e-6)

    df2 = spark.createDataFrame(
        [("a", float(v)) for v in a] + [("b", float(v)) for v in b], ["g", "x"])
    kd = drift.ks_from_digests(df2, "x", "g").collect()[0]
    assert kd["ks"] == pytest.approx(np_ks(a, b), abs=0.05)


def test_grouped_digests_skewed_constant_column_spreads(spark):
    """ADVICE r2 (medium): a constant/heavy-hitter column must still spread
    across salts — the salt hashes row content, not the value. With a
    constant value and unique ids, level-1 must produce many sub-digests
    (value-hash salting produced exactly 1 per group)."""
    n = 10_000
    df = spark.range(n).select(
        F.col("id"),
        F.lit(3.14).alias("x"),
        (F.col("id") % 2 == 0).cast("string").alias("g"))
    # observe the level-1 spread directly: partial rows per group
    agg = drift.tdigest_udaf(100)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns], F.lit(7)),
                  F.lit(64))
    partial = (df.groupBy(F.col("g").alias("grp"), salt.alias("__salt"))
               .agg(agg(F.col("x").cast("double")).alias("d")))
    per_group = {r["grp"]: r["n"] for r in
                 partial.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert all(v > 32 for v in per_group.values()), per_group
    # and the merged quantiles are still exact for the constant
    prof = drift.quantile_profile(df, "x", "g").collect()
    for r in prof:
        assert all(abs(q - 3.14) < 1e-9 for q in r["quantiles"])


def test_grouped_digests_deterministic_across_parallelism(spark):
    """Sorted-merge hardening: the merged digest is a pure function of the
    partial set, so quantiles are identical across input partitionings."""
    import random
    rng = random.Random(7)
    rows = [(i, rng.gauss(0, 1), "g") for i in range(5000)]
    df = spark.createDataFrame(rows, "id long, x double, g string")
    a = drift.quantile_profile(df.repartition(2), "x", "g").collect()
    b = drift.quantile_profile(df.repartition(13), "x", "g").collect()
    assert a[0]["quantiles"] == b[0]["quantiles"]


def test_ks_from_digests_max_groups_guard(spark):
    """Round-3 verdict item 8: the single-task O(G^2) compare fails fast past
    max_groups with an actionable message."""
    df = spark.range(300).select(
        F.col("id").cast("double").alias("x"),
        F.col("id").cast("string").alias("g"))  # 300 groups
    out = drift.ks_from_digests(df, "x", "g", max_groups=10)
    with pytest.raises(Exception, match="max_groups"):
        out.collect()


def test_ks_from_digests_distributed_matches_single_task(spark):
    """The distributed pairwise compare (broadcast range self-join + scalar
    Arrow UDF) must produce EXACTLY the single-task applyInPandas results —
    same digests, same grids, same sup-gap — for every pair."""
    import random
    rng = random.Random(3)
    rows = []
    for g in range(8):
        mu = g * 0.5
        rows += [(i, rng.gauss(mu, 1.0), f"g{g}") for i in range(800)]
    df = spark.createDataFrame(rows, "id long, x double, g string")
    single = {(r["grp_a"], r["grp_b"]): r["ks"]
              for r in drift.ks_from_digests(df, "x", "g").collect()}
    dist = {(r["grp_a"], r["grp_b"]): r["ks"]
            for r in drift.ks_from_digests_distributed(df, "x", "g").collect()}
    assert set(single) == set(dist) and len(single) == 8 * 7 // 2
    for k in single:
        assert single[k] == dist[k], (k, single[k], dist[k])
    # sanity: distant cohorts drift more than near ones
    assert dist[("g0", "g7")] > dist[("g0", "g1")]


def test_categorical_psi_matches_numpy(spark):
    """Categorical PSI equals the hand-computed statistic, detects a mix
    shift, and is ~0 for identical mixes."""
    import numpy as np
    import pyspark.sql.functions as F
    from events_validator_spark.operators.drift import categorical_psi
    rows = ([("a", True)] * 50 + [("b", True)] * 50 +
            [("a", False)] * 80 + [("b", False)] * 20)
    df = spark.createDataFrame(rows, "cat string, cur boolean")
    got = categorical_psi(df, "cat", F.col("cur")).collect()[0]["psi"]
    p = np.array([0.5, 0.5]); q = np.array([0.8, 0.2])
    want = float(((p - q) * np.log(p / q)).sum())
    assert abs(got - want) < 1e-6
    same = spark.createDataFrame(
        [("a", True), ("b", True), ("a", False), ("b", False)],
        "cat string, cur boolean")
    assert abs(categorical_psi(same, "cat", F.col("cur"))
               .collect()[0]["psi"]) < 1e-9
    # a category present only in the current cohort raises the alarm term
    new = spark.createDataFrame(
        [("a", True), ("NEW", True), ("a", False)],
        "cat string, cur boolean")
    assert categorical_psi(new, "cat", F.col("cur")) \
        .collect()[0]["psi"] > 1.0


def test_tdigest_exactness_audit(spark):
    """The audit's exact column matches a direct percentile computation, all
    digest_ok booleans hold at delta=200, and an absurdly tight band flips
    them — the mechanism the drift3 driver oracle relies on."""
    import pyspark.sql.functions as F
    from events_validator_spark.operators.drift import tdigest_exactness_audit
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    g = ev.withColumn("half",
                      F.when(F.dayofmonth("ts") >= 16, "cur").otherwise("base"))
    rows = tdigest_exactness_audit(g, "value", "half").collect()
    assert len(rows) == 10  # 2 groups x 5 probes
    assert all(r["digest_ok"] for r in rows)
    med = [r for r in rows if r["grp"] == "base" and r["probe"] == 0.5][0]
    want = g.where(F.col("half") == "base") \
        .agg(F.round(F.percentile("value", F.lit(0.5)), 6).alias("m")) \
        .collect()[0]["m"]
    assert med["exact_value"] == want
    # a zero-width band must flip booleans (the digest is approximate)
    tight = tdigest_exactness_audit(g, "value", "half", rel_tol=1e-12).collect()
    assert any(not r["digest_ok"] for r in tight)
