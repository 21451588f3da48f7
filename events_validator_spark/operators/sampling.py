"""Deterministic sampling & quota operators for training-data pipelines.

Web-scale corpus construction samples constantly — subsample a crawl, cap
any one domain's share, carve held-out slices — and at 100 TB the sample
must be a PURE FUNCTION of the row key: ``df.sample()`` draws differently
per run/partitioning, so a resume or incremental append silently changes
membership. Everything here is keyed hashing or explicit ordering — stable
across reruns, parallelism, resume, and appends (a doc's fate never
changes), and exactly reproducible by the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

_BUCKETS = 1_000_000


def _hash_bucket(key: Column, seed: int, hash_fn: str) -> Column:
    """Uniform bucket in [0, 1e6) from a key column.

    ``xxhash64`` (default): fastest, JVM-side. ``md5``: byte-identical in
    DuckDB (``('0x' || substr(md5(k), 1, 8))::BIGINT``) — the cross-engine
    oracle path; first 8 hex chars = 32 uniform bits, plenty for 1e6
    buckets."""
    k = key.cast("string")
    if hash_fn == "md5":
        h = F.conv(F.substring(F.md5(F.concat(k, F.lit(f"#{seed}"))), 1, 8),
                   16, 10).cast("long")
    else:
        h = F.xxhash64(k, F.lit(seed))
    return F.pmod(h, F.lit(_BUCKETS))


def hash_sample(df: DataFrame, rate: float, key_col: str, seed: int = 42,
                hash_fn: str = "xxhash64") -> DataFrame:
    """Keep a deterministic ``rate`` fraction of rows, keyed on ``key_col``.

    Membership = ``bucket(key, seed) < rate * 1e6`` — shuffle-free, a pure
    row-local filter that Catalyst pushes wherever the key column reaches
    (one scan, no state). Different ``seed`` values give independent
    samples; disjoint held-out slices come from :func:`hash_split`.
    """
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    cut = int(rate * _BUCKETS)
    return df.where(_hash_bucket(F.col(key_col), seed, hash_fn) < cut)


def hash_split(df: DataFrame, weights: list[float], key_col: str,
               seed: int = 42, hash_fn: str = "xxhash64") -> list[DataFrame]:
    """Disjoint, exhaustive, deterministic splits (e.g. train/val/test).

    Buckets are partitioned by cumulative weight cutoffs, so every row lands
    in EXACTLY one split regardless of run or cluster size — the property a
    train/held-out boundary must have to stay leak-free across pipeline
    reruns."""
    if abs(sum(weights) - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {sum(weights)}")
    b = _hash_bucket(F.col(key_col), seed, hash_fn)
    cuts, acc = [], 0.0
    for w in weights:
        acc += w
        cuts.append(int(round(acc * _BUCKETS)))
    cuts[-1] = _BUCKETS  # close the last interval against rounding
    out, lo = [], 0
    for hi in cuts:
        out.append(df.where((b >= F.lit(lo)) & (b < F.lit(hi))))
        lo = hi
    return out


def quota_cap(df: DataFrame, group_col: str, quota: int,
              order_col: str) -> DataFrame:
    """At most ``quota`` rows per group, keeping the first by
    ``order_col`` (ascending, ties broken by the column itself being the
    total order — pass a unique id/priority).

    The anti-monoculture cap every crawl pipeline applies (no domain may
    dominate the corpus). One shuffle on ``group_col`` + a per-group
    window. SKEW NOTE: row_number needs each group's rows on one reducer,
    so a pathological hot group (>> executor memory) is the straggler the
    skew playbook covers — at web scale pre-thin hot groups first with
    :func:`hash_sample` at a rate that leaves ~10× quota, THEN cap
    exactly; the pre-thinning is row-local and keeps the window input
    bounded, while the final cap stays exact on the survivors.
    """
    w = Window.partitionBy(group_col).orderBy(F.col(order_col).asc())
    return (df.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= quota)
            .drop("__rn"))
