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
              order_col: str, n_salts: int = 32, seed: int = 42) -> DataFrame:
    """At most ``quota`` rows per group, keeping the FIRST by ``order_col``
    (ascending; pass a unique id/priority — the total order is what makes
    the kept set deterministic).

    The anti-monoculture cap every crawl pipeline applies (no domain may
    dominate the corpus) — EXACT and skew-safe via two-phase salted top-N:

      phase 1: top-``quota`` per (group, row-local salt) — a hot group's
               rows spread over ``n_salts`` reducers, each holding
               hot_rows/n_salts, so no single reducer ever materializes a
               whole hot domain (the straggler+OOM a plain per-group
               window guarantees at web scale);
      phase 2: exact top-``quota`` over the union — input is now bounded
               by quota·n_salts rows PER GROUP, however hot the group.

    Exactness: every global top-quota row is also top-quota within its
    salt bucket, so phase 1's union is a superset of the answer and
    phase 2 is exact — for ANY salt assignment (the salt never touches
    payload columns beyond ``order_col`` — already scanned — so column
    pruning reaches the scan; pinned by the vs-naive equivalence test).
    ``n_salts=1`` degenerates to the single-window form.

    The salt is ``xxhash64(order_col, seed)`` — a DETERMINISTIC pure
    function of row content (ADVICE r4): a nondeterministic salt (rand /
    monotonically_increasing_id) routes recomputed map tasks differently on
    a stage retry after a fetch failure, duplicating or dropping rows
    (SPARK-23207 class) exactly in the large-cluster regime this operator
    targets. ``order_col`` is unique per the contract, so the hash still
    spreads a hot group uniformly over ``n_salts`` reducers.
    """
    order = F.col(order_col).asc()
    if n_salts > 1:
        salt = F.pmod(F.xxhash64(F.col(order_col), F.lit(seed)),
                      F.lit(n_salts)).alias("__salt")
        w1 = Window.partitionBy(group_col, "__salt").orderBy(order)
        df = (df.withColumn("__salt", salt)
              .withColumn("__rn1", F.row_number().over(w1))
              .where(F.col("__rn1") <= quota)
              .drop("__salt", "__rn1"))
    w = Window.partitionBy(group_col).orderBy(order)
    return (df.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= quota)
            .drop("__rn"))
