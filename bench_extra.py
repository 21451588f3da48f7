"""Round-6 measurement harness (guide §1): per-query noop-sink timing +
plan capture, and a phase breakdown of bench.py's full_constraint_suite.

Does NOT replace bench.py (frozen for measurement); this is the iteration
tool. Usage:

    python bench_extra.py queries [name ...]      # time queries (fresh+steady)
    python bench_extra.py plans OUTDIR [name ...] # write explain("formatted")
    python bench_extra.py suite                   # per-phase suite breakdown

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf1.0 — the driver's
measurement SF), SPARK_GRAFT_CPUS (default 32), BENCH_REPEATS (default 3).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pyspark.sql.functions as F

import __spark_entry__ as entrymod
from events_validator_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CORES = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPEATS = int(os.environ.get("BENCH_REPEATS", "3"))


def _spark():
    spark = get_spark(app_name="evspark-bench-extra", cores=CORES,
                      shuffle_partitions=max(CORES, 8))
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def cmd_queries(names: list[str]) -> None:
    spark = _spark()
    qs = entrymod.queries()
    names = names or list(qs)
    out = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"fresh:{name}")
        t0 = time.monotonic()
        df = qs[name](spark, SF_DIR)
        _noop(df)
        fresh = time.monotonic() - t0
        best = None
        for i in range(REPEATS):
            spark.sparkContext.setJobDescription(f"steady:{name}:{i}")
            t0 = time.monotonic()
            _noop(df)
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        out[name] = {"fresh": round(fresh, 3), "steady": round(best, 3)}
        print(json.dumps({name: out[name]}), flush=True)
    total = round(sum(v["steady"] for v in out.values()), 3)
    print(json.dumps({"steady_total": total,
                      "fresh_total": round(sum(v["fresh"] for v in out.values()), 3),
                      "sf_dir": SF_DIR}))
    spark.stop()


def cmd_plans(outdir: str, names: list[str], suffix: str) -> None:
    os.makedirs(outdir, exist_ok=True)
    spark = _spark()
    qs = entrymod.queries()
    names = names or list(qs)
    for name in names:
        df = qs[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted"))
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print("wrote", path, flush=True)
    spark.stop()


def cmd_suite() -> None:
    """Phase breakdown of bench.py's full_constraint_suite (same inputs)."""
    from events_validator_spark.operators import drift, referential, uniqueness
    from events_validator_spark.operators.stats import profile
    from events_validator_spark.operators.validation import validate_typed
    from events_validator_spark.sources.synthetic import (
        CATALOG_SIZE_RATIO, DOC_RULES, interleaved_docs, media_catalog,
    )
    spark = _spark()
    sf_name = os.path.basename(os.path.normpath(SF_DIR))
    sf = float(sf_name.replace("sf", "")) if sf_name.startswith("sf") else 1.0
    n_docs = int(os.environ.get("BENCH_DOCS", str(int(6_000_000 * sf))))

    def one_pass(n):
        docs = interleaved_docs(spark, n, n_partitions=CORES * 2)
        catalog = media_catalog(spark, max(n // CATALOG_SIZE_RATIO, 16))
        phases = {}
        t0 = time.monotonic()
        spark.sparkContext.setJobDescription("suite: generate-only")
        _noop(docs)
        phases["0_generate_noop"] = round(time.monotonic() - t0, 3)
        t0 = time.monotonic()
        spark.sparkContext.setJobDescription("suite: validate")
        validated = validate_typed(docs, DOC_RULES)
        validated.select(F.explode("violations")).count()
        phases["1_validate"] = round(time.monotonic() - t0, 3)
        t0 = time.monotonic()
        spark.sparkContext.setJobDescription("suite: uniqueness")
        uniqueness.duplicate_keys(docs, ["doc_id"], n_salts=64).count()
        phases["2_uniqueness"] = round(time.monotonic() - t0, 3)
        t0 = time.monotonic()
        spark.sparkContext.setJobDescription("suite: referential")
        referential.referential_violations_spans(docs, catalog).count()
        phases["3_referential"] = round(time.monotonic() - t0, 3)
        t0 = time.monotonic()
        spark.sparkContext.setJobDescription("suite: profile")
        flat = docs.select(
            F.col("doc_id"), F.size("spans").alias("n_spans"),
            F.xxhash64("doc_id").alias("h"))
        profile(flat, ["n_spans"], approx=True).count()
        phases["4_profile"] = round(time.monotonic() - t0, 3)
        t0 = time.monotonic()
        spark.sparkContext.setJobDescription("suite: psi")
        drift.psi_two_cohorts(
            flat, "n_spans", F.pmod(F.col("h"), F.lit(2)) == 0,
            nbins=12, lo=0.0, hi=12.0).collect()
        phases["5_psi"] = round(time.monotonic() - t0, 3)
        phases["total"] = round(sum(v for k, v in phases.items()
                                    if k != "0_generate_noop"), 3)
        return phases

    one_pass(10_000)  # warmup, mirrors bench.py
    for i in range(REPEATS):
        print(json.dumps({"pass": i, "n_docs": n_docs,
                          **one_pass(n_docs)}), flush=True)
    spark.stop()


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "queries"
    if cmd == "queries":
        cmd_queries(sys.argv[2:])
    elif cmd == "plans":
        outdir = sys.argv[2]
        suffix = os.environ.get("PLAN_SUFFIX", "before")
        cmd_plans(outdir, sys.argv[3:], suffix)
    elif cmd == "suite":
        cmd_suite()
    else:
        raise SystemExit(f"unknown command {cmd}")
