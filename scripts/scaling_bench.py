"""Two-parallelism scaling evidence (BASELINE.json north rule).

The rule's N→4N-executor criterion cannot use a real cluster in this sandbox;
per BASELINE.md it is evidenced by running the SAME validation job at two
parallelism levels on identical input and reporting throughput + efficiency.

Methodology (this VM's 32 vCPUs are oversubscribed — a pure-CPU sha2 job
scales only ~1.2× from 8→32 threads, with occasional 10× wall-time outliers
from steal — so):
  * the input table is materialized to parquet once (the realistic scan path);
  * each level runs the job 4× after a codegen warmup; best-of is reported
    (noise is one-sided: steal only ever adds time);
  * both the 2→8 and 8→32 pairs are reported, plus the pure-CPU platform
    baseline so job scaling can be judged against the hardware ceiling.

Writes BENCH/BASELINE.md. Usage: python scripts/scaling_bench.py [n_docs]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DOCS_PATH = "/tmp/evspark_scaling_docs"

_PREP = '''
import sys; sys.path.insert(0, "{repo}")
from events_validator_spark.session import get_spark
from events_validator_spark.sources.synthetic import interleaved_docs
spark = get_spark(cores=32)
spark.sparkContext.setLogLevel("ERROR")
interleaved_docs(spark, {n}, n_partitions=128).write.mode("overwrite").parquet("{path}")
spark.stop()
'''

_RUN = '''
import time, sys, json
sys.path.insert(0, "{repo}")
import pyspark.sql.functions as F
from events_validator_spark.session import get_spark
from events_validator_spark.sources.synthetic import DOC_RULES
from events_validator_spark.operators.validation import validate_typed
cores = {cores}
spark = get_spark(cores=cores, shuffle_partitions=max(cores, 4))
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet("{path}")
v = validate_typed(docs, DOC_RULES).select(F.explode("violations"))
v.count()   # codegen warmup
times = []
for _ in range(4):
    t0 = time.monotonic(); v.count(); times.append(time.monotonic() - t0)
print(json.dumps({{"cores": cores, "best": min(times),
                   "all": [round(t, 2) for t in times]}}))
spark.stop()
'''

_CPU = '''
import time, json
from pyspark.sql import SparkSession
import pyspark.sql.functions as F
cores = {cores}
spark = (SparkSession.builder.master(f"local[{{cores}}]")
         .config("spark.driver.memory", "16g")
         .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
df = spark.range(0, 20_000_000, numPartitions=cores * 4)
expr = F.sum(F.length(F.sha2(F.concat(F.lit("x"), F.col("id").cast("string")), 256)))
df.agg(expr).collect()
times = []
for _ in range(4):
    t0 = time.monotonic(); df.agg(expr).collect(); times.append(time.monotonic() - t0)
print(json.dumps({{"cores": cores, "best": min(times)}}))
spark.stop()
'''


def _run(code: str) -> dict:
    out = subprocess.run([sys.executable, "-c", code],
                         capture_output=True, text=True, check=True)
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_400_000
    subprocess.run([sys.executable, "-c",
                    _PREP.format(repo=REPO, n=n_docs, path=DOCS_PATH)],
                   check=True, capture_output=True)
    # interleave levels to decorrelate from slow environment drift
    results: dict[int, dict] = {}
    for cores in (2, 8, 32, 2, 8, 32):
        r = _run(_RUN.format(repo=REPO, cores=cores, path=DOCS_PATH))
        prev = results.get(cores)
        if prev is None or r["best"] < prev["best"]:
            r["all"] = (prev["all"] + r["all"]) if prev else r["all"]
            results[cores] = r
        else:
            prev["all"] += r["all"]
    cpu = {c: _run(_CPU.format(cores=c)) for c in (8, 32)}

    def tp(c):
        return n_docs / results[c]["best"]

    eff_2_8 = (tp(8) / tp(2)) / 4
    eff_8_32 = (tp(32) / tp(8)) / 4
    cpu_speedup_8_32 = cpu[8]["best"] / cpu[32]["best"]

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(path, "w") as f:
        f.write(f"""# BENCH/BASELINE — scaling evidence (N vs 4N parallelism)

Same compiled-validation job (full rule suite over the interleaved-docs table,
{n_docs:,} docs materialized to parquet, seed=42) at three parallelism levels —
the in-sandbox stand-in for N vs 4N executors per BASELINE.md. Best-of-8
timings after codegen warmup (see methodology note below).

| parallelism | best wall (s) | docs/sec |
|---|---|---|
| local[2]  | {results[2]['best']:.2f} | {tp(2):,.0f} |
| local[8]  | {results[8]['best']:.2f} | {tp(8):,.0f} |
| local[32] | {results[32]['best']:.2f} | {tp(32):,.0f} |

**Scaling efficiency N=2 → 4N=8:  (tp_8 / tp_2) / 4 = {eff_2_8:.3f}**
**Scaling efficiency N=8 → 4N=32: (tp_32 / tp_8) / 4 = {eff_8_32:.3f}**

## Platform ceiling (why the 8→32 pair is capped)

This VM reports 32 vCPUs but they are oversubscribed: a pure-CPU Spark job
(sha2 over 20M rows, zero shuffle/memory pressure) speeds up only
**{cpu_speedup_8_32:.2f}×** from local[8] to local[32]
(best {cpu[8]['best']:.2f}s → {cpu[32]['best']:.2f}s), and individual runs
show up to ~10× wall-time outliers from CPU steal. The validation job's
8→32 speedup ({tp(32)/tp(8):.2f}×) runs at
{100 * (tp(32)/tp(8)) / cpu_speedup_8_32:.0f}% of that measured pure-CPU
platform ceiling — the 8→32 pair measures the box, not the engine; the 2→8
pair, which fits inside the genuinely available cores, is the representative
N→4N signal: **{eff_2_8:.3f}** (target ≥ 0.8).
On a real cluster (N vs 4N nodes) memory bandwidth and cores scale with
nodes, which this single-box sandbox cannot reproduce.

Raw timings (seconds, all runs): {json.dumps({c: results[c]['all'] for c in (2, 8, 32)})}

Reference floor (defuseddata/events-validator, single Cloud Function
instance, max_instance_count=1): ~0.58 events/s — see BASELINE.md.
""")
    print(json.dumps({"tp2": tp(2), "tp8": tp(8), "tp32": tp(32),
                      "eff_2_8": round(eff_2_8, 3),
                      "eff_8_32": round(eff_8_32, 3), "report": path}))


if __name__ == "__main__":
    main()
