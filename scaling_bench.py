#!/usr/bin/env python
"""North-rule scaling evidence: the SAME extraction job at two
parallelism levels (local[N] vs local[4N]) on the SAME input corpus.

The sandbox has no multi-node cluster, so cores stand in for
executors (task instructions): throughput at both levels plus
efficiency = (T_4N / T_N) / 4 is reported and recorded in BASELINE.md.

Usage: python scaling_bench.py [--convs 8000] [--n 8]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def run_once(cpus: int, convs: int, corpus_path: str) -> dict:
    from eynollah_spark.operators.extract import extract_spans
    from eynollah_spark.session import get_spark

    spark = get_spark(
        app_name=f"eynollah-scaling-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")
    turns = spark.read.parquet(corpus_path)
    n_turns = turns.count()
    # warm the JVM/Python workers so we measure steady-state throughput
    extract_spans(turns.limit(2000)).count()
    t0 = time.perf_counter()
    n_spans = extract_spans(turns).count()
    wall = time.perf_counter() - t0
    spark.stop()
    return {
        "cpus": cpus,
        "turns": n_turns,
        "spans": n_spans,
        "wall_s": round(wall, 3),
        "turns_per_sec": round(n_turns / wall, 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--convs", type=int, default=8000)
    ap.add_argument("--n", type=int, default=8, help="small cluster size N (large is 4N)")
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

    small = run_once(args.n, args.convs, corpus_path)
    large = run_once(args.n * 4, args.convs, corpus_path)
    eff = (large["turns_per_sec"] / small["turns_per_sec"]) / 4.0
    print(
        json.dumps(
            {
                "metric": "extraction throughput scaling N -> 4N cores",
                "N": small,
                "4N": large,
                "scaling_efficiency": round(eff, 3),
                "target": 0.8,
                "pass": eff >= 0.8,
            }
        )
    )


if __name__ == "__main__":
    main()
