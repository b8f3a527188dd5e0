#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Headline metric: extraction throughput (turns/sec) over the
deterministic synthetic transcript corpus (BASELINE.json input_hint
shape), scaled by sf, plus the relational/dedup/similarity operator
suite over the driver testdata tables.

Two-cluster-size scaling evidence (north_rule ">=0.8 efficiency from N
to 4N executors"): run this twice —
    SPARK_GRAFT_CPUS=8  python bench.py
    SPARK_GRAFT_CPUS=32 python bench.py
and compare throughput_turns_per_sec (see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    try:
        sf = float(sf_dir.rstrip("/").split("sf")[-1])
    except ValueError:
        sf = 0.1

    from eynollah_spark.session import get_spark

    spark = get_spark(
        app_name="eynollah-spark-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={
            # local corpora are tiny; shrink splits so scans parallelize
            # across all cores (production defaults are right at scale)
            "spark.sql.files.maxPartitionBytes": str(512 * 1024),
            "spark.sql.files.openCostInBytes": str(64 * 1024),
            "spark.sql.execution.arrow.maxRecordsPerBatch": str(32768),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod
    from eynollah_spark.fixtures.transcripts import CorpusSpec, generate_spark
    from eynollah_spark.operators.extract import extract_spans

    timings: dict[str, float] = {}

    # --- extraction throughput over the synthetic transcript corpus ---
    n_convs = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", str(max(int(200000 * sf), 50))))
    spec = CorpusSpec(n_convs=n_convs)
    corpus = generate_spark(spark, spec, parallelism=cpus * 2).persist()
    n_turns = corpus.count()  # materialize the corpus outside the timed region

    # best of 3 with the raw samples published: the host has heavy
    # noisy-neighbor interference (BASELINE.md records 1.5x spreads on
    # identical binaries) and the driver records a single bench
    # invocation, so the JSON carries the spread alongside the best
    # untimed warmup passes (VERDICT r3 #9): the first extraction pays
    # JIT + codegen + Arrow-batch allocator warmup (driver r3 samples
    # were still descending at n=3: 8.08/5.09/4.04 s); two throwaway
    # runs put the timed samples at steady state (one pass still left
    # a 33% descent — the JVM C2 compiler needs the second)
    extract_spans(corpus).count()
    extract_spans(corpus).count()

    extract_runs: list[float] = []
    n_spans = 0
    for _ in range(3):
        t0 = time.perf_counter()
        n_spans = extract_spans(corpus).count()
        extract_runs.append(round(time.perf_counter() - t0, 3))
    extract_s = min(extract_runs)
    timings["extract_spans"] = round(extract_s, 3)
    corpus.unpersist()

    # --- operator suite over the driver testdata ---
    qs = entrymod.queries()
    bench_queries = [
        "pricing_summary",
        "top_orders",
        "region_revenue",
        "customer_top_order",
        "events_sessionize",
        "events_minute_rollup",
        "doc_region_runs",
        "token_stats",
        "quality_scores",
        "dedup_exact",
        "jaccard_pairs",
        "minhash_lsh_pairs",
        "simhash_pairs",
        "embedding_topk",
    ]
    # two alternating passes over the whole query list (not two
    # back-to-back runs of each query) so an interference burst cannot
    # inflate both samples of the same query; best-of is recorded,
    # both samples are published
    query_runs: dict[str, list[float]] = {name: [] for name in bench_queries}
    for _ in range(2):
        for name in bench_queries:
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).count()
            query_runs[name].append(round(time.perf_counter() - t0, 3))
    for name in bench_queries:
        timings[name] = min(query_runs[name])

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline suite wall time (extraction + operator queries)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cpus": cpus,
                # sample counts are per-section: the headline extraction
                # is best-of-3, each operator query best-of-2 alternating
                # passes (the runs arrays are the raw samples)
                "n_extract_runs": len(extract_runs),
                "n_query_passes": 2,
                "extract_runs": extract_runs,
                "query_runs": query_runs,
                "extract_turns": n_turns,
                "extract_spans": n_spans,
                "throughput_turns_per_sec": round(n_turns / extract_s, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
