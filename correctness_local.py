#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate, with per-query timing.

Runs EVERY `__spark_entry__.queries()` entry on Spark and (where an
oracle exists) the matching DuckDB SQL on the same parquet tables,
compares row multisets exactly like the driver (column-name-sorted
value tuples), and writes CORRECTNESS_local.json next to the driver's
CORRECTNESS_r{N}.json files.

Usage:
    python correctness_local.py [--sf /root/testdata/sf0.01] [--out CORRECTNESS_local.json]

The driver's per-round pass is time-budgeted (r3/r4 each covered ~50
rows before the budget ran out); this mirror exists so every round
still publishes a complete record over every queries() entry (101 as
of round 5, all with exact oracles), and so slow queries are visible
(the "spark_sec" / "oracle_sec" fields) and can have their default
knobs shaved. __spark_entry__._DRIVER_ORDER additionally orders the
driver-facing dict changed-rows-first then cheapest-first so the
driver's budget covers as many rows as possible.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                elif v == 0.0:
                    v = 0.0
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=repr)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01"))
    ap.add_argument("--out", default="CORRECTNESS_local.json")
    ap.add_argument("--only", default=None, help="comma-separated query names")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("correctness-local")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = list(qs)
    if args.only:
        names = [n for n in args.only.split(",") if n in qs]

    results: dict[str, dict] = {}
    t_total = time.time()
    for name in names:
        rec: dict = {"err": None}
        try:
            t0 = time.time()
            sdf = qs[name](spark, args.sf)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            rec["spark_sec"] = round(time.time() - t0, 3)
            rec["spark_rows"] = len(srows)
            if name in oracles:
                t0 = time.time()
                con = _duck(args.sf)
                res = con.sql(oracles[name])
                dcols = res.columns
                drows = res.fetchall()
                con.close()
                rec["oracle_sec"] = round(time.time() - t0, 3)
                rec["oracle_rows"] = len(drows)
                rec["rows_match"] = len(srows) == len(drows)
                rec["schema_match"] = sorted(scols) == sorted(dcols)
                sn = _normalize(srows, scols)
                dn = _normalize(drows, dcols)
                rec["hash_match"] = sn == dn
            else:
                rec["rows_match"] = True  # rows-only contract
                rec["schema_match"] = bool(scols)
                rec["hash_match"] = None
                rec["no_oracle"] = True
        except Exception as exc:  # noqa: BLE001
            rec["err"] = f"{type(exc).__name__}: {exc}"[:400]
            rec.setdefault("hash_match", False)
        results[name] = rec
        status = "OK " if rec["err"] is None and rec.get("hash_match") in (True, None) else "FAIL"
        print(
            f"{status} {name:32s} spark={rec.get('spark_sec', '-'):>7}s "
            f"oracle={rec.get('oracle_sec', '-'):>7}s rows={rec.get('spark_rows', '-')}",
            flush=True,
        )

    summary = {
        "sf": args.sf,
        "n_queries": len(results),
        "n_oracle": sum(1 for r in results.values() if not r.get("no_oracle")),
        "n_green": sum(
            1 for r in results.values() if r["err"] is None and r.get("hash_match") in (True, None)
        ),
        "total_sec": round(time.time() - t_total, 1),
    }
    out = {"_summary": summary, **results}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(summary))
    spark.stop()
    return 0 if summary["n_green"] == summary["n_queries"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
