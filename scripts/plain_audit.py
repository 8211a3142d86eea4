#!/usr/bin/env python
"""Full-registry conf-independence audit (r12 verdict item 6).

Runs EVERY registry query on a PLAIN default-config SparkSession (200
shuffle partitions, stock AQE — the driver's session shape, not
get_spark()'s tuned conf) at sf0.01 and hash-compares each result to its
DuckDB oracle with the same canonicalization the driver uses. A query
whose correctness depended on partition count or tuned conf would pass
the pytest sweep but fail here.

Writes one JSON line per query to stdout and a summary + failures to
PLAIN_AUDIT.json. Usage:  python scripts/plain_audit.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from pyspark.sql import SparkSession

    # Stop any ambient session so getOrCreate() cannot silently reuse a
    # tuned conf, and SET the plain defaults rather than asserting them —
    # SPARK_CONF_DIR / spark-defaults must not be able to abort the audit.
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("plain-audit")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "200")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from tests.oracle_harness import compare
    from xarray_sql_spark.queries import REGISTRY

    t0 = time.perf_counter()
    results: dict[str, str] = {}
    failures: dict[str, str] = {}
    for name, spec in REGISTRY.items():
        try:
            if spec.oracle is None:
                results[name] = "no-oracle"
                continue
            compare(spec.fn(spark, sf_dir), spec.oracle, sf_dir)
            results[name] = "green"
        except Exception as exc:  # noqa: BLE001 — keep auditing
            results[name] = "FAIL"
            failures[name] = f"{type(exc).__name__}: {exc}"[:500]
            traceback.print_exc(limit=3, file=sys.stderr)
        print(json.dumps({name: results[name]}), flush=True)
    out = {
        "sf_dir": sf_dir,
        "ts_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "wall_sec": round(time.perf_counter() - t0, 1),
        "n_queries": len(results),
        "n_green": sum(1 for v in results.values() if v == "green"),
        "n_fail": len(failures),
        "failures": failures,
    }
    with open(os.path.join(ROOT, "PLAIN_AUDIT.json"), "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps({k: v for k, v in out.items() if k != "failures"}))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
