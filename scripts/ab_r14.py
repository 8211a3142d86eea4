#!/usr/bin/env python
"""Interleaved same-window A/B of named queries against their r14 (b0e1dd1)
builders. Loads the r14 modules from git blobs into a THROWAWAY registry
(so the live REGISTRY keeps the current builders), proves outputs
identical, then alternates old/new to the noop sink within one session —
the only decision-grade protocol on this box.

Usage: python scripts/ab_r14.py ts15_bigram_surprisal hh04_kmv_set_ops
"""

from __future__ import annotations

import importlib.util
import os
import statistics
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

R14 = "b0e1dd1"
R14_MODULES = (
    "xarray_sql_spark/queries/pipeline_ops.py",
    "xarray_sql_spark/queries/advanced_ops.py",
)


def load_r14_registry() -> dict:
    """Exec the r14 query modules with the registry swapped out, return
    the throwaway name->QuerySpec dict they populate."""
    import xarray_sql_spark.queries  # noqa: F401 — populate live registry first
    import xarray_sql_spark.registry as reg

    live = reg.REGISTRY
    sandbox: dict = {}
    reg.REGISTRY = sandbox
    try:
        for rel in R14_MODULES:
            blob = subprocess.run(
                ["git", "-C", ROOT, "show", f"{R14}:{rel}"],
                capture_output=True, text=True, check=True,
            ).stdout
            path = os.path.join("/tmp", "r14_" + os.path.basename(rel))
            with open(path, "w") as f:
                f.write(blob)
            name = "r14_" + os.path.basename(rel)[:-3]
            spec = importlib.util.spec_from_file_location(name, path)
            mod = importlib.util.module_from_spec(spec)
            sys.modules[name] = mod
            spec.loader.exec_module(mod)
    finally:
        reg.REGISTRY = live
    return sandbox


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rounds = int(os.environ.get("AB_ROUNDS", "6"))

    old_reg = load_r14_registry()
    from xarray_sql_spark.queries import REGISTRY
    from xarray_sql_spark.session import get_spark

    spark = get_spark("ab-r14")

    def run(fn) -> float:
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    for name in names:
        old_fn, new_fn = old_reg[name].fn, REGISTRY[name].fn
        a = sorted(map(tuple, old_fn(spark, sf_dir).collect()))
        b = sorted(map(tuple, new_fn(spark, sf_dir).collect()))
        assert a == b, f"{name}: OUTPUT DIVERGES ({len(a)} vs {len(b)} rows)"
        print(f"{name}: outputs identical ({len(a)} rows)", flush=True)
        run(old_fn)
        run(new_fn)
        olds, news = [], []
        for i in range(rounds):
            spark.sparkContext._jvm.System.gc()
            olds.append(run(old_fn))
            news.append(run(new_fn))
            print(
                f"{name} round {i}: r14={olds[-1]:.3f} now={news[-1]:.3f}",
                flush=True,
            )
        mo, mn = statistics.median(olds), statistics.median(news)
        print(f"{name} MEDIAN r14={mo:.3f} now={mn:.3f} speedup={mo/mn:.2f}x")


if __name__ == "__main__":
    main()
