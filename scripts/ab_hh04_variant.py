#!/usr/bin/env python
"""Interleaved A/B: hh04 current exact-twin (groupBy(hv).collect_set)
vs the distinct-then-collect_set variant that won r15's 100x probe
(3.99 vs 4.16 s). Monkeypatches the one expression difference."""

from __future__ import annotations

import os
import statistics
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F  # noqa: E402

from xarray_sql_spark.queries import advanced_ops  # noqa: E402
from xarray_sql_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rounds = int(os.environ.get("AB_ROUNDS", "6"))
    spark = get_spark("ab-hh04v")

    cur = advanced_ops.hh04_kmv_set_ops

    # Variant: pre-dedup (source, hv) with an explicit distinct before the
    # hv group — built by cloning the builder source with that one
    # expression swapped, then exec'ing the bare function (decorator
    # stripped so the live registry is untouched).
    import inspect

    src = inspect.getsource(advanced_ops.hh04_kmv_set_ops)
    assert 'hs = hv.groupBy("hv").agg(' in src
    variant_src = src.replace(
        'hs = hv.groupBy("hv").agg(', 'hs = hv.distinct().groupBy("hv").agg('
    )
    ns = vars(advanced_ops).copy()
    lines = variant_src.splitlines()
    start = next(i for i, ln in enumerate(lines) if ln.startswith("def hh04"))
    body = "\n".join(lines[start:])
    exec(body, ns)
    var_fn = ns["hh04_kmv_set_ops"]

    def run(fn) -> float:
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    a = sorted(map(tuple, cur(spark, sf_dir).collect()))
    b = sorted(map(tuple, var_fn(spark, sf_dir).collect()))
    assert a == b, f"OUTPUT DIVERGES ({len(a)} vs {len(b)})"
    print(f"outputs identical ({len(a)} rows)", flush=True)
    run(cur)
    run(var_fn)
    curs, vars_ = [], []
    for i in range(rounds):
        spark.sparkContext._jvm.System.gc()
        curs.append(run(cur))
        vars_.append(run(var_fn))
        print(f"round {i}: cur={curs[-1]:.3f} variant={vars_[-1]:.3f}", flush=True)
    mc, mv = statistics.median(curs), statistics.median(vars_)
    print(f"MEDIAN cur={mc:.3f} variant={mv:.3f} variant_speedup={mc/mv:.2f}x")


if __name__ == "__main__":
    main()
