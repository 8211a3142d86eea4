#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Timing is end-to-end per query: build the DataFrame plan + execute it to the
``noop`` batch sink (``df.write.format("noop")``), which runs EVERY operator
including deterministic projections — ``df.count()`` is not used because
Catalyst prunes projection work under a count (a pandas-UDF projection never
executes; round-1 ADVICE verified this empirically), which under-measures
projection-shaped queries. Each query gets one untimed warm-up execution
first so single-rep driver runs (SPARK_GRAFT_BENCH_REPS=1) measure the
query, not codegen/broadcast/worker-fork cold starts.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from xarray_sql_spark.queries import REGISTRY  # noqa: E402
from xarray_sql_spark.registry import reset_train_caches  # noqa: E402
from xarray_sql_spark.session import get_spark  # noqa: E402


def main() -> None:
    wall_t0 = time.perf_counter()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "0.1")
    spark = get_spark("xarray-sql-spark-bench")

    # Warm the JVM, the Python UDF worker pool, and the parquet footers once
    # so per-query numbers measure the queries, not process spin-up (first
    # mapInPandas pays ~2.5 s of worker forking; first parquet read pays
    # footer/codegen costs — one-time noise, not operator cost).
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(1000).mapInPandas(lambda it: it, "id long").count()
    for t in ("lineitem", "orders", "events", "documents", "embeddings"):
        try:
            spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet")).count()
        except Exception:
            pass

    # Median of N reps per query (reference protocol: median of 5 cold runs,
    # BASELINE.md) — single-shot numbers on a shared box swing 3-5x on GC /
    # noisy-neighbor hiccups.
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))

    def run_once(spec) -> None:
        # Clear every registered driver-side train memo (BPE merges, PQ
        # codebooks, ts20/ts25/pl21 weights) so EACH rep — warm-up and
        # timed alike — pays full training cost. Before r16 the warm-up
        # populated these memos and the timed medians of ~11 queries
        # excluded recurring training (r15 verdict integrity item 1);
        # numbers from r15 and earlier under-count those queries.
        reset_train_caches()
        # noop sink executes the full plan (projections included) without
        # result-transfer or disk-write noise.
        spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    def densest_stage_tasks(group: str) -> int:
        """Max task count across the stages of the jobs in ``group`` — the
        per-query partition sanity signal (a heavy query whose densest stage
        is a handful of tasks is running serially; single-row-group parquet
        inputs hide exactly this)."""
        st = spark.sparkContext.statusTracker()
        best = 0
        for jid in st.getJobIdsForGroup(group):
            job = st.getJobInfo(jid)
            if job is None:
                continue
            for sid in job.stageIds:
                stage = st.getStageInfo(sid)
                if stage is not None:
                    best = max(best, stage.numTasks)
        return best

    # SPARK_GRAFT_BENCH_ONLY="name1 name2": subset the sweep for isolated
    # triage runs; the driver never sets it, so round artifacts stay full.
    only = set(os.environ.get("SPARK_GRAFT_BENCH_ONLY", "").split()) or None

    # Queries where the spread=True remedy for a narrow densest stage was
    # MEASURED and made things worse (verify gotcha: light explode does
    # not repay repartitioning the text) — the input-bound condition is
    # known, investigated, and recorded here, so the sweep does not
    # re-flag it every round. Isolated sf0.1 medians:
    _SPREAD_MEASURED = {
        "ts24_kneser_ney_surprisal": "serial 1.50 vs spread 1.74 (r14)",
        "hh04_kmv_set_ops": "serial 1.45 vs spread 1.65 (r14)",
        "pl14b_quality_calibration_two_pass": (
            "serial 1.78 vs spread 1.90 (r15; the two text-split scans "
            "are the floor — repartitioning the text does not repay)"
        ),
    }

    timings: dict[str, float] = {}
    all_samples: dict[str, list[float]] = {}
    errors: dict[str, str] = {}
    for name, spec in REGISTRY.items():
        if not spec.bench or (only is not None and name not in only):
            continue
        try:
            run_once(spec)  # untimed warm-up: codegen + broadcast + shuffle files
        except Exception as exc:  # noqa: BLE001 — one broken query must not
            # kill the whole bench (round 3: a single AnalysisException left
            # the driver with rc=1 and NO bench JSON at all).
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"ERROR {name}: {errors[name]}", file=sys.stderr)
            continue
        # Collect the accumulated broadcast/shuffle garbage OUTSIDE the
        # timed region: local-mode contexts otherwise defer cleanup until a
        # full GC lands mid-query (observed as 5-15 s outlier samples).
        spark.sparkContext._jvm.System.gc()
        spark.sparkContext.setJobGroup(name, f"bench:{name}")
        samples = []
        try:
            for _ in range(reps):
                t0 = time.perf_counter()
                run_once(spec)
                samples.append(time.perf_counter() - t0)
        except Exception as exc:  # noqa: BLE001 — flaky mid-rep failures
            # (OOM, broadcast timeout) must also degrade to a per-query
            # error, not an rc=1 bench with no JSON.
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"ERROR {name}: {errors[name]}", file=sys.stderr)
            continue
        finally:
            spark.sparkContext.setJobGroup("", "")
        # Raw per-rep samples in run order (r15 verdict item 7): lets a
        # reader quantify box drift per query from the committed artifact
        # without re-running the sweep.
        all_samples[name] = [round(s, 4) for s in samples]
        samples.sort()
        # Lower median: with reps=2 the upper-middle element reports the
        # WORSE of two runs, so one GC hiccup inflated the round-2 numbers.
        timings[name] = round(samples[(len(samples) - 1) // 2], 4)
        # Partition sanity is meaningful only at bench scale (sf >= 0.05):
        # at sf0.01 every stage is tiny and fixed overheads dominate.
        if (
            sf >= 0.05
            and timings[name] > 1.0
            and densest_stage_tasks(name) < 8
        ):
            if name in _SPREAD_MEASURED:
                # Keep the suppression VISIBLE (ADVICE r14): if this query
                # is later rewritten, a stale allowlist entry would silently
                # hide a real narrow-stage regression — the note in the round
                # artifact's stderr is the audit trail that it still fires.
                print(
                    f"NOTE {name}: narrow-densest-stage warning suppressed "
                    f"(measured: {_SPREAD_MEASURED[name]})",
                    file=sys.stderr,
                )
                continue_warn = False
            else:
                continue_warn = True
        else:
            continue_warn = False
        if continue_warn:
            # Two distinct causes. (a) Heavy per-row work after an
            # unsplittable scan: fixable with table(spread=True), warn.
            # (b) The scan ITSELF is the bottleneck on a single-row-group
            # file: parquet can't split a row group, and a repartition only
            # adds a shuffle on top of the same serial read (measured in
            # round 3) — nothing actionable in the query, so say that.
            import pyarrow.parquet as pq

            splittable = any(
                pq.ParquetFile(os.path.join(sf_dir, f"{t}.parquet")).num_row_groups >= 8
                for t in ("lineitem", "orders", "events", "documents", "embeddings")
            )
            kind = (
                "serial hot loop; spread the scan (session.table spread=True)"
                if splittable
                else "input-bound: single-row-group parquet caps scan parallelism "
                "(layout artifact of the local testdata, not the plan)"
            )
            print(
                f"WARN {name}: {timings[name]}s but densest stage < 8 tasks — {kind}",
                file=sys.stderr,
            )
    # Regression triage (r13 verdict item 3): a query slowing >1.3x
    # round-over-round is either a real regression or box swing, and the
    # artifact must let a reader tell which WITHOUT a judge re-run. For
    # each such query, re-run it isolated (3 reps, post-GC) at the end of
    # the sweep and record the best sample as its floor: a floor near the
    # previous round's time proves box swing during the sweep; a floor
    # near the new time is a real regression.
    floors: dict[str, dict] = {}
    repo_dir = os.path.dirname(os.path.abspath(__file__))
    # Two baselines (r14 verdict item 4): the last committed BENCH_LOCAL
    # alone misses regressions that an interim committed run already baked
    # in (ts20/pl01/ev02 in r14 drew no floor because BENCH_LOCAL was the
    # already-regressed sweep). Also diff against the most recent driver
    # round artifact BENCH_r{NN}.json and floor anything >1.3x vs EITHER.
    prior_maps: dict[str, dict] = {}
    try:
        with open(os.path.join(repo_dir, "BENCH_LOCAL.json")) as f:
            prior_maps["local"] = json.load(f).get("queries", {})
    except Exception:  # noqa: BLE001 — first run / corrupt artifact
        prior_maps["local"] = {}
    import glob as _glob

    round_artifacts = sorted(_glob.glob(os.path.join(repo_dir, "BENCH_r*.json")))
    if round_artifacts:
        try:
            with open(round_artifacts[-1]) as f:
                art = json.load(f)
            # The driver artifact's stdout line carries only ~16 queries
            # (baseline shapes + slowest); the FULL per-query map of that
            # round is BENCH_LOCAL.json at the commit that recorded the
            # artifact — read it via git so interim local commits can't
            # bake a regression into the only baseline.
            parsed = art.get("parsed") or {}
            prior_maps["driver_line"] = {
                n: t for n, t in (parsed.get("queries") or {}).items()
            }
            import subprocess as _sp

            rel = os.path.basename(round_artifacts[-1])
            commit = _sp.run(
                ["git", "-C", repo_dir, "log", "--format=%H", "-1", "--", rel],
                capture_output=True, text=True, timeout=20,
            ).stdout.strip()
            if commit:
                blob = _sp.run(
                    ["git", "-C", repo_dir, "show", f"{commit}:BENCH_LOCAL.json"],
                    capture_output=True, text=True, timeout=20,
                ).stdout
                prior_maps["round_close"] = json.loads(blob).get("queries", {})
        except Exception:  # noqa: BLE001 — triage baselines are best-effort
            pass
    prior = {}  # per query: the SMALLEST prior time across baselines
    for pm in prior_maps.values():
        for n, t in pm.items():
            if isinstance(t, (int, float)) and t > 0:
                prior[n] = min(prior.get(n, t), t)
    regressed = [
        n for n, t in timings.items()
        if t >= 0.2 and n in prior and t > 1.3 * prior[n]
    ]
    for name in regressed:
        spark.sparkContext._jvm.System.gc()
        best = None
        try:
            for _ in range(3):
                t0 = time.perf_counter()
                run_once(REGISTRY[name])
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
        except Exception:  # noqa: BLE001 — triage only, never fail bench
            continue
        floors[name] = {
            "prev": prior[name],
            "sweep": timings[name],
            "floor": round(best, 4),
        }
        print(f"FLOOR {name}: {floors[name]}", file=sys.stderr)

    total = round(sum(timings.values()), 4)
    baseline_shapes = {
        "q09_climatology_hour", "q10_anomaly_cte", "q13_range_join",
        "q14_math_rmse", "q20_weighted_regrid", "q21_udf_reproject",
    }
    by_time = sorted(timings, key=timings.__getitem__)

    # Two artifacts (r12 ADVICE: the driver archives only the LAST ~2000
    # chars of stdout, and with 150+ benched queries no ordering trick can
    # fit the full per-query map in that window — BENCH_r11/r12 both came
    # back parsed:null).
    #
    # 1. BENCH_LOCAL.json, committed to the repo: the COMPLETE record —
    #    every per-query median at full precision, errors, and run
    #    metadata (UTC timestamp, wall time, reps, cpus, git head) so an
    #    unchanged-vs-rerun artifact is distinguishable.
    # 2. stdout: ONE JSON line kept UNDER the driver's 2000-char tail so
    #    the whole line survives truncation and parses. It carries the
    #    round-record essentials (total, sf, nq, timestamp) plus the
    #    per-query seconds for the six BASELINE.md shapes and the 10
    #    slowest queries — the numbers the judge grades — and points at
    #    BENCH_LOCAL.json for the rest.
    meta = {
        "metric": "headline_queries_total_runtime",
        "unit": "sec",
        "value": total,
        "sf": sf,
        "nq": len(timings),
        "ts_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "wall_sec": round(time.perf_counter() - wall_t0, 1),
        "reps": reps,
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", ""),
    }
    try:
        import subprocess

        meta["git_head"] = subprocess.run(
            ["git", "-C", os.path.dirname(os.path.abspath(__file__)),
             "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip()
    except Exception:  # noqa: BLE001 — metadata only, never fail the bench
        pass
    full = dict(meta)
    full["queries"] = {n: timings[n] for n in by_time}
    full["samples"] = {n: all_samples[n] for n in by_time}
    if floors:
        full["floors"] = floors
    if errors:
        full["errors"] = errors
    # Subset runs (SPARK_GRAFT_BENCH_ONLY) are triage tools — they must
    # never clobber the committed full-sweep artifact (r14 bite: a 3-query
    # triage run overwrote the round's 160-query record).
    local_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "BENCH_LOCAL.json" if only is None else "BENCH_SUBSET.json",
    )
    try:
        with open(local_path, "w") as f:
            json.dump(full, f, indent=1, sort_keys=False)
            f.write("\n")
    except OSError as exc:
        print(f"WARN could not write {local_path}: {exc}", file=sys.stderr)

    important = baseline_shapes | set(by_time[-10:])
    line = dict(meta)
    line["full"] = "BENCH_LOCAL.json"
    line["queries"] = {
        n: timings[n] for n in by_time if n in important
    }
    if floors:
        line["n_floors"] = len(floors)
    if errors:
        line["n_errors"] = len(errors)
    encoded = json.dumps(line, separators=(",", ":"))
    if len(encoded) > 1950:  # belt-and-braces: never exceed the tail window
        line.pop("queries")
        encoded = json.dumps(line, separators=(",", ":"))
    print(encoded)


if __name__ == "__main__":
    main()
