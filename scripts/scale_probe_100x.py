#!/usr/bin/env python
"""sf0.1 -> sf10 (100x) scale probe for the heaviest pipeline families.

The per-round 10x probe (scripts/scale_probe.py) shows sub-linear ratios,
but 10x can still hide super-linear behavior that only bites two orders of
magnitude up. This probe replicates the THREE heaviest families' input
tables (documents, events, embeddings) 100x — ~10M events / 500k docs —
with the same id-shift + text-perturbation rules as the 10x replica, and
times a representative heavy query per family at sf0.1 and sf10.

Interpretation: on a fully-parallel 32-core box a perfectly linear
operator shows ratio <= 100 (well under it while sf0.1 under-subscribes
the cores); a ratio blowing past ~2x of (10x-probe-ratio)^2 signals a
super-linear stage. Task counts confirm the dense stages stay wide.

Usage: python scripts/scale_probe_100x.py  [SPARK_GRAFT_PROBE_REPS=1]
Replica cached at /tmp/xss_sf10_synth; delete to rebuild.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.scale_probe import SRC_SF, build_replica  # noqa: E402

DST100 = "/tmp/xss_sf10_synth"
COPIES = 100
TABLES = ("documents", "events", "embeddings")

# one representative heavy query per family (all touch ONLY the replicated
# tables): text LM scoring, incremental dedup, PQ serving + re-rank,
# events VARIANT extraction, rollup maintenance, sequence packing,
# sketch-based heavy hitters. The near-dup graph family (cc01) is
# deliberately ABSENT: the replica's " r{i}" text perturbation keeps all
# 100 copies of a document near-dups of each other, so candidate-pair
# cardinality grows ~10^4x for 100x data — quadratic INPUT growth that is
# a property of the synthetic corpus, not of the operator (SURVEY §8).
PROBE_QUERIES = [
    "ts15_bigram_surprisal",
    "dd08_incremental_dedup",
    "ss10_pq_rerank",
    "ev18_variant_props",
    "ev19_incremental_rollup",
    "pl08_sequence_packing",
    "hh01_heavy_hitters",
    # round-9: HLL cardinality (register-rows-only shuffle), duplicate
    # token spans (linear despite 100x gram occurrence counts — the
    # no-pair-join claim under its worst case), IVFxPQ serving
    "hh02_hll_distinct",
    "hh03_countmin",
    "dd13_dup_token_spans",
    "ss14_ivfpq_search",
    # round-10: BPE apply — vocabulary (the apply domain) is Heaps-
    # sublinear, training is sample-bounded; only the word-key join
    # scales with the corpus
    "ts19_bpe_tokenize",
    # round-12: trained quality scoring (map-only integer fold — the
    # honest-linear floor of touching every word, ts19's profile), and
    # line dedup under a WORST-case input: the replica's copies make
    # every full 8-word line an exact 100-way duplicate, inflating dup
    # mass ~100x — the map-side-combined min(struct) must keep the
    # shuffle per-key bounded
    "ts20_quality_classifier",
    "dd15_line_dedup",
    # round-13: pl17's windowed-count plan (the curl/tmd5 windows must
    # stay hot-key safe under 100x duplicate URL mass — every canonical
    # URL is a 100-way duplicate in the replica), the policy-gate
    # broadcast joins, and the bigram-widened scoring fold
    "pl17_url_provenance",
    "pl22_license_gate",
    "ts25_ngram_classifier",
    # round-12 late wave: KMV — the sketch-shuffle-size-independence
    # claim at two orders of magnitude (the k-min state is 128 longs
    # per source per partition regardless of corpus size; only the
    # exact-twin pin columns scale with distinct bigrams)
    "hh04_kmv_set_ops",
    # round-14: the five-stage composition DAG. Unlike cc01 (excluded
    # above — its PAIR output is quadratic under the replica's near-dup
    # mass), pl23's near-dup gate is CLAIM-based: <= N_BANDS candidate
    # pairs per doc whatever the cluster size, so the chain must stay
    # ~linear even though every replica copy is a near-dup of its base.
    "pl23_pipeline_e2e",
    # round-15: the two-pass decile calibration — the histogram stays
    # grid-bounded (diversity values, not docs) at every scale, so the
    # ratio must track the two scans + the (diversity, h) digest
    # shuffle, never a global sort.
    "pl14b_quality_calibration_two_pass",
]


def main() -> None:
    build_replica(SRC_SF, DST100, COPIES, TABLES)

    from xarray_sql_spark.queries import REGISTRY
    from xarray_sql_spark.session import get_spark

    spark = get_spark("xarray-sql-spark-scale-probe-100x")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(1000).mapInPandas(lambda it: it, "id long").count()
    reps = int(os.environ.get("SPARK_GRAFT_PROBE_REPS", "1"))
    st = spark.sparkContext.statusTracker()

    def densest(group: str) -> int:
        best = 0
        for jid in st.getJobIdsForGroup(group):
            job = st.getJobInfo(jid)
            for sid in job.stageIds if job else []:
                stage = st.getStageInfo(sid)
                if stage is not None:
                    best = max(best, stage.numTasks)
        return best

    # CLI names subset the probe (new-operator spot checks); no args =
    # the full permanent sweep.
    names = sys.argv[1:] or PROBE_QUERIES
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        sys.exit(f"not in registry: {unknown}")
    results: dict[str, dict] = {}
    for name in names:
        spec = REGISTRY[name]
        row: dict[str, float | int] = {}
        for label, sf_dir in (("sf0.1", SRC_SF), ("sf10", DST100)):
            spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            spark.sparkContext._jvm.System.gc()
            group = f"probe100:{name}:{label}"
            spark.sparkContext.setJobGroup(group, group)
            samples = []
            try:
                for _ in range(reps):
                    t0 = time.perf_counter()
                    spec.fn(spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    samples.append(time.perf_counter() - t0)
            finally:
                spark.sparkContext.setJobGroup("", "")
            row[label] = round(statistics.median(samples), 3)
            row[f"{label}_tasks"] = densest(group)
        row["ratio"] = round(row["sf10"] / row["sf0.1"], 2)
        results[name] = row
        print(f"{name}: {row}", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "scale_probe_sf01_vs_sf10",
                "copies": COPIES,
                "reps": reps,
                "queries": results,
            }
        )
    )


if __name__ == "__main__":
    main()
