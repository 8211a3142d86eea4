"""Sweeping physical-plan lint over every BENCHED registry query.

Encodes the per-round manual plan audit as a permanent gate: a benched
query's executed plan must contain

- no ``CartesianProduct`` (an unkeyed all-pairs join never survives 100 TB);
- no ``BatchEvalPython`` (row-at-a-time Python UDF on a hot path — Arrow
  paths show up as ArrowEvalPython / mapInPandas instead);
- ``BroadcastNestedLoopJoin`` only where the query intentionally uses a
  tiny-broadcast unkeyed shape (allowlisted below with the reason).

bench=False queries are exempt by scope: they are correctness fixtures
(store builders, quadratic diagnostics) whose docstrings already label
the non-scale paths, and some (cc01) execute work at build time.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_MED
from xarray_sql_spark.queries import REGISTRY

# query -> reason a BroadcastNestedLoopJoin is the intended shape
BNLJ_ALLOWED = {
    "q07_cross_join": "the operator under test IS a cross join (tiny dim)",
    "ss01_ann_topk": "exact baseline: 5-row query set broadcast against corpus",
    "ss07_knn_classify": "exact baseline: 5-row query set broadcast",
    "ss08_knn_classify_ivf": "8-row centroid table broadcast (cell routing)",
    "ss04_ivf_ann": "k-row centroid broadcast for cell assignment",
    "ss06_sq_topk": "1-row quantization-spec broadcast",
    "pl06_weighted_sample": "1-row total-weight spec broadcast",
    "q22_parameterized": "1-row parameter spec broadcast",
    "q13_range_join": "theta join against a handful of broadcast zonal bands",
    "q23_percentiles": "quantile-boundary spec rows (4) broadcast in a range join",
    "ss05_kmeans_train": "k-row centroid table broadcast per Lloyd's iteration",
    "ts10_unigram_surprisal": "1-row corpus-total broadcast (LM normalizer)",
    "ev14_gap_fill": "date-spine scaffold: hours x 5-type cross (both sides "
    "derived from single-row aggregates, size independent of event count)",
    "ss11_mmr_diversify": "exact shortlist stage: 3-row query set broadcast "
    "against the corpus (ss01's contract); diversity steps are keyed joins",
    "ts15_bigram_surprisal": "1-row corpus-total broadcast (LM normalizer, "
    "ts10's contract one order higher)",
    "ev19_incremental_rollup": "1-row day-boundary broadcast splitting "
    "base/delta (in production the cutoff is a literal)",
    "hh04_kmv_set_ops": "source-pair generation: n_sources sketch rows "
    "(128 longs each) self-paired, plus the zero-count stub pairs from "
    "the one-column source dictionary (r15 exact-twin rewrite) — both "
    "dimension x dimension theta joins, size independent of corpus "
    "volume",
    "pl20_epoch_shuffle": "2-row epoch dimension broadcast against the "
    "doc stream (each doc ranked once per epoch)",
    "ss16_hybrid_rrf": "3-row query-vector broadcast against the corpus "
    "(ss01's exact-baseline contract; production swaps in IVF routing)",
    "ts22_pmi_collocations": "1-row corpus-total broadcast (PMI "
    "normalizer, ts10's contract)",
    "hh05_decayed_heavy_hitters": "1-row reference-date broadcast "
    "(corpus-relative decay origin, ts10's contract)",
    "ts24_kneser_ney_surprisal": "1-row bigram-type-total broadcast "
    "(the KN continuation normalizer, ts10's contract)",
    "pl21_dsir_selection": "1-row model-total and doc-count broadcasts "
    "plus the 64-row score-table broadcast (all dimension-sized)",
    "ts16_zipf_fit": "1-row moment-sum x 1-row vocab-count cross (both "
    "sides single-row aggregates)",
    "ev21_rfm_segments": "1-row corpus-max-day anchor broadcast (the "
    "recency reference point)",
    "hh02_hll_distinct": "1-row register-fold x 1-row exact-count cross "
    "(both sides single-row aggregates; the exact leg is the gate's "
    "diagnostic passenger)",
    "ev22_scd2_merge": "1-row min/max cutoff broadcast splitting the feed "
    "into dimension + delta (ev19's contract; in production the cutoff "
    "is the partition boundary literal)",
    "sk04_bloom_fp_rate": "1-row residue-count broadcast joined to the "
    "1-row measurement aggregate",
    "ts18_bm25_retrieval": "1-row corpus-stats broadcast (N/avgdl/df — "
    "the ts10 LM-normalizer contract)",
    "pl18_perplexity_buckets": "two 1-row broadcasts: ts10's corpus-total "
    "normalizer plus the tertile-boundary aggregate",
    # pl17/pl22/sk05 left this list in the r15 optimization round: their
    # corpus-total crossJoins became unpartitioned windows (pl17/pl22:
    # over dimension-sized rollup frames) or stacked windows + one
    # aggregate over the counts-of-counts histogram (sk05) — no BNLJ
    # remains in any of the three plans.
}


def _benched():
    return [(n, s) for n, s in REGISTRY.items() if s.bench]


@pytest.mark.parametrize("name,spec", _benched(), ids=[n for n, _ in _benched()])
def test_benched_plan_is_scale_shaped(spark, name, spec):
    df = spec.fn(spark, SF_MED)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name}: unkeyed all-pairs join"
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"
    if "BroadcastNestedLoopJoin" in plan and name not in BNLJ_ALLOWED:
        raise AssertionError(
            f"{name}: BroadcastNestedLoopJoin outside the allowlist — either "
            f"key the join or add the query with its justification"
        )
