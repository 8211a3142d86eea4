"""Oracle-checked query registry.

Every implemented operator from SURVEY.md §2 (and the beyond-reference
pipeline operators) is exposed here as a named query: a PySpark builder
``(spark, sf_dir) -> DataFrame`` plus, where ANSI-SQL-expressible, an
equivalent DuckDB oracle SQL string run by the driver on the same parquet.

Import side effects populate the registry.
"""

from xarray_sql_spark.queries.registry import REGISTRY, QuerySpec, query

# Populate the registry.
from xarray_sql_spark.queries import relational  # noqa: F401,E402
from xarray_sql_spark.queries import pipeline_ops  # noqa: F401,E402
from xarray_sql_spark.queries import dedup_lsh  # noqa: F401,E402
from xarray_sql_spark.operators import multimodal  # noqa: F401,E402
from xarray_sql_spark.queries import grid_queries  # noqa: F401,E402
from xarray_sql_spark.operators import skew  # noqa: F401,E402
from xarray_sql_spark.operators import components  # noqa: F401,E402

# The driver's correctness gate records only the FIRST 50 registry entries
# (dict order). Rounds 1+2 together proved every then-existing query, but a
# "proven" row is only as good as the code that earned it (round-2 ADVICE):
# any query whose builder or oracle changed this round is treated as
# UNPROVEN again and sorted to the front of the registry — along with
# genuinely new queries — so the driver re-checks it this round.
_DRIVER_GREEN_R1R2 = (
    "q01_pricing_summary q02_filter_scan q03_top_revenue q04_exists_semijoin "
    "q05_region_volume q06_forecast_revenue q07_cross_join q08_agg_filter "
    "q09_climatology_hour q10_anomaly_cte q11_window_topk q12_interval_join "
    "q13_range_join q14_math_rmse q15_case_having_union q16_distinct_sort "
    "q17_subqueries q18_rollup q19_count_star q20_weighted_regrid "
    "q21_udf_reproject q22_parameterized q23_percentiles q24_pivot "
    "q25_set_ops q26_anti_join q27_asof_join q28_grouping_sets "
    "q29_window_suite q30_string_funcs q31_null_ops q32_json_extract "
    "q33_array_funcs q34_correlated_subquery q35_unpivot dd01_exact_dedup "
    "dd02_fingerprint_dedup dd03_ngram_jaccard ts01_text_quality ts02_langid "
    "ss01_ann_topk ss02_embedding_neardup ev01_sessionization "
    "ev02_session_windows ev03_hourly_windows ev04_moving_avg "
    "pl01_training_mix pl02_hash_split ss04_ivf_ann ev05_purchase_click_join "
    "gq01_grid_climatology gq02_grid_pruned_slice gq03_cftime_360day "
    "gq04_nan_null_semantics gq05_grid_zonal_bands gq06_grid_anomaly_selfjoin "
    "gq07_zorder_layout dd04_minhash_lsh dd05_simhash dd06_rolling_fingerprint "
    "ss03_lsh_ann ts03_regex_tokens ts04_tfidf_terms ts05_repetition "
    "mm01_decode_meta mm02_frame_sample mm03_feature_extract mm04_resize "
    "ev06_conversion_funnel ev07_resample_ffill pl03_decontaminate "
    "pl04_training_set sk01_salted_agg sk02_salted_join cc01_neardup_purge"
).split()

# Queries whose implementation changed in round 3 (perf rework / added
# repartition / refactor): their old green rows are void.
_MODIFIED_THIS_ROUND = {
    "q23_percentiles",  # single-SQL two-pass histogram selection rewrite
    "ts05_repetition",  # spread + single-projection bigram sizes
    "ts02_langid",  # tokenize-once projection + spread
    "ss01_ann_topk",  # adaptive spread after single-row-group scan
    "ss02_embedding_neardup",  # repartition after single-row-group scan
    "ss03_lsh_ann",  # adaptive spread + array-literal planes
    "ss04_ivf_ann",  # adaptive spread after single-row-group scan
    "dd03_ngram_jaccard",  # round-2 refactor shipped unchecked (ADVICE r2)
}

_proven_order = [
    n for n in _DRIVER_GREEN_R1R2 if n in REGISTRY and n not in _MODIFIED_THIS_ROUND
]
_unproven = {
    n: s
    for n, s in REGISTRY.items()
    if n not in _proven_order
}
_reordered = {**_unproven, **{n: REGISTRY[n] for n in _proven_order}}
REGISTRY.clear()
REGISTRY.update(_reordered)

__all__ = ["REGISTRY", "QuerySpec", "query"]
