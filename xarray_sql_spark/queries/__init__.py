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
# (dict order).  Round 1 proved the 50 entries listed below; reorder so every
# query WITHOUT a driver-green CORRECTNESS row yet — including anything newly
# added this round — sorts ahead of the already-proven ones, landing inside
# the driver's window.  (VERDICT.md round 1, "Next round" item 1.)
_R1_DRIVER_GREEN = (
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
    "pl01_training_mix pl02_hash_split ss04_ivf_ann ev05_purchase_click_join"
).split()

_unproven = {n: s for n, s in REGISTRY.items() if n not in _R1_DRIVER_GREEN}
_proven = {n: REGISTRY[n] for n in _R1_DRIVER_GREEN if n in REGISTRY}
_reordered = {**_unproven, **_proven}
REGISTRY.clear()
REGISTRY.update(_reordered)

__all__ = ["REGISTRY", "QuerySpec", "query"]
