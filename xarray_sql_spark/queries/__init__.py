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
from xarray_sql_spark.queries import advanced_ops  # noqa: F401,E402
from xarray_sql_spark.operators import skew  # noqa: F401,E402
from xarray_sql_spark.operators import components  # noqa: F401,E402

# The driver's correctness gate records only the FIRST 50 registry entries
# (dict order). Round-5 window priority:
#   1. The sixteen queries NEW this round (ev08/q37/dd07/ss06 + the
#      late additions q38/pl05/mm05/q39/gq15/gq16/pl06/ts06/dd08/q40/
#      ss07/ev09) — never driver-checked.
#   2. Everything OUTSIDE round 4's 50-entry window (the relational
#      q07-q35 block, dd01-03, ts01/02, ss01/03/04, gq08-10, cc02) —
#      last proven in round 3 or earlier; rotate them back in.
#   3. Remaining slots: re-prove the highest-risk round-4-green entries —
#      the grid DataSource shapes (whose store layer grew new codecs and
#      filter chains this round, gq14 most of all).
# Rotated OUT to make room for the sixteen new queries (all
# round-4-proven on unchanged inputs): q01, q36, ev01, ss05, gq11, gq04,
# q27, gq03, gq02, gq01; q07 and q08 (trivial relational shapes, proven
# r1-r3) yield their slots from the re-prove block (gq15/gq16 exercise the DataSource+store path
# under the gate this round, so gq14 alone re-proves the store layer).
# Everything else also round-4-proven and rotates to the back.
_PRIORITY = (
    # 1. new this round
    "ev08_cohort_retention q37_lateral_topn dd07_semantic_dedup ss06_sq_topk "
    "q38_scd2_pit_join pl05_stratified_split mm05_phash_neardup "
    "q39_bucketed_range_join gq15_filtered_store gq16_stats_aggregates "
    "pl06_weighted_sample ts06_char_entropy dd08_incremental_dedup "
    "q40_mode_percentile_disc ss07_knn_classify ev09_time_weighted_avg "
    # 2. outside round 4's window
    "q11_window_topk q13_range_join "
    "q14_math_rmse q15_case_having_union q16_distinct_sort q17_subqueries "
    "q18_rollup q19_count_star q20_weighted_regrid q21_udf_reproject "
    "q23_percentiles q24_pivot q26_anti_join q28_grouping_sets "
    "q29_window_suite q30_string_funcs q31_null_ops q32_json_extract "
    "q33_array_funcs q34_correlated_subquery q35_unpivot "
    "dd01_exact_dedup dd02_fingerprint_dedup dd03_ngram_jaccard "
    "ts01_text_quality ts02_langid ss01_ann_topk ss04_ivf_ann ss03_lsh_ann "
    "gq08_grid_regrid_weights gq09_grid_forecast_skill gq10_grid_reproject_udf "
    "cc02_twohop_components "
    # 3. re-prove: grid shapes over the store layer that gained codecs
    #    and filter chains this round (gq14 most of all)
    "gq14_zarr_roundtrip"
).split()

_front = [n for n in _PRIORITY if n in REGISTRY]
_rest = {n: s for n, s in REGISTRY.items() if n not in _front}
_reordered = {**{n: REGISTRY[n] for n in _front}, **_rest}
REGISTRY.clear()
REGISTRY.update(_reordered)

__all__ = ["REGISTRY", "QuerySpec", "query"]
