"""Oracle-checked query registry.

Every implemented operator from SURVEY.md §2 (and the beyond-reference
pipeline operators) is exposed here as a named query: a PySpark builder
``(spark, sf_dir) -> DataFrame`` plus, where ANSI-SQL-expressible, an
equivalent DuckDB oracle SQL string run by the driver on the same parquet.

Import side effects populate the registry.
"""

from xarray_sql_spark.registry import REGISTRY, QuerySpec, query

# Populate the registry.
from xarray_sql_spark.queries import relational  # noqa: F401,E402
from xarray_sql_spark.queries import pipeline_ops  # noqa: F401,E402
from xarray_sql_spark.queries import dedup_lsh  # noqa: F401,E402
from xarray_sql_spark.operators import multimodal  # noqa: F401,E402
from xarray_sql_spark.queries import grid_queries  # noqa: F401,E402
from xarray_sql_spark.queries import advanced_ops  # noqa: F401,E402
from xarray_sql_spark.queries import io_formats  # noqa: F401,E402
from xarray_sql_spark.queries import bpe_tokenizer  # noqa: F401,E402
from xarray_sql_spark.operators import skew  # noqa: F401,E402
from xarray_sql_spark.operators import components  # noqa: F401,E402

# The driver's correctness gate records only the FIRST 50 registry entries
# (dict order). Round-9 window, COMPUTED by scripts/next_window.py (the
# r8 discipline — never curated by hand):
#   1. never-checked: the 11 queries NEW this round (hh02/qs01/hh03
#      sketches, ss14 IVFxPQ, ev22 SCD2 merge, gq40 stencil, dd13
#      spans, sk04 bloom FP rate, ts18 BM25, mm10 EXIF/TIFF walk — every r9 addition
#      spliced the round it lands).
#   2. changed code paths: mm02 (now rides the real MP4 parse), hh01
#      (oracle modulo parity fix), io01 (fixture-dir lifecycle change
#      in io_formats — one representative of the shared module).
#   3. oldest-proof fill: q08 (last green r3), the r4 block (q02-q06,
#      q09-q11, q25...), then the oldest r5 relational/dd/ts/ss block —
#      exactly next_window.py's output.
# Everything displaced was hash-green in r8 on code paths unchanged this
# round and stays covered by the local full-registry pytest sweep.
_PRIORITY = (
    "ev22_scd2_merge dd13_dup_token_spans gq40_grid_stencil "
    "ss14_ivfpq_search hh02_hll_distinct qs01_quantile_sketch "
    "sk04_bloom_fp_rate ts18_bm25_retrieval hh03_countmin "
    "mm10_exif_census qs02_grouped_quantile_sketch "
    "mm02_frame_sample hh01_heavy_hitters "
    "io01_jsonl_roundtrip q08_agg_filter q02_filter_scan "
    "q03_top_revenue q04_exists_semijoin q05_region_volume "
    "q06_forecast_revenue q09_climatology_hour q10_anomaly_cte "
    "q25_set_ops q11_window_topk q13_range_join "
    "q14_math_rmse q15_case_having_union q16_distinct_sort "
    "q17_subqueries q18_rollup q19_count_star "
    "q20_weighted_regrid q21_udf_reproject q23_percentiles "
    "q24_pivot q26_anti_join q28_grouping_sets "
    "q29_window_suite q30_string_funcs q31_null_ops "
    "q32_json_extract q33_array_funcs q34_correlated_subquery "
    "q35_unpivot dd01_exact_dedup dd02_fingerprint_dedup "
    "dd03_ngram_jaccard ts01_text_quality ts02_langid "
    "ss01_ann_topk "
).split()

from xarray_sql_spark import registry as _registry  # noqa: E402

_registry._PRIORITY = tuple(_PRIORITY)
_registry.apply_window_order()

__all__ = ["REGISTRY", "QuerySpec", "query"]
