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
# (dict order). Round-10 window, COMPUTED by scripts/next_window.py (the
# r8 discipline — never curated by hand):
#   1. never-checked: the 5 queries NEW this round (pl16 shard
#      materialization, ss15 multi-probe LSH, mm11 EXIF GPS walk, ts19
#      BPE tokenizer apply, dd14 split-contamination audit — every r10
#      addition spliced the round it lands).
#   2. changed code paths: pl08/ts13/pl10 (now ride ts19's real BPE
#      counts — every downstream token number upgraded), ss13
#      (multi-probe lift arm), mm10 (shared marker-scan refactor),
#      ev22 (first_new broadcast hint dropped), dd13 (oracle char
#      semantics fix). pl16 is counted with the new entries and also
#      rides the BPE counts.
#   3. oldest-proof fill: the r5 ss/gq/ev/pl/q relational block, then
#      the oldest r6 block — exactly next_window.py's output.
# Everything displaced was hash-green in r9 on code paths unchanged this
# round and stays covered by the local full-registry pytest sweep.
# Round-15 window (computed by scripts/next_window.py): the round's
# new/changed queries first (pl14b two-pass deciles, pl24 contamination
# check — both never driver-checked — then the reworked pl23/dd15), then
# the oldest-proof fill: the entire 51-entry r8/r9-era tail the r14
# verdict flagged (q02-q35 relational spine, dd01/dd02, gr01-gr03, cc01,
# sk03, pl15, ts01/ts02/ts18, ss01/ss14, mm02, gq40, hh01). 0/50 overlap
# with the r14 window; after this round's gate the >=5-round-stale count
# drops from 51 to 5 (hh02/hh03, qs02, io01, sk04 — next round's fill
# head).
_PRIORITY = (
    "pl14b_quality_calibration_two_pass pl24_contamination_check pl23_pipeline_e2e "
    "dd15_line_dedup sk03_bloom_prefilter_join cc01_neardup_purge "
    "gr01_dup_graph_pagerank gr02_triangle_count gr03_cluster_size_dist "
    "pl15_full_pipeline q02_filter_scan q03_top_revenue "
    "q04_exists_semijoin q05_region_volume q06_forecast_revenue "
    "q08_agg_filter q09_climatology_hour q10_anomaly_cte "
    "q11_window_topk q13_range_join q14_math_rmse "
    "q15_case_having_union q16_distinct_sort q17_subqueries "
    "q18_rollup q19_count_star q20_weighted_regrid "
    "q21_udf_reproject q23_percentiles q24_pivot "
    "q25_set_ops q26_anti_join q28_grouping_sets "
    "q29_window_suite q30_string_funcs q31_null_ops "
    "q32_json_extract q33_array_funcs q34_correlated_subquery "
    "q35_unpivot dd01_exact_dedup dd02_fingerprint_dedup "
    "ts01_text_quality ts02_langid ss01_ann_topk "
    "ts18_bm25_retrieval mm02_frame_sample gq40_grid_stencil "
    "ss14_ivfpq_search hh01_heavy_hitters "
).split()

from xarray_sql_spark import registry as _registry  # noqa: E402

_registry._PRIORITY = tuple(_PRIORITY)
_registry.apply_window_order()

__all__ = ["REGISTRY", "QuerySpec", "query"]
