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
# (dict order). Round-4 window priority:
#   1. The two round-3 REGRESSIONS (q27, ev01) — broke when the testdata's
#      timestamp encoding changed to µs-NTZ; fixed by the session.table
#      LTZ normalization, so the driver must re-prove them first.
#   2. The 29 queries OUTSIDE round 3's 50-entry window (gq01-07, dd04-06,
#      ev02-07, mm*, sk*, pl*, ts03/04, cc01) — green in r1/r2 but the
#      events/orders/lineitem timestamp normalization touches several of
#      their inputs, so their old rows predate the current loader.
#   3. Timestamp-consuming queries that WERE green in round 3 (under NTZ) —
#      re-proven under the LTZ loader in the remaining slots.
# Everything else was hash-proven in round 3 on inputs the loader change
# cannot affect (no timestamp columns) and rotates to the back.
_PRIORITY = (
    # 0. new this round: remaining geospatial benchmark shapes (cases
    #    01/03/09) + the distributed-sink round trip
    "gq11_grid_ndvi gq12_grid_zonal_mean gq13_grid_warp gq14_zarr_roundtrip "
    # 1. regressions fixed this round + queries whose builder/oracle changed
    #    this round (ss02 threshold now yields rows, pl01/ts04 plan rework)
    "q27_asof_join ev01_sessionization ss02_embedding_neardup "
    "ss05_kmeans_train ts05_repetition q36_interval_range_frame "
    # 2. not in round 3's window
    "gq01_grid_climatology gq02_grid_pruned_slice gq03_cftime_360day "
    "gq04_nan_null_semantics gq05_grid_zonal_bands gq06_grid_anomaly_selfjoin "
    "gq07_zorder_layout dd04_minhash_lsh dd05_simhash dd06_rolling_fingerprint "
    "ev02_session_windows ev03_hourly_windows ev04_moving_avg "
    "ev05_purchase_click_join ev06_conversion_funnel ev07_resample_ffill "
    "mm01_decode_meta mm02_frame_sample mm03_feature_extract mm04_resize "
    "sk01_salted_agg sk02_salted_join pl01_training_mix pl02_hash_split "
    "pl03_decontaminate pl04_training_set ts03_regex_tokens ts04_tfidf_terms "
    "cc01_neardup_purge "
    # 3. round-3-green but timestamp-consuming: re-prove under the LTZ
    #    loader (q11/q15/q29 touch no timestamp columns — rotated out to
    #    keep the list at exactly the driver's 50-entry window)
    "q01_pricing_summary q02_filter_scan q03_top_revenue q04_exists_semijoin "
    "q05_region_volume q06_forecast_revenue q09_climatology_hour "
    "q10_anomaly_cte q12_interval_join q22_parameterized q25_set_ops"
).split()

_front = [n for n in _PRIORITY if n in REGISTRY]
_rest = {n: s for n, s in REGISTRY.items() if n not in _front}
_reordered = {**{n: REGISTRY[n] for n in _front}, **_rest}
REGISTRY.clear()
REGISTRY.update(_reordered)

__all__ = ["REGISTRY", "QuerySpec", "query"]
