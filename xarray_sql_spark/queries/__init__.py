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
# Round-16 window (computed by scripts/next_window.py): this round's
# changed-code-path queries first (dd10 packed single-scan rewrite, mm05
# match-count rewrite, ss09/ss10/ss14 — the PQ training rework feeds all
# three), then the oldest-proof fill exactly as the script printed it:
# the 5-entry stale head the r15 verdict predicted (hh02/hh03, qs02,
# io01, sk04) and the r10/r11-era block behind it.
_PRIORITY = (
    "dd10_shared_span_pairs mm05_phash_neardup ss09_pq_adc_topk "
    "ss10_pq_rerank ss14_ivfpq_search hh02_hll_distinct "
    "hh03_countmin qs02_grouped_quantile_sketch io01_jsonl_roundtrip "
    "sk04_bloom_fp_rate q01_pricing_summary q12_interval_join "
    "q22_parameterized q27_asof_join q36_interval_range_frame "
    "ss02_embedding_neardup ev01_sessionization ev02_session_windows "
    "ev03_hourly_windows ev04_moving_avg pl01_training_mix "
    "pl02_hash_split ss04_ivf_ann ev05_purchase_click_join "
    "pl03_decontaminate pl04_training_set ev06_conversion_funnel "
    "ts05_repetition ev07_resample_ffill ss05_kmeans_train "
    "ev22_scd2_merge dd13_dup_token_spans dd14_split_contamination "
    "dd04_minhash_lsh ss03_lsh_ann ss13_ann_recall "
    "mm10_exif_census mm11_exif_gps_census gq08_grid_regrid_weights "
    "gq09_grid_forecast_skill gq10_grid_reproject_udf gq16_stats_aggregates "
    "ev08_cohort_retention q37_lateral_topn ss06_sq_topk "
    "q38_scd2_pit_join pl05_stratified_split q39_bucketed_range_join "
    "pl06_weighted_sample ts06_char_entropy "
).split()

from xarray_sql_spark import registry as _registry  # noqa: E402

_registry._PRIORITY = tuple(_PRIORITY)
_registry.apply_window_order()

__all__ = ["REGISTRY", "QuerySpec", "query"]
