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
# Round-14 window (computed by scripts/next_window.py): the round's
# new/changed queries first (pl23 composition DAG, qs01 sketch-guided
# selection, ts25 bucket-cast fix, mm14 kernel hoist), then the
# oldest-proof fill — the r7/r8-era relational/pipeline spine (ev10-ev21,
# ts14-ts17, io02-io10, mm01/04/07-09, ss09-ss12, dd08/dd12, gq24/37-39,
# q43-q47, cc02, pl09/11/12/14). 2/50 overlap with the r13 window; after
# this round's gate every entry's last driver proof is r9+ except the 6
# r8-era entries that didn't fit (next round's fill head).
_PRIORITY = (
    "pl23_pipeline_e2e qs01_quantile_sketch ts25_ngram_classifier "
    "mm14_audio_fingerprint_dedup q43_set_ops_all ev10_first_touch_attribution "
    "q45_pivot cc02_twohop_components pl09_leakage_free_split "
    "ev14_gap_fill ts14_vocab_growth ev15_transition_matrix "
    "ev16_conversion_delays pl11_rag_chunking ev17_cdc_latest_state "
    "ev18_variant_props pl12_dataset_card ts15_bigram_surprisal "
    "ev19_incremental_rollup ts16_zipf_fit ev20_activity_streaks "
    "ev21_rfm_segments ts17_readability pl14_quality_calibration "
    "ss12_radius_search dd08_incremental_dedup dd12_lsh_band_sweep "
    "mm01_decode_meta mm04_resize mm07_image_rollup "
    "mm08_mp3_census mm09_mp4_census gq24_region_write_roundtrip "
    "gq37_grid_rolling_std gq38_grid_upsample gq39_grid_where_clip_fill "
    "ss09_pq_adc_topk ss10_pq_rerank q46_range_frame "
    "ss11_mmr_diversify q47_anti_join io02_csv_roundtrip "
    "io03_corrupt_record_quarantine io04_schema_evolution io05_orc_roundtrip "
    "io06_partitioned_prune io07_xml_roundtrip io09_gzip_jsonl_roundtrip "
    "io10_multiline_json_roundtrip io08_binaryfile_ingest "
).split()

from xarray_sql_spark import registry as _registry  # noqa: E402

_registry._PRIORITY = tuple(_PRIORITY)
_registry.apply_window_order()

__all__ = ["REGISTRY", "QuerySpec", "query"]
