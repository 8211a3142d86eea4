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
from xarray_sql_spark.operators import skew  # noqa: F401,E402
from xarray_sql_spark.operators import components  # noqa: F401,E402

# The driver's correctness gate records only the FIRST 50 registry entries
# (dict order). Round-8 window (round-7 VERDICT item 1 — the
# proof-consolidation round): this is deliberately NOT a growth round.
#   1. The 40 registry entries that have NEVER had a driver CORRECTNESS
#      row (local-oracle green since they landed; the driver gate is the
#      hard signal). This clears the entire backlog in one window.
#   2. NEW this round — the only three additions, each mandated by the
#      r7 verdict: mm09 (real ISO-BMFF/MP4 box walk, finishing the
#      container family), hh01 (space-saving heavy hitters, the batch
#      twin of the streaming kernel), pl15 (the six-stage pipeline
#      composition row proving the operators compose).
#   3. Re-proofs for every code path CHANGED this round: dd08 (row-count
#      gate on the index repartition), ss09/ss10 (PQ codebook memo now
#      keys on part-aware file signatures), gq24 (region write now maps
#      NULL floats to the store fill_value), mm01/mm04 (parse_container
#      gained the ftyp sniff branch ahead of their formats), cc01
#      (pl15 composes through its helpers — keep the fixpoint proof
#      fresh alongside).
# Everything displaced was hash-green in r7 on code paths unchanged this
# round and stays covered by the local full-registry pytest sweep.
#
# ROUND-9 ROTATION NOTE: once this window's CORRECTNESS_r08 lands, every
# one of the 191 registry queries has had at least one driver row — the
# never-checked backlog is ZERO for the first time. From round 9 on the
# window is pure freshness rotation: (1) any query whose code path
# changes that round, (2) any NEW query (splice in the round it lands —
# never let a backlog re-form), (3) fill the rest with the oldest
# latest-proof entries, which entering round 9 are q08 (last green r3),
# the r4 block (q02-q06, q09, q10, q25), then the r5 relational/dd/ev/gq
# block (dd01-dd03, ev08, ev09, gq08, ...) — recompute from the
# CORRECTNESS_r*.json files rather than trusting this comment.
_PRIORITY = (
    # 1. the never-driver-checked backlog (all 40)
    "ev14_gap_fill gq37_grid_rolling_std gq38_grid_upsample q46_range_frame "
    "q47_anti_join io01_jsonl_roundtrip io02_csv_roundtrip mm07_image_rollup "
    "ss11_mmr_diversify ts14_vocab_growth ev15_transition_matrix "
    "sk03_bloom_prefilter_join io03_corrupt_record_quarantine "
    "gr01_dup_graph_pagerank io04_schema_evolution ev16_conversion_delays "
    "io05_orc_roundtrip io06_partitioned_prune pl11_rag_chunking "
    "ev17_cdc_latest_state gr02_triangle_count io07_xml_roundtrip "
    "io08_binaryfile_ingest ev18_variant_props pl12_dataset_card "
    "ts15_bigram_surprisal ev19_incremental_rollup ss12_radius_search "
    "gq39_grid_where_clip_fill mm08_mp3_census gr03_cluster_size_dist "
    "ts16_zipf_fit ss13_ann_recall dd12_lsh_band_sweep ev20_activity_streaks "
    "io09_gzip_jsonl_roundtrip ev21_rfm_segments ts17_readability "
    "io10_multiline_json_roundtrip pl14_quality_calibration "
    # 2. new this round (verdict-mandated)
    "mm09_mp4_census hh01_heavy_hitters pl15_full_pipeline "
    # 3. re-proofs of changed code paths
    "dd08_incremental_dedup ss09_pq_adc_topk ss10_pq_rerank "
    "gq24_region_write_roundtrip mm01_decode_meta mm04_resize "
    "cc01_neardup_purge"
).split()

from xarray_sql_spark import registry as _registry  # noqa: E402

_registry._PRIORITY = tuple(_PRIORITY)
_registry.apply_window_order()

__all__ = ["REGISTRY", "QuerySpec", "query"]
