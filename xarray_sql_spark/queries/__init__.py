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
# Round-12 window (computed by scripts/next_window.py): the seven NEW
# operators of the early round-12 block plus the seventeen late additions
# (ts21/io12/gr04/pl19/hh04/pl20/ss16/dd17/ts22/ev23/sk05/hh05/
# ts23/ev24/io13/ts24/pl21) first, then every query whose code or shared oracle
# CTE changed this round (the BPE b{i} no-op padding flows into all
# five bpe-sharing queries), then the oldest-proof fill (the r6-era
# block).
_PRIORITY = (
    "ts20_quality_classifier dd15_line_dedup pl17_url_provenance "
    "mm12_signal_stats dd16_url_dedup io11_warc_ingest "
    "pl18_perplexity_buckets ts21_unicode_normalize io12_arrow_ipc_ingest "
    "gr04_label_propagation pl19_temperature_sampling hh04_kmv_set_ops "
    "pl20_epoch_shuffle ss16_hybrid_rrf dd17_containment_neardup "
    "ts22_pmi_collocations ev23_watermark_audit sk05_skew_report "
    "hh05_decayed_heavy_hitters ts23_langid_calibration ev24_retention_halflife "
    "io13_ingest_manifest ts24_kneser_ney_surprisal pl21_dsir_selection "
    "ts19_bpe_tokenize pl08_sequence_packing pl10_repetition_mixing "
    "ts13_token_budget_fill pl16_shard_materialize ss15_multiprobe_ann "
    "dd05_simhash ts03_regex_tokens dd06_rolling_fingerprint "
    "ts04_tfidf_terms mm03_feature_extract gq01_grid_climatology "
    "gq03_cftime_360day gq04_nan_null_semantics gq05_grid_zonal_bands "
    "gq06_grid_anomaly_selfjoin gq07_zorder_layout gq11_grid_ndvi "
    "gq12_grid_zonal_mean gq13_grid_warp dd07_semantic_dedup "
    "ss08_knn_classify_ivf q41_recursive_cte_spine ts08_rare_trigram_score "
    "q42_map_funcs pl07_mixture_quotas "
).split()

from xarray_sql_spark import registry as _registry  # noqa: E402

_registry._PRIORITY = tuple(_PRIORITY)
_registry.apply_window_order()

__all__ = ["REGISTRY", "QuerySpec", "query"]
