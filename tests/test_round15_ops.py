"""Round-15 pins: pl23's exact-dedup exchange must not carry document
text (the MinHash signature is hoisted above the content-hash window,
so every wide shuffle in the flagship DAG moves scalars, never token
arrays), plus the composed streaming ingest gate and pl14's two-pass
decile variant."""

from __future__ import annotations

from tests.conftest import SF_MED, SF_SMALL
from xarray_sql_spark.queries import REGISTRY


def _exchange_output_types(df) -> list[tuple[str, list[str]]]:
    """(node simple name, output column type strings) for every shuffle
    exchange in the collected DataFrame's final adaptive plan, walking
    into query stages like test_round14_ops._executed_scan_rows."""
    found = []

    def walk(node):
        name = node.getClass().getSimpleName()
        if "ShuffleExchange" in name:
            out = node.output()
            types = [
                out.apply(i).dataType().simpleString()
                for i in range(out.size())
            ]
            found.append((name, types))
        for i in range(node.children().size()):
            walk(node.children().apply(i))
        if "QueryStageExec" in name:
            walk(node.plan())
        if name == "AdaptiveSparkPlanExec":
            walk(node.executedPlan())

    walk(df._jdf.queryExecution().executedPlan())
    return found


def test_pl23_exchanges_carry_no_token_arrays(spark):
    """r14 verdict item 2: the chash window used to shuffle the full
    `toks` arrays (roughly the corpus text) because the signature was
    computed after exact dedup. The signature is row-wise and
    dedup-independent, so it is now hoisted above the window — every
    exchange in the DAG must carry only scalars (16 longs + hash/domain
    strings), never an array column."""
    df = REGISTRY["pl23_pipeline_e2e"].fn(spark, SF_MED)
    df.collect()
    exchanges = _exchange_output_types(df)
    assert exchanges, "plan unexpectedly has no shuffle exchange"
    offenders = [
        (name, t)
        for name, types in exchanges
        for t in types
        if t.startswith("array<")
    ]
    assert not offenders, f"array column crosses a shuffle: {offenders}"


def test_pl14_decile_expr_equals_spark_ntile(spark):
    """The closed-form bucket arithmetic behind pl14b must reproduce
    Spark's NTILE(10) for every rank at every corpus size that
    exercises an edge: n < 10 (empty small buckets, the q=0 CASE
    guard), n = 10, n % 10 == 0, and ragged n."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from xarray_sql_spark.queries.pipeline_ops import _pl14_decile_expr

    for n in [1, 3, 9, 10, 11, 19, 20, 25, 100, 101, 109]:
        rows = (
            spark.range(1, n + 1)
            .selectExpr(
                "id AS rank",
                f"{_pl14_decile_expr('id', str(n))} AS closed_form",
            )
            .withColumn(
                "ntile", F.ntile(10).over(W.orderBy("rank"))
            )
            .filter("closed_form <> ntile")
            .count()
        )
        assert rows == 0, f"closed form diverges from NTILE at n={n}"


def test_pl14b_bit_identical_to_pl14(spark):
    """The benched two-pass variant and the exact-NTILE diagnostic must
    return the same rows — the 'same output contract' claim as an
    executed equality, not prose."""
    a = REGISTRY["pl14_quality_calibration"].fn(spark, SF_MED).collect()
    b = REGISTRY["pl14b_quality_calibration_two_pass"].fn(spark, SF_MED).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len(a) == 10


def test_pl14b_straddle_window_is_partitioned(spark):
    """pl14b's reason to exist: the corpus-sized rows must never flow
    through a single-partition window. The executed plan's Window
    nodes are allowed only over the grid-bounded histogram (its input
    is the post-aggregation exchange) — the per-doc straddle ranking
    must show a partitioning expression."""
    df = REGISTRY["pl14b_quality_calibration_two_pass"].fn(spark, SF_MED)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    window_lines = [
        ln for ln in plan.splitlines() if "windowspecdefinition(" in ln
    ]
    assert window_lines, "expected Window nodes in the executed plan"
    for ln in window_lines:
        if "row_number()" in ln:
            # the per-doc straddle ranking: MUST be partitioned (by the
            # diversity run), never a global sort of the corpus
            assert "diversity" in ln.split("windowspecdefinition(")[1], ln
        else:
            # the only unpartitioned windows are the cumulative/total
            # sums over the post-aggregation histogram (input rows are
            # per-VALUE counts `nr`, grid-bounded, never per-doc)
            assert "sum(nr#" in ln, ln


def test_pl24_planted_contamination_counts(spark, tmp_path):
    """Differential on a PLANTED corpus where the expected counts are
    hand-computable: doc 0 (doc_id % 97 == 0, so it plays benchmark)
    carries a distinctive 20-word run; doc 5 copies a 13-word span of
    it (exactly 1 colliding position); doc 7 copies the full 20-word
    run (20 - 13 + 1 = 8 positions); doc 9 shares nothing; doc 11 has
    fewer than 13 words (zero grams, clean by construction)."""
    from pyspark.sql import Row

    from xarray_sql_spark.queries import REGISTRY

    run = " ".join(f"zq{i}" for i in range(20))  # 20 distinctive words
    span13 = " ".join(f"zq{i}" for i in range(13))
    # DISTINCT filler per doc — shared filler >= 13 words would be
    # real contamination (it was: the first draft shared one filler and
    # correctly got 18 extra hits)
    f0 = " ".join(f"a{i}" for i in range(30))
    f5 = " ".join(f"b{i}" for i in range(30))
    f9 = " ".join(f"c{i}" for i in range(30))
    docs = [
        Row(doc_id=0, text=f"{f0} {run}", lang="en", source="s",
            n_chars=1),
        Row(doc_id=5, text=f"{span13} {f5}", lang="en", source="s",
            n_chars=1),
        Row(doc_id=7, text=f"pre {run} post", lang="en", source="s",
            n_chars=1),
        Row(doc_id=9, text=f9, lang="de", source="s", n_chars=1),
        Row(doc_id=11, text="tiny doc only five words x", lang="de",
            source="s", n_chars=1),
    ]
    sf_dir = str(tmp_path)
    spark.createDataFrame(docs).write.parquet(f"{sf_dir}/documents.parquet")
    out = {
        r["lang"]: r.asDict()
        for r in REGISTRY["pl24_contamination_check"].fn(spark, sf_dir).collect()
    }
    # en probes: doc 5 (1 hit) and doc 7 (8 hits) — doc 0 is benchmark
    assert out["en"]["n_docs"] == 2
    assert out["en"]["n_contaminated"] == 2
    assert out["en"]["total_hits"] == 1 + 8
    assert out["en"]["max_hits"] == 8
    # de probes: doc 9 clean, doc 11 too short for any gram
    assert out["de"]["n_docs"] == 2
    assert out["de"]["n_contaminated"] == 0
    assert out["de"]["total_hits"] == 0


def test_ts19_one_join_two_corpus_passes(spark):
    """The rewritten ts19 (optimization r15): posexplode carries the
    word position, so the first word's segmentation rides the ONE
    word-key vocabulary join as a max-over-pos-0 aggregate — the old
    shape's separate seg join and doc_id join-back are gone. Executed
    plan must show exactly two passes over documents (the corpus
    posexplode + the vocabulary word-frequency build) and exactly one
    join node."""
    from tests.test_round14_ops import _executed_scan_rows

    df = REGISTRY["ts19_bpe_tokenize"].fn(spark, SF_MED)
    df.collect()
    n_scans, _ = _executed_scan_rows(df, "documents")
    assert n_scans == 2, f"expected 2 documents scans, saw {n_scans}"

    joins = []

    def walk(node):
        name = node.getClass().getSimpleName()
        if "Join" in name:
            joins.append(name)
        for i in range(node.children().size()):
            walk(node.children().apply(i))
        if "QueryStageExec" in name:
            walk(node.plan())
        if name == "AdaptiveSparkPlanExec":
            walk(node.executedPlan())

    walk(df._jdf.queryExecution().executedPlan())
    assert len(joins) == 1, f"expected the single vocab join, saw {joins}"


def _walk_nodes(df) -> list[str]:
    """Simple-class-name list of every node in the executed adaptive plan."""
    names: list[str] = []

    def walk(node):
        name = node.getClass().getSimpleName()
        names.append(name)
        for i in range(node.children().size()):
            walk(node.children().apply(i))
        if "QueryStageExec" in name:
            walk(node.plan())
        if name == "AdaptiveSparkPlanExec":
            walk(node.executedPlan())

    walk(df._jdf.queryExecution().executedPlan())
    return names


def test_mm_fused_single_python_pass(spark):
    """Optimization r15 (guide §4): the mm fixtures' encode kernel and the
    query's decode/hash kernel are composed into ONE mapInPandas, so the
    binary payload crosses the JVM<->Python boundary once per scan instead
    of once per stage. Every fused benched mm query must show exactly one
    Python-evaluation node; mm06/mm07 additionally carry `origin` through
    the kernel, so their old doc_id join-back (and its second documents
    scan) must be gone."""
    fused = (
        "mm01_decode_meta", "mm02_frame_sample", "mm04_resize",
        "mm06_audio_rollup", "mm07_image_rollup", "mm12_signal_stats",
        "mm13_image_phash_dedup", "mm14_audio_fingerprint_dedup",
    )
    for name in fused:
        df = REGISTRY[name].fn(spark, SF_MED)
        df.collect()
        nodes = _walk_nodes(df)
        py = [n for n in nodes if "InPandas" in n or "EvalPython" in n]
        assert len(py) == 1, f"{name}: expected 1 Python node, saw {py}"
        if name in ("mm06_audio_rollup", "mm07_image_rollup"):
            joins = [n for n in nodes if "Join" in n]
            assert not joins, f"{name}: origin join-back resurfaced: {joins}"


def test_mm_fused_matches_two_step(spark):
    """The fused kernels must return byte-identical rows to the retained
    two-step helpers (encode table -> decode op), which remain the
    streaming twins' building blocks."""
    import xarray_sql_spark.operators.multimodal as mm

    two_step = {
        "mm01_decode_meta": lambda: mm.decode_media(
            mm.encoded_media_table(spark, SF_SMALL)
        ),
        "mm02_frame_sample": lambda: mm.sample_frames(
            mm.mp4_media_table(spark, SF_SMALL)
        ),
        "mm04_resize": lambda: mm.resize_images(
            mm.encoded_media_table(spark, SF_SMALL)
        ),
        "mm13_image_phash_dedup_hashes": lambda: mm.image_phash_table(
            spark, SF_SMALL
        ).mapInPandas(mm._phash_batches, "doc_id long, phash string, n_px long"),
        "mm14_audio_fingerprint_dedup_fps": lambda: mm.audio_phash_table(
            spark, SF_SMALL
        ).mapInPandas(mm._afp_batches, "doc_id long, fp string, n_samples long"),
    }
    fused = {
        "mm01_decode_meta": lambda: REGISTRY["mm01_decode_meta"].fn(
            spark, SF_SMALL
        ),
        "mm02_frame_sample": lambda: REGISTRY["mm02_frame_sample"].fn(
            spark, SF_SMALL
        ),
        "mm04_resize": lambda: REGISTRY["mm04_resize"].fn(spark, SF_SMALL),
        "mm13_image_phash_dedup_hashes": lambda: mm._mm13_docs(
            spark, SF_SMALL
        ).mapInPandas(
            mm._compose(mm._mm13_encode_batches, mm._phash_batches),
            "doc_id long, phash string, n_px long",
        ),
        "mm14_audio_fingerprint_dedup_fps": lambda: mm._mm14_docs(
            spark, SF_SMALL
        ).mapInPandas(
            mm._compose(mm._mm14_encode_batches, mm._afp_batches),
            "doc_id long, fp string, n_samples long",
        ),
    }
    for name in two_step:
        a = sorted(tuple(r) for r in two_step[name]().collect())
        b = sorted(tuple(r) for r in fused[name]().collect())
        assert a == b, f"{name}: fused output diverged from two-step"


def test_ev14_two_scans_no_nested_loop(spark):
    """Optimization r15 (guide §2.3): ev14's scaffold bounds and its
    event-type set now come from ONE single-row aggregate
    (min/max/collect_set) instead of separate bounds + DISTINCT scans,
    and the hours x types grid is built by two explodes instead of a
    crossJoin — two events scans total, no BroadcastNestedLoopJoin."""
    from tests.test_round14_ops import _executed_scan_rows

    df = REGISTRY["ev14_gap_fill"].fn(spark, SF_MED)
    df.collect()
    n_scans, _ = _executed_scan_rows(df, "events")
    assert n_scans == 2, f"expected 2 events scans, saw {n_scans}"
    nodes = _walk_nodes(df)
    assert not any("NestedLoop" in n for n in nodes), nodes


def test_funnels_one_scan_one_exchange_key(spark):
    """Optimization r15 (guide §2.3/§2.4): ev06/ev12's funnel stages are
    chained min-over-user_id windows + a user_id groupBy — ONE executed
    events scan and no joins (the old per-stage aggregate cascade
    recomputed each stage's subtree per consumer: 3 and 4 executed
    scans respectively)."""
    from tests.test_round14_ops import _executed_scan_rows

    for name in ("ev06_conversion_funnel", "ev12_funnel_conversion"):
        df = REGISTRY[name].fn(spark, SF_MED)
        df.collect()
        n_scans, _ = _executed_scan_rows(df, "events")
        assert n_scans == 1, f"{name}: expected 1 events scan, saw {n_scans}"
        nodes = _walk_nodes(df)
        assert not any("Join" in n for n in nodes), (name, nodes)


def test_funnel_user_stages_equals_funnel_stages(spark):
    """The chained-window funnel helper (ONE user_id exchange) is
    row-identical to the per-stage min-join cascade it replaced —
    ``funnel_stages`` stays the streaming stage-machine's batch
    reference, ``funnel_user_stages`` is what ev06/ev12/ev16 execute."""
    from xarray_sql_spark.queries.pipeline_ops import (
        funnel_stages,
        funnel_user_stages,
    )
    from xarray_sql_spark.session import table

    e = table(spark, SF_MED, "events")
    cols = ["user_id", "t1", "t2", "t3"]
    old = sorted(map(tuple, funnel_stages(e).select(*cols).collect()))
    new = sorted(map(tuple, funnel_user_stages(e).select(*cols).collect()))
    assert old == new


def test_single_scan_rewrites_r15_batch2(spark):
    """Optimization r15 (guide §2.3): ev16 rides funnel_user_stages,
    ev24's cohort_size is a window over the dimension-sized cells table,
    sk05's top-key/total/percentile probes all ride the counts-of-counts
    histogram — each executes exactly ONE events scan and no joins
    (before: 4, 3 and 5 static scans with 6, 4 and 8 joins)."""
    from tests.test_round14_ops import _executed_scan_rows

    for name in (
        "ev16_conversion_delays",
        "ev24_retention_halflife",
        "sk05_skew_report",
    ):
        df = REGISTRY[name].fn(spark, SF_MED)
        df.collect()
        n_scans, _ = _executed_scan_rows(df, "events")
        assert n_scans == 1, f"{name}: expected 1 events scan, saw {n_scans}"
        nodes = _walk_nodes(df)
        assert not any("Join" in n for n in nodes), (name, nodes)


def test_hh04_exact_twin_single_heavy_pass(spark):
    """Optimization r15 (guide §2.3): hh04's exact twin consumes the
    hashed-bigram subtree ONCE (a grouped source-set pass) — the old
    distinct + hv self-equi-join re-ran it three more times. Executed
    documents scans: est sketch side + exact hs side + the trivial
    one-column source dictionary (its theta-join stub sides share one
    reused stage) = 3; no SortMergeJoin anywhere."""
    from tests.test_round14_ops import _executed_scan_rows

    df = REGISTRY["hh04_kmv_set_ops"].fn(spark, SF_MED)
    df.collect()
    n_scans, _ = _executed_scan_rows(df, "documents")
    assert n_scans <= 3, f"expected <=3 documents scans, saw {n_scans}"
    nodes = _walk_nodes(df)
    assert not any("SortMergeJoin" in n for n in nodes), nodes
