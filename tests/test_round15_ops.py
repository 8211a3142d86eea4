"""Round-15 pins: pl23's exact-dedup exchange must not carry document
text (the MinHash signature is hoisted above the content-hash window,
so every wide shuffle in the flagship DAG moves scalars, never token
arrays), plus the composed streaming ingest gate and pl14's two-pass
decile variant."""

from __future__ import annotations

from tests.conftest import SF_MED
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
