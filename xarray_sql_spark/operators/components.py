"""Connected components over near-duplicate pair graphs → dedup purge lists.

Near-dup detection (MinHash/SimHash/embedding buckets) emits *pairs*; a
purge needs *clusters* — if A~B and B~C, one keeper must survive for
{A,B,C} even though (A,C) was never emitted. That closure is a connected-
components problem, solved here as iterative min-label propagation with a
path-compression join (label <- label-of-label) so chains collapse in
O(log diameter) rounds, entirely in DataFrame ops.

This is the engine's one *iterative* operator: each round is a join +
groupBy (two shuffles) on the current label table — at 100 TB the label
table is (doc_id, comp) pairs, a fraction of corpus bytes, and rounds are
capped. Production systems use the same loop (or its large-star/small-star
refinement) when a graph engine isn't available.

No DuckDB oracle: iterative fixpoints are not single-statement ANSI SQL
(the driver records the rows-only check for cc01 — the category the brief
reserves for iterative algorithms); value-level correctness is pinned by a
union-find differential test in tests/test_components.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xarray_sql_spark.queries.registry import query
from xarray_sql_spark.queries.dedup_lsh import dd04_minhash_lsh
from xarray_sql_spark.session import table

MAX_ROUNDS = 12


def connected_components(edges: DataFrame, max_rounds: int = MAX_ROUNDS) -> DataFrame:
    """Label every vertex of an undirected edge list (src, dst) with the
    minimum vertex id of its component. Converges when a full round changes
    no label; rounds are join+min-aggregate, so the plan stays shuffle-
    bounded regardless of component shape."""
    sym = edges.selectExpr("src", "dst").union(edges.selectExpr("dst AS src", "src AS dst"))
    labels = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("comp"))
    )
    labels = labels.localCheckpoint(eager=True)
    for _ in range(max_rounds):
        # neighbor minimum: the smallest label visible one hop away
        neigh = (
            sym.join(labels, sym.dst == labels.id)
            .groupBy("src")
            .agg(F.min("comp").alias("ncomp"))
        )
        new_labels = (
            labels.join(neigh, labels.id == neigh.src, "left")
            .select(
                "id",
                F.least(
                    "comp", F.coalesce("ncomp", F.col("comp"))
                ).alias("comp"),
            )
        )
        # path compression: comp <- comp's own label (collapses chains fast)
        l2 = new_labels.alias("l2")
        new_labels = (
            new_labels.alias("l1")
            .join(l2, F.col("l1.comp") == F.col("l2.id"), "left")
            .select(
                F.col("l1.id").alias("id"),
                F.least(
                    F.col("l1.comp"), F.coalesce(F.col("l2.comp"), F.col("l1.comp"))
                ).alias("comp"),
            )
        )
        # truncate lineage each round — iterative plans otherwise grow
        # exponentially and re-execute from the source every round
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), F.col("n.id") == F.col("o.id"))
            .filter(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def dedup_assignment(pairs: DataFrame) -> DataFrame:
    """pairs (doc_a, doc_b) -> (doc_id, keeper_doc_id, is_duplicate):
    every doc in a near-dup cluster maps to the cluster's min doc_id."""
    edges = pairs.selectExpr("doc_a AS src", "doc_b AS dst")
    comp = connected_components(edges)
    return comp.select(
        F.col("id").alias("doc_id"),
        F.col("comp").alias("keeper_doc_id"),
        (F.col("id") != F.col("comp")).alias("is_duplicate"),
    )


@query(
    "cc01_neardup_purge",
    oracle=None,  # iterative fixpoint — rows-only driver check; see module doc
    tags=("dedup", "components", "iterative", "pipeline"),
    bench=False,
)
def cc01_neardup_purge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end purge list: MinHash-LSH pairs (est_jaccard >= 0.9) →
    connected components → per-doc keeper assignment. Docs never appearing
    in any pair are their own keeper (left-join + coalesce)."""
    pairs = dd04_minhash_lsh(spark, sf_dir)
    assign = dedup_assignment(pairs)
    docs = table(spark, sf_dir, "documents").select("doc_id")
    return (
        docs.join(assign, on="doc_id", how="left")
        .select(
            "doc_id",
            F.coalesce("keeper_doc_id", F.col("doc_id")).alias("keeper_doc_id"),
            F.coalesce("is_duplicate", F.lit(False)).alias("is_duplicate"),
        )
    )
