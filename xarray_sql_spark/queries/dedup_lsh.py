"""Sketch-based near-duplicate detection and LSH similarity search.

These are the *scale paths* for the pipeline operators in ``pipeline_ops``:
``dd03_ngram_jaccard`` / ``ss02_embedding_neardup`` do exact pairwise math
within buckets; the operators here replace the candidate-generation stage
with sublinear sketches (MinHash banding, SimHash byte-banding, random
hyperplane LSH) so the only joins are equi-joins on short sketch keys.

Cross-engine determinism: every pseudo-random quantity (MinHash permutation
coefficients, hyperplane components) is derived from md5, which Python,
Spark (``md5``) and DuckDB (``md5``) all agree on. The shared 60-bit token
hash is::

    Spark:  CAST(conv(substring(md5(x), 1, 15), 16, 10) AS BIGINT)
    DuckDB: ('0x' || substring(md5(x), 1, 15))::BIGINT
    Python: int(hashlib.md5(x.encode()).hexdigest()[:15], 16)

all equal by construction (15 hex chars = 60 bits, fits int64).

Reference parity note: the reference (alxmrs/xarray-sql) has no dedup or
similarity operators — these extend the engine for LLM-training-data
pipelines per the north star in BASELINE.json.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from xarray_sql_spark.registry import query
from xarray_sql_spark.session import table

MERSENNE31 = 2147483647  # permutations work mod this prime; a*h < 2^62 fits int64


def _md5int(s: str) -> int:
    """Python twin of the shared 60-bit md5-prefix hash."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _spark_h31(col_sql: str) -> str:
    return f"CAST(conv(substring(md5({col_sql}), 1, 15), 16, 10) AS BIGINT) % {MERSENNE31}"


def _duck_h31(col_sql: str) -> str:
    return f"(('0x' || substring(md5({col_sql}), 1, 15))::BIGINT) % {MERSENNE31}"


# --- MinHash + LSH banding --------------------------------------------------
N_PERMS = 16
N_BANDS = 4  # 4 bands x 4 rows
ROWS_PER_BAND = N_PERMS // N_BANDS
# Permutation coefficients h_i(x) = (a_i * x + b_i) mod P, derived from md5 so
# the oracle SQL can embed the identical literals.
PERM_A = [_md5int(f"minhash-a-{i}") % (MERSENNE31 - 2) + 1 for i in range(N_PERMS)]
PERM_B = [_md5int(f"minhash-b-{i}") % MERSENNE31 for i in range(N_PERMS)]
# The synthetic corpus has a ~40-word vocabulary, so token *sets* overlap
# heavily; report only pairs whose signatures estimate jaccard >= this.
EST_JACCARD_MIN = 0.9


def _minhash_sig_cte() -> str:
    """Shared oracle CTE prefix: documents -> distinct-token hashes ->
    16-component MinHash signatures (no banding). dd12's layout sweep
    builds its own band arms on top of this."""
    mins = ",\n               ".join(
        f"min(({PERM_A[i]} * h + {PERM_B[i]}) % {MERSENNE31}) AS s{i}"
        for i in range(N_PERMS)
    )
    return f"""
    WITH tok AS (
        SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
        FROM documents
    ),
    h AS (SELECT doc_id, {_duck_h31('tok')} AS h FROM tok),
    sig AS (
        SELECT doc_id,
               {mins}
        FROM h GROUP BY doc_id
    )"""


def _band_rows_sql(bands: int, rows: int) -> str:
    """DuckDB VALUES rows hashing a (bands x rows) layout of the s0..s15
    signature columns — ONE construction for the production 4x4 CTE and
    dd12's layout sweep."""
    return ", ".join(
        "(" + str(j) + ", md5(concat_ws('-', "
        + ", ".join(f"s{j * rows + r}" for r in range(rows))
        + ")))"
        for j in range(bands)
    )


def _band_structs(bands: int, rows: int):
    """Spark twin of :func:`_band_rows_sql`: the exploded-band struct
    array over a signature row."""
    return F.array(
        *[
            F.struct(
                F.lit(j).alias("band_idx"),
                F.md5(
                    F.concat_ws(
                        "-", *[F.col(f"s{j * rows + r}") for r in range(rows)]
                    )
                ).alias("band_hash"),
            )
            for j in range(bands)
        ]
    )


def _minhash_bands_cte() -> str:
    """Signature prefix + the production 4x4 banded hashes. Used by dd04's
    pair generation AND dd08's incremental gate so the band definition
    exists in exactly one place per engine."""
    return f"""{_minhash_sig_cte()},
    bands AS (
        SELECT doc_id, band.band_idx, band.band_hash
        FROM sig, LATERAL (
            SELECT * FROM (VALUES {_band_rows_sql(N_BANDS, ROWS_PER_BAND)})
            AS v(band_idx, band_hash)
        ) AS band
    )"""


def _minhash_bands_df(spark: SparkSession, sf_dir: str):
    """Shared Spark builder: (signatures df, exploded bands df) with the
    same constants the oracle CTE embeds."""
    d = table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("tok")
    )
    h = tok.select("doc_id", F.expr(_spark_h31("tok")).alias("h"))
    sig = h.groupBy("doc_id").agg(
        *[
            F.min((F.lit(PERM_A[i]) * F.col("h") + F.lit(PERM_B[i])) % MERSENNE31).alias(
                f"s{i}"
            )
            for i in range(N_PERMS)
        ]
    )
    bands = sig.select(
        "doc_id", F.explode(_band_structs(N_BANDS, ROWS_PER_BAND)).alias("band")
    ).select("doc_id", "band.band_idx", "band.band_hash")
    return sig, bands


def _minhash_oracle() -> str:
    eq_terms = " + ".join(
        f"CASE WHEN sa.s{i} = sb.s{i} THEN 1 ELSE 0 END" for i in range(N_PERMS)
    )
    return f"""{_minhash_bands_cte()},
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               count(*) AS n_bands
        FROM bands a JOIN bands b
          ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
         AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT CAST(p.doc_a AS BIGINT) AS doc_a,
           CAST(p.doc_b AS BIGINT) AS doc_b,
           CAST(p.n_bands AS INT) AS n_bands,
           round(({eq_terms}) / {N_PERMS}.0, 6) AS est_jaccard
    FROM pairs p
    JOIN sig sa ON sa.doc_id = p.doc_a
    JOIN sig sb ON sb.doc_id = p.doc_b
    WHERE ({eq_terms}) / {N_PERMS}.0 >= {EST_JACCARD_MIN}
    """


@query(
    "dd04_minhash_lsh",
    oracle=_minhash_oracle(),
    tags=("dedup", "near-dup", "lsh", "pipeline"),
    # The ~40-word synthetic vocabulary makes most docs near-dups, so the
    # pair output is quadratic at sf0.1 — an artifact, not the operator's
    # scale shape. Keep it oracle-checked but out of the headline bench.
    bench=False,
)
def dd04_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(16 perms) + LSH banding (4 bands x 4 rows) near-dup candidates.

    Scale shape: one scan computes 16-component signatures with map-side
    combine (groupBy doc_id over exploded tokens); candidate generation is an
    equi-join on (band_idx, band_hash) — docs land in the same bucket only if
    a whole band matches, so the join output is ~linear in the number of true
    near-dups, never O(n^2). The signature table (16 ints/doc) is ~1e-4 of
    corpus bytes at 100 TB, so the final est-jaccard join is cheap and the
    raw text never shuffles.
    """
    sig, bands = _minhash_bands_df(spark, sf_dir)
    a, b = bands.alias("a"), bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").cast("int").alias("n_bands"))
    )
    sa = sig.alias("sa")
    sb = sig.alias("sb")
    est = sum(
        F.when(F.col(f"sa.s{i}") == F.col(f"sb.s{i}"), 1).otherwise(0)
        for i in range(N_PERMS)
    ) / float(N_PERMS)
    return (
        pairs.join(sa, F.col("sa.doc_id") == F.col("doc_a"))
        .join(sb, F.col("sb.doc_id") == F.col("doc_b"))
        .filter(est >= EST_JACCARD_MIN)
        .select("doc_a", "doc_b", "n_bands", F.round(est, 6).alias("est_jaccard"))
    )


# --- dd09: sketch accuracy (MinHash estimate vs exact Jaccard) ---------------
_DD09_MAX_DOC = 60  # bounded eval subset: accuracy, not corpus-scale dedup


def _dd09_oracle() -> str:
    eq_terms = " + ".join(
        f"CASE WHEN sa.s{i} = sb.s{i} THEN 1 ELSE 0 END" for i in range(N_PERMS)
    )
    return f"""{_minhash_bands_cte()},
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
         AND a.doc_id < b.doc_id
        WHERE a.doc_id < {_DD09_MAX_DOC} AND b.doc_id < {_DD09_MAX_DOC}
        GROUP BY 1, 2
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
    inter AS (
        SELECT p.doc_a, p.doc_b, count(*) AS ninter
        FROM pairs p
        JOIN tok ta ON ta.doc_id = p.doc_a
        JOIN tok tb ON tb.doc_id = p.doc_b AND tb.tok = ta.tok
        GROUP BY 1, 2
    )
    SELECT CAST(p.doc_a AS BIGINT) AS doc_a,
           CAST(p.doc_b AS BIGINT) AS doc_b,
           round(({eq_terms}) / {N_PERMS}.0, 6) AS est_jaccard,
           round(i.ninter / (za.n + zb.n - i.ninter), 6) AS exact_jaccard,
           round(abs(({eq_terms}) / {N_PERMS}.0
                     - i.ninter / (za.n + zb.n - i.ninter)), 6) AS abs_err
    FROM pairs p
    JOIN inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b
    JOIN sizes za ON za.doc_id = p.doc_a
    JOIN sizes zb ON zb.doc_id = p.doc_b
    JOIN sig sa ON sa.doc_id = p.doc_a
    JOIN sig sb ON sb.doc_id = p.doc_b
    ORDER BY doc_a, doc_b
    """


@query(
    "dd09_sketch_accuracy",
    oracle=_dd09_oracle(),
    tags=("dedup", "lsh", "evaluation", "pipeline"),
    bench=False,  # bounded eval subset, not a throughput shape
)
def dd09_sketch_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-quality evaluation: for every LSH candidate pair in a
    bounded doc subset, the MinHash Jaccard ESTIMATE (signature
    agreement / 16) next to the EXACT distinct-token Jaccard and the
    absolute error — the measurement a pipeline owner runs before
    trusting a sketch config (n_perms/bands) at corpus scale. Pure
    integer set arithmetic plus single divisions, so both engines agree
    bit-for-bit.

    Scale: this is the bounded diagnostic (like dd03) — the exact
    intersection join is per CANDIDATE pair, so cost is |candidates| x
    avg set size, run on a sample, never the corpus. The sketch being
    evaluated (dd04/dd08) stays the production shape."""
    sig, bands = _minhash_bands_df(spark, sf_dir)
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < _DD09_MAX_DOC)
    tok = d.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("tok")
    )
    sub = bands.filter(F.col("doc_id") < _DD09_MAX_DOC)
    a, b = sub.alias("a"), sub.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sizes = tok.groupBy("doc_id").agg(F.count("*").alias("n"))
    ta, tb = tok.alias("ta"), tok.alias("tb")
    inter = (
        pairs.join(ta, F.col("ta.doc_id") == F.col("doc_a"))
        .join(
            tb,
            (F.col("tb.doc_id") == F.col("doc_b"))
            & (F.col("tb.tok") == F.col("ta.tok")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("ninter"))
    )
    sa, sb_ = sig.alias("sa"), sig.alias("sb")
    est = sum(
        F.when(F.col(f"sa.s{i}") == F.col(f"sb.s{i}"), 1).otherwise(0)
        for i in range(N_PERMS)
    ) / float(N_PERMS)
    za, zb = sizes.alias("za"), sizes.alias("zb")
    exact = F.col("ninter") / (F.col("za.n") + F.col("zb.n") - F.col("ninter"))
    return (
        pairs.join(inter, ["doc_a", "doc_b"])
        .join(za, F.col("za.doc_id") == F.col("doc_a"))
        .join(zb, F.col("zb.doc_id") == F.col("doc_b"))
        .join(sa, F.col("sa.doc_id") == F.col("doc_a"))
        .join(sb_, F.col("sb.doc_id") == F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.round(est, 6).alias("est_jaccard"),
            F.round(exact, 6).alias("exact_jaccard"),
            F.round(F.abs(est - exact), 6).alias("abs_err"),
        )
        .orderBy("doc_a", "doc_b")
    )


# --- SimHash ----------------------------------------------------------------
SIMHASH_BITS = 32
SIMHASH_BANDS = 4  # 8-bit bytes; hamming <= 3 guarantees >= 1 shared byte
HAMMING_MAX = 2


def _simhash_oracle() -> str:
    byte_rows = ", ".join(
        f"({j}, (simhash >> {8 * j}) & 255)" for j in range(SIMHASH_BANDS)
    )
    return f"""
    WITH tok AS (
        SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
        FROM documents
    ),
    h AS (SELECT doc_id, ('0x' || substring(md5(tok), 1, 15))::BIGINT AS h FROM tok),
    bits AS (
        SELECT doc_id, bit,
               sum(CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS s
        FROM h, LATERAL (SELECT unnest(range(0, {SIMHASH_BITS})) AS bit) b
        GROUP BY doc_id, bit
    ),
    sig AS (
        SELECT doc_id,
               sum(CASE WHEN s > 0 THEN (1::BIGINT << bit) ELSE 0 END) AS simhash
        FROM bits GROUP BY doc_id
    ),
    bands AS (
        SELECT doc_id, simhash, band.byte_idx, band.byte_val
        FROM sig, LATERAL (
            SELECT * FROM (VALUES {byte_rows}) AS v(byte_idx, byte_val)
        ) AS band
    )
    SELECT DISTINCT CAST(a.doc_id AS BIGINT) AS doc_a,
           CAST(b.doc_id AS BIGINT) AS doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
    FROM bands a JOIN bands b
      ON a.byte_idx = b.byte_idx AND a.byte_val = b.byte_val
     AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {HAMMING_MAX}
    """


@query(
    "dd05_simhash",
    oracle=_simhash_oracle(),
    tags=("dedup", "near-dup", "simhash", "pipeline"),
    bench=False,  # same degenerate-corpus artifact as dd04
)
def dd05_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash(32-bit) near-dup: byte-banded candidates, hamming<=2 verify.

    Each doc collapses to one 32-bit signature (a per-bit majority vote over
    token hashes). Candidates share at least one of 4 signature bytes — the
    pigeonhole guarantee for hamming<=3, a recall-biased net for <=6 — so
    candidate generation is an equi-join on a 1-byte key + band index.
    At 100 TB: the signature table is 12 bytes/doc; the only wide shuffle is
    the doc_id groupBy that builds signatures, which AQE coalesces.
    """
    d = table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("tok")
    )
    h = tok.select(
        "doc_id",
        F.expr("CAST(conv(substring(md5(tok), 1, 15), 16, 10) AS BIGINT)").alias("h"),
    )
    bits = (
        h.select(
            "doc_id",
            "h",
            F.explode(F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1))).alias("bit"),
        )
        .select(
            "doc_id",
            "bit",
            F.when(F.expr("(h >> bit) & 1 = 1"), 1).otherwise(-1).alias("contrib"),
        )
        .groupBy("doc_id", "bit")
        .agg(F.sum("contrib").alias("s"))
    )
    sig = bits.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("s") > 0, F.expr("CAST(1 AS BIGINT) << bit")).otherwise(0)
        ).alias("simhash")
    )
    byte_structs = F.array(
        *[
            F.struct(
                F.lit(j).alias("byte_idx"),
                F.expr(f"(simhash >> {8 * j}) & 255").alias("byte_val"),
            )
            for j in range(SIMHASH_BANDS)
        ]
    )
    bands = sig.select("doc_id", "simhash", F.explode(byte_structs).alias("band")).select(
        "doc_id", "simhash", "band.byte_idx", "band.byte_val"
    )
    a, b = bands.alias("a"), bands.alias("b")
    hamming = F.expr("bit_count(a.simhash ^ b.simhash)").cast("int")
    return (
        a.join(
            b,
            (F.col("a.byte_idx") == F.col("b.byte_idx"))
            & (F.col("a.byte_val") == F.col("b.byte_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= HAMMING_MAX)
        .distinct()
    )


# --- Random-hyperplane LSH ANN ---------------------------------------------
N_PLANES = 8
EMBED_DIM = 64
# Hyperplane components in [-1, 1], derived from md5 so all engines agree.
PLANES = [
    [
        (_md5int(f"plane-{p}-dim-{dd}") % 2001 - 1000) / 1000.0
        for dd in range(EMBED_DIM)
    ]
    for p in range(N_PLANES)
]


def _plane_literal_duck(p: int) -> str:
    return "[" + ", ".join(repr(x) for x in PLANES[p]) + "]::DOUBLE[]"


# The Spark-side exact-cosine fold between aliases q and c — ONE spelling
# shared by ss03/ss12/ss13 so the distance arithmetic cannot drift between
# the retrieval queries (the fold equals DuckDB's list_cosine_similarity
# only at the 1e-6 rounding grid; comparisons/ranks must round first).
COS_FOLD_SQL = (
    "aggregate(zip_with(q.v, c.v, (x, y) -> x * y), "
    "CAST(0.0 AS DOUBLE), (a, x) -> a + x) / (q.norm * c.norm)"
)


def _bucket_terms_duck() -> str:
    """The 8-bit hyperplane signature, DuckDB spelling — ONE definition
    shared by every LSH oracle (ss03/ss12), so a change to the plane set
    or the >= 0 sign rule cannot drift between queries."""
    return " + ".join(
        f"(CASE WHEN list_inner_product(v, {_plane_literal_duck(p)}) >= 0 "
        f"THEN {1 << p} ELSE 0 END)"
        for p in range(N_PLANES)
    )


def _bucketed_cte_spark(view: str) -> str:
    """The matching Spark-SQL CTE body: signature + L2 norm per vector —
    the single source of the bucket definition on the Spark side. The
    8x64 plane matrix appears ONCE inside a sequence-aggregate (the DSL
    form duplicated a 64-float literal into 8 subtrees and paid ~1 s of
    py4j/analysis per build)."""
    planes_sql = "array(" + ", ".join(
        "array(" + ", ".join(repr(x) for x in PLANES[p]) + ")"
        for p in range(N_PLANES)
    ) + ")"
    return f"""
            SELECT vec_id, v,
                   aggregate(sequence(0, {N_PLANES - 1}), 0, (acc, p) ->
                       acc + IF(aggregate(zip_with(v, {planes_sql}[p],
                                                   (x, y) -> x * y),
                                CAST(0.0 AS DOUBLE), (a, x) -> a + x) >= 0,
                                shiftleft(1, p), 0)) AS bucket,
                   sqrt(aggregate(transform(v, x -> x * x),
                        CAST(0.0 AS DOUBLE), (a, x) -> a + x)) AS norm
            FROM (SELECT vec_id, CAST(embedding AS array<double>) AS v
                  FROM {view})"""


def _lsh_ann_oracle() -> str:
    bucket_terms = _bucket_terms_duck()
    return f"""
    WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    bucketed AS (
        SELECT vec_id, v, {bucket_terms} AS bucket FROM e
    ),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               list_cosine_similarity(q.v, c.v) AS cos
        FROM bucketed q JOIN bucketed c
          ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
        WHERE q.vec_id < 10
    ),
    ranked AS (
        SELECT query_id, neighbor_id, cos,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, neighbor_id) AS rank
        FROM scored
    )
    SELECT CAST(query_id AS BIGINT) AS query_id,
           CAST(neighbor_id AS BIGINT) AS neighbor_id,
           CAST(rank AS INT) AS rank,
           round(cos, 6) AS cosine
    FROM ranked WHERE rank <= 3
    """


@query(
    "ss03_lsh_ann",
    oracle=_lsh_ann_oracle(),
    tags=("similarity", "lsh", "pipeline"),
)
def ss03_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via random-hyperplane LSH: 8 signed projections -> 256 buckets,
    exact cosine re-rank within the query's bucket only.

    This is the sublinear counterpart of ``ss01_ann_topk`` (brute force):
    the corpus is scanned once to compute an 8-bit bucket id, and the
    candidate join is an equi-join on that id, touching ~1/256 of the corpus
    per query. At 100 TB the bucketed table is written once (partitioned by
    bucket) and every query prunes to its bucket's partitions; recall is
    tuned by multi-probe or more tables, not by widening the join.
    """
    # spread the 8 per-row plane projections if the layout is unsplittable
    # (bench partition sanity; same rationale as ss01)
    table(spark, sf_dir, "embeddings", spread=True).createOrReplaceTempView(
        "ss03_embeddings"
    )
    return spark.sql(f"""
        WITH b AS ({_bucketed_cte_spark("ss03_embeddings")}
        ),
        scored AS (
            SELECT /*+ BROADCAST(q) */
                   q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   {COS_FOLD_SQL} AS cos
            FROM b c JOIN (SELECT * FROM b WHERE vec_id < 10) q
              ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
        )
        SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank,
               round(cos, 6) AS cosine
        FROM (SELECT query_id, neighbor_id, cos,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY cos DESC, neighbor_id) AS rank
              FROM scored)
        WHERE rank <= 3
    """)


# --- ss12: LSH-bucketed radius (range) search --------------------------------
RADIUS_TAU = 0.2
RADIUS_NQ = 50


def _lsh_radius_oracle() -> str:
    bucket_terms = _bucket_terms_duck()
    return f"""
    WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    bucketed AS (
        SELECT vec_id, v, {bucket_terms} AS bucket FROM e
    )
    SELECT CAST(q.vec_id AS BIGINT) AS query_id,
           CAST(c.vec_id AS BIGINT) AS neighbor_id,
           round(list_cosine_similarity(q.v, c.v), 6) AS cosine
    FROM bucketed q JOIN bucketed c
      ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
    WHERE q.vec_id < {RADIUS_NQ}
      AND round(list_cosine_similarity(q.v, c.v), 6) >= {RADIUS_TAU}
    """


@query(
    "ss12_radius_search",
    oracle=_lsh_radius_oracle(),
    tags=("similarity", "lsh", "range-query", "pipeline"),
)
def ss12_radius_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius (range) search — the retrieval verb top-k cannot express:
    return EVERY corpus vector within a fixed cosine radius of each
    query, however many or few there are (near-duplicate sweeps, recall
    sets, dense-region diagnostics all want "all matches above τ", not
    "the best 3"). Same sublinear shape as ss03: one scan computes the
    8-bit hyperplane signature, candidates come from the bucket
    equi-join, and the radius test runs only within the bucket. The
    decision compares the ROUNDED cosine on both engines, so the keep/
    drop boundary sits on the shared 1e-6 grid.

    Scale: identical to ss03 — candidates are ~1/256 of the corpus per
    query, recall is tuned with multi-probe or more tables, and the
    output is linear in TRUE matches (radius queries are the shape
    whose result size top-k clamps artificially)."""
    table(spark, sf_dir, "embeddings", spread=True).createOrReplaceTempView(
        "ss12_embeddings"
    )
    return spark.sql(f"""
        WITH b AS ({_bucketed_cte_spark("ss12_embeddings")}
        ),
        scored AS (
            SELECT /*+ BROADCAST(q) */
                   q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   round({COS_FOLD_SQL}, 6) AS cosine
            FROM b c JOIN (SELECT * FROM b WHERE vec_id < {RADIUS_NQ}) q
              ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
        )
        SELECT query_id, neighbor_id, cosine
        FROM scored WHERE cosine >= {RADIUS_TAU}
    """)


# --- BPE-ish regex tokenization --------------------------------------------
TOKEN_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"


@query(
    "ts03_regex_tokens",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, lang,
               regexp_extract_all(text, '{TOKEN_RE}') AS pieces
        FROM documents
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len(pieces)) AS BIGINT) AS total_pieces,
           round(avg(CAST(len(pieces) AS DOUBLE)), 6) AS avg_pieces,
           round(avg(CAST(len(list_distinct(pieces)) AS DOUBLE)
                     / CAST(len(pieces) AS DOUBLE)), 6) AS avg_piece_diversity
    FROM t GROUP BY lang ORDER BY lang
    """,
    tags=("text", "tokenize", "pipeline"),
)
def ts03_regex_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-style regex tokenization stats per language: alpha runs, digit
    runs, and single punctuation marks as word pieces (the pre-merge BPE
    alphabet). Pure JVM regexp over one scan; the groupBy key has 5 values,
    so partial aggregation collapses nearly all rows map-side.
    """
    d = table(spark, sf_dir, "documents")
    pieces = F.expr(f"regexp_extract_all(text, '{TOKEN_RE}', 0)")
    t = d.select("doc_id", "lang", pieces.alias("pieces"))
    n = F.size("pieces").cast("double")
    return (
        t.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.size("pieces")).cast("long").alias("total_pieces"),
            F.round(F.avg(F.size("pieces").cast("double")), 6).alias("avg_pieces"),
            F.round(
                F.avg(F.size(F.array_distinct("pieces")).cast("double") / n), 6
            ).alias("avg_piece_diversity"),
        )
        .orderBy("lang")
    )


# --- Rolling-hash document fingerprint --------------------------------------
ROLL_BASE = 1000003


@query(
    "dd06_rolling_fingerprint",
    oracle=f"""
    WITH fp AS (
        SELECT doc_id,
               list_reduce(
                   list_prepend(0::BIGINT,
                       list_transform(string_split(text, ' '),
                                      t -> {_duck_h31('t')})),
                   (acc, x) -> (acc * {ROLL_BASE} + x) % {MERSENNE31}
               ) AS fingerprint
        FROM documents
    )
    SELECT fingerprint,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(doc_id) AS BIGINT) AS keeper_doc_id
    FROM fp GROUP BY fingerprint
    """,
    tags=("dedup", "fingerprint", "pipeline"),
)
def dd06_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive polynomial rolling-hash fingerprint over the token
    stream (acc = acc*B + h(tok) mod P) — the order-sensitive dual of
    dd02's sorted-set fingerprint. One scan, one tiny groupBy; at 100 TB the
    fingerprint column is 8 bytes/doc, so dedup never shuffles text.
    """
    d = table(spark, sf_dir, "documents")
    fp = F.expr(
        f"aggregate(transform(split(text, ' '), t -> {_spark_h31('t')}), "
        f"CAST(0 AS BIGINT), (acc, x) -> (acc * {ROLL_BASE} + x) % {MERSENNE31})"
    )
    return (
        d.select("doc_id", fp.alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("keeper_doc_id"))
    )


# --- TF-IDF: top distinguishing terms per language --------------------------
@query(
    "ts04_tfidf_terms",
    oracle="""
    WITH tok AS (
        SELECT doc_id, lang, unnest(list_distinct(string_split(text, ' '))) AS term
        FROM documents
    ),
    n_docs AS (SELECT count(*) AS n FROM documents),
    df_t AS (SELECT term, count(*) AS df FROM tok GROUP BY term),
    tf AS (SELECT lang, term, count(*) AS tf FROM tok GROUP BY lang, term),
    scored AS (
        SELECT tf.lang, tf.term,
               round(tf.tf * ln((SELECT n FROM n_docs) / CAST(df_t.df AS DOUBLE)), 6)
                   AS tfidf
        FROM tf JOIN df_t ON tf.term = df_t.term
    ),
    ranked AS (
        SELECT lang, term, tfidf,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY tfidf DESC, term) AS rnk
        FROM scored
    )
    SELECT lang, term, tfidf, CAST(rnk AS INT) AS rnk
    FROM ranked WHERE rnk <= 5
    """,
    tags=("text", "tfidf", "pipeline"),
)
def ts04_tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 TF-IDF terms per language (document-frequency IDF over the
    whole corpus, term frequency within the language).

    One tokenization pass, not two: tf(lang, term) counts docs-in-language
    containing the term, and df(term) is exactly Σ_lang tf — a window sum
    over the term partition of the (already tiny) tf table, so there is no
    second scan, no second explode, and no self-join at all (the naive
    join-back plan tokenized 100 TB twice; a join on a re-aliased copy of
    tf defeats exchange reuse, measured 2 split(text) in the executed
    plan). ``spread=True`` fans the explode across cores on the
    single-row-group local file. The corpus-size scalar reads the unspread
    table so it stays a parquet metadata count (no shuffle)."""
    d = table(spark, sf_dir, "documents", spread=True)
    tok = d.select(
        "lang", F.explode(F.array_distinct(F.split("text", " "))).alias("term")
    )
    n_docs = table(spark, sf_dir, "documents").count()  # parquet metadata count
    tf = tok.groupBy("lang", "term").agg(F.count("*").alias("tf"))
    wdf = W.partitionBy("term")
    scored = tf.withColumn("df", F.sum("tf").over(wdf)).select(
        "lang",
        "term",
        F.round(
            F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df").cast("double")), 6
        ).alias("tfidf"),
    )
    w = W.partitionBy("lang").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= 5)
    )


def minhash_bands_expr():
    """Per-ROW MinHash banding: (band_idx, band_hash) structs computed with
    higher-order array functions only — no explode/groupBy, so the same
    expression works in batch projections AND streaming selects (streaming
    aggregations are stateful; a per-row expression is free). Constants are
    shared with dd04, so band keys are comparable across both paths. The
    token-hash array binds ONCE per row via a transform lambda (the ts05
    single-evaluation pattern); each of the 16 permutation mins reads it
    without re-hashing the tokens."""
    h_sql = f"transform(array_distinct(split(text, ' ')), t -> {_spark_h31('t')})"

    def sig_term(i: int) -> str:
        return (
            f"array_min(transform(hh, x -> (CAST({PERM_A[i]} AS BIGINT) * x"
            f" + {PERM_B[i]}) % {MERSENNE31}))"
        )

    bands = ", ".join(
        "named_struct('band_idx', {j}, 'band_hash', md5(concat_ws('-', {terms})))".format(
            j=j,
            terms=", ".join(
                sig_term(j * ROWS_PER_BAND + r) for r in range(ROWS_PER_BAND)
            ),
        )
        for j in range(N_BANDS)
    )
    return F.expr(f"transform(array({h_sql}), hh -> array({bands}))[0]")


# --- dd08: incremental dedup against an existing band index -----------------
def _dd08_oracle() -> str:
    return f"""{_minhash_bands_cte()},
    index_keys AS (
        SELECT DISTINCT band_idx, band_hash FROM bands WHERE doc_id % 5 <> 0
    ),
    batch AS (SELECT * FROM bands WHERE doc_id % 5 = 0)
    SELECT CAST(b.doc_id AS BIGINT) AS doc_id,
           CAST(count(i.band_hash) AS INT) AS n_hit_bands,
           count(i.band_hash) = 0 AS accepted
    FROM batch b
    LEFT JOIN index_keys i
      ON b.band_idx = i.band_idx AND b.band_hash = i.band_hash
    GROUP BY b.doc_id
    ORDER BY doc_id
    """


@query(
    "dd08_incremental_dedup",
    oracle=_dd08_oracle(),
    tags=("dedup", "incremental", "lsh", "pipeline"),
)
def dd08_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup gating — the PRODUCTION dedup shape: a new
    batch (doc_id % 5 == 0 stands in for today's crawl) is admitted or
    rejected against the band index of the EXISTING corpus, not against
    itself. A batch doc is rejected when any of its MinHash-LSH bands
    already exists in the index; dd04's banding (same constants) makes
    the two operators a matched pair, and streaming/dedup.py is this
    gate's stateful streaming twin.

    Scale: the index is (band_idx, band_hash) keys — ~1e-4 of corpus
    bytes — and admission is ONE equi-join of the batch's 4 bands per
    doc against it (count-matches left join here so the verdict is
    explainable; a pure LEFT ANTI gives the accepted set directly). No
    batch-vs-batch or batch-vs-corpus pairwise work; raw text never
    shuffles; at 100 TB the index lives as a bucketed table keyed by
    band_hash so the join co-locates without a shuffle of the index."""
    sig, bands = _minhash_bands_df(spark, sf_dir)
    # Explicit width on the index-dedup exchange: AQE coalesces it to 1-2
    # tasks at small SF (harmless here, serial at 100 TB — the sf1 scale
    # probe showed the densest stage stuck at 2 tasks). A user repartition
    # with a fixed count is exempt from AQE coalescing, and its
    # hashpartitioning on the dedup keys satisfies the aggregate's
    # clustering requirement, so no second exchange appears.
    # ...but the fixed-count exchange costs ~0.4 s of shuffle setup that a
    # tiny input cannot amortize (r7 bench: dd08 0.73 -> 1.10 s at sf0.1).
    # Gate it on the corpus row count from the parquet footer (zero jobs):
    # small corpora let AQE coalesce freely; at probe/production scale —
    # or when the footer is unreadable (directory of parts) — keep the
    # explicit width.
    from xarray_sql_spark.queries.advanced_ops import _parquet_footer_rows

    n_docs = _parquet_footer_rows(sf_dir, "documents")
    index_keys = bands.filter(F.col("doc_id") % 5 != 0).select(
        "band_idx", "band_hash"
    )
    if n_docs is None or n_docs >= 20_000:
        n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
        index_keys = index_keys.repartition(n_part, "band_idx", "band_hash")
    index_keys = index_keys.dropDuplicates().withColumn("hit", F.lit(1))
    batch = bands.filter(F.col("doc_id") % 5 == 0)
    joined = batch.join(index_keys, ["band_idx", "band_hash"], "left")
    return (
        joined.groupBy("doc_id")
        .agg(F.count("hit").cast("int").alias("n_hit_bands"))
        .withColumn("accepted", F.col("n_hit_bands") == 0)
        .orderBy("doc_id")
    )


# --- dd11: cross-source duplication matrix ----------------------------------
def _dup_edges_cte() -> str:
    """Shared oracle WITH-fragment ending in ``dup(doc_a, doc_b)``: the
    est-jaccard-filtered MinHash near-dup pair list (dd04's output shape).
    Used by dd11's provenance matrix and gr01's dup-graph centrality so
    the edge definition exists in exactly one place per engine."""
    eq_terms = " + ".join(
        f"CASE WHEN sa.s{i} = sb.s{i} THEN 1 ELSE 0 END" for i in range(N_PERMS)
    )
    return f"""{_minhash_bands_cte()},
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
         AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    dup AS (
        SELECT p.doc_a, p.doc_b
        FROM pairs p
        JOIN sig sa ON sa.doc_id = p.doc_a
        JOIN sig sb ON sb.doc_id = p.doc_b
        WHERE ({eq_terms}) / {N_PERMS}.0 >= {EST_JACCARD_MIN}
    )"""


def _dd11_oracle() -> str:
    return f"""{_dup_edges_cte()}
    SELECT least(da.source, db.source) AS source_a,
           greatest(da.source, db.source) AS source_b,
           CAST(count(*) AS BIGINT) AS n_dup_pairs
    FROM dup
    JOIN documents da ON da.doc_id = dup.doc_a
    JOIN documents db ON db.doc_id = dup.doc_b
    GROUP BY 1, 2 ORDER BY source_a, source_b
    """


@query(
    "dd11_cross_source_dup_matrix",
    oracle=_dd11_oracle(),
    tags=("dedup", "minhash", "provenance", "pipeline"),
    # Rides dd04's pair output, which is quadratic on the ~40-word
    # synthetic vocabulary at sf0.1 (same artifact that benches dd04/dd05
    # out); the rollup itself is linear in true pairs on a real corpus.
    bench=False,
)
def dd11_cross_source_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication matrix: which corpus sources copy from
    which — dd04's MinHash near-dup pairs rolled up to unordered
    (source, source) cells. The standard provenance diagnostic before
    choosing per-source mixing weights (a source that is 90% dups of
    another contributes no new tokens). least/greatest canonicalizes the
    pair so the matrix is triangular on both engines.

    Scale: rides dd04's bucketed candidate join (never all-pairs); the
    two provenance joins shuffle only (doc_id, source) pairs — a tiny
    projection of the corpus, not text; the final rollup has at most
    n_sources^2 groups."""
    pairs = dd04_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    d = table(spark, sf_dir, "documents").select("doc_id", "source")
    da, db = d.alias("da"), d.alias("db")
    return (
        pairs.join(da, F.col("da.doc_id") == F.col("doc_a"))
        .join(db, F.col("db.doc_id") == F.col("doc_b"))
        .groupBy(
            F.least("da.source", "db.source").alias("source_a"),
            F.greatest("da.source", "db.source").alias("source_b"),
        )
        .agg(F.count("*").alias("n_dup_pairs"))
        .orderBy("source_a", "source_b")
    )


# --- ss13: ANN recall evaluation ------------------------------------------------
RECALL_NQ = 10
RECALL_K = 3

# --- multi-probe LSH (ss15 + ss13's lift measurement) ----------------------------
# Flip the 2 hyperplanes whose |projection| is smallest (the query sits
# closest to those decision boundaries, so the flipped buckets are the
# likeliest homes of missed neighbors — Lv et al., VLDB 2007): probe set =
# {base, flip p1, flip p2, flip both} = 4 buckets per query.
MULTIPROBE_FLIPS = 2


def _planes_literal_spark() -> str:
    return "array(" + ", ".join(
        "array(" + ", ".join(repr(x) for x in PLANES[p]) + ")"
        for p in range(N_PLANES)
    ) + ")"


def _planes_literal_duck_2d() -> str:
    rows = ", ".join(
        "[" + ", ".join(repr(x) for x in PLANES[p]) + "]"
        for p in range(N_PLANES)
    )
    return f"[{rows}]::DOUBLE[][]"


def _probe_cte_spark(nq: int = RECALL_NQ) -> str:
    """CTEs qp/probes (Spark SQL) over the bucketed corpus ``b``: rank
    planes by ROUNDED |projection| (the 1e-6 grid where the Spark fold
    equals DuckDB's list_inner_product; plane index breaks ties — the
    same struct-sort rule on both engines), then emit the 4-bucket probe
    set per query."""
    dot = (
        f"aggregate(zip_with(v, {_planes_literal_spark()}[p], (x, y) -> x * y), "
        "CAST(0.0 AS DOUBLE), (a, x) -> a + x)"
    )
    return f"""qp AS (
            SELECT vec_id, v, norm, bucket,
                   array_sort(transform(sequence(0, {N_PLANES - 1}),
                       p -> struct(round(abs({dot}), 6) AS a, p AS p))) AS rk
            FROM b WHERE vec_id < {nq}
        ),
        probes AS (
            SELECT vec_id, v, norm, pbucket FROM qp
            LATERAL VIEW explode(array(
                bucket,
                bucket ^ shiftleft(1, rk[0].p),
                bucket ^ shiftleft(1, rk[1].p),
                bucket ^ shiftleft(1, rk[0].p) ^ shiftleft(1, rk[1].p)
            )) pb AS pbucket
        )"""


def _probe_cte_duck(nq: int = RECALL_NQ) -> str:
    """The matching DuckDB CTEs over the oracle's ``bucketed`` corpus."""
    dot = (
        f"list_inner_product(v, ({_planes_literal_duck_2d()})"
        "[CAST(p + 1 AS INT)])"
    )
    return f"""qp AS (
        SELECT vec_id, v, bucket,
               list_sort(list_transform(range(0, {N_PLANES}),
                   p -> {{'a': round(abs({dot}), 6), 'p': p}})) AS rk
        FROM bucketed WHERE vec_id < {nq}
    ),
    probes AS (
        SELECT vec_id, v, u.pbucket
        FROM qp, LATERAL (SELECT unnest([
            CAST(bucket AS BIGINT),
            xor(CAST(bucket AS BIGINT),
                1::BIGINT << struct_extract(rk[1], 'p')),
            xor(CAST(bucket AS BIGINT),
                1::BIGINT << struct_extract(rk[2], 'p')),
            xor(xor(CAST(bucket AS BIGINT),
                    1::BIGINT << struct_extract(rk[1], 'p')),
                1::BIGINT << struct_extract(rk[2], 'p'))
        ]) AS pbucket) u
    )"""


def _multiprobe_oracle() -> str:
    bucket_terms = _bucket_terms_duck()
    return f"""
    WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    bucketed AS (SELECT vec_id, v, {bucket_terms} AS bucket FROM e),
    {_probe_cte_duck()},
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               round(list_cosine_similarity(q.v, c.v), 6) AS cos
        FROM probes q JOIN bucketed c
          ON q.pbucket = c.bucket AND q.vec_id <> c.vec_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id, cos,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, neighbor_id) AS rank
        FROM scored
    )
    SELECT CAST(query_id AS BIGINT) AS query_id,
           CAST(neighbor_id AS BIGINT) AS neighbor_id,
           CAST(rank AS INT) AS rank,
           cos AS cosine
    FROM ranked WHERE rank <= {RECALL_K}
    """


@query(
    "ss15_multiprobe_ann",
    oracle=_multiprobe_oracle(),
    tags=("similarity", "lsh", "multiprobe", "pipeline"),
)
def ss15_multiprobe_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH ANN (Lv et al., VLDB 2007) — ss03's recall lever:
    besides its own bucket, each query probes the buckets reached by
    flipping the 2 (MULTIPROBE_FLIPS) hyperplanes it sits closest to
    (smallest rounded |projection|; plane-index tie-break), individually
    and jointly — 4 probe buckets total. Candidates remain a bucket
    equi-join; ranking is ss03's (rounded cosine DESC, neighbor_id)
    rule. ss13 measures the realized recall lift of exactly this probe
    set against the single-probe arm.

    Scale: this is THE production recall knob — 4x the candidate work
    (still ~4/256 of the corpus per query, still an equi-join, never a
    cartesian) instead of rebuilding the index with more tables. The
    probe-set computation is a per-query projection; the corpus is
    scanned/bucketed once, identically to ss03."""
    table(spark, sf_dir, "embeddings", spread=True).createOrReplaceTempView(
        "ss15_embeddings"
    )
    return spark.sql(f"""
        WITH b AS ({_bucketed_cte_spark("ss15_embeddings")}
        ),
        {_probe_cte_spark()},
        scored AS (
            SELECT /*+ BROADCAST(q) */
                   q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   round({COS_FOLD_SQL}, 6) AS cos
            FROM b c JOIN probes q
              ON q.pbucket = c.bucket AND q.vec_id <> c.vec_id
        )
        SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank,
               cos AS cosine
        FROM (SELECT query_id, neighbor_id, cos,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY cos DESC, neighbor_id) AS rank
              FROM scored)
        WHERE rank <= {RECALL_K}
    """)


def _ann_recall_oracle() -> str:
    bucket_terms = _bucket_terms_duck()

    def arm(from_clause: str) -> str:
        return f"""
        SELECT query_id, neighbor_id FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY round(list_cosine_similarity(q.v, c.v), 6)
                                    DESC,
                                c.vec_id
                   ) AS rk
            FROM {from_clause}
        ) WHERE rk <= {RECALL_K}"""

    return f"""
    WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    bucketed AS (SELECT vec_id, v, {bucket_terms} AS bucket FROM e),
    q AS (SELECT * FROM bucketed WHERE vec_id < {RECALL_NQ}),
    {_probe_cte_duck()},
    exact AS ({arm("bucketed c JOIN q ON c.vec_id <> q.vec_id")}
    ),
    single AS ({arm(
        "bucketed c JOIN q ON q.bucket = c.bucket AND c.vec_id <> q.vec_id"
    )}
    ),
    multi AS ({arm(
        "bucketed c JOIN probes q"
        " ON q.pbucket = c.bucket AND c.vec_id <> q.vec_id"
    )}
    )
    SELECT CAST(x.query_id AS BIGINT) AS query_id,
           CAST(count(*) AS BIGINT) AS n_exact,
           CAST(sum(CASE WHEN s.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_hit_single,
           round(sum(CASE WHEN s.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE), 6) AS recall_single,
           CAST(sum(CASE WHEN m.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_hit_multi,
           round(sum(CASE WHEN m.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE), 6) AS recall_multi
    FROM exact x
    LEFT JOIN single s USING (query_id, neighbor_id)
    LEFT JOIN multi m USING (query_id, neighbor_id)
    GROUP BY x.query_id
    ORDER BY x.query_id
    """


@query(
    "ss13_ann_recall",
    oracle=_ann_recall_oracle(),
    tags=("similarity", "lsh", "evaluation", "diagnostics"),
    # evaluation diagnostic: the exact arm is deliberately brute force
    # (dd09's rule for sketch-accuracy checks) — excluded from bench
    bench=False,
)
def ss13_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-engine ANN recall@k — dd09's sketch-accuracy contract applied
    to retrieval: for each query, the LSH arm's top-{RECALL_K} (ss03's
    bucket candidates and ranking rule) is scored against the exact
    brute-force top-{RECALL_K} ground truth, per query. This is how a
    100-TB pipeline tunes its bucket count / multi-probe width: recall
    is measured ON A SAMPLE inside the engine, not eyeballed — the exact
    arm runs on the {RECALL_NQ}-query sample only, never the full
    corpus. Both arms rank on the identical (cosine DESC, neighbor_id)
    rule, so hits are well-defined cross-engine; recall rounds on the
    1e-6 grid. Round 10 adds the MULTI-PROBE arm (ss15's 4-bucket probe
    set), so the table now shows the recall LIFT the probe width buys —
    the exact tuning readout a deployment uses before paying 4x
    candidate work (pinned monotone: multi-probe candidates are a
    superset of the single bucket's, so per-query recall_multi >=
    recall_single by construction).

    Scale: the exact arm is {RECALL_NQ} broadcast queries against one
    corpus scan (ss01's intentional shape); the approx arms are the
    ss03/ss15 bucket equi-joins; the comparison joins k·{RECALL_NQ}-row
    sets."""
    table(spark, sf_dir, "embeddings", spread=True).createOrReplaceTempView(
        "ss13_embeddings"
    )
    # rank on the ROUNDED cosine: the fold and list_cosine_similarity agree
    # only at the 1e-6 grid, so a top-k MEMBERSHIP decision on raw doubles
    # could flip at the rank boundary between engines (review finding)
    cos = f"round({COS_FOLD_SQL}, 6)"

    def _arm(from_clause: str) -> str:
        # the three arms differ ONLY in the candidate join
        return f"""
            SELECT query_id, neighbor_id FROM (
                SELECT /*+ BROADCAST(q) */
                       q.vec_id AS query_id, c.vec_id AS neighbor_id,
                       row_number() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY {cos} DESC, c.vec_id
                       ) AS rk
                FROM {from_clause}
            ) WHERE rk <= {RECALL_K}"""

    def hit(alias: str) -> str:
        return f"SUM(IF({alias}.neighbor_id IS NOT NULL, 1, 0))"

    return spark.sql(f"""
        WITH b AS ({_bucketed_cte_spark("ss13_embeddings")}
        ),
        q AS (SELECT * FROM b WHERE vec_id < {RECALL_NQ}),
        {_probe_cte_spark()},
        exact AS ({_arm("b c JOIN q ON c.vec_id <> q.vec_id")}
        ),
        single AS ({_arm(
            "b c JOIN q ON q.bucket = c.bucket AND c.vec_id <> q.vec_id"
        )}
        ),
        multi AS ({_arm(
            "b c JOIN probes q"
            " ON q.pbucket = c.bucket AND c.vec_id <> q.vec_id"
        )}
        )
        SELECT x.query_id,
               COUNT(*) AS n_exact,
               CAST({hit("s")} AS BIGINT) AS n_hit_single,
               round({hit("s")} / CAST(COUNT(*) AS DOUBLE), 6)
                   AS recall_single,
               CAST({hit("m")} AS BIGINT) AS n_hit_multi,
               round({hit("m")} / CAST(COUNT(*) AS DOUBLE), 6)
                   AS recall_multi
        FROM exact x
        LEFT JOIN single s
          ON s.query_id = x.query_id AND s.neighbor_id = x.neighbor_id
        LEFT JOIN multi m
          ON m.query_id = x.query_id AND m.neighbor_id = x.neighbor_id
        GROUP BY x.query_id
        ORDER BY x.query_id
    """)


# --- dd12: LSH banding parameter sweep -------------------------------------------
# The three band layouts 16 permutations admit: collision probability for a
# pair with true signature agreement s is 1 - (1 - s^rows)^bands — the
# S-curve every LSH deployment tunes before committing a layout.
BAND_CONFIGS = ((2, 8), (4, 4), (8, 2))  # (bands, rows_per_band)


def _band_sweep_oracle() -> str:
    sig_cte = _minhash_sig_cte()
    eq_terms = " + ".join(
        f"CASE WHEN sa.s{i} = sb.s{i} THEN 1 ELSE 0 END" for i in range(N_PERMS)
    )
    arms = []
    for bands, rows in BAND_CONFIGS:
        band_rows = _band_rows_sql(bands, rows)
        arms.append(f"""
    SELECT {bands} AS n_bands, {rows} AS rows_per_band,
           CAST(count(*) AS BIGINT) AS n_candidate_pairs,
           CAST(count(DISTINCT p.doc_a) + count(DISTINCT p.doc_b)
                AS BIGINT) AS n_doc_slots,
           round(avg(({eq_terms}) / {N_PERMS}.0), 6) AS mean_est_jaccard
    FROM (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM (SELECT doc_id, band.band_idx, band.band_hash
              FROM sig, LATERAL (SELECT * FROM (VALUES {band_rows})
                                 AS v(band_idx, band_hash)) AS band) a
        JOIN (SELECT doc_id, band.band_idx, band.band_hash
              FROM sig, LATERAL (SELECT * FROM (VALUES {band_rows})
                                 AS v(band_idx, band_hash)) AS band) b
          ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
         AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ) p
    JOIN sig sa ON sa.doc_id = p.doc_a
    JOIN sig sb ON sb.doc_id = p.doc_b""")
    return f"""{sig_cte}
    {" UNION ALL ".join(arms)}
    ORDER BY n_bands
    """


@query(
    "dd12_lsh_band_sweep",
    oracle=_band_sweep_oracle(),
    tags=("dedup", "lsh", "tuning", "diagnostics"),
    # rides the dd04 signature table on the tiny-vocabulary corpus — the
    # candidate sets are artifact-quadratic like dd04 (bench=False there
    # for the same reason); on a real corpus each arm is linear in true
    # near-dups
    bench=False,
)
def dd12_lsh_band_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding parameter sweep — the tuning table computed BEFORE
    committing a band layout (ss13's measure-inside-the-engine contract
    applied to the candidate-generation stage): for each layout 16
    permutations admit (2x8 conservative, 4x4 balanced, 8x2 aggressive),
    the candidate pair count, the number of matched doc slots, and the
    mean estimated jaccard of the candidates. More bands with fewer rows
    shifts the S-curve left: more candidates, lower mean quality — the
    numbers quantify exactly that tradeoff on YOUR corpus.

    Scale: one signature table (16 ints/doc) feeds all three arms; each
    arm is a bucketed equi-join on its banded hashes (dd04's shape) and
    a rollup — no pairwise stage outside the buckets. Arms union to a
    3-row result."""
    sig, _ = _minhash_bands_df(spark, sf_dir)
    sig = sig.localCheckpoint(eager=True)  # consumed by 3 arms x 3 refs
    eq = sum(
        F.when(F.col(f"sa.s{i}") == F.col(f"sb.s{i}"), 1).otherwise(0)
        for i in range(N_PERMS)
    ) / float(N_PERMS)
    arms = []
    for bands, rows in BAND_CONFIGS:
        banded = sig.select(
            "doc_id", F.explode(_band_structs(bands, rows)).alias("band")
        ).select("doc_id", "band.band_idx", "band.band_hash")
        a, b = banded.alias("a"), banded.alias("b")
        pairs = (
            a.join(
                b,
                (F.col("a.band_idx") == F.col("b.band_idx"))
                & (F.col("a.band_hash") == F.col("b.band_hash"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
            )
            .distinct()
        )
        arm = (
            pairs.join(sig.alias("sa"), F.col("sa.doc_id") == F.col("doc_a"))
            .join(sig.alias("sb"), F.col("sb.doc_id") == F.col("doc_b"))
            .agg(
                F.count("*").cast("bigint").alias("n_candidate_pairs"),
                (
                    F.countDistinct("doc_a") + F.countDistinct("doc_b")
                ).cast("bigint").alias("n_doc_slots"),
                F.round(F.avg(eq), 6).alias("mean_est_jaccard"),
            )
            .select(
                F.lit(bands).cast("int").alias("n_bands"),
                F.lit(rows).cast("int").alias("rows_per_band"),
                "n_candidate_pairs",
                "n_doc_slots",
                "mean_est_jaccard",
            )
        )
        arms.append(arm)
    out = arms[0]
    for arm in arms[1:]:
        out = out.unionByName(arm)
    return out.orderBy("n_bands")
