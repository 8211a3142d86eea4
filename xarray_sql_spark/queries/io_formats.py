"""Text-format ingest parity: JSONL and CSV roundtrips under the hash gate.

Raw web-crawl corpora land as JSONL (one document object per line) or CSV
long before they become parquet; a training-data engine must ingest both
losslessly. Each query here writes the documents table to the text format
with Spark's native writer, reads it back through the native reader with an
EXPLICIT schema (schema inference is a convenience trap at 100 TB — it
costs an extra full scan and can flip types between runs), and aggregates
the readback — hash-equality with the DuckDB oracle over the original
parquet proves the write -> read cycle lost nothing.

Only exactly-representable column types ride the text roundtrip here
(int64, string): float-through-text is a separate contract (shortest
round-trip repr) deliberately out of scope for the hash gate.

Scale: both writers/readers are JVM-native and splittable (CSV and JSONL
shard by line; the readback scan parallelizes per 128 MB split); the
fixture writes one shuffle-free pass and aggregates with map-side combine.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from xarray_sql_spark.registry import query
from xarray_sql_spark.session import table

# Per-process fixture root: two concurrent runs against the same sf_dir
# (parallel pytest sessions, bench + driver) must not overwrite each
# other's fixture dirs mid-read (r7 ADVICE). atexit-removed so repeated
# runs on a long-lived host don't accumulate orphans (r8 ADVICE); stale
# trees from crashed siblings are swept here too — a live PID guard keeps
# concurrent runs safe.
_IO_DIR = f"/tmp/xss_io_formats_{os.getpid()}"


def _cleanup_io_dirs() -> None:
    import glob
    import shutil

    shutil.rmtree(_IO_DIR, ignore_errors=True)
    for stale in glob.glob("/tmp/xss_io_formats_*"):
        try:
            pid = int(stale.rsplit("_", 1)[1])
        except ValueError:
            continue  # unparseable suffix: not ours, leave it
        try:
            os.kill(pid, 0)  # probe liveness without signalling
        except ProcessLookupError:
            shutil.rmtree(stale, ignore_errors=True)  # dead -> orphan
        except PermissionError:
            pass  # alive under another user: keep


import atexit

atexit.register(_cleanup_io_dirs)
_cleanup_io_dirs()  # sweep orphans from crashed prior runs at import

_DOC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)

_IO_ORACLE = """
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           CAST(sum(length(text)) AS BIGINT) AS sum_text_len,
           CAST(min(doc_id) AS BIGINT) AS min_doc,
           CAST(max(doc_id) AS BIGINT) AS max_doc
    FROM documents GROUP BY lang ORDER BY lang
"""


def _roundtrip(
    spark: SparkSession, sf_dir: str, fmt: str, tag: str = "", **writer_opts
) -> DataFrame:
    d = table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    path = os.path.join(
        _IO_DIR,
        f"{fmt}{tag}-{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}",
    )
    d.write.mode("overwrite").format(fmt).options(**writer_opts).save(path)
    back = (
        spark.read.format(fmt)
        .options(**writer_opts)
        .schema(_DOC_SCHEMA)
        .load(path)
    )
    return _lang_rollup(back)


def _lang_rollup(back: DataFrame) -> DataFrame:
    """The readback rollup matching _IO_ORACLE — one definition for every
    roundtrip variant, so a contract change cannot drift between them."""
    return (
        back.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("source").cast("bigint").alias("n_sources"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
            F.sum(F.length("text")).cast("bigint").alias("sum_text_len"),
            F.min("doc_id").cast("bigint").alias("min_doc"),
            F.max("doc_id").cast("bigint").alias("max_doc"),
        )
        .orderBy("lang")
    )


@query(
    "io01_jsonl_roundtrip",
    oracle=_IO_ORACLE,
    tags=("io", "jsonl", "ingest", "roundtrip"),
    bench=False,  # I/O fixture: proves the cycle, not a throughput shape
)
def io01_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL ingest parity: documents -> line-delimited JSON -> explicit-
    schema readback -> per-lang rollup. Hash-equality with the oracle over
    the ORIGINAL parquet proves the JSON writer/reader cycle is lossless
    for the int64/string document model (escaping, unicode, nulls)."""
    return _roundtrip(spark, sf_dir, "json")


@query(
    "io02_csv_roundtrip",
    oracle=_IO_ORACLE,
    tags=("io", "csv", "ingest", "roundtrip"),
    bench=False,  # I/O fixture: proves the cycle, not a throughput shape
)
def io02_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV ingest parity: same cycle through the CSV writer/reader with
    header + full quoting (document text contains the delimiter-adjacent
    space soup that breaks naive splitting; Spark's quoted CSV is the
    splittable-by-line contract).

    Format boundary (verified empirically, pinned in
    tests/test_pipeline_semantics.py): the univocity parser compares
    unquoted field CONTENT against ``nullValue``, so a data value
    literally equal to the sentinel reads back NULL even when quoted —
    like the no-embedded-newlines rule, this is inherent to CSV, not to
    this reader; arbitrary-content corpora belong in JSONL (io01)."""
    return _roundtrip(
        spark, sf_dir, "csv",
        header="true", quoteAll="true", escape='"', nullValue="\\\\N",
    )


@query(
    "io03_corrupt_record_quarantine",
    oracle="""
    SELECT lang, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM documents WHERE doc_id % 7 <> 0 GROUP BY lang
    UNION ALL
    SELECT '__corrupt__' AS lang,
           CAST(count(*) AS BIGINT) AS n,
           CAST(NULL AS BIGINT) AS sum_chars
    FROM documents WHERE doc_id % 7 = 0
    ORDER BY lang
    """,
    tags=("io", "jsonl", "ingest", "bad-records"),
    bench=False,  # I/O fixture: proves the quarantine path, not throughput
)
def io03_corrupt_record_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERMISSIVE ingest with corrupt-record quarantine — the bad-line
    contract every raw-crawl ingest needs: a JSONL feed where every 7th
    line is truncated mid-object must parse the good lines, land the bad
    ones intact in ``_corrupt_record`` (nulls elsewhere), and NEVER fail
    the job (FAILFAST is the opposite contract; DROPMALFORMED silently
    lies about corpus size). The oracle regenerates good-per-lang and
    corrupt counts from the planting rule, so a hash match proves the
    quarantine routed every line to exactly one side.

    Scale: the feed writes and reads line-split (splittable) JSONL; the
    corrupt branch is per-line state in the JSON parser, no extra pass."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    line = F.to_json(F.struct("doc_id", "text", "lang", "source", "n_chars"))
    feed = d.select(
        F.when(F.col("doc_id") % 7 == 0, F.substring(line, 1, 20))
        .otherwise(line)
        .alias("value")
    )
    path = os.path.join(_IO_DIR, f"corrupt-{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}")
    feed.write.mode("overwrite").text(path)

    schema = StructType(
        _DOC_SCHEMA.fields + [StructField("_corrupt_record", StringType())]
    )
    back = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    return (
        back.select(
            F.when(F.col("_corrupt_record").isNotNull(), "__corrupt__")
            .otherwise(F.col("lang"))
            .alias("lang"),
            "n_chars",
        )
        .groupBy("lang")
        .agg(
            F.count("*").alias("n"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        )
        .orderBy("lang")
    )


@query(
    "io04_schema_evolution",
    oracle="""
    WITH old_half AS (
        SELECT doc_id, lang, n_chars, CAST(NULL AS BIGINT) AS quality
        FROM documents WHERE doc_id % 2 = 0
    ),
    new_half AS (
        SELECT doc_id, lang, n_chars, n_chars % 100 AS quality
        FROM documents WHERE doc_id % 2 = 1
    ),
    unioned AS (SELECT * FROM old_half UNION ALL SELECT * FROM new_half)
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(quality) AS BIGINT) AS n_with_quality,
           CAST(sum(quality) AS BIGINT) AS sum_quality,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM unioned GROUP BY lang ORDER BY lang
    """,
    tags=("io", "parquet", "schema-evolution"),
    bench=False,  # I/O fixture: proves the evolution contract, not throughput
)
def io04_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution-tolerant parquet scan: half the corpus is written
    with the ORIGINAL schema, half with an added ``quality`` column (the
    unavoidable lakehouse situation once a pipeline version adds a
    field); a ``mergeSchema`` read must union the footers, null-fill the
    missing column in old files, and aggregate correctly. The oracle
    regenerates the same union by arithmetic.

    Scale note: ``mergeSchema`` reads EVERY file footer at planning time
    — the per-query cost that makes real deployments pin evolved schemas
    in a table catalog instead; the read itself stays splittable and
    column-pruned either way. Explicitly requesting it here documents
    the contract AND the cost."""
    d = table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    root = os.path.join(
        _IO_DIR, f"evolve-{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}"
    )
    d.filter(F.col("doc_id") % 2 == 0).write.mode("overwrite").parquet(
        os.path.join(root, "v1")
    )
    d.filter(F.col("doc_id") % 2 == 1).withColumn(
        "quality", (F.col("n_chars") % 100).cast("bigint")
    ).write.mode("overwrite").parquet(os.path.join(root, "v2"))
    back = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(root, "v1"), os.path.join(root, "v2")
    )
    return (
        back.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.count("quality").alias("n_with_quality"),
            F.sum("quality").cast("bigint").alias("sum_quality"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        )
        .orderBy("lang")
    )


@query(
    "io05_orc_roundtrip",
    oracle=_IO_ORACLE,
    tags=("io", "orc", "ingest", "roundtrip"),
    bench=False,  # I/O fixture: proves the cycle, not a throughput shape
)
def io05_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC ingest parity: the second columnar lake format Spark ships a
    native vectorized reader/writer for (Hive/Trino deployments hold
    petabytes of it). Same cycle as io01/io02 — write the documents
    table as ORC, explicit-schema readback, per-lang rollup — hashed
    against the oracle over the ORIGINAL parquet, so a match proves the
    ORC writer/reader cycle is lossless for the int64/string model.

    Scale: ORC stripes are splittable like parquet row groups, and the
    reader does predicate pushdown + column pruning through the same
    DataSource V1 path; the cycle is one shuffle-free write pass plus a
    map-side-combinable aggregate."""
    return _roundtrip(spark, sf_dir, "orc")


@query(
    "io06_partitioned_prune",
    oracle="""
    SELECT lang, source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           CAST(min(doc_id) AS BIGINT) AS min_doc,
           CAST(max(doc_id) AS BIGINT) AS max_doc
    FROM documents WHERE lang IN ('en', 'zh')
    GROUP BY lang, source ORDER BY lang, source
    """,
    tags=("io", "parquet", "hive-partitioning", "pruning"),
    bench=False,  # I/O fixture: proves the layout contract, not throughput
)
def io06_partitioned_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned lake layout: the documents table is written
    ``partitionBy("lang")`` (the directory-per-value layout every curated
    corpus uses for its coarsest filter column), then read back with a
    partition-column filter. Catalyst turns the filter into
    ``PartitionFilters`` at PLANNING time — non-matching directories are
    never listed into the scan, the 100-TB version of "don't read 3 of 5
    language shards" (pinned by a plan test on this fixture). The oracle
    applies the same filter to the flat table, so the hash also proves
    partition values round-trip through directory names (URL-escaped
    keys included).

    Scale: pruning cost is proportional to the partition COUNT (a
    metadata listing), not data size; low-cardinality columns only —
    partitionBy on doc_id would create one directory per row."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source", "n_chars", "lang"
    )
    root = os.path.join(
        _IO_DIR, f"bylang-{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}"
    )
    d.write.mode("overwrite").partitionBy("lang").parquet(root)
    back = spark.read.parquet(root).filter(F.col("lang").isin("en", "zh"))
    return (
        back.groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
            F.min("doc_id").cast("bigint").alias("min_doc"),
            F.max("doc_id").cast("bigint").alias("max_doc"),
        )
        .orderBy("lang", "source")
    )


@query(
    "io07_xml_roundtrip",
    oracle=_IO_ORACLE,
    tags=("io", "xml", "ingest", "roundtrip"),
    bench=False,  # I/O fixture: proves the cycle, not a throughput shape
)
def io07_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML ingest parity through Spark 4's BUILT-IN XML source (the
    spark-xml donation): enterprise feeds (sitemaps, patent corpora,
    PubMed, legacy B2B) still land as XML; the same cycle as io01/io02 —
    write the documents table row-per-``<doc>`` element, explicit-schema
    readback, per-lang rollup — hashed against the oracle over the
    ORIGINAL parquet proves entity escaping (&amp;/&lt;) and unicode
    round-trip losslessly for the int64/string model.

    Scale: the XML writer emits one file per task like the other text
    writers; the reader splits between row tags, so readback
    parallelizes like JSONL. Control characters are the format boundary
    (XML 1.0 cannot encode them at all) — arbitrary-binary corpora
    belong in JSONL (io01) or parquet."""
    return _roundtrip(spark, sf_dir, "xml", rowTag="doc")


@query(
    "io09_gzip_jsonl_roundtrip",
    oracle=_IO_ORACLE,
    tags=("io", "jsonl", "gzip", "compression", "roundtrip"),
    bench=False,  # I/O fixture: proves the cycle, not a throughput shape
)
def io09_gzip_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gzip-compressed JSONL roundtrip — how raw crawls actually arrive
    (WARC-adjacent .json.gz drops): io01's cycle with
    ``compression=gzip`` on the writer, transparent codec decode on the
    read. The hash gate proves losslessness through the codec.

    THE scale lesson this query documents: gzip is NOT SPLITTABLE — one
    .gz file is one task no matter how big, so a single 100 GB drop
    serializes its scan. The mitigation is in the layout, not the
    reader: many medium files (this writer emits one per task, the
    right shape already) or a splittable codec (bzip2, or zstd with a
    seekable frame index). Never one giant gzip."""
    return _roundtrip(spark, sf_dir, "json", tag="gz", compression="gzip")


@query(
    "io10_multiline_json_roundtrip",
    oracle=_IO_ORACLE,
    tags=("io", "json", "multiline", "roundtrip"),
    bench=False,  # I/O fixture: proves the cycle, not a throughput shape
)
def io10_multiline_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pretty-printed / array-form JSON roundtrip: API exports and data
    dumps often arrive as ONE JSON ARRAY per file, not line-delimited —
    readable only with ``multiLine=true`` (the default line reader sees
    a '[' line and quarantines everything). The fixture writes each
    partition's rows as a JSON array file from the executors, reads the
    directory back multiLine with the explicit schema, and proves the
    cycle under the hash gate.

    THE scale lesson (gzip's sibling): a multiLine JSON file is NOT
    SPLITTABLE — the parser must see the whole document, so one task
    per file no matter the size. The mitigation is again layout (many
    files — this fixture's shape) or converting to JSONL at the landing
    zone; never one giant array file."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    path = os.path.join(
        _IO_DIR, f"mljson-{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}"
    )
    import shutil

    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)

    def _dump(batches):
        import json as _json
        import uuid

        import pandas as pd

        n = 0
        for pdf in batches:
            rows = pdf.to_dict(orient="records")
            # uuid per file: pid+index is NOT unique across tasks (reused
            # Python workers restart the index and can clobber another
            # partition's file — review finding)
            fname = os.path.join(path, f"chunk-{uuid.uuid4().hex}.json")
            with open(fname, "w", encoding="utf-8") as f:
                _json.dump(rows, f, ensure_ascii=False, indent=2)
            n += len(rows)
        yield pd.DataFrame({"n": [n]})

    d.mapInPandas(_dump, "n long").collect()  # eager: the read lists files
    back = (
        spark.read.option("multiLine", "true").schema(_DOC_SCHEMA).json(path)
    )
    return _lang_rollup(back)


@query(
    "io08_binaryfile_ingest",
    oracle="""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_files,
           CAST(sum(octet_length(encode(text))) AS BIGINT) AS sum_bytes,
           CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_distinct_content,
           CAST(sum(('0x' || substring(md5(text), 1, 15))::BIGINT % 1000003)
                AS BIGINT) AS sum_h60
    FROM documents GROUP BY lang ORDER BY lang
    """,
    tags=("io", "binary", "ingest", "multimodal"),
    bench=False,  # I/O fixture: proves the landing path, not throughput
)
def io08_binaryfile_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Loose-binary-file landing: the raw multimodal ingestion shape —
    blobs arrive as ONE FILE PER OBJECT on the object store (crawler
    output, image dumps), are read through Spark's ``binaryFile`` source
    (path, length, content), keyed by filename, and joined back to the
    metadata table. The fixture writes each document's UTF-8 bytes as
    ``doc_<id>.bin`` from the EXECUTORS (mapInPandas partition-local
    writes — the driver never touches a payload), reads the directory
    back, and verifies content integrity per language via md5-derived
    60-bit residues; the oracle recomputes byte lengths and digests from
    the original parquet, so a hash match proves every blob landed and
    read back byte-identical.

    Scale: ``binaryFile`` packs many small files per input partition
    (spark.sql.files.maxPartitionBytes) and never splits one file — the
    natural blob granularity; the metadata join shuffles only
    (doc_id, lang) projections while content stays where it was read.
    Listing cost is proportional to file COUNT — at 100 TB you shard
    blobs into subdirectories and register them in a catalog, but the
    read path is this one."""
    d = table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    root = os.path.join(
        _IO_DIR, f"blobs-{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}"
    )
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root, exist_ok=True)

    def _land(batches):
        import pandas as pd

        n = 0
        for pdf in batches:
            for did, txt in zip(pdf["doc_id"], pdf["text"]):
                with open(os.path.join(root, f"doc_{did}.bin"), "wb") as f:
                    f.write(txt.encode("utf-8"))
            n += len(pdf)
        yield pd.DataFrame({"n": [n]})

    # Eager landing job: the binaryFile listing below must see the files.
    d.select("doc_id", "text").mapInPandas(_land, "n long").collect()

    blobs = spark.read.format("binaryFile").load(root).select(
        F.regexp_extract(F.col("path"), r"doc_(\d+)\.bin$", 1)
        .cast("long")
        .alias("doc_id"),
        F.length("content").alias("nbytes"),
        F.md5("content").alias("h"),
    )
    joined = blobs.join(d.select("doc_id", "lang"), "doc_id")
    return (
        joined.groupBy("lang")
        .agg(
            F.count("*").alias("n_files"),
            F.sum("nbytes").cast("bigint").alias("sum_bytes"),
            F.countDistinct("h").cast("bigint").alias("n_distinct_content"),
            F.sum(
                F.conv(F.substring("h", 1, 15), 16, 10).cast("bigint")
                % F.lit(1000003)
            )
            .cast("bigint")
            .alias("sum_h60"),
        )
        .orderBy("lang")
    )


# --- io11: WARC ingest (the container crawl corpora actually arrive in) ---------
_WARC_SHARDS = 8
from xarray_sql_spark.queries.pipeline_ops import _pl17_url_expr as _warc_url_expr  # noqa: E402
_WARC_DECOY = "\r\n\r\nWARC/1.0\r\n"  # planted INSIDE payloads of doc_id % 5 == 0


@query(
    "io11_warc_ingest",
    oracle=f"""
    WITH exp AS (
        SELECT doc_id,
               {_warc_url_expr("duck")} AS uri,
               octet_length(encode(text))
                   + CASE WHEN doc_id % 5 = 0 THEN {len(_WARC_DECOY)}
                          ELSE 0 END AS content_length,
               CASE WHEN doc_id % 5 = 0
                    THEN md5(text || chr(13) || chr(10) || chr(13) || chr(10)
                             || 'WARC/1.0' || chr(13) || chr(10))
                    ELSE md5(text) END AS payload_md5,
               doc_id % {_WARC_SHARDS} AS shard
        FROM documents
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id, uri,
           CAST(content_length AS BIGINT) AS content_length,
           payload_md5,
           CAST(shard AS BIGINT) AS shard
    FROM exp ORDER BY doc_id
    """,
    tags=("io", "warc", "ingest", "pipeline"),
    bench=False,  # I/O fixture: proves the landing path, not throughput
)
def io11_warc_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC ingest — the ISO 28500 container CommonCrawl-style corpora
    actually arrive in. The fixture writes REAL multi-record WARC files
    from the executors (one file per doc_id%{_WARC_SHARDS} shard, led by
    a warcinfo record the parser must skip, response records with
    WARC-Record-ID / WARC-Target-URI (pl17's planted URL) / exact
    Content-Length headers); the operator reads them back through
    ``binaryFile`` and walks records honoring Content-Length framing.
    Every fifth payload EMBEDS the record separator + magic
    ("\\r\\n\\r\\nWARC/1.0\\r\\n") mid-payload, so a regex-split parser
    fails loudly while the length-honoring parser recovers the planted
    byte-exact payload digests the oracle regenerates from the text.

    Scale: one file per shard is the fixture's layout; real crawls are
    ~1 GB WARCs, one binaryFile row each — record walking is
    per-file-local in an Arrow-batched mapInPandas (payloads never
    shuffle; each record reduces to a 4-field row). Listing/packing
    follows io08's binaryFile contract."""
    d = table(spark, sf_dir, "documents").selectExpr(
        "doc_id",
        "text",
        f"doc_id % {_WARC_SHARDS} AS shard",
        f"{_warc_url_expr('spark')} AS url",
    )
    root = os.path.join(
        _IO_DIR, f"warc-{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}"
    )
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root, exist_ok=True)

    def _record(rec_type: str, rec_id: str, payload: bytes, extra: str = "") -> bytes:
        head = (
            f"WARC/1.0\r\nWARC-Type: {rec_type}\r\n"
            f"WARC-Record-ID: <{rec_id}>\r\n{extra}"
            f"Content-Length: {len(payload)}\r\n\r\n"
        )
        return head.encode("utf-8") + payload + b"\r\n\r\n"

    def _land(key, pdf):
        import pandas as pd

        shard = int(key[0])
        pdf = pdf.sort_values("doc_id")
        parts = [
            _record(
                "warcinfo",
                f"urn:file:{shard}",
                b"software: xarray-sql-spark\r\n",
            )
        ]
        for did, txt, url in zip(pdf["doc_id"], pdf["text"], pdf["url"]):
            payload = str(txt).encode("utf-8")
            if int(did) % 5 == 0:
                payload += _WARC_DECOY.encode("utf-8")
            parts.append(
                _record(
                    "response",
                    f"urn:doc:{int(did)}",
                    payload,
                    extra=f"WARC-Target-URI: {url}\r\n",
                )
            )
        with open(os.path.join(root, f"part-{shard}.warc"), "wb") as f:
            f.write(b"".join(parts))
        return pd.DataFrame({"shard": [shard], "n": [len(pdf)]})

    # Eager landing job: the binaryFile listing below must see the files.
    d.groupBy("shard").applyInPandas(_land, "shard long, n long").collect()

    def _parse(batches):
        import pandas as pd
        import re as _re

        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                shard = int(_re.search(r"part-(\d+)\.warc$", path).group(1))
                blob = bytes(content)
                i = 0
                while i < len(blob):
                    j = blob.index(b"\r\n\r\n", i)
                    lines = blob[i:j].decode("utf-8").split("\r\n")
                    hdrs = dict(
                        ln.split(": ", 1) for ln in lines[1:] if ": " in ln
                    )
                    ln_ = int(hdrs["Content-Length"])
                    payload = blob[j + 4 : j + 4 + ln_]
                    i = j + 4 + ln_ + 4  # skip record separator
                    if hdrs.get("WARC-Type") != "response":
                        continue
                    m = _re.match(r"<urn:doc:(\d+)>", hdrs["WARC-Record-ID"])
                    rows.append(
                        (
                            int(m.group(1)),
                            hdrs["WARC-Target-URI"],
                            ln_,
                            hashlib.md5(payload).hexdigest(),
                            shard,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "uri",
                    "content_length",
                    "payload_md5",
                    "shard",
                ],
            )

    return (
        spark.read.format("binaryFile")
        .load(root)
        .select("path", "content")
        .mapInPandas(
            _parse,
            "doc_id long, uri string, content_length long, "
            "payload_md5 string, shard long",
        )
        .orderBy("doc_id")
    )


# --- io12: Arrow IPC (Feather v2) ingest -------------------------------------
_IPC_SHARDS = 8
_IPC_BATCH = 32  # rows per record batch: the multi-batch framing under test


@query(
    "io12_arrow_ipc_ingest",
    oracle=f"""
    SELECT CAST(doc_id % {_IPC_SHARDS} AS BIGINT) AS shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST((count(*) + {_IPC_BATCH - 1}) // {_IPC_BATCH} AS BIGINT)
               AS n_batches,
           CAST(sum(octet_length(encode(text))) AS BIGINT) AS sum_bytes,
           CAST(bit_xor(('0x' || substring(
               md5(CAST(doc_id AS VARCHAR) || ':' || text), 1, 15))::BIGINT)
               AS BIGINT) AS xor_digest,
           CAST(min(doc_id) AS BIGINT) AS min_doc,
           CAST(max(doc_id) AS BIGINT) AS max_doc
    FROM documents
    GROUP BY 1 ORDER BY 1
    """,
    tags=("io", "arrow", "ipc", "ingest"),
    bench=False,  # I/O fixture: proves the landing path, not throughput
)
def io12_arrow_ipc_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow IPC (Feather v2) ingest — the zero-copy interchange format
    feature stores and dataloader pipelines hand off in. The fixture
    writes one real multi-record-batch .arrow file per doc_id%8 shard
    from the executors (pyarrow ipc.new_file, 32-row record batches —
    the batch framing is part of the contract, pinned by n_batches =
    ceil(n_docs/32)); the operator reads the files back through
    ``binaryFile`` and walks record batches with pyarrow's file reader
    inside Arrow-batched mapInPandas. Fidelity pin: an order-independent
    bit_xor over per-record 60-bit md5(doc_id:text) digests — unlike a
    sorted string_agg this aggregates with map-side combine and never
    buffers a shard's text in one place, which is the shape that
    survives 1 GB+ shards.

    Scale: one binaryFile row per .arrow file; record-batch walking is
    file-local and streams batch-at-a-time (get_batch(i), not
    read_all), so executor memory is bounded by ONE record batch, not
    the file; the rollup is a map-side-combinable 7-aggregate groupBy
    on 8 keys. Listing/packing follows io08's binaryFile contract."""
    import pyarrow as pa
    import pyarrow.ipc as ipc  # noqa: F401  (executors re-import)

    d = table(spark, sf_dir, "documents").selectExpr(
        "doc_id", "text", f"doc_id % {_IPC_SHARDS} AS shard"
    )
    root = os.path.join(
        _IO_DIR, f"ipc-{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}"
    )
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root, exist_ok=True)

    def _land(key, pdf):
        import pandas as pd
        import pyarrow as pa
        import pyarrow.ipc as ipc

        shard = int(key[0])
        pdf = pdf.sort_values("doc_id")
        t = pa.table(
            {
                "doc_id": pa.array(pdf["doc_id"], pa.int64()),
                "text": pa.array(pdf["text"], pa.string()),
            }
        )
        with ipc.new_file(
            os.path.join(root, f"part-{shard}.arrow"), t.schema
        ) as w:
            w.write_table(t, max_chunksize=_IPC_BATCH)
        return pd.DataFrame({"shard": [shard], "n": [len(pdf)]})

    # Eager landing job: the binaryFile listing below must see the files.
    d.groupBy("shard").applyInPandas(_land, "shard long, n long").collect()

    def _parse(batches):
        import pandas as pd
        import pyarrow as pa
        import pyarrow.ipc as ipc
        import re as _re

        for pdf in batches:
            out = []
            for path, content in zip(pdf["path"], pdf["content"]):
                shard = int(_re.search(r"part-(\d+)\.arrow$", path).group(1))
                rd = ipc.open_file(pa.BufferReader(bytes(content)))
                nb = rd.num_record_batches
                for bi in range(nb):
                    b = rd.get_batch(bi)
                    out.append(
                        pd.DataFrame(
                            {
                                "shard": shard,
                                "n_file_batches": nb,
                                "doc_id": b.column("doc_id").to_pandas(),
                                "text": b.column("text").to_pandas(),
                            }
                        )
                    )
            yield pd.concat(out) if out else pd.DataFrame(
                columns=["shard", "n_file_batches", "doc_id", "text"]
            )

    rows = (
        spark.read.format("binaryFile")
        .load(root)
        .select("path", "content")
        .mapInPandas(
            _parse,
            "shard long, n_file_batches long, doc_id long, text string",
        )
    )
    return (
        rows.groupBy("shard")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.max("n_file_batches").cast("bigint").alias("n_batches"),
            F.sum(F.octet_length("text")).cast("bigint").alias("sum_bytes"),
            F.expr(
                "bit_xor(cast(conv(substring(md5(concat(cast(doc_id as"
                " string), ':', text)), 1, 15), 16, 10) as bigint))"
            )
            .cast("bigint")
            .alias("xor_digest"),
            F.min("doc_id").cast("bigint").alias("min_doc"),
            F.max("doc_id").cast("bigint").alias("max_doc"),
        )
        .orderBy("shard")
    )


# --- io13: incremental ingest with a manifest ledger --------------------------
# File-level exactly-once: blobs arrive in waves; each ingest run lists
# the landing dir, ANTI-JOINS against the manifest of what was already
# ingested, and processes only the new files. The fixture lands wave 1
# (even doc_ids), snapshots the manifest, lands wave 2 (odd doc_ids),
# re-lists — and the oracle regenerates both waves from the parity rule,
# so a hash match proves the ledger skipped every wave-1 file and missed
# no wave-2 file (a double-ingest or a gap flips a wave's xor digest).


@query(
    "io13_ingest_manifest",
    oracle="""
    SELECT CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 2 END AS INT) AS wave,
           CAST(count(*) AS BIGINT) AS n_files,
           CAST(sum(octet_length(encode(text))) AS BIGINT) AS sum_bytes,
           CAST(bit_xor(('0x' || substring(
               md5(CAST(doc_id AS VARCHAR) || ':' || text), 1, 15))::BIGINT)
               AS BIGINT) AS xor_digest
    FROM documents
    WHERE octet_length(encode(text)) > 0
    GROUP BY 1 ORDER BY 1
    """,
    tags=("io", "ingest", "manifest", "exactly-once"),
    bench=False,  # I/O fixture: proves the ledger path, not throughput
)
def io13_ingest_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest-gated incremental ingest: run 1 ingests the landing dir
    and records (path, length) in the manifest; run 2, after more files
    arrive, lists again and processes ONLY the anti-join of the listing
    against the manifest. Per-wave xor digests over md5(doc_id:text)
    are the exactly-once pins — re-ingesting a wave-1 file in run 2
    (or missing a new file) flips a digest against the oracle's
    parity-rule regeneration.

    Scale: the manifest is (path, length) — file-count-sized, orders
    below the data; the anti-join keys on path (broadcast the manifest
    while it fits, shuffle-join beyond); content is only read for files
    that SURVIVE the anti-join, because binaryFile's content column is
    lazily scanned per matched file. This is the idempotent-retry
    contract object stores force on every long-running ingest.

    Format boundary (verified empirically, pinned in
    tests/test_round12b_ops.py): Spark's file-split planner generates
    NO split for a zero-length file, so an empty document cannot ride
    the one-file-per-object blob path at all — both sides exclude
    empty texts (a production landing zone writes a tombstone or a
    metadata row for them instead)."""
    d = (
        table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.octet_length("text") > 0)
    )
    root = os.path.join(
        _IO_DIR, f"ledger-{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}"
    )
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root, exist_ok=True)

    def _land(flt):
        def _w(batches):
            import pandas as pd

            n = 0
            for pdf in batches:
                for did, txt in zip(pdf["doc_id"], pdf["text"]):
                    if flt(int(did)):
                        with open(
                            os.path.join(root, f"doc_{int(did)}.bin"), "wb"
                        ) as f:
                            f.write(str(txt).encode("utf-8"))
                        n += 1
            yield pd.DataFrame({"n": [n]})

        return _w

    def _ingest(df):
        return df.selectExpr(
            "CAST(regexp_extract(path, 'doc_(\\\\d+)\\\\.bin$', 1) AS BIGINT)"
            " AS doc_id",
            "content",
        ).selectExpr(
            "doc_id",
            "octet_length(content) AS nbytes",
            "cast(conv(substring(md5(concat(cast(doc_id as string), ':',"
            " cast(content as string))), 1, 15), 16, 10) as bigint)"
            " AS digest",
        )

    # wave 1 lands, run 1 ingests everything it sees and keeps a manifest.
    # run1 is MATERIALIZED before wave 2 is written to the same directory
    # (r12 ADVICE): lazily it would only execute after wave-2 files exist,
    # leaning on Spark's InMemoryFileIndex snapshotting the listing at
    # load() time — true in pyspark 4.1.2, but exactly-once semantics
    # shouldn't ride on file-index snapshot behavior.
    d.mapInPandas(_land(lambda i: i % 2 == 0), "n long").collect()
    listing1 = spark.read.format("binaryFile").load(root).select("path", "content")
    run1 = (
        _ingest(listing1)
        .withColumn("wave", F.lit(1))
        .localCheckpoint(eager=True)
    )
    manifest = listing1.select("path")  # (path, length) in production
    manifest_rows = manifest.collect()  # file-count-sized ledger snapshot
    m1 = spark.createDataFrame(manifest_rows, "path string")

    # wave 2 lands; run 2 lists again and ingests ONLY the anti-join
    d.mapInPandas(_land(lambda i: i % 2 == 1), "n long").collect()
    listing2 = spark.read.format("binaryFile").load(root).select("path", "content")
    run2 = (
        _ingest(listing2.join(F.broadcast(m1), "path", "left_anti"))
        .withColumn("wave", F.lit(2))
    )
    return (
        run1.unionByName(run2)
        .groupBy(F.col("wave").cast("int").alias("wave"))
        .agg(
            F.count("*").cast("bigint").alias("n_files"),
            F.sum("nbytes").cast("bigint").alias("sum_bytes"),
            F.expr("bit_xor(digest)").cast("bigint").alias("xor_digest"),
        )
        .orderBy("wave")
    )
