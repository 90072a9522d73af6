"""Driver-checkable queries for the IO / catalog surface (SURVEY.md
§2.1 S2/S6) — previously pinned only by pytest (tests/test_io_catalog).

Both queries are deliberately externally verifiable: the r5 verdict's
"what's missing" item 7 asked for every surface the driver CAN check to
be a registered query with an oracle, and the sink + schema contracts
are exactly the surfaces whose silent drift has bitten before (the
events ts physical-form change at the r4 round boundary).
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.expressions import dec_present
from .io import load_table, write_partitioned
from .registry import register

_SINK_DIRS: list[str] = []


@atexit.register
def _cleanup_sink_dirs() -> None:
    while _SINK_DIRS:
        shutil.rmtree(_SINK_DIRS.pop(), ignore_errors=True)


@register(
    "s2_sink_partitioned_roundtrip",
    oracle="""
    SELECT CAST(YEAR(o_orderdate) AS INT) AS year,
           COUNT(*) AS n_orders,
           CAST(CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                          AS DECIMAL(38,2)) AS VARCHAR) AS DOUBLE)
               AS sum_price
    FROM orders
    WHERE YEAR(o_orderdate) IN (1996, 1997)
    GROUP BY 1
    """,
)
def s2_sink_partitioned_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 sink contract, end to end: write orders year-partitioned
    (io.write_partitioned — the reference's year-filtered checkpoint
    layout, 2_data_importing_cleaning.R:301), read the copy back, and
    aggregate TWO of the partitions.  The year filter prunes to two
    ``year=`` directories on the read side (partition pruning is the
    point of the layout; the plan's PartitionFilters carry it), and the
    money sum goes through exact DECIMAL with the dec_present boundary
    cast — so the roundtrip proves write layout, pruned read, AND that
    no value was damaged in transit.  The oracle computes the same
    aggregate straight from the source table: sink + source agree or
    the sink is broken."""
    path = tempfile.mkdtemp(prefix="spark_graft_sink_")
    _SINK_DIRS.append(path)
    write_partitioned(load_table(spark, sf_dir, "orders"), path, "o_orderdate")
    back = spark.read.parquet(path).filter(F.col("year").isin(1996, 1997))
    return back.groupBy(F.col("year").cast("int").alias("year")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        dec_present(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast(
                "decimal(38,2)"
            )
        ).alias("sum_price"),
    )


# The reader contract, frozen: io.load_table must present exactly these
# columns and Spark types for every testdata table, independent of the
# parquet physical form (events.ts has ALREADY changed physical form
# once, at the r4 boundary — the footer-sniffing reader normalizes
# either form to a session-tz timestamp, and THIS query now externally
# pins that).  The oracle is the same rows as literals: schema drift in
# a regenerated corpus or a reader regression fails the gate loudly.
_SCHEMA_CONTRACT: list[tuple[str, int, str, str]] = [
    ("region", 1, "r_regionkey", "int"),
    ("region", 2, "r_name", "string"),
    ("nation", 1, "n_nationkey", "int"),
    ("nation", 2, "n_name", "string"),
    ("nation", 3, "n_regionkey", "int"),
    ("customer", 1, "c_custkey", "bigint"),
    ("customer", 2, "c_name", "string"),
    ("customer", 3, "c_nationkey", "int"),
    ("customer", 4, "c_acctbal", "double"),
    ("customer", 5, "c_mktsegment", "string"),
    ("supplier", 1, "s_suppkey", "bigint"),
    ("supplier", 2, "s_name", "string"),
    ("supplier", 3, "s_nationkey", "int"),
    ("supplier", 4, "s_acctbal", "double"),
    ("part", 1, "p_partkey", "bigint"),
    ("part", 2, "p_name", "string"),
    ("part", 3, "p_brand", "string"),
    ("part", 4, "p_type", "string"),
    ("part", 5, "p_size", "int"),
    ("part", 6, "p_retailprice", "double"),
    ("orders", 1, "o_orderkey", "bigint"),
    ("orders", 2, "o_custkey", "bigint"),
    ("orders", 3, "o_orderstatus", "string"),
    ("orders", 4, "o_totalprice", "double"),
    ("orders", 5, "o_orderdate", "timestamp_ntz"),
    ("orders", 6, "o_orderpriority", "string"),
    ("lineitem", 1, "l_orderkey", "bigint"),
    ("lineitem", 2, "l_partkey", "bigint"),
    ("lineitem", 3, "l_suppkey", "bigint"),
    ("lineitem", 4, "l_linenumber", "int"),
    ("lineitem", 5, "l_quantity", "double"),
    ("lineitem", 6, "l_extendedprice", "double"),
    ("lineitem", 7, "l_discount", "double"),
    ("lineitem", 8, "l_tax", "double"),
    ("lineitem", 9, "l_returnflag", "string"),
    ("lineitem", 10, "l_linestatus", "string"),
    ("lineitem", 11, "l_shipdate", "timestamp_ntz"),
    ("events", 1, "event_id", "bigint"),
    ("events", 2, "ts", "timestamp"),
    ("events", 3, "user_id", "bigint"),
    ("events", 4, "event_type", "string"),
    ("events", 5, "value", "double"),
    ("events", 6, "props", "string"),
    ("documents", 1, "doc_id", "bigint"),
    ("documents", 2, "text", "string"),
    ("documents", 3, "lang", "string"),
    ("documents", 4, "source", "string"),
    ("documents", 5, "n_chars", "bigint"),
    ("embeddings", 1, "vec_id", "bigint"),
    ("embeddings", 2, "embedding", "array<float>"),
    ("embeddings", 3, "label", "int"),
]


def _schema_contract_oracle() -> str:
    rows = ",\n        ".join(
        f"('{t}', {i}, '{c}', '{d}')" for t, i, c, d in _SCHEMA_CONTRACT
    )
    return f"""
    SELECT * FROM (VALUES
        {rows}
    ) AS v(table_name, ordinal, col_name, spark_type)
    """


@register("s6_catalog_schema_contract", oracle=_schema_contract_oracle())
def s6_catalog_schema_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 catalog introspection as a driver-checkable query: enumerate
    every testdata table through io.load_table and emit its observed
    (table, ordinal, column, Spark type) rows.  Metadata-only — the
    one place a driver-side createDataFrame of a collected list is the
    operator itself, not a scale hazard (≤ tens of rows at any corpus
    size)."""
    rows = []
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        for i, f_ in enumerate(load_table(spark, sf_dir, t).schema.fields):
            rows.append((t, i + 1, f_.name, f_.dataType.simpleString()))
    return spark.createDataFrame(
        rows, "table_name STRING, ordinal INT, col_name STRING, "
              "spark_type STRING"
    )


@register(
    "s3_csv_roundtrip",
    oracle="""
    SELECT c_nationkey,
           COUNT(*) AS n_cust,
           MIN(c_acctbal) AS min_bal,
           MAX(c_acctbal) AS max_bal
    FROM customer
    GROUP BY 1
    """,
)
def s3_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3 CSV source contract, end to end: export customer to
    header-CSV (io.write_csv — the reference's checkpoint format,
    2_data_importing_cleaning.R:233), read it back through io.read_csv
    with the EXPLICIT schema (no inference pre-pass — at 100 TB
    inference reads every byte twice), and aggregate.  The aggregate
    uses only order-independent exact reductions (count/min/max):
    Spark writes shortest-repr doubles, which round-trip text→binary
    bit-exactly, so sink + source agreeing proves the CSV writer,
    the schema-first reader, AND value fidelity in one query."""
    import pyspark.sql.types as T

    src = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    path = tempfile.mkdtemp(prefix="spark_graft_csv_")
    _SINK_DIRS.append(path)
    from .io import read_csv, write_csv

    write_csv(src, path)
    schema = T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
        ]
    )
    back = read_csv(spark, path, schema)
    return back.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_cust"),
        F.min("c_acctbal").alias("min_bal"),
        F.max("c_acctbal").alias("max_bal"),
    )


@register(
    "s8_jsonl_orc_roundtrip",
    oracle="""
    SELECT p_brand,
           COUNT(*) AS n_parts,
           MIN(p_retailprice) AS min_price,
           MAX(p_size) AS max_size
    FROM part
    GROUP BY 1
    """,
)
def s8_jsonl_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8 interchange contract: part flows parquet → JSONL (gzip,
    explicit-schema read-back — the training-data interchange format)
    → ORC (the Hive/Trino hand-over format) → aggregate, all through
    the io.py readers/writers.  Doubles survive both hops bit-exactly
    (shortest-repr JSON text; ORC binary), pinned by min/max against
    the source-table oracle — a silent type coercion or locale bug in
    either format fails the gate loudly."""
    import pyspark.sql.types as T

    src = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size", "p_retailprice"
    )
    from .io import read_jsonl, read_orc, write_jsonl, write_orc

    jdir = tempfile.mkdtemp(prefix="spark_graft_jsonl_")
    _SINK_DIRS.append(jdir)
    write_jsonl(src, jdir)
    schema = T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    )
    odir = tempfile.mkdtemp(prefix="spark_graft_orc_")
    _SINK_DIRS.append(odir)
    write_orc(read_jsonl(spark, jdir, schema), odir)
    return read_orc(spark, odir).groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.min("p_retailprice").alias("min_price"),
        F.max("p_size").alias("max_size"),
    )


@register(
    "s13_compaction_roundtrip",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           CAST(16 AS BIGINT) AS n_files_before,
           CAST(2 AS BIGINT) AS n_files_after,
           CAST(CAST(CAST(SUM(CAST(value AS DECIMAL(18,2)))
                          AS DECIMAL(38,2)) AS VARCHAR) AS DOUBLE)
               AS value_sum
    FROM events
    """,
)
def s13_compaction_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S13 table-maintenance contract: small-file compaction.  The
    events table is deliberately fragmented into 16 files (the
    streaming-ingest pathology — many small appends), then compacted
    to 2 with a NARROW coalesce (no shuffle: compaction is a read +
    concatenate, never a repartition of 100 TB), and the roundtrip
    proves (a) the file counts via distinct input_file_name on each
    copy — 16 is deterministic because an explicit repartition(16)
    defeats AQE coalescing and 10k+ rows hash to every partition —
    and (b) value integrity via the exact-DECIMAL sum against the
    source oracle."""
    ev = load_table(spark, sf_dir, "events")
    frag = tempfile.mkdtemp(prefix="spark_graft_frag_")
    comp = tempfile.mkdtemp(prefix="spark_graft_compact_")
    _SINK_DIRS.extend([frag, comp])
    ev.repartition(16).write.mode("overwrite").parquet(frag)
    frag_df = spark.read.parquet(frag)
    n_before = (
        frag_df.select(F.input_file_name().alias("f"))
        .distinct()
        .count()
    )
    frag_df.coalesce(2).write.mode("overwrite").parquet(comp)
    back = spark.read.parquet(comp)
    named = back.withColumn("__f", F.input_file_name())
    return named.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.lit(int(n_before)).cast("bigint").alias("n_files_before"),
        F.countDistinct("__f").cast("bigint").alias("n_files_after"),
        dec_present(
            F.sum(F.col("value").cast("decimal(18,2)")).cast(
                "decimal(38,2)"
            )
        ).alias("value_sum"),
    )


@register(
    "s14_text_source_roundtrip",
    oracle="""
    SELECT COUNT(*) AS n_lines,
           CAST(SUM(LENGTH(text)) AS BIGINT) AS total_chars,
           CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_en_tagged
    FROM documents
    """,
)
def s14_text_source_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S14 raw-text interchange: documents exported one-per-line as
    ``lang\\ttext`` through the plain text sink and re-read with
    ``spark.read.text`` + a split projection — the lowest-common-
    denominator corpus format every ingestion pipeline still meets.
    The roundtrip checks line count, total text volume, and a parsed
    field (the language tag) against the source table, proving the
    writer emits one intact line per document and the reader's
    single-column contract recovers structure losslessly (documents
    contain no newlines/tabs by corpus construction — the format's
    own precondition, which the count check would loudly break)."""
    docs = load_table(spark, sf_dir, "documents")
    path = tempfile.mkdtemp(prefix="spark_graft_text_")
    _SINK_DIRS.append(path)
    docs.select(
        F.concat_ws("\t", F.col("lang"), F.col("text")).alias("value")
    ).write.mode("overwrite").text(path)
    back = spark.read.text(path)
    parsed = back.select(
        F.substring_index(F.col("value"), "\t", 1).alias("lang"),
        F.expr("substring(value, instr(value, '\t') + 1)").alias("text"),
    )
    return parsed.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.length("text")).cast("bigint").alias("total_chars"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
        .cast("bigint")
        .alias("n_en_tagged"),
    )


@register(
    "s15_dpp_partitioned_join",
    oracle="""
    WITH ship_years AS (
        SELECT DISTINCT EXTRACT(year FROM l_shipdate) AS yr
        FROM lineitem WHERE l_returnflag = 'R'
          AND EXTRACT(year FROM l_shipdate) <= 1997
    )
    SELECT CAST(YEAR(o.o_orderdate) AS INT) AS year,
           COUNT(*) AS n_orders,
           CAST(CAST(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2)))
                          AS DECIMAL(38,2)) AS VARCHAR) AS DOUBLE)
               AS sum_price
    FROM orders o JOIN ship_years e ON YEAR(o.o_orderdate) = e.yr
    GROUP BY 1
    """,
)
def s15_dpp_partitioned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S15 dynamic partition pruning: the year-partitioned orders copy
    (io.write_partitioned, the s2 layout) joined on its PARTITION
    column against a small derived dimension (the years present in
    purchase events; the selective dim-side predicate is what arms
    the optimizer's pruning-benefit check) — the shape where Spark
    prunes fact partitions AT RUNTIME from the broadcast side's
    values instead of scanning all years.
    At 100 TB this is the difference between reading 2 partitions and
    reading 7; the dynamicpruning subquery's presence in the plan is
    pinned by tests/test_plans.py.  Values stay exact DECIMAL against
    the unpartitioned-source oracle, so the pruned read provably
    returns every row of the surviving partitions."""
    path = tempfile.mkdtemp(prefix="spark_graft_dpp_")
    _SINK_DIRS.append(path)
    write_partitioned(load_table(spark, sf_dir, "orders"), path, "o_orderdate")
    fact = spark.read.parquet(path)
    ship_years = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_returnflag") == "R")
            & (F.year("l_shipdate") <= 1997)
        )
        .select(F.year("l_shipdate").alias("yr"))
        .distinct()
    )
    return (
        fact.join(F.broadcast(ship_years), F.col("year") == F.col("yr"))
        .groupBy(F.col("year").cast("int").alias("year"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dec_present(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast(
                    "decimal(38,2)"
                )
            ).alias("sum_price"),
        )
    )
