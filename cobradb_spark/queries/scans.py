"""§2 A — scans / sources / sinks.

Reference grounding [P]: cobradb's scan layer is ORM full-table reads
(model_loading.py preload dicts), TSV curation lists (util.py load_tsv),
Escher JSON blobs (models.py EscherMap.map_data), get_or_create upserts
(util.py), and a terminal pg_dump.  Here: parquet scans with pruning,
csv/json decode, partitioned parquet sinks, and an anti-join merge.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cobradb_spark import schemas
from cobradb_spark.io import load_table, load_tables
from cobradb_spark.operators.merge import merge_upsert
from cobradb_spark.registry import register
from cobradb_spark.scratch import scratch_dir


@register(
    "scan_parquet",
    oracle="SELECT r_regionkey, r_name FROM region",
    doc="A1 full table scan with schema assert; ref: session.query(Model) full reads [P]",
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, sf_dir, "region")
    assert [f.name for f in df.schema.fields] == ["r_regionkey", "r_name"]
    return df


@register(
    "scan_projection_pushdown",
    oracle="SELECT l_orderkey, l_extendedprice FROM lineitem",
    doc="A2 column-pruned scan; ref: session.query(Reaction.bigg_id, ...) column lists [P]. "
    "Catalyst pushes the 2-column ReadSchema to the parquet footer — at 100 TB this is "
    "the difference between reading 2 columns and reading 11.",
)
def scan_projection_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")


@register(
    "scan_csv_tsv",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
    doc="A3 TSV round-trip; ref: cobradb/util.py::load_tsv curation lists [P]. Writes "
    "nation as TSV then reads it back with an explicit schema (no inference).",
)
def scan_csv_tsv(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    tmp = scratch_dir("cobradb_tsv_")
    path = os.path.join(tmp, "nation_tsv")
    nation.coalesce(1).write.mode("overwrite").options(sep="\t", header=True).csv(path)
    return spark.read.options(sep="\t", header=True).schema(schemas.NATION).csv(path)


@register(
    "scan_json_lines",
    oracle=(
        "SELECT event_id, CAST(json_extract(props, '$.k') AS INTEGER) AS k FROM events"
    ),
    doc="A4 JSON decode as scan-adjacent op; ref: EscherMap.map_data JSON blobs [P]; "
    "from_json with explicit schema (never schema-of-json inference on the hot path).",
)
def scan_json_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id", F.from_json("props", "k INT").getField("k").alias("k")
    )


@register(
    "sink_parquet_partitioned",
    oracle="SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag FROM lineitem",
    doc="A5 partitioned parquet sink + read-back identity; ref: terminal pg_dump [P]. "
    "partitionBy(l_returnflag) gives partition pruning to every later reader; the "
    "read-back must reproduce the source rows exactly.",
)
def sink_parquet_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"
    )
    tmp = scratch_dir("cobradb_sink_")
    path = os.path.join(tmp, "lineitem_by_flag")
    li.write.mode("overwrite").partitionBy("l_returnflag").parquet(path)
    back = spark.read.parquet(path)
    # partition column comes back via directory names; re-assert its type
    return back.select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.col("l_returnflag").cast("string").alias("l_returnflag"),
    )


@register(
    "scan_jsonl_source",
    oracle="SELECT event_id, user_id, event_type, value FROM events",
    doc="A4b JSON-lines source round-trip: events written as jsonl, read back with "
    "an explicit schema (no inference scan). Covers the reference's JSON-blob "
    "ingestion path [P: EscherMap] as a first-class source format.",
)
def scan_jsonl_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    tmp = scratch_dir("cobradb_jsonl_")
    path = os.path.join(tmp, "events_jsonl")
    ev.write.mode("overwrite").json(path)
    schema = "event_id long, user_id long, event_type string, value double"
    return spark.read.schema(schema).json(path)


@register(
    "sink_orc_roundtrip",
    oracle="SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier",
    doc="A5b ORC sink/source round-trip — the second columnar format; same "
    "pushdown/pruning properties as parquet.",
)
def sink_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = load_table(spark, sf_dir, "supplier")
    tmp = scratch_dir("cobradb_orc_")
    path = os.path.join(tmp, "supplier_orc")
    sup.write.mode("overwrite").orc(path)
    return spark.read.orc(path)


@register(
    "merge_upsert",
    oracle="""
WITH existing AS (
  SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 3 <> 0
), incoming AS (
  SELECT o_orderkey, o_totalprice + 1.0 AS o_totalprice FROM orders WHERE o_orderkey % 2 = 0
)
SELECT o_orderkey, o_totalprice FROM incoming
UNION ALL
SELECT e.o_orderkey, e.o_totalprice FROM existing e
WHERE NOT EXISTS (SELECT 1 FROM incoming i WHERE i.o_orderkey = e.o_orderkey)
""",
    doc="A6 upsert/merge; ref: cobradb/util.py::get_or_create — the universal upsert "
    "behind every loader [P]. Spark-first: incoming wins, existing-not-matched kept "
    "via left-anti join + union (no Delta in this env). See operators/merge.py.",
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    existing = orders.filter(F.col("o_orderkey") % 3 != 0).select("o_orderkey", "o_totalprice")
    incoming = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", (F.col("o_totalprice") + 1.0).alias("o_totalprice")
    )
    return merge_upsert(existing, incoming, keys=["o_orderkey"])


@register(
    "scan_nested_ingest",
    oracle="SELECT l_orderkey, l_linenumber, l_partkey, l_quantity FROM lineitem",
    doc="A7 nested-format ingest; ref: SBML object graphs flattened to relational "
    "rows (parse.py load_and_normalize; component_loading.py load_genome [P]). "
    "Synthesizes one SBML-shaped XML document per order (model/listOfReactants/"
    "speciesReference with stoichiometry attributes — the SURVEY §1.2 shape) "
    "with JVM-side string building, then INGESTS the XML for real: ElementTree "
    "parse inside Arrow-batched mapInPandas, all ids/values recovered from "
    "attributes only.  Must reproduce lineitem exactly — Spark's shortest-"
    "round-trip double formatting guarantees stoichiometry survives the "
    "string round-trip bit-exactly.  At 100 TB each partition parses its own "
    "documents; nothing touches the driver.",
)
def scan_nested_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    li = load_table(spark, sf_dir, "lineitem")
    species_ref = F.concat(
        F.lit('<speciesReference species="S_'),
        F.col("l_partkey").cast("string"),
        F.lit('" compartment="c'),
        F.col("l_linenumber").cast("string"),
        F.lit('" stoichiometry="'),
        F.col("l_quantity").cast("string"),
        F.lit('"/>'),
    )
    docs = li.groupBy("l_orderkey").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("l_linenumber"), species_ref.alias("x")))
                ),
                lambda s: s["x"],
            ),
            "",
        ).alias("body")
    )
    staged = docs.select(
        F.concat(
            F.lit('<model id="M_'),
            F.col("l_orderkey").cast("string"),
            F.lit('"><listOfReactants>'),
            F.col("body"),
            F.lit("</listOfReactants></model>"),
        ).alias("xml")
    )

    def parse(batches):
        import xml.etree.ElementTree as ET

        for pdf in batches:
            out = {"l_orderkey": [], "l_linenumber": [], "l_partkey": [], "l_quantity": []}
            for xml_str in pdf["xml"]:
                root = ET.fromstring(xml_str)
                okey = int(root.attrib["id"].removeprefix("M_"))
                for ref in root.iter("speciesReference"):
                    out["l_orderkey"].append(okey)
                    out["l_linenumber"].append(int(ref.attrib["compartment"].removeprefix("c")))
                    out["l_partkey"].append(int(ref.attrib["species"].removeprefix("S_")))
                    out["l_quantity"].append(float(ref.attrib["stoichiometry"]))
            yield pd.DataFrame(out)

    return staged.mapInPandas(
        parse, schema="l_orderkey long, l_linenumber int, l_partkey long, l_quantity double"
    )


@register(
    "scan_python_datasource",
    oracle="""
SELECT doc_id, lang, n_chars FROM documents WHERE lang = 'en'
""",
    doc="A-ext custom Python DataSource (sources/pydocs.py): pluggable "
    "connector with row-group split planning, pushFilters equality pushdown "
    "(the lang = 'en' predicate runs inside the scan — PushedFilters visible "
    "in the plan), and Arrow-batch transfer. Oracle = the same scan through "
    "the native reader.",
)
def scan_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cobradb_spark.sources.pydocs import DocsParquetDataSource
    from cobradb_spark.session import apply_runtime_confs

    apply_runtime_confs(spark)  # filterPushdown conf on foreign sessions too
    spark.dataSource.register(DocsParquetDataSource)
    df = (
        spark.read.format("cobradb_pydocs")
        .option("path", f"{sf_dir}/documents.parquet")
        .load()
    )
    return df.filter(F.col("lang") == "en").select("doc_id", "lang", "n_chars")


@register(
    "scan_observed_metrics",
    oracle="""
SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
       round(sum(o_totalprice), 2) AS total
FROM orders GROUP BY o_orderstatus
""",
    doc="A-ext pipeline observability: df.observe() attaches named metrics "
    "(row count, null count, value sum) that are computed DURING the normal "
    "action — no second scan — and surface via QueryExecutionListener / "
    "Observation. The returned result is the ordinary aggregate (oracle-exact); "
    "tests/test_operators.py asserts the observed metrics match it.",
)
def scan_observed_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    observed = o.observe(
        "orders_scan_metrics",
        F.count(F.lit(1)).alias("rows_seen"),
        F.sum("o_totalprice").alias("price_sum"),
        F.count(F.when(F.col("o_custkey").isNull(), 1)).alias("null_custkeys"),
    )
    return observed.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total")
    )


@register(
    "sink_python_datasource",
    oracle="""
SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderkey % 7 = 0
""",
    doc="A-ext custom Python DataSource WRITER (sources/pysink.py): JSONL sink "
    "with the two-phase commit protocol — tasks write independent part files "
    "and return commit messages; the driver publishes a _MANIFEST only when "
    "all succeed, so committed data is never torn. Read-back goes through the "
    "manifest; round-trip is oracle-exact.",
)
def sink_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cobradb_spark.sources.pysink import (
        JsonlSinkDataSource,
        read_manifested_jsonl,
    )

    spark.dataSource.register(JsonlSinkDataSource)
    sel = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 7 == 0)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    )
    tmp = scratch_dir("cobradb_pyjsonl_")
    path = os.path.join(tmp, "orders_jsonl")
    sel.write.format("cobradb_pyjsonl").option("path", path).mode("append").save()
    return read_manifested_jsonl(
        spark, path, "o_orderkey long, o_orderstatus string, o_totalprice double"
    )


@register(
    "scan_partition_pruning",
    oracle="""
SELECT l_orderkey, l_linenumber, round(l_quantity, 6) AS qty
FROM lineitem WHERE l_returnflag = 'R'
""",
    doc="A5c partition pruning end-to-end: lineitem written partitionBy("
    "l_returnflag), read back with an equality predicate on the partition "
    "column. The filter must resolve at PLANNING time from directory names "
    "(PartitionFilters in the scan, audited) — zero bytes of the other "
    "partitions are read. This is THE mechanism that turns a 100 TB "
    "dataset into a 30 TB scan for flag-scoped queries.",
)
def scan_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"
    )
    tmp = scratch_dir("cobradb_prune_")
    path = os.path.join(tmp, "lineitem_by_flag")
    li.write.mode("overwrite").partitionBy("l_returnflag").parquet(path)
    back = spark.read.parquet(path).filter(F.col("l_returnflag") == "R")
    return back.select(
        "l_orderkey", "l_linenumber", F.round("l_quantity", 6).alias("qty")
    )


@register(
    "scan_schema_evolution",
    oracle="""
SELECT l_orderkey, l_linenumber,
       round(l_quantity, 6) AS qty,
       CAST(NULL AS DOUBLE) AS tax
FROM lineitem WHERE l_linenumber = 1
UNION ALL
SELECT l_orderkey, l_linenumber,
       CAST(NULL AS DOUBLE) AS qty,
       round(l_tax, 6) AS tax
FROM lineitem WHERE l_linenumber = 2
""",
    doc="A-ext schema evolution on read: two parquet batches written with "
    "DIFFERENT schemas (an old writer without `tax`, a new writer that "
    "dropped `qty`), read back as ONE dataset with mergeSchema=true — "
    "missing columns surface as NULLs, never errors. This is how a 100 TB "
    "dataset absorbs producer schema changes without rewriting history; "
    "the per-file schemas reconcile at planning time.",
)
def scan_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    tmp = scratch_dir("cobradb_evo_")
    old = li.filter(F.col("l_linenumber") == 1).select(
        "l_orderkey", "l_linenumber", F.round("l_quantity", 6).alias("qty")
    )
    new = li.filter(F.col("l_linenumber") == 2).select(
        "l_orderkey", "l_linenumber", F.round("l_tax", 6).alias("tax")
    )
    old.write.mode("overwrite").parquet(f"{tmp}/ds/batch=old")
    new.write.mode("overwrite").parquet(f"{tmp}/ds/batch=new")
    back = spark.read.option("mergeSchema", "true").parquet(f"{tmp}/ds")
    return back.select("l_orderkey", "l_linenumber", "qty", "tax")


@register(
    "scan_file_metadata_lineage",
    oracle="""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(1 AS BIGINT) AS n_files
FROM events
GROUP BY event_type
""",
    doc="Row-level file lineage via the hidden _metadata struct: events "
    "are written partitionBy(event_type) after repartition(event_type) "
    "(one shuffle partition per type -> exactly one file per partition "
    "directory, making the file count deterministic), then read back "
    "selecting _metadata.file_path alongside the data. The partition "
    "value is recovered FROM THE PATH (regexp on 'event_type=...') and "
    "per-file row counts are aggregated — the audit primitive for "
    "incremental pipelines ('which files fed this partition, how many "
    "rows each'), with no extra bookkeeping column materialized in the "
    "data. At 100 TB, _metadata is planning-time information the reader "
    "attaches per split; it costs nothing at rest.",
)
def scan_file_metadata_lineage(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type")
    tmp = scratch_dir("cobradb_meta_")
    path = os.path.join(tmp, "events_by_type")
    (
        ev.repartition("event_type")
        .write.mode("overwrite")
        .partitionBy("event_type")
        .parquet(path)
    )
    back = spark.read.parquet(path).select(
        F.regexp_extract(F.col("_metadata.file_path"), r"event_type=([^/]+)/", 1)
        .alias("event_type"),
        F.col("_metadata.file_path").alias("file_path"),
    )
    per_file = back.groupBy("event_type", "file_path").agg(
        F.count("*").alias("n_rows")
    )
    return per_file.groupBy("event_type").agg(
        F.sum("n_rows").alias("n_rows"),
        F.countDistinct("file_path").alias("n_files"),
    )


@register(
    "scan_binaryfile_ingest",
    oracle="""
SELECT doc_id, md5(text) AS content_md5,
       CAST(strlen(text) AS BIGINT) AS n_bytes
FROM documents
WHERE doc_id < 20
""",
    doc="Opaque-blob ingestion via the binaryFile source — the entry "
    "point for image/audio corpora: one file per blob on disk, read as "
    "(path, modificationTime, length, content) with content as a raw "
    "binary column. Here 20 blobs are materialized from document texts "
    "(so the oracle can verify bytes: md5 over UTF-8 bytes matches "
    "DuckDB's md5 over the same text), the key is recovered from the "
    "file name, and the md5 + byte length prove content integrity "
    "end-to-end. Feeds the multimodal_* pipeline (binary column + "
    "typed metadata struct); at scale pathGlobFilter/recursive lookup "
    "prune the listing and each blob stays a single task-local read — "
    "no shuffle.",
)
def scan_binaryfile_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 20)
        .select("doc_id", "text")
        .collect()
    )
    tmp = scratch_dir("cobradb_blobs_")
    for r in docs:
        with open(os.path.join(tmp, f"{r.doc_id}.bin"), "wb") as fh:
            fh.write(r.text.encode("utf-8"))
    blobs = spark.read.format("binaryFile").load(tmp)
    return blobs.select(
        F.regexp_extract(
            F.element_at(F.split("path", "/"), -1), r"(\d+)\.bin", 1
        )
        .cast("long")
        .alias("doc_id"),
        F.md5("content").alias("content_md5"),
        F.col("length").alias("n_bytes"),
    )


@register(
    "scan_corrupt_tolerant",
    oracle="""
WITH mangled AS (
  SELECT event_type,
         CASE WHEN event_id % 97 = 0 THEN concat('{bad', props) ELSE props END AS p
  FROM events
), parsed AS (
  SELECT event_type,
         CASE WHEN json_valid(p)
              THEN CAST(json_extract_string(p, '$.k') AS BIGINT) END AS k,
         NOT json_valid(p) AS is_corrupt
  FROM mangled
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) FILTER (WHERE is_corrupt) AS BIGINT) AS n_corrupt,
       CAST(sum(k) AS BIGINT) AS sum_k
FROM parsed GROUP BY event_type
""",
    doc="Corrupt-tolerant semi-structured ingestion: PERMISSIVE from_json "
    "with columnNameOfCorruptRecord quarantines malformed payloads (a "
    "deterministic 1-in-97 mangle simulates upstream corruption) instead "
    "of failing the job or silently dropping rows — the dead-letter "
    "pattern every 100 TB ingest needs. Valid rows parse their fields, "
    "corrupt rows keep the raw payload for replay, and the per-type audit "
    "counts both populations in the same single pass (parse is a narrow "
    "map; the rollup is partial+final).",
    tags=("scans",),
)
def scan_corrupt_tolerant(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    mangled = e.select(
        "event_type",
        F.when(F.col("event_id") % 97 == 0, F.concat(F.lit("{bad"), F.col("props")))
        .otherwise(F.col("props"))
        .alias("p"),
    )
    parsed = mangled.select(
        "event_type",
        F.from_json(
            "p",
            "k LONG, _corrupt_record STRING",
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_record"},
        ).alias("j"),
    )
    return (
        parsed.select(
            "event_type",
            F.col("j.k").alias("k"),
            F.col("j._corrupt_record").isNotNull().alias("is_corrupt"),
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_rows"),
            F.count_if(F.col("is_corrupt")).alias("n_corrupt"),
            F.sum(F.when(~F.col("is_corrupt"), F.col("k"))).cast("long").alias("sum_k"),
        )
    )


@register(
    "join_dpp_partition_pruning",
    oracle="""
SELECT l.l_returnflag, CAST(count(*) AS BIGINT) AS n_lines,
       round(sum(l.l_quantity), 2) AS total_qty
FROM lineitem l
JOIN (SELECT DISTINCT l_returnflag AS flag FROM lineitem
      WHERE l_linestatus = 'F') d
  ON l.l_returnflag = d.flag
GROUP BY l.l_returnflag
""",
    doc="DYNAMIC partition pruning: the fact table is stored partitioned "
    "by the join key; the dim side's qualifying keys are only known at "
    "runtime, so Catalyst injects a dynamicpruning#... subquery filter "
    "into the fact scan — whole partition directories are skipped based "
    "on the joined dim, the single biggest I/O lever for star joins over "
    "partitioned 100 TB facts (static pruning is scan_partition_pruning). "
    "Plan-audited: 'dynamicpruning' present in the fact scan's "
    "PartitionFilters.",
    tags=("scans",),
)
def join_dpp_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_linestatus", "l_returnflag"
    )
    tmp = scratch_dir("cobradb_dpp_")
    path = os.path.join(tmp, "lineitem_by_flag")
    li.write.mode("overwrite").partitionBy("l_returnflag").parquet(path)
    fact = spark.read.parquet(path)
    dim = (
        fact.filter(F.col("l_linestatus") == "F")
        .select(F.col("l_returnflag").alias("flag"))
        .distinct()
    )
    return (
        fact.join(dim, fact["l_returnflag"] == dim["flag"])
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_lines"),
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
        )
    )


@register(
    "etl_schema_evolution_merge",
    oracle="""
SELECT o_orderkey,
       round(o_totalprice, 2) AS o_totalprice,
       CASE WHEN o_orderkey % 2 = 1 THEN o_orderpriority END AS o_orderpriority
FROM orders
""",
    doc="A-ext schema-evolution read: two parquet generations of the same "
    "dataset — gen1 written before a column existed (o_orderkey, "
    "o_totalprice), gen2 after adding o_orderpriority — are scanned as "
    "ONE dataset via mergeSchema; gen1 rows surface NULL for the added "
    "column. This is how a 100 TB lake absorbs additive schema change "
    "without rewriting history: the merged schema is reconciled from "
    "file footers at planning time (a driver-side metadata pass), scans "
    "stay columnar, and readers never special-case file vintage. The "
    "oracle reconstructs the same union directly from orders (gen "
    "membership = orderkey parity), proving no rows or values drift "
    "through the evolution.",
    tags=("scans", "etl"),
)
def etl_schema_evolution_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    root = scratch_dir("cobradb_schevo_")
    gen1, gen2 = f"{root}/gen1", f"{root}/gen2"
    o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_totalprice"
    ).write.mode("overwrite").parquet(gen1)
    o.filter(F.col("o_orderkey") % 2 == 1).write.mode("overwrite").parquet(gen2)
    merged = spark.read.option("mergeSchema", "true").parquet(gen1, gen2)
    return merged.select(
        "o_orderkey",
        F.round("o_totalprice", 2).alias("o_totalprice"),
        "o_orderpriority",
    )


@register(
    "scan_gzip_jsonl",
    oracle="""
SELECT event_id, user_id, event_type, round(value, 6) AS value
FROM events WHERE event_id % 3 = 0
""",
    doc="A-ext compressed-text ingestion: a gzip-compressed JSONL landing "
    "zone (written with Spark's native codec support) scanned back with "
    "an explicit schema. Gzip is NOT splittable — each .json.gz file is "
    "one task regardless of size — so the write keeps files bounded "
    "(repartition before write), which is exactly the at-scale guidance: "
    "many medium gzip files parallelize, one giant one serializes. The "
    "oracle reconstructs the same rows from the source table, proving "
    "no loss or type drift through the compress/decompress round trip.",
    tags=("scans", "etl"),
)
def scan_gzip_jsonl(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 3 == 0)
    out = scratch_dir("cobradb_gzjson_")
    (
        ev.select("event_id", "user_id", "event_type", "value")
        .repartition(4)  # bounded gzip members: 4 parallel single-task files
        .write.mode("overwrite")
        .option("compression", "gzip")
        .json(out)
    )
    back = (
        spark.read.schema("event_id long, user_id long, event_type string, value double")
        .json(out)
    )
    return back.select(
        "event_id", "user_id", "event_type", F.round("value", 6).alias("value")
    )


@register(
    "scan_timetravel_log",
    oracle="""
WITH cents AS (
  SELECT event_id, event_type,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c
  FROM events
),
v1 AS (SELECT event_type, c FROM cents WHERE event_id % 3 IN (0, 1)),
v2 AS (SELECT event_type, c FROM cents WHERE event_id % 3 = 1
       UNION ALL
       SELECT event_type, c FROM cents
       WHERE event_id % 3 = 0 AND c >= 5000),
g1 AS (SELECT 1 AS version, event_type, CAST(count(*) AS BIGINT) AS n_rows,
              CAST(sum(c) AS BIGINT) AS sum_cents
       FROM v1 GROUP BY event_type),
g2 AS (SELECT 2 AS version, event_type, CAST(count(*) AS BIGINT) AS n_rows,
              CAST(sum(c) AS BIGINT) AS sum_cents
       FROM v2 GROUP BY event_type)
SELECT * FROM g1 UNION ALL SELECT * FROM g2
""",
    doc="Time travel over a minimal transaction-log table format (the "
    "lakehouse mechanism behind Delta/Iceberg snapshots, built from "
    "first principles): the op materializes a table directory whose "
    "_log/ holds ordered JSON commit files of add/remove file actions — "
    "commit 0 adds batch A (event_id%3==0), commit 1 adds batch B "
    "(event_id%3==1), commit 2 REWRITES A as A' (rows with >= 5000 "
    "cents), i.e. a delete executed as remove+add — then reads snapshots "
    "v1 (A+B) and v2 (B+A') by replaying the log up to each version and "
    "scanning exactly the active file set. Snapshot isolation = file "
    "pruning: a reader pinned at v1 never sees commit 2's rewrite. The "
    "log is O(commits) driver-side JSON (bounded metadata, like any "
    "table format); the data path is ordinary parquet scans of the "
    "active files. At 100 TB the same replay serves incremental readers "
    "(diff of active sets between versions — the CDC feed "
    "etl_cdc_apply/stream_cdc_upsert_view consume). Oracle recomputes "
    "both snapshot semantics directly from the source table.",
    tags=("scan", "etl"),
)
def scan_timetravel_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.floor(F.col("value") * 100.0 + 0.5).cast("bigint").alias("c"),
    )
    root = scratch_dir("cobradb_tlog_")
    log_dir = os.path.join(root, "_log")
    os.makedirs(log_dir, exist_ok=True)

    def _write_part(name: str, df: DataFrame) -> str:
        path = os.path.join(root, name)
        df.write.mode("overwrite").parquet(path)
        return path

    a = _write_part("part-a", ev.filter(F.col("event_id") % 3 == 0))
    b = _write_part("part-b", ev.filter(F.col("event_id") % 3 == 1))
    a2 = _write_part(
        "part-a2",
        ev.filter((F.col("event_id") % 3 == 0) & (F.col("c") >= 5000)),
    )
    commits = [
        [{"action": "add", "path": a}],
        [{"action": "add", "path": b}],
        [{"action": "remove", "path": a}, {"action": "add", "path": a2}],
    ]
    for v, actions in enumerate(commits):
        with open(os.path.join(log_dir, f"{v:06d}.json"), "w") as f:
            for act in actions:
                f.write(json.dumps(act) + "\n")

    def _snapshot(version: int) -> list[str]:
        """Replay the log through `version`: the active file set."""
        active: list[str] = []
        logs = sorted(os.listdir(log_dir))[: version + 1]
        assert len(logs) == version + 1, f"missing commits for v{version}"
        for name in logs:
            for line in open(os.path.join(log_dir, name)):
                act = json.loads(line)
                if act["action"] == "add":
                    active.append(act["path"])
                else:
                    active.remove(act["path"])
        return active

    outs = []
    for version in (1, 2):
        snap = spark.read.parquet(*_snapshot(version))
        outs.append(
            snap.groupBy("event_type").agg(
                F.count("*").cast("bigint").alias("n_rows"),
                F.sum("c").cast("bigint").alias("sum_cents"),
            ).select(
                F.lit(version).alias("version"),
                "event_type",
                "n_rows",
                "sum_cents",
            )
        )
    return outs[0].unionAll(outs[1])


@register(
    "scan_fixedwidth",
    oracle="""
SELECT o_orderkey, o_custkey, o_orderstatus,
       CAST(CAST(o_totalprice * 100 AS DECIMAL(18,0)) AS BIGINT) AS total_cents,
       o_orderpriority
FROM orders
""",
    doc="Fixed-width (COBOL-copybook-style) text ingestion — the legacy "
    "mainframe exchange format that still feeds real lakes: orders "
    "render to 48-byte records (zero-padded numerics, space-padded "
    "text, positions 1-10/11-20/21/22-33/34-48) via format_string, land "
    "as plain text, and are re-parsed by POSITION — substring slices, "
    "rtrim, numeric casts — with no delimiter anywhere.  The round trip "
    "must reproduce the source table exactly (the oracle reads orders "
    "directly), proving the copybook offsets, padding, and sign-free "
    "numeric conventions survive both directions.  Scale posture: text "
    "lines are splittable, the parse is a narrow projection fused into "
    "the scan, and the writer repartitions to bounded files; the "
    "slice-and-cast pattern is exactly how a 100 TB EBCDIC-converted "
    "feed is unpacked in place.",
    tags=("scans", "etl"),
)
def scan_fixedwidth(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    lines = o.select(
        F.format_string(
            "%010d%010d%1s%012d%-15s",
            F.col("o_orderkey"),
            F.col("o_custkey"),
            F.col("o_orderstatus"),
            (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint"),
            F.col("o_orderpriority"),
        ).alias("value")
    )
    out = scratch_dir("cobradb_fixw_")
    lines.repartition(4).write.mode("overwrite").text(out)
    back = spark.read.text(out)
    v = F.col("value")
    return back.select(
        F.substring(v, 1, 10).cast("bigint").alias("o_orderkey"),
        F.substring(v, 11, 10).cast("bigint").alias("o_custkey"),
        F.substring(v, 21, 1).alias("o_orderstatus"),
        F.substring(v, 22, 12).cast("bigint").alias("total_cents"),
        F.rtrim(F.substring(v, 34, 15)).alias("o_orderpriority"),
    )


_CSV_HOSTILE_DUCK = """CASE p_partkey % 4
  WHEN 0 THEN p_name
  WHEN 1 THEN p_name || ',embedded,delims'
  WHEN 2 THEN p_name || ' says ' || chr(34) || 'quoted' || chr(34)
  ELSE p_name || chr(10) || 'second line' END"""


@register(
    "sink_csv_quoted_roundtrip",
    oracle=f"""
SELECT p_partkey, {_CSV_HOSTILE_DUCK} AS payload,
       CAST(length({_CSV_HOSTILE_DUCK}) AS BIGINT) AS n_chars
FROM part
""",
    doc="CSV round trip under HOSTILE content — embedded delimiters, "
    "embedded double quotes, and embedded NEWLINES (the three classic "
    "CSV corruption vectors): per-part payloads exercise all three, "
    "written with quoting+doubled-quote escaping (RFC 4180 semantics) "
    "and read back with multiLine + explicit schema.  The round trip "
    "must reproduce every byte (the oracle recomputes the payloads from "
    "part directly), proving the writer's quoting and the reader's "
    "quote-aware record splitting agree — the failure mode this pins is "
    "a newline-bearing field silently becoming two records.  Scale "
    "note, stated loudly: multiLine CSV is NOT splittable (quote state "
    "can't be resumed mid-file), so each file is one task — the writer "
    "repartitions to bounded files, and the 100-TB guidance is to land "
    "hostile text in parquet and keep CSV only at the edges.",
    tags=("scans", "etl"),
)
def sink_csv_quoted_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    payload = (
        F.when(F.col("p_partkey") % 4 == 0, F.col("p_name"))
        .when(F.col("p_partkey") % 4 == 1, F.concat("p_name", F.lit(",embedded,delims")))
        .when(
            F.col("p_partkey") % 4 == 2,
            F.concat("p_name", F.lit(' says "quoted"')),
        )
        .otherwise(F.concat("p_name", F.lit("\nsecond line")))
    )
    src = p.select("p_partkey", payload.alias("payload"))
    out = scratch_dir("cobradb_csvq_")
    (
        src.repartition(4)
        .write.mode("overwrite")
        .option("quoteAll", "true")
        .option("escape", '"')  # RFC 4180: quotes escape by doubling
        .csv(out)
    )
    back = (
        spark.read.schema("p_partkey long, payload string")
        .option("multiLine", "true")
        .option("escape", '"')
        .csv(out)
    )
    return back.select(
        "p_partkey", "payload", F.length("payload").cast("bigint").alias("n_chars")
    )


@register(
    "scan_json_multiline",
    oracle="""
SELECT doc_id, lang, n_chars FROM documents
WHERE n_chars >= 50 ORDER BY doc_id LIMIT 400
""",
    doc="Multi-line JSON reader path (A4's sibling: one pretty-printed "
    "JSON ARRAY per file instead of one object per line — the shape "
    "most REST-API dumps and config exports arrive in): the fixture "
    "writes the filtered documents metadata as indented JSON arrays "
    "(several files, each a single top-level array spanning many "
    "lines), reads them back with multiLine=true, and must reproduce "
    "the source rows exactly. The 100-TB caveat is part of the "
    "operator's contract and doc: a multiLine JSON file is ONE "
    "splittable unit (the whole file is a single record boundary "
    "scope), so the writer side keeps files small and many — exactly "
    "what this fixture does (8 files) — whereas JSONL splits by line "
    "and is the at-scale default.",
    tags=("scans",),
)
def scan_json_multiline(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json

    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("n_chars") >= 50)
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
        .limit(400)
    )
    tmp = scratch_dir("cobradb_mljson_")
    path = os.path.join(tmp, "docs_multiline")
    os.makedirs(path, exist_ok=True)
    # 8 pretty-printed array files, written deterministically by bucket.
    # Bounded collect: exactly <= 400 three-column metadata rows (the
    # LIMIT above IS the bound) — the operator exercises the multiLine
    # READER; a production writer would partition-write via df.write
    rows = d.collect()
    buckets: dict[int, list] = {}
    for r in rows:
        buckets.setdefault(r.doc_id % 8, []).append(
            {"doc_id": r.doc_id, "lang": r.lang, "n_chars": r.n_chars}
        )
    for b, items in sorted(buckets.items()):
        items.sort(key=lambda x: x["doc_id"])
        with open(os.path.join(path, f"part-{b}.json"), "w") as f:
            json.dump(items, f, indent=2)
    back = spark.read.option("multiLine", "true").json(path)
    return back.select("doc_id", "lang", F.col("n_chars").cast("bigint").alias("n_chars"))


@register(
    "scan_csv_gzip",
    oracle="""
SELECT n_nationkey, n_name, n_regionkey FROM nation
""",
    doc="Compressed-CSV reader path (A3's codec sibling): the nation dim "
    "is written as gzip-compressed CSV with a header and read back "
    "with an explicit schema — must reproduce the source rows exactly. "
    "The 100-TB note is the operator's point: gzip is NOT a splittable "
    "codec, so one .csv.gz file = one task regardless of size — the "
    "writer side must keep files bounded (or use bzip2/zstd-in-parquet "
    "instead); this fixture's per-partition files are the pattern.",
    tags=("scans",),
)
def scan_csv_gzip(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    tmp = scratch_dir("cobradb_csvgz_")
    path = os.path.join(tmp, "nation_gz")
    n.write.mode("overwrite").option("header", "true").option(
        "compression", "gzip"
    ).csv(path)
    back = spark.read.option("header", "true").schema(
        "n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT"
    ).csv(path)
    return back
