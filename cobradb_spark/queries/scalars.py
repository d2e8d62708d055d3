"""§2 H — scalar/array/map/JSON functions.

ID normalization is cobradb's soul [P]: parse.py::convert_ids char
scrubbing, ::split_compartment regex `(.*)_([a-z][a-z0-9]?)$`,
::hash_reaction (md5 over sorted met:stoich pairs — THE cross-model
reaction dedup), util.py::increment_id / scrub_gene_id.  All of these
are expressible as built-in JVM functions — no Python UDF on the hot
path (the deliberately-UDF variants live in §2 K).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cobradb_spark.io import load_table, load_tables
from cobradb_spark.registry import register


@register(
    "str_normalize_ids",
    oracle="""
SELECT p_partkey,
       lower(trim(regexp_replace(p_name, '[^a-zA-Z0-9_]', '_', 'g'))) AS norm_id,
       upper(p_brand) AS brand_uc,
       translate(p_name, ' -', '__') AS underscored
FROM part
""",
    doc="H1 ID normalization; ref: parse.py::convert_ids char-scrub [P]. "
    "regexp_replace/lower/trim/translate — all codegen'd, no UDF.",
)
def str_normalize_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower(F.trim(F.regexp_replace("p_name", "[^a-zA-Z0-9_]", "_"))).alias("norm_id"),
        F.upper("p_brand").alias("brand_uc"),
        F.translate("p_name", " -", "__").alias("underscored"),
    )


@register(
    "str_split_compartment",
    oracle="""
SELECT p_partkey,
       regexp_extract(p_name, '^(\\w+) (\\w+)$', 1) AS base_id,
       regexp_extract(p_name, '^(\\w+) (\\w+)$', 2) AS compartment,
       str_split(p_name, ' ')[1] AS first_token
FROM part
""",
    doc="H2 compartment split; ref: parse.py::split_compartment regex "
    "`(.*)_([a-z][a-z0-9]?)$` on ids like glc__D_c [P] — same extract-groups "
    "shape on the two-token p_name.",
)
def str_split_compartment(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    pat = r"^(\w+) (\w+)$"
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", pat, 1).alias("base_id"),
        F.regexp_extract("p_name", pat, 2).alias("compartment"),
        F.split("p_name", " ").getItem(0).alias("first_token"),
    )


@register(
    "str_fuzzy_match",
    oracle="""
SELECT s.s_suppkey, c.c_custkey,
       CAST(levenshtein(s.s_name, c.c_name) AS BIGINT) AS dist
FROM supplier s JOIN customer c
  ON levenshtein(s.s_name, c.c_name) <= 6
""",
    doc="H3 fuzzy synonym lookup; ref: synonym fuzzy matching during gene linking [P]. "
    "levenshtein threshold join. Routed through join_fuzzy_blocked's PassJoin "
    "segment blocking (r3 verdict item 3): identical result set, same oracle, but "
    "candidate generation is an equi-join on exact segment text — never the "
    "|S|x|C| crossJoin a naive theta join plans (a scale-killer at 100 TB).",
)
def str_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cobradb_spark.queries.joins import join_fuzzy_blocked

    return join_fuzzy_blocked(spark, sf_dir)


@register(
    "hash_reaction_dedup",
    oracle="""
WITH sig AS (
  SELECT l_orderkey,
         sha256(string_agg(concat(l_partkey, ':', CAST(l_quantity AS BIGINT)), ','
                ORDER BY concat(l_partkey, ':', CAST(l_quantity AS BIGINT)))) AS sig_hash
  FROM lineitem GROUP BY l_orderkey
)
SELECT sig_hash, CAST(count(*) AS BIGINT) AS n_orders, min(l_orderkey) AS first_orderkey
FROM sig GROUP BY sig_hash
""",
    doc="H4 reaction-hash dedup — THE flagship domain op; ref: parse.py::hash_reaction "
    "(md5 over sorted 'met:stoich' pairs) + match-existing-by-hash in model_loading "
    "[P]. Order = reaction, lineitem = stoichiometry triple. sha2(sorted signature) "
    "then group-by-hash; two aggregations, both map-side combinable.",
)
def hash_reaction_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pair = F.concat_ws(":", F.col("l_partkey"), F.col("l_quantity").cast("long"))
    sig = li.groupBy("l_orderkey").agg(
        F.sha2(F.concat_ws(",", F.array_sort(F.collect_list(pair))), 256).alias("sig_hash")
    )
    return sig.groupBy("sig_hash").agg(
        F.count("*").alias("n_orders"), F.min("l_orderkey").alias("first_orderkey")
    )


@register(
    "date_parts_trunc",
    oracle="""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS BIGINT) AS y,
       CAST(month(o_orderdate) AS BIGINT) AS m,
       CAST(isodow(o_orderdate) AS BIGINT) AS iso_dow,
       CAST(date_trunc('week', o_orderdate) AS TIMESTAMP) AS week_start,
       date_diff('day', TIMESTAMP '1970-01-01', o_orderdate) AS days_since_epoch,
       CAST(last_day(o_orderdate) AS TIMESTAMP) AS month_end
FROM orders
""",
    doc="H5 date parts/truncation; ref: load timestamps and database_version dates [P]. "
    "ISO day-of-week (Spark weekday()+1 == DuckDB isodow) avoids the engines' "
    "different Sunday conventions.",
)
def date_parts_trunc(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).cast("long").alias("y"),
        F.month(d).cast("long").alias("m"),
        (F.weekday(d) + 1).cast("long").alias("iso_dow"),
        F.date_trunc("week", d).alias("week_start"),
        F.datediff(d, F.lit("1970-01-01").cast("date")).cast("long").alias("days_since_epoch"),
        F.last_day(d).cast("timestamp_ntz").alias("month_end"),
    )


@register(
    "math_suite",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CAST(floor(l_extendedprice * 0.1) AS BIGINT) AS tenth_floor,
       CAST(ceil(l_extendedprice * 0.1) AS BIGINT) AS tenth_ceil,
       round(l_quantity / 7.0, 3) AS seventh,
       abs(l_discount - 0.05) AS disc_dev,
       CAST(sign(l_quantity - 25.0) AS DOUBLE) AS over25,
       greatest(l_tax, l_discount) AS rate_max,
       least(l_tax, l_discount) AS rate_min,
       round(ln(l_extendedprice), 6) AS ln_price,
       round(exp(l_discount), 6) AS exp_disc,
       l_quantity / nullif(CAST(l_linenumber - 1 AS DOUBLE), 0.0) AS per_prev_line
FROM lineitem
""",
    doc="H6 arithmetic suite; ref: stoichiometry/bounds arithmetic in loaders [P]. "
    "try_divide == x / nullif(y, 0) under non-ANSI semantics.",
)
def math_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        # NOTE round(price*0.1, 2) is deliberately absent: 2-decimal prices
        # x 0.1 land exactly on .xx5 ties, where Spark (exact-binary
        # HALF_UP) and DuckDB (shortest-repr) disagree. floor/ceil of the
        # same IEEE double are deterministic; /7 never terminates on a tie.
        F.floor(F.col("l_extendedprice") * 0.1).alias("tenth_floor"),
        F.ceil(F.col("l_extendedprice") * 0.1).alias("tenth_ceil"),
        F.round(F.col("l_quantity") / 7.0, 3).alias("seventh"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.signum(F.col("l_quantity") - 25.0).alias("over25"),
        F.greatest("l_tax", "l_discount").alias("rate_max"),
        F.least("l_tax", "l_discount").alias("rate_min"),
        F.round(F.log(F.col("l_extendedprice")), 6).alias("ln_price"),
        F.round(F.exp("l_discount"), 6).alias("exp_disc"),
        F.try_divide(F.col("l_quantity"), (F.col("l_linenumber") - 1).cast("double")).alias(
            "per_prev_line"
        ),
    )


@register(
    "array_ops",
    oracle="""
SELECT l_orderkey,
       CAST(len(list_sort(list(l_partkey))) AS BIGINT) AS n_parts,
       array_to_string(list_sort(list(l_partkey))[1:3], ',') AS first3,
       CAST(len(list_distinct(list(l_partkey))) AS BIGINT) AS n_uniq
FROM lineitem GROUP BY l_orderkey
""",
    doc="H7 array manipulation; the stoichiometry-as-array form (SURVEY §1.2): "
    "collect -> sort -> slice/distinct. Arrays always array_sort'ed before "
    "comparison (determinism, SURVEY §5.2). first3 is projected as a ','-joined "
    "string: the driver's pandas canonicalizer cannot hash array cells (r3 ERR).",
)
def array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    arr = F.array_sort(F.collect_list("l_partkey"))
    return li.groupBy("l_orderkey").agg(
        F.size(arr).cast("long").alias("n_parts"),
        F.concat_ws(",", F.slice(arr, 1, 3).cast("array<string>")).alias("first3"),
        F.size(F.array_distinct(arr)).cast("long").alias("n_uniq"),
    )


@register(
    "array_higher_order",
    oracle="""
SELECT vec_id,
       CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
       round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 6)
         AS sumsq,
       (len(list_filter(embedding, x -> x > 2.0)) > 0) AS any_big,
       (len(list_filter(embedding, x -> abs(x) >= 10.0)) = 0) AS all_small
FROM embeddings
""",
    doc="H8 higher-order array functions; ref: GPR rule evaluation (OR-of-ANDs over "
    "gene presence, gene_reaction_rule) [P]. transform/filter/exists/forall/aggregate "
    "run inside codegen — this is how per-vector math stays off the Python path.",
)
def array_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    dbl = lambda x: x.cast("double")  # noqa: E731
    return e.select(
        "vec_id",
        F.size(F.filter(emb, lambda x: x > 0)).cast("long").alias("n_pos"),
        F.round(
            F.aggregate(emb, F.lit(0.0), lambda acc, x: acc + dbl(x) * dbl(x)), 6
        ).alias("sumsq"),
        F.exists(emb, lambda x: x > 2.0).alias("any_big"),
        F.forall(emb, lambda x: F.abs(x) < 10.0).alias("all_small"),
    )


@register(
    "map_ops",
    oracle="""
WITH pq AS (
  SELECT l_orderkey, l_partkey, sum(l_quantity) AS q
  FROM lineitem GROUP BY l_orderkey, l_partkey
)
SELECT l_orderkey,
       CAST(count(*) AS BIGINT) AS n_keys,
       min(l_partkey) AS min_key,
       arg_min(q, l_partkey) AS qty_of_min_key
FROM pq GROUP BY l_orderkey
""",
    doc="H9 map construction/access: per-order partkey->qty map (props/attrs pattern); "
    "map_from_entries + map_keys + element_at. Oracle states the same facts "
    "relationally (DuckDB map literals differ).",
)
def map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pq = li.groupBy("l_orderkey", "l_partkey").agg(F.sum("l_quantity").alias("q"))
    m = F.map_from_entries(F.collect_list(F.struct("l_partkey", "q")))
    per_order = pq.groupBy("l_orderkey").agg(m.alias("m"))
    min_key = F.array_min(F.map_keys("m"))
    return per_order.select(
        "l_orderkey",
        F.size(F.map_keys("m")).cast("long").alias("n_keys"),
        min_key.alias("min_key"),
        F.element_at("m", min_key).alias("qty_of_min_key"),
    )


@register(
    "json_extract_nested",
    oracle="""
SELECT event_id,
       json_extract_string(props, '$.k') AS k_str,
       CAST(json_extract_string(props, '$.k') AS BIGINT) + 1 AS k_plus
FROM events
""",
    doc="H10 JSON path extraction; ref: Escher map_data JSON blobs [P]. "
    "get_json_object (string path) + from_json struct field access.",
)
def json_extract_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        (F.from_json("props", "k LONG").getField("k") + 1).alias("k_plus"),
    )


@register(
    "conditional_null",
    oracle="""
SELECT o_orderkey,
       nullif(o_orderstatus, 'O') AS status_or_null,
       coalesce(nullif(o_orderstatus, 'O'), nullif(o_orderpriority, '1-URGENT'), 'fallback')
         AS first_non_null,
       CASE WHEN nullif(o_orderstatus, 'O') IS NOT NULL THEN 'closed' ELSE 'open' END
         AS nvl2_style,
       CASE WHEN isnan(CASE WHEN o_totalprice < 100000 THEN CAST('NaN' AS DOUBLE)
                            ELSE o_totalprice END)
            THEN -1.0
            ELSE o_totalprice END AS nan_guarded
FROM orders
""",
    doc="H11 null/NaN fallback chains; ref: formula/charge fallback across models [P]. "
    "coalesce/nullif/nvl2/nanvl.",
)
def conditional_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    status_or_null = F.nullif("o_orderstatus", F.lit("O"))
    nan_val = F.when(
        F.col("o_totalprice") < 100000, F.lit("NaN").cast("double")
    ).otherwise(F.col("o_totalprice"))
    return o.select(
        "o_orderkey",
        status_or_null.alias("status_or_null"),
        F.coalesce(
            status_or_null, F.nullif("o_orderpriority", F.lit("1-URGENT")), F.lit("fallback")
        ).alias("first_non_null"),
        F.nvl2(status_or_null, F.lit("closed"), F.lit("open")).alias("nvl2_style"),
        F.nanvl(nan_val, F.lit(-1.0)).alias("nan_guarded"),
    )


@register(
    "date_months_between",
    oracle="""
SELECT o_orderkey,
       round(
         (1998 - year(o_orderdate)) * 12 + (1 - month(o_orderdate))
         + CASE WHEN day(o_orderdate) = 1 THEN 0.0
                ELSE (1 - day(o_orderdate)) / 31.0 END,
         6) AS months_to_1998
FROM orders
""",
    doc="H5b months_between, hash-checked by replicating Spark's documented "
    "semantics in SQL: whole calendar months plus a (day1-day2)/31 fraction, "
    "integer when the days-of-month match.  The general rule also covers "
    "time-of-day and both-last-day cases; neither arises here (orderdates "
    "are midnight, the reference day is the 1st), so the oracle's two-branch "
    "CASE is the complete semantics for this data.",
)
def date_months_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.round(
            F.months_between(F.lit("1998-01-01").cast("timestamp"), F.col("o_orderdate")), 6
        ).alias("months_to_1998"),
    )


@register(
    "date_month_diff_exact",
    oracle="""
SELECT o_orderkey,
       (1998 - year(o_orderdate)) * 12 + (1 - month(o_orderdate)) AS month_diff,
       CAST(date_diff('day', o_orderdate, TIMESTAMP '1998-01-01') AS BIGINT) AS day_diff,
       CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end
FROM orders
""",
    doc="H5 closure, exact half: calendar month delta as the explicit integer "
    "formula (identical in every engine, unlike months_between's fractional "
    "31-day base — that variant stays rows-only as date_months_between), plus "
    "day datediff and month-end. All narrow expressions — codegen'd, no shuffle.",
)
def date_month_diff_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    ref_year = F.lit(1998)
    return o.select(
        "o_orderkey",
        ((ref_year - F.year("o_orderdate")) * 12 + (F.lit(1) - F.month("o_orderdate"))).alias(
            "month_diff"
        ),
        F.datediff(F.lit("1998-01-01").cast("date"), F.col("o_orderdate")).cast("long").alias(
            "day_diff"
        ),
        F.last_day("o_orderdate").cast("timestamp").alias("month_end"),
    )


@register(
    "math_bround",
    oracle="""
SELECT l_orderkey, l_linenumber,
       round_even(l_quantity / 2, 0) AS half_even0,
       round_even(l_quantity / 4, 1) AS quarter_even1
FROM lineitem
""",
    doc="H6 closure: banker's rounding (Spark bround == DuckDB round_even). "
    "Tie inputs are halves/quarters of integer quantities — exactly "
    "representable in binary, so both engines see a TRUE tie and break it "
    "to the even digit identically. (bround on arbitrary decimal doubles "
    "is NOT cross-engine stable: Spark goes through the shortest decimal "
    "string, DuckDB rounds the raw binary — same pitfall as round(); "
    "only exact-binary ties are safely oracle-able.)",
)
def math_bround(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.bround(F.col("l_quantity") / 2, 0).alias("half_even0"),
        F.bround(F.col("l_quantity") / 4, 1).alias("quarter_even1"),
    )


@register(
    "str_regexp_extract_all",
    oracle="""
SELECT event_id,
       array_to_string(regexp_extract_all(props, '[0-9]+'), ',') AS nums,
       CAST(len(regexp_extract_all(props, '[0-9]+')) AS BIGINT) AS n_nums
FROM events
""",
    doc="H-ext regexp_extract_all: every digit run in the raw JSON payload "
    "joined with ',', plus the count — the tokenizer-ish primitive PII "
    "redaction and log parsing share. Pure codegen. The driver-facing "
    "projection is a delimited string (digit runs cannot contain ','): "
    "the driver's canonicalizer cannot hash array cells.",
)
def str_regexp_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    nums = F.regexp_extract_all(F.col("props"), F.lit(r"[0-9]+"), 0)
    return e.select(
        "event_id",
        F.concat_ws(",", nums).alias("nums"),
        F.size(nums).cast("long").alias("n_nums"),
    )


@register(
    "json_variant_typed",
    oracle="""
SELECT CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) // 10 AS BIGINT)
         AS k_decade,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(value), 6) AS total_value
FROM events
GROUP BY 1
""",
    doc="Semi-structured analytics over Spark 4's VARIANT type: "
    "parse_json(props) produces a binary variant column (parsed ONCE, "
    "typed access without re-tokenizing the JSON string per path — the "
    "at-scale advantage over get_json_object, which re-parses on every "
    "extraction), then variant_get('$.k', 'bigint') pulls a typed path "
    "for the rollup key. DuckDB oracles the same aggregation through "
    "its JSON extension. Everything stays in codegen; the agg is "
    "partial+final on the extracted key.",
)
def json_variant_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cobradb_spark.io import load_events

    e = load_events(spark, sf_dir)
    v = F.parse_json("props")
    k = F.try_variant_get(v, "$.k", "bigint")
    return (
        e.select(F.floor(k / 10).cast("long").alias("k_decade"), "value")
        .groupBy("k_decade")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("total_value"))
    )


@register(
    "scalars_try_safe",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CASE WHEN l_linenumber - 1 = 0 THEN NULL
            ELSE round(l_extendedprice / (l_linenumber - 1), 6) END
         AS price_per_prev_line,
       TRY_CAST(CASE WHEN l_linenumber % 2 = 0
                     THEN CAST(CAST(l_quantity AS BIGINT) AS VARCHAR)
                     ELSE 'n/a' END AS BIGINT) AS qty_parsed,
       CASE WHEN l_linenumber % 3 = 0 THEN NULL
            ELSE CAST(l_partkey * 2 AS BIGINT) END AS guarded_double
FROM lineitem
""",
    doc="Error-safe evaluation with the try_* family: try_divide returns "
    "NULL on zero denominators instead of failing the job (under ANSI "
    "mode a single bad row would otherwise kill a 100 TB pass), "
    "try_cast turns unparseable strings into NULLs, and a CASE-guarded "
    "arithmetic shows the equivalent manual guard. The oracle encodes "
    "the identical NULL-on-error semantics in portable CASE/TRY_CAST "
    "SQL. At scale this is the difference between quarantining bad "
    "records and re-running a day of compute.",
)
def scalars_try_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(
            F.try_divide(F.col("l_extendedprice"), F.col("l_linenumber") - 1), 6
        ).alias("price_per_prev_line"),
        F.expr(
            "try_cast(CASE WHEN l_linenumber % 2 = 0 "
            "THEN CAST(CAST(l_quantity AS BIGINT) AS STRING) "
            "ELSE 'n/a' END AS BIGINT)"
        ).alias("qty_parsed"),
        F.when(F.col("l_linenumber") % 3 == 0, F.lit(None))
        .otherwise((F.col("l_partkey") * 2).cast("long"))
        .alias("guarded_double"),
    )
