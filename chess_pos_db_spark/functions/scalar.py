"""Scalar function suites (SURVEY.md §2.8, F4–F13 generic parts).

The reference's scalar layer is chess-specific C++ (FEN/SAN parsing,
Zobrist keys, 27-bit packed reverse moves, partial PGN dates, JSON
protocol encode/decode). Each suite below exercises the generic Spark
primitive that the chess layer builds on: bit packing → shiftleft/&/|,
position hashing → md5/sha2/xxhash64, JSON protocol → from_json,
date handling → year/month/datediff/date_trunc, response assembly →
array/map construction.

All expressions are built-ins (JVM-side, whole-stage-codegen'd) — no
Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import register
from ..tables import t


# F2/F13-adjacent — basic string ops (substr/instr/translate/case/trim).
@register(
    "str_basic_suite",
    oracle="""
SELECT c_custkey,
       UPPER(c_name)                       AS name_upper,
       LOWER(c_mktsegment)                 AS seg_lower,
       SUBSTR(c_name, 1, 8)                AS name_prefix,
       CAST(LENGTH(c_name) AS INT)         AS name_len,
       CAST(INSTR(c_name, '0') AS INT)     AS zero_pos,
       TRANSLATE(c_mktsegment, 'AEIOU', 'aeiou') AS seg_translated,
       TRIM(CONCAT('  ', c_name, '  '))    AS name_trimmed
FROM customer
""",
)
def str_basic_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").cast("int").alias("name_len"),
        F.instr(F.col("c_name"), "0").cast("int").alias("zero_pos"),
        F.translate(F.col("c_mktsegment"), "AEIOU", "aeiou").alias("seg_translated"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit("  "))).alias(
            "name_trimmed"
        ),
    )


# F1-adjacent — regexp suite (FEN/SAN parsing maps to regexp_extract over
# structured text; duckdb regexp_replace needs the 'g' flag to match
# Spark's replace-all semantics).
@register(
    "str_regexp_suite",
    oracle="""
SELECT p_partkey,
       REGEXP_EXTRACT(p_type, '([A-Z]+)$', 1)            AS type_last_word,
       REGEXP_REPLACE(p_name, '[aeiou]', '_', 'g')       AS name_devoweled,
       REGEXP_MATCHES(p_name, '^p')                      AS starts_with_p,
       REGEXP_EXTRACT(p_brand, '([0-9]+)', 1)            AS brand_num
FROM part
""",
)
def str_regexp_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_type", "([A-Z]+)$", 1).alias("type_last_word"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("name_devoweled"),
        F.col("p_name").rlike("^p").alias("starts_with_p"),
        F.regexp_extract("p_brand", "([0-9]+)", 1).alias("brand_num"),
    )


# F13 — string formatting (FEN/EPD/PGN emit: zero-padding, concat).
@register(
    "str_format",
    oracle="""
SELECT s_suppkey,
       CONCAT_WS('|', s_name, CAST(s_nationkey AS VARCHAR)) AS joined,
       LPAD(CAST(s_suppkey AS VARCHAR), 8, '0')             AS padded_key,
       PRINTF('%s#%04d', s_name, s_suppkey)                 AS formatted,
       REPEAT('-', 5)                                       AS rule,
       REVERSE(s_name)                                      AS name_rev
FROM supplier
""",
)
def str_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = t(spark, sf_dir, "supplier")
    return s.select(
        "s_suppkey",
        F.concat_ws("|", "s_name", F.col("s_nationkey").cast("string")).alias(
            "joined"
        ),
        F.lpad(F.col("s_suppkey").cast("string"), 8, "0").alias("padded_key"),
        F.format_string("%s#%04d", F.col("s_name"), F.col("s_suppkey")).alias(
            "formatted"
        ),
        F.repeat(F.lit("-"), 5).alias("rule"),
        F.reverse(F.col("s_name")).alias("name_rev"),
    )


# F7 — date/time suite (partial PGN dates → nullable y/m/d extraction; here
# the generic extraction/truncation/arithmetic surface over timestamps).
@register(
    "date_suite",
    oracle="""
SELECT o_orderkey,
       CAST(YEAR(o_orderdate) AS INT)   AS yr,
       CAST(MONTH(o_orderdate) AS INT)  AS mo,
       CAST(DAY(o_orderdate) AS INT)    AS dy,
       CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS month_start,
       CAST(DATE_DIFF('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INT)
                                        AS days_to_2002,
       CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus3mo,
       LAST_DAY(CAST(o_orderdate AS DATE))          AS month_end
FROM orders
""",
)
def date_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dy"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate")).alias(
            "days_to_2002"
        ),
        F.add_months("o_orderdate", 3).alias("plus3mo"),
        F.last_day("o_orderdate").alias("month_end"),
    )


# F9 — math suite (Elo arithmetic generalized). Transcendentals rounded:
# JVM Math vs C libm may differ in the last ULP.
@register(
    "math_suite",
    oracle="""
SELECT l_orderkey, l_linenumber,
       ROUND(l_extendedprice / 7, 4)                 AS price_div7,
       ABS(l_discount - 0.05)                        AS disc_dev,
       CAST(CEIL(l_quantity / 7.0) AS BIGINT)        AS qty_ceil7,
       CAST(FLOOR(l_extendedprice / 1000) AS BIGINT) AS price_kbucket,
       CAST(l_orderkey % 97 AS BIGINT)               AS key_mod,
       ROUND(SQRT(l_extendedprice), 6)               AS price_sqrt,
       ROUND(LN(l_extendedprice + 1), 6)             AS price_ln,
       ROUND(POW(l_discount, 2), 8)                  AS disc_sq
FROM lineitem
""",
)
def math_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") / 7, 4).alias("price_div7"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil(F.col("l_quantity") / 7.0).alias("qty_ceil7"),
        F.floor(F.col("l_extendedprice") / 1000).alias("price_kbucket"),
        (F.col("l_orderkey") % 97).alias("key_mod"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
        F.round(F.pow("l_discount", F.lit(2)), 8).alias("disc_sq"),
    )


# F6 — bit ops (packed reverse move: ~27 bits of from/to/promotion packed
# with shifts and masks; PackedReverseMove in the reference formats).
@register(
    "math_bitops",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CAST(l_linenumber AS BIGINT) << 6
         | (CAST(l_orderkey AS BIGINT) & 63)          AS packed,
       (CAST(l_orderkey AS BIGINT) >> 3) & 1023       AS key_midbits,
       XOR(CAST(l_orderkey AS BIGINT), CAST(l_partkey AS BIGINT)) AS key_xor,
       CAST(l_orderkey AS BIGINT) | 128               AS key_or,
       CAST(l_orderkey AS BIGINT) & CAST(l_suppkey AS BIGINT)     AS key_and
FROM lineitem
""",
)
def math_bitops(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    okey = F.col("l_orderkey").cast("bigint")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.shiftleft(F.col("l_linenumber").cast("bigint"), 6)
        .bitwiseOR(okey.bitwiseAND(F.lit(63)))
        .alias("packed"),
        (F.shiftright(okey, 3).bitwiseAND(F.lit(1023))).alias("key_midbits"),
        okey.bitwiseXOR(F.col("l_partkey").cast("bigint")).alias("key_xor"),
        okey.bitwiseOR(F.lit(128)).alias("key_or"),
        okey.bitwiseAND(F.col("l_suppkey").cast("bigint")).alias("key_and"),
    )


# F4 — hash keys (Zobrist position keys generalized; md5/sha256 are
# cross-engine reproducible, xxhash64 is Spark-native → rows-only below).
@register(
    "hash_keys",
    oracle="""
SELECT c_custkey,
       MD5(c_name)    AS key_md5,
       SHA256(c_name) AS key_sha256
FROM customer
""",
)
def hash_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.md5("c_name").alias("key_md5"),
        F.sha2(F.col("c_name"), 256).alias("key_sha256"),
    )


@register("hash_keys_native")  # rows-only: xxhash64/murmur are Spark-specific
def hash_keys_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.xxhash64("c_name").alias("key_xx64"),
        F.hash("c_name").alias("key_murmur"),
        F.crc32(F.col("c_name").cast("binary")).alias("key_crc32"),
    )


# F5 — binary encode/decode (24-byte CompressedPosition generalized to
# the binary/base64/hex surface).
@register(
    "binary_suite",
    oracle="""
SELECT c_custkey,
       TO_BASE64(ENCODE(c_name))       AS name_b64,
       HEX(ENCODE(c_name))             AS name_hex,
       CAST(OCTET_LENGTH(ENCODE(c_name)) AS INT) AS name_bytes
FROM customer
""",
)
def binary_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    raw = F.encode(F.col("c_name"), "UTF-8")
    return c.select(
        "c_custkey",
        F.base64(raw).alias("name_b64"),
        F.hex(raw).alias("name_hex"),
        F.octet_length(F.col("c_name")).cast("int").alias("name_bytes"),
    )


# F8 — CASE WHEN bucketing (ECO opening classification A00–E99 maps to a
# broadcast lookup or CASE chain; here the CASE chain form).
@register(
    "case_when_bucketing",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_totalprice < 50000  THEN 'small'
            WHEN o_totalprice < 150000 THEN 'medium'
            WHEN o_totalprice < 300000 THEN 'large'
            ELSE 'jumbo' END AS price_bucket,
       CASE o_orderstatus WHEN 'F' THEN 'finished'
                          WHEN 'O' THEN 'open'
                          ELSE 'other' END AS status_name
FROM orders
""",
)
def case_when_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    price = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.when(price < 50000, "small")
        .when(price < 150000, "medium")
        .when(price < 300000, "large")
        .otherwise("jumbo")
        .alias("price_bucket"),
        F.when(F.col("o_orderstatus") == "F", "finished")
        .when(F.col("o_orderstatus") == "O", "open")
        .otherwise("other")
        .alias("status_name"),
    )


# F10 — JSON protocol decode (the reference's query wire format is JSON;
# from_json with an explicit schema is the Spark-side equivalent).
@register(
    "json_extract",
    oracle="""
SELECT event_id,
       CASE WHEN json_valid(props)
                 AND regexp_matches(json_extract_string(props, '$.k'),
                                    '^-?[0-9]+$')
            THEN CAST(json_extract_string(props, '$.k') AS INT) END AS k_val,
       (CASE WHEN json_valid(props)
             THEN json_extract_string(props, '$.k') END) IS NOT NULL AS has_k
FROM events
""",
)
def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$.k extraction with engine-identical semantics BY CONSTRUCTION:
    both sides extract the top-level key as a string (real JSON path
    evaluation — a raw regex over the document would match nested keys
    and miss the point), then cast ONLY integer-patterned values (the
    engines' string→int casts disagree on '1.5': Spark ANSI raises /
    try_cast nulls, DuckDB rounds). Malformed JSON and missing keys are
    NULL on both sides."""
    e = t(spark, sf_dir, "events")
    k_str = F.get_json_object(F.col("props"), "$.k")
    return e.select(
        "event_id",
        F.when(k_str.rlike("^-?[0-9]+$"), k_str.cast("int")).alias("k_val"),
        k_str.isNotNull().alias("has_k"),
    )


# F11 — array construction + higher-order functions (children arrays in the
# explorer response; collect_list order is made deterministic via
# array_sort before anything order-sensitive).  The sorted array is
# serialized with array_join so every output column is a driver-hashable
# scalar: the external gate's pandas canonicalizer sort_values all
# columns, and a top-level ARRAY column is unhashable there (the round-5
# gate recorded exactly that ``err``).  collect_list / array_sort /
# array_contains / array_min are still all exercised.
@register(
    "array_suite",
    oracle="""
SELECT l_orderkey,
       ARRAY_TO_STRING(LIST_SORT(LIST(l_linenumber)), ',') AS line_numbers,
       CAST(LEN(LIST(l_linenumber)) AS INT)        AS n_lines,
       LIST_CONTAINS(LIST(l_linenumber), 3)        AS has_line3,
       CAST(LIST_SORT(LIST(l_linenumber))[1] AS INT) AS first_line
FROM lineitem
GROUP BY l_orderkey
""",
)
def array_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_orderkey").agg(
        F.array_join(
            F.array_sort(F.collect_list("l_linenumber")), ","
        ).alias("line_numbers"),
        F.count("*").cast("int").alias("n_lines"),
        F.array_contains(F.collect_list("l_linenumber"), 3).alias("has_line3"),
        F.array_min(F.collect_list("l_linenumber")).alias("first_line"),
    )


# F12 — map/struct construction (the (level→result→stats) nested grids in
# the JSON response), exploded back to rows so the oracle stays relational.
@register(
    "map_struct_suite",
    oracle="""
SELECT l_returnflag AS grid_key, CAST(COUNT(*) AS BIGINT) AS grid_value
FROM lineitem
GROUP BY l_returnflag
""",
)
def map_struct_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_returnflag").agg(F.count("*").alias("cnt"))
    # Build the response-shaped map, then explode back to rows: proves
    # map_from_entries / collect_list / explode compose losslessly.
    grid = counts.agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("l_returnflag"), F.col("cnt")))
        ).alias("grid")
    )
    return grid.select(F.explode("grid").alias("grid_key", "grid_value"))


# F11b — positional explode (ordinal-preserving child expansion: the
# ply index of the game→positions walk survives the explode).
@register(
    "array_posexplode",
    oracle="""
SELECT doc_id,
       CAST(unnest(generate_series(0, len(string_split(text, ' ')) - 1)) AS INTEGER) AS pos,
       unnest(string_split(text, ' ')) AS token
FROM documents
""",
)
def array_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token")
    )
