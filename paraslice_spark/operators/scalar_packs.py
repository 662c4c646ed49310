"""Scalar function packs (SURVEY §2.9): F1-F7.

One declared query per function family; each output column exercises one
function so the oracle hash covers the whole family. Cross-engine notes
(SURVEY §5.3) are inline per column — this file is where engine divergences
live, so every column states its DuckDB twin.

Integer-width rule: DuckDB scalar functions return BIGINT where Spark
returns INT; Spark side casts to long so pandas dtypes agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from paraslice_spark.functions.canon import rnd
from paraslice_spark.registry import query
from paraslice_spark.sources.io import load_tables


@query(
    "scalar_string_pack",
    oracle=r"""
    SELECT p_partkey,
           concat(p_brand, '-', p_type)                   AS brand_type,
           substring(p_name, 1, 5)                        AS name5,
           upper(p_type)                                  AS type_up,
           lower(p_brand)                                 AS brand_lo,
           trim(concat(' ', p_name, ' '))                 AS name_trim,
           CAST(length(p_name) AS BIGINT)                 AS name_len,
           lpad(CAST(p_size AS VARCHAR), 4, '0')          AS size_pad,
           string_split(p_name, ' ')[1]                   AS first_word,
           regexp_extract(p_name, '(\w+)$', 1)            AS last_word,
           regexp_replace(p_name, '[aeiou]', '*', 'g')    AS vowels_masked,
           replace(p_type, 'A', '@')                      AS type_repl,
           CAST(strpos(p_name, 'o') AS BIGINT)            AS o_pos,
           left(p_name, 3)                                AS name_l3,
           right(p_name, 3)                               AS name_r3
    FROM part
    """,
)
def scalar_string_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1: string family. Divergences handled: split↔string_split,
    instr↔strpos, Spark regexp_replace is global (DuckDB needs 'g')."""
    p = load_tables(spark, sf_dir)["part"]
    return p.select(
        "p_partkey",
        F.concat(F.col("p_brand"), F.lit("-"), F.col("p_type")).alias("brand_type"),
        F.substring("p_name", 1, 5).alias("name5"),
        F.upper("p_type").alias("type_up"),
        F.lower("p_brand").alias("brand_lo"),
        F.trim(F.concat(F.lit(" "), F.col("p_name"), F.lit(" "))).alias("name_trim"),
        F.length("p_name").cast("long").alias("name_len"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
        F.element_at(F.split("p_name", " "), 1).alias("first_word"),
        F.regexp_extract("p_name", r"(\w+)$", 1).alias("last_word"),
        F.regexp_replace("p_name", "[aeiou]", "*").alias("vowels_masked"),
        F.expr("replace(p_type, 'A', '@')").alias("type_repl"),
        F.instr("p_name", "o").cast("long").alias("o_pos"),
        F.expr("left(p_name, 3)").alias("name_l3"),
        F.expr("right(p_name, 3)").alias("name_r3"),
    )


@query(
    "scalar_datetime_pack",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT)                          AS yr,
           CAST(month(o_orderdate) AS BIGINT)                         AS mo,
           CAST(dayofmonth(o_orderdate) AS BIGINT)                    AS dom,
           CAST(dayofweek(o_orderdate) AS BIGINT)                     AS dow0,
           date_trunc('month', o_orderdate)                           AS month_start,
           CAST(date_diff('day', CAST(o_orderdate AS DATE),
                          DATE '2000-01-01') AS BIGINT)               AS days_to_y2k,
           CAST(CAST(o_orderdate AS DATE) + 30 AS TIMESTAMP)          AS plus30,
           CAST(epoch(o_orderdate) AS BIGINT)                         AS unix_sec,
           CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP)               AS odate,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP)     AS month_end,
           (2000 - CAST(year(o_orderdate) AS BIGINT)) * 12
             + (1 - CAST(month(o_orderdate) AS BIGINT))               AS months_to_y2k
    FROM orders
    """,
)
def scalar_datetime_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2: date/time family (session UTC both sides). Spark dayofweek is
    1=Sunday vs DuckDB dayofweek 0=Sunday -> Spark subtracts 1."""
    o = load_tables(spark, sf_dir)["orders"]
    od = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(od).cast("long").alias("yr"),
        F.month(od).cast("long").alias("mo"),
        F.dayofmonth(od).cast("long").alias("dom"),
        (F.dayofweek(od) - 1).cast("long").alias("dow0"),
        F.date_trunc("month", od).alias("month_start"),
        F.datediff(F.lit("2000-01-01").cast("date"), od.cast("date"))
        .cast("long")
        .alias("days_to_y2k"),
        # DATE outputs cast to TIMESTAMP on both sides: pandas maps DuckDB
        # DATE to midnight Timestamp but Spark DATE to datetime.date
        F.date_add(od.cast("date"), 30).cast("timestamp").alias("plus30"),
        F.unix_timestamp(od).cast("long").alias("unix_sec"),
        od.cast("date").cast("timestamp").alias("odate"),
        F.last_day(od.cast("date")).cast("timestamp").alias("month_end"),
        ((F.lit(2000) - F.year(od)) * 12 + (F.lit(1) - F.month(od)))
        .cast("long")
        .alias("months_to_y2k"),
    )


@query(
    "scalar_math_pack",
    oracle="""
    SELECT p_partkey,
           ROUND(p_retailprice / 7, 2)                      AS div_round,
           CAST(abs(p_size - 25) AS BIGINT)                 AS abs_off,
           CAST(ceil(p_retailprice / 100) AS BIGINT)        AS ceil_h,
           CAST(floor(p_retailprice / 100) AS BIGINT)       AS floor_h,
           ROUND(CAST(p_size AS DOUBLE) ^ 2, 6)             AS size_sq,
           ROUND(sqrt(CAST(p_size AS DOUBLE)), 6)           AS size_sqrt,
           ROUND(exp(p_size / 50.0), 6)                     AS size_exp,
           ROUND(ln(p_retailprice), 6)                      AS price_ln,
           ROUND(log10(p_retailprice), 6)                   AS price_log10,
           CAST(p_size % 7 AS BIGINT)                       AS size_mod,
           CAST(sign(p_size - 25) AS BIGINT)                AS size_sign,
           CAST(greatest(p_size, 25) AS BIGINT)             AS g25,
           CAST(least(p_size, 25) AS BIGINT)                AS l25
    FROM part
    """,
)
def scalar_math_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3: math family. Transcendentals (exp/ln/log10/sqrt) rounded(6) to
    absorb libm last-bit differences; pmod used with positive operands so
    Spark pmod ≡ DuckDB %."""
    p = load_tables(spark, sf_dir)["part"]
    size_d = F.col("p_size").cast("double")
    return p.select(
        "p_partkey",
        F.round(F.col("p_retailprice") / 7, 2).alias("div_round"),
        F.abs(F.col("p_size") - 25).cast("long").alias("abs_off"),
        F.ceil(F.col("p_retailprice") / 100).cast("long").alias("ceil_h"),
        F.floor(F.col("p_retailprice") / 100).cast("long").alias("floor_h"),
        rnd(F.pow(size_d, 2), 6).alias("size_sq"),
        rnd(F.sqrt(size_d), 6).alias("size_sqrt"),
        rnd(F.exp(F.col("p_size") / 50.0), 6).alias("size_exp"),
        rnd(F.log(F.col("p_retailprice")), 6).alias("price_ln"),
        rnd(F.log10("p_retailprice"), 6).alias("price_log10"),
        F.pmod(F.col("p_size"), 7).cast("long").alias("size_mod"),
        F.signum(F.col("p_size") - 25).cast("long").alias("size_sign"),
        F.greatest(F.col("p_size"), F.lit(25)).cast("long").alias("g25"),
        F.least(F.col("p_size"), F.lit(25)).cast("long").alias("l25"),
    )


@query(
    "scalar_conditional_pack",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'neg'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'high' END                                    AS bal_band,
           coalesce(NULLIF(c_mktsegment, 'BUILDING'), 'DEFAULT')   AS seg_or_default,
           ifnull(NULLIF(c_mktsegment, 'MACHINERY'), 'WAS_MACH')   AS seg_ifnull,
           CASE WHEN NULLIF(c_mktsegment, 'AUTOMOBILE') IS NOT NULL
                THEN 'other' ELSE 'auto' END                       AS seg_nvl2,
           NULLIF(c_nationkey, 0)                                  AS nation_nz
    FROM customer
    """,
)
def scalar_conditional_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4: CASE WHEN / coalesce / nullif / ifnull / nvl2 (DuckDB lacks nvl2
    -> CASE twin)."""
    c = load_tables(spark, sf_dir)["customer"]
    seg = F.col("c_mktsegment")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "neg")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
        .alias("bal_band"),
        F.coalesce(F.nullif(seg, F.lit("BUILDING")), F.lit("DEFAULT")).alias("seg_or_default"),
        F.ifnull(F.nullif(seg, F.lit("MACHINERY")), F.lit("WAS_MACH")).alias("seg_ifnull"),
        F.expr("nvl2(nullif(c_mktsegment, 'AUTOMOBILE'), 'other', 'auto')").alias("seg_nvl2"),
        F.nullif(F.col("c_nationkey"), F.lit(0)).alias("nation_nz"),
    )


def scalar_array_pack_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5 array form (internal pytest only): the genuine ``array<string>``
    outputs.  The declared twin serializes these to one string per cell
    because the driver's canonicalizer cannot hash ndarray cells — same
    split as collect_set_array / agg_collect_set."""
    d = load_tables(spark, sf_dir)["documents"]
    words = F.split("text", " ")
    return d.select(
        "doc_id",
        F.slice(words, 1, 3).alias("first3"),
        F.sort_array(F.array_distinct(words)).alias("uniq_sorted"),
    )


def scalar_json_pack_maps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6 array form (internal pytest only): genuine map_keys/map_values
    arrays — see scalar_array_pack_arrays note."""
    ev = load_tables(spark, sf_dir)["events"]
    k_int = F.get_json_object("props", "$.k").cast("int")
    m = F.map_from_arrays(F.array(F.lit("k")), F.array(k_int))
    return ev.select(
        "event_id",
        F.map_keys(m).alias("mkeys"),
        F.map_values(m).alias("mvals"),
    )


@query(
    "scalar_array_pack",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT)            AS n_words,
           string_split(text, ' ')[1]                              AS first_word,
           array_to_string(list_slice(string_split(text, ' '), 1, 3), ',')
                                                                   AS first3,
           array_to_string(list_sort(list_distinct(string_split(text, ' '))), ',')
                                                                   AS uniq_sorted,
           list_contains(string_split(text, ' '), 'query')         AS has_query,
           len(list_intersect(string_split(text, ' '),
                              ['query', 'engine'])) > 0            AS overlaps_qe
    FROM documents
    """,
)
def scalar_array_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5: array family over tokenized text (1-based element_at both sides;
    distinct is order-unstable in both engines -> always sorted after).
    Array-valued outputs are serialized to one string per cell (array_join ↔
    array_to_string) because the driver's canonicalizer cannot hash ndarray
    cells — same pattern as agg_collect_set; the genuine array forms remain
    pytest-checked via scalar_array_pack_arrays."""
    d = load_tables(spark, sf_dir)["documents"]
    words = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(words).cast("long").alias("n_words"),
        F.element_at(words, 1).alias("first_word"),
        F.array_join(F.slice(words, 1, 3), ",").alias("first3"),
        F.array_join(F.sort_array(F.array_distinct(words)), ",").alias("uniq_sorted"),
        F.array_contains(words, "query").alias("has_query"),
        F.arrays_overlap(words, F.array(F.lit("query"), F.lit("engine"))).alias("overlaps_qe"),
    )


@query(
    "scalar_json_pack",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT)  AS k_int,
           CAST(json_extract_string(props, '$.k') AS INT)  AS k_struct,
           'k'                                             AS mkeys,
           coalesce(CAST(CAST(json_extract_string(props, '$.k') AS INT)
                         AS VARCHAR), '')                  AS mvals
    FROM events
    """,
)
def scalar_json_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6: JSON + map family. get_json_object and a from_json struct read
    the same field; map built from the parsed value. map_keys/map_values
    arrays are serialized to one string per cell (array_join skips nulls,
    mirrored by the oracle's coalesce-to-'') because the driver's
    canonicalizer cannot hash ndarray cells — see scalar_array_pack."""
    ev = load_tables(spark, sf_dir)["events"]
    k_int = F.get_json_object("props", "$.k").cast("int")
    k_struct = F.from_json("props", "k INT")["k"]
    m = F.map_from_arrays(F.array(F.lit("k")), F.array(k_int))
    return ev.select(
        "event_id",
        k_int.alias("k_int"),
        k_struct.alias("k_struct"),
        F.array_join(F.map_keys(m), ",").alias("mkeys"),
        F.array_join(F.map_values(m).cast("array<string>"), ",").alias("mvals"),
    )


@query(
    "scalar_bitwise_pack",
    oracle="""
    SELECT o_orderkey,
           o_orderkey & 255                          AS low_byte,
           o_orderkey | 15                           AS or15,
           xor(o_orderkey, o_custkey)                AS key_xor,
           (o_orderkey & 1023) << 2                  AS shl2,
           o_orderkey >> 3                           AS shr3,
           CAST(bit_count(o_orderkey) AS BIGINT)     AS popcount
    FROM orders
    """,
)
def scalar_bitwise_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8: bitwise family (&, |, xor, shifts, popcount) — the substrate for
    hash-bucketing/banding tricks used by the dedup operators."""
    o = load_tables(spark, sf_dir)["orders"]
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        k.bitwiseOR(F.lit(15)).alias("or15"),
        k.bitwiseXOR(F.col("o_custkey")).alias("key_xor"),
        F.shiftleft(k.bitwiseAND(F.lit(1023)), 2).cast("long").alias("shl2"),
        F.shiftright(k, 3).cast("long").alias("shr3"),
        F.bit_count(k).cast("long").alias("popcount"),
    )


@query(
    "scalar_cast_pack",
    oracle="""
    SELECT c_custkey,
           CAST(c_custkey AS VARCHAR)                     AS key_str,
           CAST(substring(c_name, 10, 9) AS INT)          AS cust_no,
           CAST(c_nationkey AS DOUBLE)                    AS nation_dbl,
           c_acctbal > 0                                  AS in_credit,
           CAST(CAST(round(c_acctbal) AS BIGINT) AS VARCHAR) AS bal_str
    FROM customer
    """,
)
def scalar_cast_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7: cast/typing family (double→string avoided: formatting diverges
    across engines; numeric strings go through int)."""
    c = load_tables(spark, sf_dir)["customer"]
    return c.select(
        "c_custkey",
        F.col("c_custkey").cast("string").alias("key_str"),
        F.substring("c_name", 10, 9).cast("int").alias("cust_no"),
        F.col("c_nationkey").cast("double").alias("nation_dbl"),
        (F.col("c_acctbal") > 0).alias("in_credit"),
        F.round("c_acctbal").cast("long").cast("string").alias("bal_str"),
    )


@query(
    "scalar_variant_pack",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT)    AS k_var,
           CAST(json_extract_string(props, '$.k') AS DOUBLE) AS k_dbl,
           -- pinned constant: valid ONLY while the props fixture is the
           -- uniform {"k": int} shape; diversify props and this twin must
           -- become a per-row expression (VERDICT r4 hygiene note)
           'OBJECT<k: BIGINT>'                               AS vschema,
           json_extract_string(props, '$.missing') IS NULL   AS miss_is_null
    FROM events
    """,
)
def scalar_variant_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9: Spark 4 VARIANT — the modern semi-structured path next to the
    string-JSON F6 pack.  parse_json builds the binary variant once; typed
    reads via try_variant_get (int and double extractions of the same
    field), schema_of_variant, and missing-path null semantics.  At scale
    VARIANT beats get_json_object because the document parses ONCE per row
    into a binary form all extractions share — the oracle reads the same
    facts with DuckDB's JSON functions."""
    ev = load_tables(spark, sf_dir)["events"]
    v = F.parse_json("props")
    return ev.select(
        "event_id",
        F.try_variant_get(v, "$.k", "int").alias("k_var"),
        F.try_variant_get(v, "$.k", "double").alias("k_dbl"),
        F.schema_of_variant(v).alias("vschema"),
        F.try_variant_get(v, "$.missing", "string").isNull().alias("miss_is_null"),
    )
