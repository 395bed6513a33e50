"""Scalar-function pack (SURVEY §2.8): regex, string predicates, arrays,
timestamps, JSON, CASE WHEN classification.

q03_regexp_extract       X4: regexp_extract / rlike (the lua-config path
                         extraction pattern, cli.py:69-95)
q11_array_slice          O3/X10/X14: split → slice/element_at/
                         array_position/least clamp (candidate-list ops,
                         lua:188-251)
q11_explode_tokens       §2.12: explode as the engine's table-generating
                         primitive (candidates array → rows)
q12_string_predicates    X5/X6/X7: contains/startswith/trim/substring/
                         regexp_replace (cli.py:128-209 line munging)
q13_ts_parse_bucket      X8 + T6 extension: timestamp truncation rollup
q14_json_extract         X9/X11: JSON payload extraction + int cast
q15_case_when_classify   X12/X13: selection_method / event_subtype
                         derivation as CASE WHEN chains (lua:254-262,
                         325-339)
q63_variant_extract      X9 modern path: VARIANT parse-once typed
                         access (Spark 4) — one decode per payload vs
                         one parse per extracted path

All expressions are built-in JVM functions inside whole-stage codegen —
no Python on the hot path. Shuffles only where a groupBy requires one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.stable import dsum, dsum_expr
from ..sources.readers import load_table
from .events_model import RANK_SQL, with_rank


def q03_regexp_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First word + digit detection per document (X4)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.regexp_extract("text", r"^([a-z]+)", 1).alias("first_word"),
        F.regexp_extract("text", r"([a-z]+)\s+(join|scan)", 2).alias("op_word"),
        F.col("text").rlike(r"[0-9]").alias("has_digit"),
    )


def q11_array_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-list array ops mapped onto tokenized document text:
    head element (lua:273), display truncation to 5 (lua:188, 202-211),
    position lookup (lua:231-239), min/max clamp (lua:202, 316)."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.element_at(words, 1).alias("first_token"),
        F.size(words).alias("n_tokens"),
        F.concat_ws(" ", F.slice(words, 1, 5)).alias("head5"),
        F.array_position(words, "join").cast("bigint").alias("join_pos"),
        F.least(F.size(words), F.lit(5)).alias("display_limit"),
        F.greatest(F.size(words) - 1, F.lit(0)).alias("page_clamp"),
    )


def q11_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explode tokens → global token frequencies (the engine's only
    table-generating need, SURVEY §2.12)."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
    return tok.groupBy("token").agg(F.count(F.lit(1)).alias("n"))


def q12_string_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.col("text").contains("spark").alias("mentions_spark"),
        F.col("text").startswith("the").alias("starts_the"),
        F.trim(F.substring("text", 1, 12)).alias("head12"),
        F.regexp_replace(F.substring("text", 1, 20), " ", "_").alias("snake20"),
        F.length("text").alias("text_len"),
        F.upper(F.substring("source", 1, 4)).alias("src_upper"),
    )


def q13_ts_parse_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly rollup of the event stream (timestamp truncation; the
    windowed-aggregation extension the reference lacks, SURVEY T6)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).cast("timestamp_ntz").alias("bucket_hour")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", scale=2).alias("sum_value"),
        )
    )


def q14_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extract int payload field from the JSON props column (X9) and
    roll up by its decile bucket (X11 int parse)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        ev.select((k % 10).alias("k_bucket"), k.alias("k"))
        .groupBy("k_bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


def q15_case_when_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive the reference's enums from raw fields (lua:254-262 for
    selection_method; lua:325-339 for event_subtype) as CASE WHEN
    chains, then count combinations."""
    ev = with_rank(load_table(spark, sf_dir, "events"))
    method = (
        F.when(F.col("rank") == -1, "direct_commit_no_menu")
        .when(F.col("rank") == 0, "first_choice_space")
        .when(F.col("rank") < 6, "nth_choice_space")
        .otherwise("nth_choice_number")
    )
    subtype = (
        F.when(F.col("event_type") == "click", "menu_navigation")
        .when(F.col("event_type") == "error", "input_rejected")
        .when(F.col("event_type") == "signup", "manual_segmentation")
        .when(F.col("event_type") == "view", "buffer_edit")
        .otherwise("other_key")
    )
    return (
        ev.select(method.alias("selection_method"), subtype.alias("event_subtype"))
        .groupBy("selection_method", "event_subtype")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q63_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X9 on the modern path: semi-structured props via the VARIANT
    type (Spark 4) instead of per-path string parsing.

    ``parse_json`` decodes each payload ONCE into a binary columnar
    variant; ``variant_get`` then does typed path access without
    re-parsing — at 100 TB this beats N × get_json_object (N string
    parses per row) and survives schema drift (missing path → NULL,
    mirrored by try_variant_get semantics). Output is engine-neutral
    (plain bigints) so DuckDB's JSON reader can replay it.
    """
    ev = load_table(spark, sf_dir, "events")
    k = F.expr("cast(variant_get(parse_json(props), '$.k') as bigint)")
    missing = F.expr(
        "cast(variant_get(parse_json(props), '$.absent') as bigint)"
    )
    return (
        ev.select("event_type", k.alias("k"), missing.alias("absent"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
            F.sum(F.when(F.col("absent").isNull(), 1).otherwise(0)).alias(
                "n_missing_path"
            ),
        )
    )


QUERIES = {
    "q03_regexp_extract": q03_regexp_extract,
    "q11_array_slice": q11_array_slice,
    "q11_explode_tokens": q11_explode_tokens,
    "q12_string_predicates": q12_string_predicates,
    "q13_ts_parse_bucket": q13_ts_parse_bucket,
    "q14_json_extract": q14_json_extract,
    "q15_case_when_classify": q15_case_when_classify,
    "q63_variant_extract": q63_variant_extract,
}

ORACLE = {
    "q03_regexp_extract": r"""
        SELECT doc_id,
               regexp_extract(text, '^([a-z]+)', 1) AS first_word,
               regexp_extract(text, '([a-z]+)\s+(join|scan)', 2) AS op_word,
               regexp_matches(text, '[0-9]') AS has_digit
        FROM documents
    """,
    "q11_array_slice": """
        WITH t AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
        SELECT doc_id,
               words[1] AS first_token,
               CAST(len(words) AS INT) AS n_tokens,
               array_to_string(words[1:5], ' ') AS head5,
               CAST(COALESCE(list_position(words, 'join'), 0) AS BIGINT) AS join_pos,
               CAST(LEAST(len(words), 5) AS INT) AS display_limit,
               CAST(GREATEST(len(words) - 1, 0) AS INT) AS page_clamp
        FROM t
    """,
    "q11_explode_tokens": """
        SELECT token, COUNT(*) AS n
        FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        GROUP BY token
    """,
    "q12_string_predicates": """
        SELECT doc_id,
               contains(text, 'spark') AS mentions_spark,
               starts_with(text, 'the') AS starts_the,
               trim(substring(text, 1, 12)) AS head12,
               regexp_replace(substring(text, 1, 20), ' ', '_', 'g') AS snake20,
               CAST(length(text) AS INT) AS text_len,
               upper(substring(source, 1, 4)) AS src_upper
        FROM documents
    """,
    "q13_ts_parse_bucket": f"""
        SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket_hour,
               COUNT(*) AS n_events,
               {dsum_expr("value", scale=2)} AS sum_value
        FROM events GROUP BY 1
    """,
    "q14_json_extract": """
        WITH t AS (
          SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events
        )
        SELECT k % 10 AS k_bucket, COUNT(*) AS n,
               CAST(SUM(k) AS BIGINT) AS sum_k,
               MIN(k) AS min_k, MAX(k) AS max_k
        FROM t GROUP BY 1
    """,
    "q63_variant_extract": """
        WITH t AS (
          SELECT event_type,
                 CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
                 CAST(json_extract_string(props, '$.absent') AS BIGINT) AS absent
          FROM events
        )
        SELECT event_type, COUNT(*) AS n,
               CAST(SUM(k) AS BIGINT) AS sum_k,
               MAX(k) AS max_k,
               CAST(SUM(CASE WHEN absent IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_missing_path
        FROM t GROUP BY event_type
    """,
    "q15_case_when_classify": f"""
        WITH t AS (SELECT {RANK_SQL} AS rank, event_type FROM events)
        SELECT
          CASE WHEN rank = -1 THEN 'direct_commit_no_menu'
               WHEN rank = 0 THEN 'first_choice_space'
               WHEN rank < 6 THEN 'nth_choice_space'
               ELSE 'nth_choice_number' END AS selection_method,
          CASE event_type WHEN 'click' THEN 'menu_navigation'
               WHEN 'error' THEN 'input_rejected'
               WHEN 'signup' THEN 'manual_segmentation'
               WHEN 'view' THEN 'buffer_edit'
               ELSE 'other_key' END AS event_subtype,
          COUNT(*) AS n
        FROM t GROUP BY 1, 2
    """,
}
