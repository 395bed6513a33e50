"""Corpus-curation operators: the end-of-pipeline stages a training-data
run executes after dedup/similarity (north-star M8 cont.).

q57_stratified_sample  deterministic per-stratum downsampling: keep the
                       K docs with the smallest content-stable hash per
                       language — the reproducible way to rebalance
                       over-represented strata (no RNG, no seed drift)
q58_curation_funnel    the full keep/drop funnel in one pass: quality
                       gate → exact-dedup survivor election → per-source
                       stage counts (the report every curation run ships)
q59_latest_by_key      log compaction / CDC-style upsert resolution:
                       latest record per (user, event_type) by event
                       time — the "current state" materialization over
                       an append-only stream
q60_session_funnel     ordered conversion funnel: first view → first
                       click at-or-after it → first purchase at-or-after
                       that, per user; global reach counts per step

Design for 100 TB:
- q57 is one window over a (lang)-partitioned exchange; the sort key is
  md5(doc_id), so the sample is a pure function of the corpus — re-runs,
  re-partitions and cluster resizes all pick the SAME docs. At extreme
  stratum sizes, pre-filter with a hash-prefix predicate (keep only
  hashes < t where t bounds K with high probability) so the window sees
  a sliver, not the stratum.
- q58 runs in a single scan: the quality flag is a projection, the
  survivor election is one window over the fingerprint partition, the
  funnel is one hash-aggregate — no self-joins, no second scan.
- q59 is the canonical compaction shape: row_number over
  (key) ordered by (ts, id) desc, keep 1. AQE's skew-join/partition
  splitting handles hot keys; at scale this runs incrementally per
  date partition and merges against the previous compacted snapshot.
- q60 chains three conditional-min windows; each depends on the
  previous one's output so they stay separate Window execs, but all
  three (and the per-user groupBy) reuse ONE (user) exchange — the
  plan re-shuffles only for the final single-row aggregate. No joins,
  no per-step passes over the events.

All four are declared scale extensions (SURVEY §2.11b style; the
reference has no sampling/compaction/funnel surface) — oracle-paired.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..sources.readers import load_table
from .pipeline import _h32
from .textstats import STOPWORDS, _in_list, _sql_in_list

SAMPLE_K = 20
MIN_TOKENS = 5
QUALITY_FLOOR = 0.2


def q57_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep the SAMPLE_K docs with the smallest md5(doc_id) per lang."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    rk = F.row_number().over(
        W.partitionBy("lang").orderBy(h.asc(), F.col("doc_id").asc())
    )
    return (
        docs.select("doc_id", "lang", rk.alias("rk"))
        .where(F.col("rk") <= SAMPLE_K)
    )


# Quality gate — q29's score formula verbatim (same IEEE double op
# sequence in both engines, so the boolean is bit-deterministic).
_W = "split(text, ' ')"


def _quality_flag() -> F.Column:
    n_tokens = F.expr(f"size({_W})")
    stop_hits = F.expr(_in_list(_W, STOPWORDS))
    score = (
        F.least(F.lit(1.0), n_tokens / F.lit(100.0)) * F.lit(0.5)
        + (stop_hits / n_tokens) * F.lit(0.5)
    )
    return (score > QUALITY_FLOOR) & (n_tokens >= MIN_TOKENS)


def q58_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source funnel: input docs → quality-passing → kept after
    exact-dedup survivor election (smallest passing doc_id per
    fingerprint survives)."""
    docs = load_table(spark, sf_dir, "documents")
    flagged = docs.select(
        "doc_id",
        "source",
        F.md5(F.lower(F.trim("text"))).alias("fp"),
        _quality_flag().alias("q"),
    )
    survivor = F.min(F.when(F.col("q"), F.col("doc_id"))).over(
        W.partitionBy("fp")
    )
    kept = F.col("q") & (F.col("doc_id") == survivor)
    return (
        flagged.withColumn("kept", kept)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_input"),
            F.sum(F.when(F.col("q"), 1).otherwise(0)).alias("n_quality"),
            F.sum(F.when(F.col("kept"), 1).otherwise(0)).alias("n_kept"),
        )
    )


def q59_latest_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Current-state compaction: latest event per (user_id, event_type)
    by (ts, event_id) — event_id breaks ts ties, so the survivor is
    total-ordered and hash-stable."""
    ev = load_table(spark, sf_dir, "events")
    rn = F.row_number().over(
        W.partitionBy("user_id", "event_type").orderBy(
            F.col("ts").desc(), F.col("event_id").desc()
        )
    )
    return (
        ev.withColumn("rn", rn)
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("event_id").alias("last_event_id"),
            F.col("ts").alias("last_ts"),
            F.col("value").alias("last_value"),
        )
    )


def q60_session_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view → click → purchase reach counts, time-ordered within user
    (each step at-or-after the previous step's first occurrence)."""
    ev = load_table(spark, sf_dir, "events")
    u = W.partitionBy("user_id")
    t_view = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(u)
    with_view = ev.withColumn("t_view", t_view)
    t_click = F.min(
        F.when(
            (F.col("event_type") == "click") & (F.col("ts") >= F.col("t_view")),
            F.col("ts"),
        )
    ).over(u)
    with_click = with_view.withColumn("t_click", t_click)
    t_purchase = F.min(
        F.when(
            (F.col("event_type") == "purchase")
            & (F.col("ts") >= F.col("t_click")),
            F.col("ts"),
        )
    ).over(u)
    per_user = (
        with_click.withColumn("t_purchase", t_purchase)
        .groupBy("user_id")
        .agg(
            F.max(F.col("t_view").isNotNull()).alias("reached_view"),
            F.max(F.col("t_click").isNotNull()).alias("reached_click"),
            F.max(F.col("t_purchase").isNotNull()).alias("reached_purchase"),
        )
    )
    return per_user.agg(
        F.sum(F.when(F.col("reached_view"), 1).otherwise(0)).alias("n_view"),
        F.sum(F.when(F.col("reached_click"), 1).otherwise(0)).alias(
            "n_click_after_view"
        ),
        F.sum(F.when(F.col("reached_purchase"), 1).otherwise(0)).alias(
            "n_purchase_after_click"
        ),
    )


#: q73: per-source mixture weights in basis points — derived from the
#: source name so both engines compute them from data (no config file):
#: sources cycle through keep rates 25/50/75/100%.
MIX_BP_DENOM = 10_000

#: q74: training context window (tokens) and the shard width that
#: bounds any single packing window's span (packing restarts per
#: (source, shard) — semantically free for training, and it keeps the
#: ordered window keyed by a cardinality that GROWS with the corpus
#: instead of the fixed source vocabulary).
PACK_CTX_TOKENS = 512  # power of two: start_offset/512 is float-exact
PACK_SHARD_DOCS = 100_000


def q73_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted source mixing — the up/down-sampling
    stage that rebalances corpus composition before training (e.g.
    downsample crawl, keep wiki): every doc draws a content-stable
    Bernoulli via the md5 idiom (salted 'mix:' so it decorrelates from
    q56's split hash) against its source's keep rate. Re-runs pick the
    SAME docs — no RNG, no seed drift. Output: the per-source audit
    (target vs realized rate).

    One scan, one map-side-combined aggregate; the hash is a
    projection, never a shuffle key.
    """
    docs = load_table(spark, sf_dir, "documents")
    srcnum = F.regexp_extract("source", "([0-9]+)", 1).cast("bigint")
    w_bp = ((srcnum % 4) + 1) * (MIX_BP_DENOM // 4)
    h = (
        F.expr(_h32("concat('mix:', CAST(doc_id AS STRING))", "instr"))
        % MIX_BP_DENOM
    )
    base = docs.select(
        "source",
        w_bp.alias("w_bp"),
        (h < w_bp).alias("keep"),
    )
    return (
        base.groupBy("source", "w_bp")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_if(F.col("keep")).alias("n_kept"),
        )
        .select(
            "source",
            "n_docs",
            "n_kept",
            F.round(F.col("w_bp") / MIX_BP_DENOM, 4).alias("target_rate"),
            F.round(F.col("n_kept") / F.col("n_docs"), 9).alias("kept_rate"),
        )
    )


def q74_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy contiguous sequence packing — the sample-packing stage
    that fills fixed training context windows (≤ CTX tokens) with
    consecutive documents, per (source, shard): each doc lands in the
    pack its START offset falls into (boundary docs span into the next
    pack, the standard concat-then-chunk packing). Output: per-pack
    fill audit.

    One window (running token sum) over (source, shard) — shard =
    doc_id div PACK_SHARD_DOCS, so the partition key's cardinality
    grows with the corpus and no window ever spans more than
    PACK_SHARD_DOCS docs — then one aggregate. start_offset/512 is a
    power-of-two division of a < 2^53 integer: float-exact in both
    engines, so pack ids never flap on ulp noise.
    """
    docs = load_table(spark, sf_dir, "documents")
    ntok = F.size(F.split("text", " "))
    shard = F.floor(F.col("doc_id") / PACK_SHARD_DOCS).cast("bigint")
    w = (
        W.partitionBy("source", "shard")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    base = (
        docs.select(
            "source", "doc_id", shard.alias("shard"), ntok.alias("n_tok")
        )
        .withColumn("cum", F.sum("n_tok").over(w))
        .withColumn(
            "pack_id",
            F.floor(
                (F.col("cum") - F.col("n_tok")) / PACK_CTX_TOKENS
            ).cast("bigint"),
        )
    )
    return (
        base.groupBy("source", "shard", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("pack_tokens"),
        )
        .select(
            "source",
            "shard",
            "pack_id",
            "n_docs",
            "pack_tokens",
            F.round(F.col("pack_tokens") / PACK_CTX_TOKENS, 9).alias(
                "fill_rate"
            ),
        )
    )


QUERIES = {
    "q57_stratified_sample": q57_stratified_sample,
    "q58_curation_funnel": q58_curation_funnel,
    "q59_latest_by_key": q59_latest_by_key,
    "q60_session_funnel": q60_session_funnel,
    "q73_source_mix": q73_source_mix,
    "q74_pack_sequences": q74_pack_sequences,
}

_Q_SQL = (
    f"(least(1.0, len(string_split(text, ' ')) / 100.0) * 0.5"
    f" + (CAST({_sql_in_list(STOPWORDS)} AS DOUBLE)"
    f" / len(string_split(text, ' '))) * 0.5) > {QUALITY_FLOOR}"
    f" AND len(string_split(text, ' ')) >= {MIN_TOKENS}"
)

ORACLE = {
    "q57_stratified_sample": f"""
        WITH ranked AS (
          SELECT doc_id, lang,
                 CAST(row_number() OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC
                 ) AS INT) AS rk
          FROM documents
        )
        SELECT doc_id, lang, rk FROM ranked WHERE rk <= {SAMPLE_K}
    """,
    "q58_curation_funnel": f"""
        WITH flagged AS (
          SELECT doc_id, source,
                 md5(lower(trim(text))) AS fp,
                 ({_Q_SQL}) AS q
          FROM documents
        ), surv AS (
          SELECT doc_id, source, q,
                 q AND doc_id = MIN(CASE WHEN q THEN doc_id END)
                       OVER (PARTITION BY fp) AS kept
          FROM flagged
        )
        SELECT source,
               COUNT(*) AS n_input,
               CAST(SUM(CASE WHEN q THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
               CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        FROM surv GROUP BY source
    """,
    "q59_latest_by_key": """
        WITH ranked AS (
          SELECT user_id, event_type, event_id,
                 CAST(ts AS TIMESTAMP) AS ts, value,
                 row_number() OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY ts DESC, event_id DESC
                 ) AS rn
          FROM events
        )
        SELECT user_id, event_type,
               event_id AS last_event_id,
               ts AS last_ts,
               value AS last_value
        FROM ranked WHERE rn = 1
    """,
    "q60_session_funnel": """
        WITH v AS (
          SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
                 MIN(CASE WHEN event_type = 'view' THEN CAST(ts AS TIMESTAMP) END)
                   OVER (PARTITION BY user_id) AS t_view
          FROM events
        ), c AS (
          SELECT *,
                 MIN(CASE WHEN event_type = 'click' AND ts >= t_view THEN ts END)
                   OVER (PARTITION BY user_id) AS t_click
          FROM v
        ), p AS (
          SELECT *,
                 MIN(CASE WHEN event_type = 'purchase' AND ts >= t_click THEN ts END)
                   OVER (PARTITION BY user_id) AS t_purchase
          FROM c
        ), per_user AS (
          SELECT user_id,
                 MAX(t_view IS NOT NULL) AS reached_view,
                 MAX(t_click IS NOT NULL) AS reached_click,
                 MAX(t_purchase IS NOT NULL) AS reached_purchase
          FROM p GROUP BY user_id
        )
        SELECT CAST(SUM(CASE WHEN reached_view THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_view,
               CAST(SUM(CASE WHEN reached_click THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_click_after_view,
               CAST(SUM(CASE WHEN reached_purchase THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_purchase_after_click
        FROM per_user
    """,
    "q73_source_mix": f"""
        WITH base AS (
          SELECT source,
                 ((CAST(regexp_extract(source, '([0-9]+)', 1) AS BIGINT) % 4)
                  + 1) * {MIX_BP_DENOM // 4} AS w_bp,
                 ({_h32("concat('mix:', CAST(doc_id AS VARCHAR))", "strpos")})
                   % {MIX_BP_DENOM} AS h
          FROM documents
        )
        SELECT source,
               COUNT(*) AS n_docs,
               COUNT(*) FILTER (WHERE h < w_bp) AS n_kept,
               round(w_bp / {MIX_BP_DENOM}, 4) AS target_rate,
               round((COUNT(*) FILTER (WHERE h < w_bp)) / COUNT(*), 9)
                 AS kept_rate
        FROM base GROUP BY source, w_bp
    """,
    "q74_pack_sequences": f"""
        WITH base AS (
          SELECT source, doc_id,
                 CAST(floor(doc_id / {PACK_SHARD_DOCS}) AS BIGINT) AS shard,
                 CAST(len(string_split(text, ' ')) AS INT) AS n_tok
          FROM documents
        ), packed AS (
          SELECT *,
                 CAST(SUM(n_tok) OVER (PARTITION BY source, shard
                                       ORDER BY doc_id) AS BIGINT) AS cum
          FROM base
        )
        SELECT source, shard,
               CAST(floor((cum - n_tok) / {PACK_CTX_TOKENS}) AS BIGINT)
                 AS pack_id,
               COUNT(*) AS n_docs,
               CAST(SUM(n_tok) AS BIGINT) AS pack_tokens,
               round(CAST(SUM(n_tok) AS BIGINT) / {PACK_CTX_TOKENS}, 9)
                 AS fill_rate
        FROM packed
        GROUP BY source, shard, CAST(floor((cum - n_tok) / {PACK_CTX_TOKENS}) AS BIGINT)
    """,
}
