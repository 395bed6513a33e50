"""Data-quality operators for LLM training-corpus curation: the
contamination / repetition / rarity / indexing stages that run between
dedup and the final mix (north-star M8 cont.; no reference twin — the
reference has no corpus surface, SURVEY §2.11b scale extensions).

q75_decontaminate    benchmark decontamination: flag training docs
                     sharing word n-grams with the held-out eval set
                     (the GPT-3/Llama-style n-gram overlap scrub)
q76_repetition_stats Gopher-style repetition signals per doc: top-word
                     fraction, distinct-word fraction, duplicate-bigram
                     fraction, and the composite low-quality flag
q77_rarity_score     CCNet-style doc rarity: mean inverse unigram
                     probability under the corpus LM (high = rare
                     vocabulary, low = boilerplate)
q78_inverted_index   postings construction: per term, document
                     frequency, collection frequency, and the first
                     K postings (bounded, deterministic)

Design for 100 TB:
- q75 broadcasts the DISTINCT eval-set n-grams (benchmarks are bounded
  — millions of grams, not corpus-scale) against a single pass over
  the training shingles; the per-doc rollup is the only shuffle. If the
  eval side ever outgrows broadcast, the same plan degrades gracefully
  to a shuffled hash join on the gram key.
- q76 is two explode→two-level-aggregate chains, both keyed by doc_id;
  partial aggregation absorbs the explosion map-side and the final
  join is co-partitioned on doc_id (AQE coalesces the tiny sides).
- q77 broadcasts the unigram vocabulary (bounded by the token space,
  not the corpus) and the 1-row grand total; the corpus is scanned
  once and shuffled once (per-doc rollup). Scores are summed through
  the scaled-BIGINT lattice (functions/stable.py discipline) so the
  float result is order-independent and engine-exact.
- q78 never materializes unbounded postings: df/cf come from a
  hash aggregate, and the postings sample is a top-K-per-term window
  over the (term, doc) AGGREGATE (one row per term×doc, not per
  occurrence) — the q41 top-k-per-group shape. Hot terms (stopwords)
  are skew for the window; at scale pre-filter with a per-partition
  min-K pass or let AQE split the skewed partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..sources.readers import fanout, load_table
from .dedup import _SHINGLES_DUCK, _SHINGLES_SPARK

#: q75: eval-set membership — every 97th doc is the held-out benchmark
#: proxy (deterministic, derived from data; no config file).
EVAL_MOD = 97

#: q76 low-quality thresholds (strictly-greater-than comparisons on the
#: ROUNDED fractions, so the flag is engine-exact).
TOP_WORD_MAX = 0.15
DUP_BIGRAM_MAX = 0.25

#: q77 fixed-point scale for the inverse-probability lattice.
RARITY_SCALE = 1_000_000

#: q78 postings sample width.
POSTINGS_K = 8

# 2-gram twin of dedup's 3-gram shingle expression.
_BIGRAMS_SPARK = (
    "CASE WHEN size(split(text, ' ')) < 2 THEN array() "
    "ELSE transform(sequence(1, size(split(text, ' ')) - 1), "
    "i -> concat_ws(' ', slice(split(text, ' '), i, 2))) END"
)
_BIGRAMS_DUCK = (
    "CASE WHEN len(string_split(text, ' ')) < 2 THEN [] "
    "ELSE list_transform(generate_series(1, len(string_split(text, ' ')) - 1), "
    "i -> array_to_string((string_split(text, ' '))[i:i+1], ' ')) END"
)


def _word_rows(docs: DataFrame) -> DataFrame:
    return fanout(docs).select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    )


def q75_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flag training documents that share ≥1 word trigram with the
    held-out eval set (doc_id % EVAL_MOD == 0): per contaminated doc,
    its distinct-gram count, the overlapping-gram count, and the
    contamination fraction. Gram counts are DISTINCT-per-doc on both
    sides so repeated phrases inside one doc don't inflate overlap."""
    docs = load_table(spark, sf_dir, "documents")
    sh = fanout(docs).select(
        "doc_id", F.explode(F.expr(_SHINGLES_SPARK)).alias("sh")
    )
    eval_grams = (
        sh.where(F.col("doc_id") % EVAL_MOD == 0)
        .select(F.col("sh").alias("hit_sh"))
        .distinct()
    )
    train = sh.where(F.col("doc_id") % EVAL_MOD != 0)
    joined = train.join(
        F.broadcast(eval_grams),
        train["sh"] == eval_grams["hit_sh"],
        "left",
    )
    return (
        joined.groupBy("doc_id")
        .agg(
            F.countDistinct("sh").alias("n_grams"),
            F.countDistinct("hit_sh").alias("n_hits"),
        )
        .where(F.col("n_hits") > 0)
        .select(
            "doc_id",
            "n_grams",
            "n_hits",
            F.round(F.col("n_hits") / F.col("n_grams"), 9).alias(
                "contam_frac"
            ),
        )
    )


def q76_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc repetition signals (Gopher rules 4-8 adapted to the
    word/bigram level): top-word fraction, distinct-word fraction,
    duplicate-bigram fraction, and the composite low_quality flag.
    Flag comparisons run on the ROUNDED fractions so both engines see
    bit-identical inputs."""
    docs = load_table(spark, sf_dir, "documents")
    # Shuffle-free (the dedup._signatures pattern): every statistic is
    # a function of ONE document's own token/bigram arrays, so the two
    # explode→double-groupBy chains collapse into per-row HOF folds —
    # top_cnt is an O(distinct × tokens) in-row scan (~µs/doc), far
    # cheaper than shuffling corpus × tokens rows. The `size >= 2`
    # guard reproduces the old inner wstat⋈bstat join, which dropped
    # docs with no bigram rows. Counts are exact ints either way; the
    # DuckDB oracle is untouched.
    stats = (
        fanout(docs)
        .select(
            "doc_id",
            F.split("text", " ").alias("tk"),
            F.expr(_BIGRAMS_SPARK).alias("bg"),
        )
        .where(F.size("tk") >= 2)
        .select(
            "doc_id",
            F.size("tk").cast("bigint").alias("n_words"),
            F.expr("size(array_distinct(tk))")
            .cast("bigint")
            .alias("n_distinct"),
            F.expr(
                "array_max(transform(array_distinct(tk),"
                " d -> size(filter(tk, t -> t = d))))"
            )
            .cast("bigint")
            .alias("top_cnt"),
            F.size("bg").cast("bigint").alias("n_bigrams"),
            F.expr("size(array_distinct(bg))")
            .cast("bigint")
            .alias("n_uniq_bigrams"),
        )
    )
    top_frac = F.round(F.col("top_cnt") / F.col("n_words"), 9)
    dist_frac = F.round(F.col("n_distinct") / F.col("n_words"), 9)
    dup_frac = F.round(
        (F.col("n_bigrams") - F.col("n_uniq_bigrams")) / F.col("n_bigrams"), 9
    )
    return (
        stats
        .select(
            "doc_id",
            "n_words",
            top_frac.alias("top_word_frac"),
            dist_frac.alias("distinct_frac"),
            dup_frac.alias("dup_bigram_frac"),
        )
        .withColumn(
            "low_quality",
            (F.col("top_word_frac") > TOP_WORD_MAX)
            | (F.col("dup_bigram_frac") > DUP_BIGRAM_MAX),
        )
    )


def q77_rarity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean inverse unigram probability per doc: score(d) = mean over
    words of total/count(w) — the cheap CCNet-style boilerplate-vs-rare
    signal (no float log; the inverse ratio keeps the lattice exact).
    Per-word terms are scaled to BIGINT (floor(x·10⁶ + 0.5)) before the
    per-doc sum so the aggregate is order-independent and engine-exact."""
    docs = load_table(spark, sf_dir, "documents")
    words = _word_rows(docs)
    vocab = words.groupBy("w").agg(F.count(F.lit(1)).alias("wcnt"))
    total = vocab.agg(F.sum("wcnt").alias("total"))
    scaled = (
        words.join(F.broadcast(vocab), "w")
        .crossJoin(F.broadcast(total))
        .withColumn(
            "inv_scaled",
            F.floor(
                (F.col("total") / F.col("wcnt")) * RARITY_SCALE + F.lit(0.5)
            ).cast("bigint"),
        )
    )
    return (
        scaled.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("inv_scaled").alias("s"),
        )
        .select(
            "doc_id",
            "n_words",
            F.round(
                F.col("s") / (F.lit(float(RARITY_SCALE)) * F.col("n_words")), 9
            ).alias("rarity_score"),
        )
    )


def q78_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Postings construction: per term, document frequency, collection
    frequency, and the first POSTINGS_K doc_ids (ascending) as a
    comma-joined string — bounded output regardless of term frequency.
    The sample comes from a top-K window over the (term, doc) aggregate
    (q41 shape), never from an unbounded collect_list."""
    docs = load_table(spark, sf_dir, "documents")
    per = (
        _word_rows(docs)
        .groupBy("w", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    stats = per.groupBy("w").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("cf"),
    )
    topk = (
        per.withColumn(
            "rn",
            F.row_number().over(W.partitionBy("w").orderBy("doc_id")),
        )
        .where(F.col("rn") <= POSTINGS_K)
        .groupBy("w")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list("doc_id")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("postings")
        )
    )
    return (
        stats.join(topk, "w")
        .select(F.col("w").alias("term"), "df", "cf", "postings")
    )


QUERIES = {
    "q75_decontaminate": q75_decontaminate,
    "q76_repetition_stats": q76_repetition_stats,
    "q77_rarity_score": q77_rarity_score,
    "q78_inverted_index": q78_inverted_index,
}

ORACLE = {
    "q75_decontaminate": f"""
        WITH sh AS (
          SELECT doc_id, unnest({_SHINGLES_DUCK}) AS sh FROM documents
        ),
        ev AS (
          SELECT DISTINCT sh AS hit_sh FROM sh WHERE doc_id % {EVAL_MOD} = 0
        ),
        tr AS (SELECT * FROM sh WHERE doc_id % {EVAL_MOD} <> 0)
        SELECT tr.doc_id,
               COUNT(DISTINCT tr.sh) AS n_grams,
               COUNT(DISTINCT ev.hit_sh) AS n_hits,
               round(COUNT(DISTINCT ev.hit_sh) / COUNT(DISTINCT tr.sh), 9)
                 AS contam_frac
        FROM tr LEFT JOIN ev ON tr.sh = ev.hit_sh
        GROUP BY tr.doc_id
        HAVING COUNT(DISTINCT ev.hit_sh) > 0
    """,
    "q76_repetition_stats": f"""
        WITH w AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
        ),
        wc AS (
          SELECT doc_id, w, COUNT(*) AS cnt FROM w GROUP BY doc_id, w
        ),
        ws AS (
          SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_words,
                 COUNT(*) AS n_distinct, MAX(cnt) AS top_cnt
          FROM wc GROUP BY doc_id
        ),
        b AS (
          SELECT doc_id, unnest({_BIGRAMS_DUCK}) AS bg FROM documents
        ),
        bc AS (
          SELECT doc_id, bg, COUNT(*) AS cnt FROM b GROUP BY doc_id, bg
        ),
        bs AS (
          SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_bigrams,
                 COUNT(*) AS n_uniq_bigrams
          FROM bc GROUP BY doc_id
        )
        SELECT ws.doc_id, n_words,
               round(top_cnt / n_words, 9) AS top_word_frac,
               round(n_distinct / n_words, 9) AS distinct_frac,
               round((n_bigrams - n_uniq_bigrams) / n_bigrams, 9)
                 AS dup_bigram_frac,
               (round(top_cnt / n_words, 9) > {TOP_WORD_MAX}
                OR round((n_bigrams - n_uniq_bigrams) / n_bigrams, 9)
                   > {DUP_BIGRAM_MAX}) AS low_quality
        FROM ws JOIN bs ON ws.doc_id = bs.doc_id
    """,
    "q77_rarity_score": f"""
        WITH w AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
        ),
        vocab AS (SELECT w, COUNT(*) AS wcnt FROM w GROUP BY w),
        tot AS (SELECT CAST(SUM(wcnt) AS BIGINT) AS total FROM vocab),
        scaled AS (
          SELECT doc_id,
                 CAST(floor((total / wcnt) * {RARITY_SCALE} + 0.5) AS BIGINT)
                   AS inv_scaled
          FROM w JOIN vocab USING (w) CROSS JOIN tot
        )
        SELECT doc_id, COUNT(*) AS n_words,
               round(CAST(SUM(inv_scaled) AS BIGINT)
                     / ({RARITY_SCALE}.0 * COUNT(*)), 9) AS rarity_score
        FROM scaled GROUP BY doc_id
    """,
    "q78_inverted_index": f"""
        WITH w AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
        ),
        per AS (
          SELECT w, doc_id, COUNT(*) AS tf FROM w GROUP BY w, doc_id
        ),
        stats AS (
          SELECT w, COUNT(*) AS df, CAST(SUM(tf) AS BIGINT) AS cf
          FROM per GROUP BY w
        ),
        topk AS (
          SELECT w, array_to_string(
                   list_transform(list_sort(list(doc_id)),
                                  x -> CAST(x AS VARCHAR)), ',') AS postings
          FROM (
            SELECT w, doc_id,
                   row_number() OVER (PARTITION BY w ORDER BY doc_id) AS rn
            FROM per
          ) WHERE rn <= {POSTINGS_K}
          GROUP BY w
        )
        SELECT stats.w AS term, df, cf, postings
        FROM stats JOIN topk ON stats.w = topk.w
    """,
}
