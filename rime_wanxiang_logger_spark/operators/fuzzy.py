"""Fuzzy-matching & language-model statistics (pipeline extensions).

Two operators a large-scale training-data pipeline runs that the
engine didn't yet cover:

q93_edit_verify   edit-distance verification of the LSH-blocked
                  candidate pairs — the character-level twin of q24's
                  shingle-Jaccard verify. Near-dup candidates from the
                  MinHash band join are re-scored with exact
                  levenshtein distance + normalized similarity. Both
                  engines ship the identical classic edit distance
                  (unit-cost insert/delete/substitute), verified
                  value-equal in tests.
q97_containment   asymmetric shingle containment |A∩B| / |A| over the
                  same candidate set — the subsumption signal
                  (quote / excerpt / boilerplate inclusion) symmetric
                  Jaccard can't see.
q94_trigram_lm    the classic n-gram language-model count job: trigram
                  counts and conditional probabilities
                  P(w3 | w1 w2) = c(w1w2w3) / c(w1w2·), with contexts
                  summed from the trigram table itself and a min-count
                  floor applied AFTER the probability (so rare
                  continuations of common contexts keep exact
                  denominators).

Scale design:
- q93 is verify-after-block only: levenshtein is O(|a|·|b|) per pair,
  so it runs on the LINEAR candidate set the band join emits — never
  corpus². The text join probes the corpus twice by doc_id (AQE
  broadcasts the tiny pair side at test scale; co-partitioned shuffle
  joins at 100 TB).
- q94 is one Generate (per-row trigram array → explode) into one
  map-side-combined groupBy on the trigram, then a whole-partition
  window sum on the (w1, w2) context — the context table can be
  billions of rows at web scale, so it is co-partitioned via the
  window shuffle, never collected or broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..sources.readers import load_table
from .dedup import _CAND_CTE, cand_pairs, shingle_sets

TRIGRAM_MIN_COUNT = 5


def q93_edit_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-blocked candidate pairs re-scored with exact edit distance.

    Output per pair: levenshtein distance and normalized similarity
    1 - d / max(len_a, len_b), rounded to 9 dp. The threshold decision
    is left to the caller (q24 precedent: the verify stage emits
    scores, the curation policy cuts).

    r14: candidates from the shared ``q22_pairs`` pin (q22 provides; a
    raw call builds the documented detect plan). The first text join
    pins its strategy because the pin scan reaches it without an
    intervening shuffle (STATS HAZARD): shuffle-hash with the NARROW
    candidate side as build — the text side streams, nothing sorts a
    text payload, never a stats-driven broadcast. The second join's
    probe side is post-shuffle, so AQE plans it from real sizes."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = cand_pairs(spark, sf_dir)
    ta = docs.select(
        F.col("doc_id").alias("doc_a"), F.col("text").alias("text_a")
    )
    tb = docs.select(
        F.col("doc_id").alias("doc_b"), F.col("text").alias("text_b")
    )
    d = F.levenshtein("text_a", "text_b").cast("bigint")
    maxlen = F.greatest(F.length("text_a"), F.length("text_b"))
    return (
        pairs.hint("shuffle_hash")
        .join(ta, "doc_a")
        .join(tb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            d.alias("edit_dist"),
            F.round(
                F.lit(1.0) - d / maxlen.cast("double"), 9
            ).alias("edit_sim"),
        )
    )


def q94_trigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigram language-model statistics over the corpus.

    Single scan: per-row trigram structs built with one in-row
    ``transform`` over the token array (docs under 3 tokens are
    filtered BEFORE ``sequence`` — sequence(0, negative) would emit a
    descending range, not an empty one), exploded once, counted with a
    map-side-combined hash aggregate, contexts summed with an
    unordered window over (w1, w2)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.split("text", " ").alias("t")).where(
        F.size("t") >= 3
    )
    tri = toks.select(
        F.explode(
            F.expr(
                "transform(sequence(0, size(t) - 3), i -> struct("
                "element_at(t, i + 1) AS w1,"
                " element_at(t, i + 2) AS w2,"
                " element_at(t, i + 3) AS w3))"
            )
        ).alias("g")
    ).select("g.w1", "g.w2", "g.w3")
    counts = tri.groupBy("w1", "w2", "w3").agg(
        F.count(F.lit(1)).alias("n")
    )
    ctx = W.partitionBy("w1", "w2")
    return (
        counts.withColumn(
            "p", F.round(F.col("n") / F.sum("n").over(ctx), 9)
        )
        .where(F.col("n") >= TRIGRAM_MIN_COUNT)
        .select("w1", "w2", "w3", "n", "p")
    )


def q97_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASYMMETRIC containment for the LSH candidate pairs:
    C(A→B) = |A∩B| / |A| and C(B→A) = |A∩B| / |B| over the hashed
    shingle sets. Symmetric Jaccard (q24) misses subsumption — a short
    doc quoted whole inside a long one scores low Jaccard but
    containment ≈ 1 from the short side; this is the dedup signal for
    quote/excerpt/boilerplate-inclusion removal.

    Same scale shape as q24 (verify-after-block, work linear in the
    candidate set, never corpus²). r14: both inputs come from the
    shared stages — candidates from ``q22_pairs``, hashed shingle sets
    from ``q24_shingle_sets`` — and the intersection is a JVM
    ``array_intersect`` over two array cells (q24's r14 note: one
    shingle pass instead of three, no per-shingle join, identical
    values). Joins on the pin scans carry pinned strategies (STATS
    HAZARD)."""
    pairs = cand_pairs(spark, sf_dir)
    sets = shingle_sets(spark, sf_dir)
    sa = sets.select(
        F.col("doc_id").alias("doc_a"), F.col("hs").alias("hs_a")
    )
    sb = sets.select(
        F.col("doc_id").alias("doc_b"), F.col("hs").alias("hs_b")
    )
    n_i = F.size(F.array_intersect("hs_a", "hs_b")).cast("bigint")
    return (
        pairs.join(sa.hint("shuffle_hash"), "doc_a")
        .join(sb.hint("shuffle_hash"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            n_i.alias("n_inter"),
            (n_i / F.size("hs_a")).alias("containment_a"),
            (n_i / F.size("hs_b")).alias("containment_b"),
        )
    )


QUERIES = {
    "q93_edit_verify": q93_edit_verify,
    "q94_trigram_lm": q94_trigram_lm,
    "q97_containment": q97_containment,
}

ORACLE = {
    "q93_edit_verify": f"""
        WITH {_CAND_CTE}
        SELECT c.doc_a, c.doc_b,
               CAST(levenshtein(a.text, b.text) AS BIGINT) AS edit_dist,
               round(1.0 - levenshtein(a.text, b.text)
                     / CAST(GREATEST(length(a.text), length(b.text))
                            AS DOUBLE), 9) AS edit_sim
        FROM cand c
        JOIN documents a ON a.doc_id = c.doc_a
        JOIN documents b ON b.doc_id = c.doc_b
    """,
    "q97_containment": f"""
        WITH {_CAND_CTE},
        dsh AS (SELECT DISTINCT doc_id, h FROM hashed_sh),
        sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM dsh GROUP BY doc_id),
        inter AS (
          SELECT c.doc_a, c.doc_b, COUNT(*) AS n_inter
          FROM cand c
          JOIN dsh a ON a.doc_id = c.doc_a
          JOIN dsh b ON b.doc_id = c.doc_b AND b.h = a.h
          GROUP BY c.doc_a, c.doc_b
        )
        SELECT c.doc_a, c.doc_b,
               CAST(COALESCE(i.n_inter, 0) AS BIGINT) AS n_inter,
               COALESCE(i.n_inter, 0) / CAST(na.n_sh AS DOUBLE)
                 AS containment_a,
               COALESCE(i.n_inter, 0) / CAST(nb.n_sh AS DOUBLE)
                 AS containment_b
        FROM cand c
        LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
        JOIN sizes na ON na.doc_id = c.doc_a
        JOIN sizes nb ON nb.doc_id = c.doc_b
    """,
    "q94_trigram_lm": f"""
        WITH toks AS (
          SELECT string_split(text, ' ') AS t FROM documents
          WHERE len(string_split(text, ' ')) >= 3
        ), tri AS (
          SELECT t[i + 1] AS w1, t[i + 2] AS w2, t[i + 3] AS w3
          FROM toks,
               LATERAL unnest(generate_series(0, len(t) - 3)) AS g(i)
        ), counts AS (
          SELECT w1, w2, w3, COUNT(*) AS n FROM tri GROUP BY 1, 2, 3
        )
        SELECT w1, w2, w3, CAST(n AS BIGINT) AS n,
               round(n / CAST(SUM(n) OVER (PARTITION BY w1, w2)
                              AS DOUBLE), 9) AS p
        FROM counts
        QUALIFY n >= {TRIGRAM_MIN_COUNT}
    """,
}
