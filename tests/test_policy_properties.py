"""Property-based checks for the r4b policy pack's determinism idioms.

The pack's oracle parity rests on three primitives being engine-exact:
integer `div` (Spark) == `//` (DuckDB) == floor division for positive
BIGINTs, the trigram-probability fixed-point sum, and the
value-histogram k-th-smallest. The oracle suite pins them on the fixed
corpus; these pin them on adversarial inputs against pure-Python
replays and against DuckDB directly (two implementations, one spec —
SURVEY §5.2.3).
"""

from __future__ import annotations

from collections import Counter

import duckdb
from hypothesis import HealthCheck, given, settings, strategies as st

# Envelope: 1e9·a must fit in int64, so a ≤ ~9.2e9 (policy._FP doc).
# Outside it BOTH engines fail loudly (Spark ANSI overflow, DuckDB
# overflow error) — never silently wrong.
_POS = st.integers(min_value=1, max_value=2**33)
_NUM = st.integers(min_value=0, max_value=2**33)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pairs=st.lists(st.tuples(_NUM, _POS), min_size=1, max_size=30))
def test_integer_div_is_engine_exact(spark, pairs):
    """floor(1e9·a / b) via Spark `div` must equal DuckDB `//` and
    Python `//` for every positive pair — the q95/q101/q103 fixed-point
    primitive."""
    df = spark.createDataFrame(pairs, "a long, b long").selectExpr(
        "a", "b", "(1000000000 * a) div b AS q"
    )
    got = {(r["a"], r["b"]): r["q"] for r in df.collect()}
    con = duckdb.connect()
    for a, b in pairs:
        (duck,) = con.execute(
            f"SELECT (1000000000 * CAST({a} AS BIGINT)) // {b}"
        ).fetchone()
        assert got[(a, b)] == duck == (1_000_000_000 * a) // b, (a, b)
    con.close()


_WORDS = st.lists(
    st.sampled_from(["x", "y", "zz", "x", "w1", "a b"]),
    min_size=0,
    max_size=20,
).map(lambda ws: " ".join(ws))


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(_WORDS, min_size=1, max_size=6))
def test_q101_score_matches_python_replay(spark, texts):
    """q101's windowed fixed-point trigram score vs a pure-Python
    replay of the same spec (corpus trigram/context counts, floored
    1e9 ratios, integer sums)."""
    from rime_wanxiang_logger_spark.operators.policy import _FP

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    # run the same plan q101 builds, against the in-memory frame
    from pyspark.sql import Window as W, functions as F

    toks = docs.select("doc_id", F.split("text", " ").alias("t")).where(
        F.size("t") >= 3
    )
    tri = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(t) - 3), i -> struct("
                "element_at(t, i + 1) AS w1,"
                " element_at(t, i + 2) AS w2,"
                " element_at(t, i + 3) AS w3))"
            )
        ).alias("g"),
    ).select("doc_id", "g.w1", "g.w2", "g.w3")
    ctx = W.partitionBy("w1", "w2")
    peers = ctx.orderBy("w3").rangeBetween(W.currentRow, W.currentRow)
    got = {
        r["doc_id"]: (r["n"], r["s"])
        for r in tri.select(
            "doc_id",
            F.count(F.lit(1)).over(peers).alias("n_tri_c"),
            F.count(F.lit(1)).over(ctx).alias("n_ctx_c"),
        )
        .select(
            "doc_id", F.expr(f"({_FP} * n_tri_c) div n_ctx_c").alias("p")
        )
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("p").alias("s"))
        .collect()
    }
    # pure-Python replay
    tris: dict[int, list] = {}
    for i, t in enumerate(texts):
        w = t.split(" ")
        tris[i] = [
            (w[j], w[j + 1], w[j + 2]) for j in range(len(w) - 2)
        ] if len(w) >= 3 else []
    tri_c = Counter(g for gs in tris.values() for g in gs)
    ctx_c = Counter((g[0], g[1]) for gs in tris.values() for g in gs)
    for i, gs in tris.items():
        if not gs:
            assert i not in got
            continue
        s = sum(_FP * tri_c[g] // ctx_c[(g[0], g[1])] for g in gs)
        assert got[i] == (len(gs), s), (i, got[i], len(gs), s)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lens=st.lists(st.integers(min_value=1, max_value=40), min_size=3, max_size=60)
)
def test_q104_bounds_are_exact_kth_smallest(spark, lens):
    """q104's histogram-cumsum bound == the k-th smallest of the raw
    values with k = ceil(p·n), for both tails, on arbitrary
    multisets."""
    from pyspark.sql import Window as W, functions as F

    from rime_wanxiang_logger_spark.operators.policy import (
        TRIM_HI_PCT,
        TRIM_LO_PCT,
    )

    docs = spark.createDataFrame(
        [("xx", v) for v in lens], "lang string, n_chars long"
    )
    hist = docs.groupBy("lang", "n_chars").agg(F.count(F.lit(1)).alias("n"))
    wl = W.partitionBy("lang").orderBy("n_chars")
    cum = hist.select(
        "lang",
        "n_chars",
        F.sum("n").over(wl.rowsBetween(W.unboundedPreceding, 0)).alias("cum"),
        F.sum("n").over(W.partitionBy("lang")).alias("n_docs"),
    )
    lo_k = F.expr(f"({TRIM_LO_PCT} * n_docs + 99) div 100")
    hi_k = F.expr(f"({TRIM_HI_PCT} * n_docs + 99) div 100")
    (row,) = cum.groupBy("lang").agg(
        F.min(F.when(F.col("cum") >= lo_k, F.col("n_chars"))).alias("lo"),
        F.min(F.when(F.col("cum") >= hi_k, F.col("n_chars"))).alias("hi"),
    ).collect()
    srt = sorted(lens)
    n = len(srt)
    want_lo = srt[-(-TRIM_LO_PCT * n // 100) - 1]  # ceil, 1-indexed
    want_hi = srt[-(-TRIM_HI_PCT * n // 100) - 1]
    assert (row["lo"], row["hi"]) == (want_lo, want_hi), (row, srt)


def test_q117_cap_recall_invariants(spark, sf_dir):
    """q117's three pair counts are nested by construction
    (found_prod ⇒ found_content ⇒ found_cal: production witnesses all
    count as content, content witnesses all count at the calibration
    cap), n_lost_content is their difference, and the coverage ratio
    renders prod/content (NULL on an empty content set). Pinning the
    nesting here means a future edit that breaks the monotonicity —
    e.g. classifying a df ≤ FP_DF_CAP fp as non-content — fails fast
    without waiting for a driver round."""
    from rime_wanxiang_logger_spark.operators.policy import (
        q117_winnow_cap_recall,
    )

    row = q117_winnow_cap_recall(spark, sf_dir).collect()[0]
    assert row.n_pairs_prod <= row.n_pairs_content <= row.n_pairs_cal
    assert row.n_lost_content == row.n_pairs_content - row.n_pairs_prod
    assert row.n_overcal_fps >= 0
    if row.n_pairs_content == 0:
        assert row.coverage_content is None
    else:
        assert row.coverage_content == (
            row.n_pairs_prod / row.n_pairs_content
        )


def test_q118_admit_cap_invariants_and_q86_consistency(spark, sf_dir):
    """q118's counts are nested by construction (a pair admissible at
    the production cap is admissible at the 10x calibration cap), and
    where NO bucket is saturated (every SF <= sf1 on this corpus: max
    occupancy 58 < ADMIT_BAND_CAP) the calibration verdicts must equal
    the EXACT admit path's: n_dup_cal == q86's non-unique doc count and
    n_pairs_cal == q86's total candidate volume. A cap or probe edit
    that silently changes the uncapped semantics fails here, not in a
    driver round."""
    from pyspark.sql import functions as F

    from rime_wanxiang_logger_spark.operators.dedup import (
        q86_incremental_dedup,
    )
    from rime_wanxiang_logger_spark.operators.policy import (
        q118_admit_cap_recall,
    )

    row = q118_admit_cap_recall(spark, sf_dir).collect()[0]
    assert row.n_dup_prod <= row.n_dup_cal <= row.n_new
    assert row.n_pairs_prod <= row.n_pairs_cal
    assert row.n_lost == row.n_dup_cal - row.n_dup_prod
    if row.n_dup_cal:
        assert row.recall_prod == round(row.n_dup_prod / row.n_dup_cal, 9)
    else:
        assert row.recall_prod is None
    # caps inactive on the small test corpus -> capped == exact
    assert row.n_overcal_buckets == 0 and row.n_new_overcal == 0
    assert row.n_lost == 0 and row.n_pairs_prod == row.n_pairs_cal
    q86 = (
        q86_incremental_dedup(spark, sf_dir)
        .agg(
            F.sum(F.when(~F.col("is_unique"), 1).otherwise(0)).alias("d"),
            F.sum("n_cand").alias("p"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()[0]
    )
    assert row.n_dup_cal == q86["d"]
    assert row.n_pairs_cal == q86["p"]
    assert row.n_new == q86["n"]


def test_drop_overcap_fps_null_and_cap_semantics(spark):
    """_drop_overcap_fps must match the inner joins it replaced on
    NULL fingerprints (ADVICE r12): an inner equi-join silently DROPS
    NULL keys, but a bare LEFT ANTI would KEEP them (NULL matches
    nothing on the over-cap side either), letting any future NULL-fp
    producer bypass the df cap. Pin all three behaviors: NULL fp
    dropped, over-cap fp dropped, in-cap survivor kept intact."""
    from rime_wanxiang_logger_spark.operators.policy import (
        _drop_overcap_fps,
    )

    fps = spark.createDataFrame(
        [(1, None), (2, 5), (3, 99), (4, 99)],
        "doc_id bigint, fp bigint",
    )
    over = spark.createDataFrame([(99,)], "fp bigint")
    got = {
        (r["doc_id"], r["fp"])
        for r in _drop_overcap_fps(fps, over).collect()
    }
    assert got == {(2, 5)}, got
