"""q119 (semantic decontamination) and q120 (k-means) invariants
beyond the oracle-parity suite: q119's candidate set vs the shared q25
pipeline and its brute-force recall floor; q120's Lloyd monotonicity,
assignment totality, and the shuffle-free final-plan claim.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rime_wanxiang_logger_spark.operators.similarity import (
    EVAL_MOD,
    EVAL_REM,
    KMEANS_K,
    NEARDUP_THRESHOLD,
    _kmeans_assign,
    _vecs,
    embedding_neardup_bruteforce,
    q25_embedding_neardup,
    q119_semantic_decontaminate,
    q120_kmeans_embeddings,
)


def _is_eval(vid: int) -> bool:
    return vid % EVAL_MOD == EVAL_REM


def test_q119_equals_mixed_pair_rollup_of_q25(spark, sf_dir):
    """q119's per-bucket eval×corpus scorer must emit exactly the
    mixed-endpoint subset of q25's banded pairs — same buckets, same
    strict fold, so aggregating q25's output over its corpus endpoint
    reproduces q119 bit-for-bit."""
    pairs = q25_embedding_neardup(spark, sf_dir).collect()
    agg: dict[int, list] = {}
    for r in pairs:
        ea, eb = _is_eval(r.id_a), _is_eval(r.id_b)
        if ea == eb:
            continue
        corpus, _ = (r.id_b, r.id_a) if ea else (r.id_a, r.id_b)
        hit = agg.setdefault(corpus, [0, float("-inf")])
        hit[0] += 1
        hit[1] = max(hit[1], r.cosine)
    got = {
        r.vec_id: (r.n_eval_hits, r.max_cosine)
        for r in q119_semantic_decontaminate(spark, sf_dir).collect()
    }
    assert got == {k: (n, mx) for k, (n, mx) in agg.items()}


def test_q119_recall_floor_vs_bruteforce(spark, sf_dir):
    """Banded recall on the MIXED pair subset tracks q25's documented
    ≈0.85 banding recall (same buckets, same threshold)."""
    truth = {
        (r.id_a, r.id_b)
        for r in embedding_neardup_bruteforce(spark, sf_dir).collect()
        if _is_eval(r.id_a) != _is_eval(r.id_b)
    }
    assert truth, "fixture must contain mixed near-dup pairs"
    found_rows = q119_semantic_decontaminate(spark, sf_dir).collect()
    # q119 rolls pairs up per corpus doc; recall is measured on the
    # contaminated-doc set (the decision the operator actually makes).
    truth_docs = {a if _is_eval(b) else b for a, b in truth}
    found_docs = {r.vec_id for r in found_rows}
    assert found_docs <= truth_docs  # banding never invents a hit
    assert len(found_docs) / len(truth_docs) >= 0.75


def test_q120_assignment_total_and_seeded(spark, sf_dir):
    v = _vecs(spark, sf_dir).select("vec_id")
    out = q120_kmeans_embeddings(spark, sf_dir)
    rows = out.collect()
    assert len(rows) == v.count()  # every vector assigned exactly once
    assert len({r.vec_id for r in rows}) == len(rows)
    assert {r.cluster for r in rows} <= set(range(KMEANS_K))
    assert all(r.dist >= 0.0 for r in rows)


def test_q120_lloyd_iteration_does_not_regress_sse(spark, sf_dir):
    """One recompute+reassign round must not increase total SSE (the
    Lloyd guarantee; the exact-decimal centroid quantization at scale 7
    perturbs means by ≤ 5e-8 per dim, far below the improvement)."""
    v = _vecs(spark, sf_dir, checked=True).select("vec_id", "v")
    seeds = [
        (int(r["vec_id"]), list(r["v"]))
        for r in v.where(F.col("vec_id") < KMEANS_K)
        .orderBy("vec_id")
        .collect()
    ]
    _, d1 = _kmeans_assign(seeds)
    sse1 = v.agg(F.sum(d1).alias("s")).collect()[0]["s"]
    sse2 = (
        q120_kmeans_embeddings(spark, sf_dir)
        .agg(F.sum("dist").alias("s"))
        .collect()[0]["s"]
    )
    assert sse2 <= sse1 * (1 + 1e-9)


def test_q120_final_plan_is_shuffle_free_jvm_projection(spark, sf_dir):
    """The returned assignment frame is a pure JVM projection over the
    scan: no KEY shuffle, no Python eval — the 100 TB claim (the two
    bounded collects happen at plan-construction time, K×d driver
    state). readers.fanout's round-robin repartition of the
    single-row-group test file is allowed — it is a fixture artifact,
    not data movement the algorithm demands."""
    plan = (
        q120_kmeans_embeddings(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "hashpartitioning" not in plan
    assert "rangepartitioning" not in plan
    for marker in ("ArrowEvalPython", "BatchEvalPython",
                   "FlatMapGroupsInPandas", "MapInPandas"):
        assert marker not in plan


def test_q120_assignment_stays_hof_not_unrolled(spark, sf_dir):
    """Compile-cost pin (r13): the centroid distance must stay the
    compact zip_with/aggregate fold. The pre-r13 form unrolled
    EMBED_DIM literal-CAST terms per centroid (~1k expression nodes
    per assignment), costing ~3.5 s of Janino compile per run at ANY
    scale; a revert would pass every value test and only show up as a
    bench regression. The fold's IEEE order equals the oracle's
    left-assoc column chain, so this shape is also the parity
    contract."""
    plan = (
        q120_kmeans_embeddings(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "aggregate(zip_with(" in plan
    # Direct negative pin on the unrolled signature itself (not just
    # formatting artifacts): the pre-r13 form subscripted every dim of
    # every centroid, so `[63]` (the last EMBED_DIM index) appeared per
    # centroid; the HOF fold never materializes a per-dim subscript.
    assert "[63]" not in plan
    # the unrolled form carried 2 casts per dim per centroid — several
    # hundred; the HOF plan has single-digit incidental casts
    assert plan.count("cast(") < 50, plan.count("cast(")


def test_q119_threshold_boundary_kept(spark, sf_dir):
    """Pairs exactly AT the threshold are kept (>= semantics, both
    engines round to 9 dp before comparing)."""
    out = q119_semantic_decontaminate(spark, sf_dir)
    mn = out.agg(F.min("max_cosine").alias("m")).collect()[0]["m"]
    assert mn >= NEARDUP_THRESHOLD
