#!/usr/bin/env python
"""Scale audit for the connected-component queries whose DuckDB
oracles are intractable at sf1 (the recursive transitive-closure CTE
is O(V×component); see BASELINE.md). In place of the SQL oracle, this
checks the defining INVARIANTS of the CC family at any sf_dir with
O(E) Spark joins — the scale-appropriate verification:

- label validity (q53/q72 shape): every edge's endpoints carry the
  SAME label; every label is ≤ its node id; every label is itself a
  node whose own label is itself (canonical representative).
- split consistency (q85): no candidate-pair edge straddles two
  splits — the leak-free property itself.
- survivor policy (q98): exactly one KEEP per cluster, and the keeper
  is the longest doc (ties to smallest id) of its cluster.

Run:  python scripts/cc_audit.py [sf_dir]     (default /tmp/sf1)
Writes cc_audit.json next to the repo root; every check must be 0.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window as W, functions as F  # noqa: E402

from rime_wanxiang_logger_spark.operators.dedup import (  # noqa: E402
    _candidate_pairs,
    _signatures,
)
from rime_wanxiang_logger_spark.operators.pipeline import (  # noqa: E402
    connected_components,
)
from rime_wanxiang_logger_spark.session import get_spark  # noqa: E402
from rime_wanxiang_logger_spark.sources.readers import load_table  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"


def main() -> None:
    spark = get_spark("cc-audit")
    docs = load_table(spark, SF_DIR, "documents")
    pairs = _candidate_pairs(_signatures(docs).localCheckpoint())
    pairs = pairs.localCheckpoint()
    labels = connected_components(pairs).localCheckpoint()
    out: dict[str, int] = {
        "n_docs": docs.count(),
        "n_edges": pairs.count(),
        "n_labeled_nodes": labels.count(),
    }

    la = labels.select(
        F.col("node").alias("doc_a"), F.col("label").alias("lab_a")
    )
    lb = labels.select(
        F.col("node").alias("doc_b"), F.col("label").alias("lab_b")
    )
    # 1. no edge crosses two labels
    out["edges_crossing_labels"] = (
        pairs.join(la, "doc_a").join(lb, "doc_b")
        .where(F.col("lab_a") != F.col("lab_b"))
        .count()
    )
    # 2. label is a lower bound and a canonical representative
    out["labels_above_node"] = labels.where(
        F.col("label") > F.col("node")
    ).count()
    reps = labels.select(F.col("label").alias("node")).distinct()
    out["labels_not_self_rooted"] = (
        reps.join(labels, "node").where(F.col("label") != F.col("node"))
        .count()
    )

    # 3. q85 leak-free split: no edge straddles splits (recomputed
    # with q85's own hash + case expressions)
    from rime_wanxiang_logger_spark.operators.pipeline import (
        _SPLIT_CASE,
        _h32,
    )

    rep = labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("rep")
    )
    assigned = (
        docs.select("doc_id")
        .join(rep, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("rep", "doc_id").alias("rep"),
        )
        .withColumn(
            "bucket",
            F.expr(_h32("CAST(rep AS STRING)", "instr")) % F.lit(100),
        )
        .withColumn("split", F.expr(_SPLIT_CASE))
    )
    sa = assigned.select(
        F.col("doc_id").alias("doc_a"), F.col("split").alias("split_a")
    )
    sb = assigned.select(
        F.col("doc_id").alias("doc_b"), F.col("split").alias("split_b")
    )
    out["edges_straddling_splits"] = (
        pairs.join(sa, "doc_a").join(sb, "doc_b")
        .where(F.col("split_a") != F.col("split_b"))
        .count()
    )

    # 4. q98 survivor policy: one keeper per cluster, longest-doc wins
    member = (
        docs.select("doc_id", "n_chars")
        .join(rep, "doc_id", "left")
        .select(
            "doc_id",
            "n_chars",
            F.coalesce("rep", "doc_id").alias("cluster_id"),
        )
    )
    wk = W.partitionBy("cluster_id").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    expected_keep = member.withColumn(
        "is_best", F.row_number().over(wk) == 1
    )
    from rime_wanxiang_logger_spark.operators.mixture import (
        q98_survivor_policy,
    )

    got = q98_survivor_policy(spark, SF_DIR).select("doc_id", "keep")
    cmp = expected_keep.join(got, "doc_id")
    out["q98_keep_mismatches"] = cmp.where(
        F.col("is_best") != F.col("keep")
    ).count()
    out["q98_multi_keep_clusters"] = (
        cmp.where("keep")
        .groupBy("cluster_id")
        .count()
        .where(F.col("count") > 1)
        .count()
    )

    bad = {
        k: v
        for k, v in out.items()
        if k.startswith(("edges_", "labels_", "q98_")) and v != 0
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "cc_audit.json",
    )
    with open(path, "w") as f:
        json.dump({"sf_dir": SF_DIR, **out}, f, indent=1)
        f.write("\n")
    print(json.dumps({"sf_dir": SF_DIR, **out}))
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
