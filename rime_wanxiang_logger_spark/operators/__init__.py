"""Operator registry: the full SURVEY §2 inventory + LLM-pipeline
extensions, as (query, oracle-SQL) pairs keyed by query name.

Modules register themselves via their ``QUERIES`` / ``ORACLE`` dicts;
this package concatenates them in inventory order. Queries without an
oracle entry (genuinely non-SQL-expressible ops) get the driver's
weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import aggregates, extensions, joins, misses, rime, scalars, scans, windows

_MODULES = [scans, misses, aggregates, windows, scalars, joins, extensions, rime]

# Optional modules land here as they are built (dedup, similarity,
# textstats, multimodal) — appended in later milestones.
try:  # pragma: no cover
    from . import dedup

    _MODULES.append(dedup)
except ImportError:
    pass
try:  # pragma: no cover
    from . import similarity

    _MODULES.append(similarity)
except ImportError:
    pass
try:  # pragma: no cover
    from . import textstats

    _MODULES.append(textstats)
except ImportError:
    pass
try:  # pragma: no cover
    from . import multimodal

    _MODULES.append(multimodal)
except ImportError:
    pass
try:  # pragma: no cover
    from . import advanced

    _MODULES.append(advanced)
except ImportError:
    pass
try:  # pragma: no cover
    from . import pipeline

    _MODULES.append(pipeline)
except ImportError:
    pass
try:  # pragma: no cover
    from . import curation

    _MODULES.append(curation)
except ImportError:
    pass
try:  # pragma: no cover
    from . import timeseries

    _MODULES.append(timeseries)
except ImportError:
    pass
try:  # pragma: no cover
    from . import quality

    _MODULES.append(quality)
except ImportError:
    pass
try:  # pragma: no cover
    from . import mining

    _MODULES.append(mining)
except ImportError:
    pass
try:  # pragma: no cover
    from . import maintenance

    _MODULES.append(maintenance)
except ImportError:
    pass


# Round-1 driver CORRECTNESS verified exactly the first 50 registry
# entries (CORRECTNESS_r01.json) — the driver caps its oracle check at
# 50 queries per round, in dict order. Rotation policy: queries WITHOUT
# a green driver row yet sort first, so the cap always lands on the
# never-verified set; previously-verified queries keep their local
# exact-value DuckDB differential (tests/test_oracle_parity.py) as the
# regression gate. See SURVEY.md §6 (verification rotation).
_DRIVER_VERIFIED = frozenset({
    "q01_scan_count", "q02_scan_filter_pushdown", "q03_regexp_extract",
    "q04_export_misses", "q05_filter_eq", "q06_filter_ge",
    "q07_accuracy_summary", "q08_freq_window", "q09_asof_enrich",
    "q10_topk_misses", "q11_array_slice", "q11_explode_tokens",
    "q12_string_predicates", "q13_ts_parse_bucket", "q14_json_extract",
    "q15_case_when_classify", "q16_join_broadcast", "q17_join_multiway",
    "q18_semi_anti", "q19_distinct_union", "q20_rollup",
    "q21_dedup_exact", "q22_minhash_lsh", "q23_simhash",
    # q25 re-registered in r2 as the banded-LSH composition (semantics
    # changed) → dropped from the verified set so the driver re-checks.
    "q24_ngram_jaccard", "q26_ann_topk",
    "q27_ann_lsh", "q28_lang_id", "q29_text_quality", "q30_token_count",
    "q31_fingerprint", "q32_multimodal_decode", "q33_sessionize",
    "q34_tumbling_window", "q35_asof_join", "q36_range_join",
    "q37_percentiles", "q38_cube", "q39_pivot", "q40_salted_agg",
    "q41_topk_per_group", "q42_embedding_centroid", "q43_stream_hourly",
    "q44_ann_ivf", "q45_sketches", "q46_tpch_q3", "q47_grouping_sets",
    "q48_rolling_window", "q49_skew_join",
})


def _rotation_key(name: str) -> tuple[int, str]:
    return (1 if name in _DRIVER_VERIFIED else 0, name)


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        out.update(m.QUERIES)
    return dict(sorted(out.items(), key=lambda kv: _rotation_key(kv[0])))


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(getattr(m, "ORACLE", {}))
    return {
        k: " ".join(v.split())
        for k, v in sorted(out.items(), key=lambda kv: _rotation_key(kv[0]))
    }
