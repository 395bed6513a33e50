"""Operator registry: the full SURVEY §2 inventory + LLM-pipeline
extensions, as (query, oracle-SQL) pairs keyed by query name.

Modules register themselves via their ``QUERIES`` / ``ORACLE`` dicts;
this package concatenates them in inventory order. Queries without an
oracle entry (genuinely non-SQL-expressible ops) get the driver's
weaker rows-only check.
"""

from __future__ import annotations

import hashlib as _hashlib
import json as _json
from collections.abc import Callable
from pathlib import Path as _Path

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
try:  # pragma: no cover
    from . import fuzzy

    _MODULES.append(fuzzy)
except ImportError:
    pass
try:  # pragma: no cover
    from . import mixture

    _MODULES.append(mixture)
except ImportError:
    pass
try:  # pragma: no cover
    from . import policy

    _MODULES.append(policy)
except ImportError:
    pass
try:  # pragma: no cover
    from . import tpch_extra

    _MODULES.append(tpch_extra)
except ImportError:
    pass


# Round-1 driver CORRECTNESS verified exactly the first 50 registry
# entries (CORRECTNESS_r01.json) — the driver caps its oracle check at
# 50 queries per round, in dict order. Rotation policy: queries WITHOUT
# a green driver row yet sort first, so the cap always lands on the
# never-verified set; previously-verified queries keep their local
# exact-value DuckDB differential (tests/test_oracle_parity.py) as the
# regression gate. See SURVEY.md §6 (verification rotation).
#
# A green row is only as good as the code it certified: a query whose
# defining module changed AFTER its driver row went green keeps a
# stale green (the r2 q43 regression shipped exactly this way). So
# "verified" is the conjunction of (a) membership in the green-row set
# below and (b) the defining module's source hash still matching the
# hash frozen at verification time (_verified_hashes.json, regenerated
# via ``freeze_verified_hashes()`` ONLY after the local DuckDB parity
# suite is green). An edited module's queries automatically sort
# unverified-first for the next driver round.
_DRIVER_VERIFIED = frozenset({
    "q01_scan_count", "q02_scan_filter_pushdown", "q03_regexp_extract",
    "q04_export_misses", "q05_filter_eq", "q06_filter_ge",
    "q07_accuracy_summary", "q08_freq_window", "q09_asof_enrich",
    "q10_topk_misses", "q11_array_slice", "q11_explode_tokens",
    "q12_string_predicates", "q13_ts_parse_bucket", "q14_json_extract",
    "q15_case_when_classify", "q16_join_broadcast", "q17_join_multiway",
    "q18_semi_anti", "q19_distinct_union", "q20_rollup",
    "q21_dedup_exact",
    # q25 re-registered in r2 as the banded-LSH composition (semantics
    # changed) → dropped from the verified set so the driver re-checks.
    # q43 dropped in r3: its r1 green row predates the streaming
    # ts-unit regression+fix (streaming/twin.py) — driver must re-check.
    # q22/q23/q24/q27 dropped in r3: their execution plans were
    # rewritten (projection signatures) — values verified identical
    # locally, but the driver should re-certify independently, same
    # policy as q43/q56.
    "q26_ann_topk",
    "q28_lang_id", "q29_text_quality", "q30_token_count",
    "q31_fingerprint", "q33_sessionize",
    "q34_tumbling_window", "q35_asof_join", "q36_range_join",
    "q37_percentiles", "q38_cube", "q39_pivot", "q40_salted_agg",
    "q41_topk_per_group", "q42_embedding_centroid",
    "q44_ann_ivf", "q45_sketches", "q46_tpch_q3", "q47_grouping_sets",
    "q48_rolling_window", "q49_skew_join",
    # r3 driver round (CORRECTNESS_r03.json): all 50 checked rows green,
    # covering the full r3-changed set plus q01/q02. Promoted here so the
    # r4 cap lands on new/changed work only (VERDICT r3 "Next round" #1).
    #
    # r4 drops (plan/semantics changed this round — driver must
    # re-certify, the q43/q56 r3 policy): q25/q72 (data-derived split
    # budget + integer need_bits), q27 (packed signature fold), q66
    # (EMBED_DIM constant), q32/q87 (first-codepoint decode), q91
    # (forced-broadcast removal). q92_dedup_admit is new (never green).
    "q22_minhash_lsh", "q23_simhash", "q24_ngram_jaccard",
    "q43_stream_hourly",
    "q50_tpch_q5", "q51_frame_sample", "q52_winnowing",
    "q53_dedup_clusters", "q54_tpch_q17", "q55_tpch_q18",
    "q56_hash_split", "q57_stratified_sample", "q58_curation_funnel",
    "q59_latest_by_key", "q60_session_funnel", "q61_resample_gapfill",
    "q62_scd2_intervals", "q63_variant_extract", "q64_chunk_windows",
    "q65_tpch_q21", "q67_rank_functions",
    "q68_tfidf", "q69_bigram_pmi", "q70_page_rank_replay", "q71_bm25",
    "q73_source_mix", "q74_pack_sequences",
    "q75_decontaminate", "q76_repetition_stats", "q77_rarity_score",
    "q78_inverted_index", "q79_pagerank", "q80_dup_span_coverage",
    "q81_profile_stats", "q82_cdc_merge", "q83_profile_sketch",
    "q84_source_overlap", "q85_leakfree_split", "q86_incremental_dedup",
    "q88_feature_extract", "q89_tpch_q2",
    "q90_tpch_q16",
})

_PKG_DIR = _Path(__file__).resolve().parent
_VERIFIED_HASH_FILE = _PKG_DIR / "_verified_hashes.json"


def _intra_package_imports(path: _Path) -> set[_Path]:
    """Package-internal .py files imported by ``path``.

    Walks the module's AST (so function-local imports like
    extensions.py's ``from ..streaming.twin import ...`` count too) and
    resolves every relative import — ``from .sib import x``,
    ``from . import sib``, ``from ..pkg.mod import x``,
    ``from ..pkg import mod`` — to an existing file. This feeds the
    hash closure below: an edit to dedup.py must invalidate the
    driver-verified rows of mining/pipeline/quality, which execute
    dedup's helpers (the stale-green hole ADVICE r3 flagged).
    """
    import ast

    out: set[_Path] = set()
    try:
        tree = ast.parse(path.read_text())
    except (OSError, SyntaxError):  # pragma: no cover
        return out
    for node in ast.walk(tree):
        if not (isinstance(node, ast.ImportFrom) and node.level > 0):
            continue
        base = path.resolve().parent
        for _ in range(node.level - 1):
            base = base.parent
        parts = node.module.split(".") if node.module else []
        mod_path = base.joinpath(*parts) if parts else base
        as_file = mod_path.with_suffix(".py")
        if parts and as_file.is_file():
            out.add(as_file.resolve())
            continue
        for alias in node.names:  # `from .pkg import mod` forms
            sub = mod_path / (alias.name + ".py")
            if sub.is_file():
                out.add(sub.resolve())
    return out


def _source_closure(path: _Path) -> list[_Path]:
    """Transitive closure of ``path`` over intra-package imports."""
    seen: set[_Path] = set()
    stack = [path.resolve()]
    while stack:
        p = stack.pop()
        if p in seen:
            continue
        seen.add(p)
        stack.extend(_intra_package_imports(p))
    return sorted(seen)


_HASH_CACHE: dict[str, str] = {}


def _module_src_hash(mod) -> str:
    """Stable digest of a query module's defining source files: the
    module itself plus every package-internal file it transitively
    imports (readers/schemas shims, sibling helpers, streaming twins)."""
    base = _Path(mod.__file__).resolve()
    cached = _HASH_CACHE.get(str(base))
    if cached is not None:
        return cached
    h = _hashlib.sha256()
    for p in _source_closure(base):
        h.update(str(p.relative_to(_PKG_DIR.parent)).encode())
        h.update(p.read_bytes())
    digest = h.hexdigest()[:16]
    _HASH_CACHE[str(base)] = digest
    return digest


def _load_verified_hashes() -> dict[str, str]:
    try:
        return _json.loads(_VERIFIED_HASH_FILE.read_text())
    except (OSError, ValueError):  # pragma: no cover
        return {}


def _query_owner() -> dict[str, object]:
    """Map each registered query name to its defining module."""
    owner: dict[str, object] = {}
    for m in _MODULES:
        for name in m.QUERIES:
            owner[name] = m
    return owner


def freeze_verified_hashes() -> None:
    """Re-freeze module source hashes. Run ONLY after
    ``pytest tests/test_oracle_parity.py`` is fully green."""
    hashes = {
        _Path(m.__file__).stem: _module_src_hash(m) for m in _MODULES
    }
    _VERIFIED_HASH_FILE.write_text(_json.dumps(hashes, indent=1) + "\n")


_FROZEN_HASHES = _load_verified_hashes()
_OWNER = _query_owner()


def _is_driver_verified(name: str) -> bool:
    if name not in _DRIVER_VERIFIED:
        return False
    mod = _OWNER.get(name)
    if mod is None:  # pragma: no cover
        return False
    stem = _Path(mod.__file__).stem
    return _FROZEN_HASHES.get(stem) == _module_src_hash(mod)


def _rotation_key(name: str) -> tuple[int, str]:
    return (1 if _is_driver_verified(name) else 0, name)


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
