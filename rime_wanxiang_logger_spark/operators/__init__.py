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
    "q31_fingerprint", "q32_multimodal_decode", "q33_sessionize",
    "q34_tumbling_window", "q35_asof_join", "q36_range_join",
    "q37_percentiles", "q38_cube", "q39_pivot", "q40_salted_agg",
    "q41_topk_per_group", "q42_embedding_centroid",
    "q44_ann_ivf", "q45_sketches", "q46_tpch_q3", "q47_grouping_sets",
    "q48_rolling_window", "q49_skew_join",
})

_PKG_DIR = _Path(__file__).resolve().parent
_VERIFIED_HASH_FILE = _PKG_DIR / "_verified_hashes.json"

# Shared-helper sources whose edits change query semantics everywhere
# (reader shims, schemas): they fold into EVERY module's hash, so a
# reader change invalidates the whole verified set.
_GLOBAL_SOURCES = ["../sources/readers.py", "../schemas.py"]
# Per-module extra sources (module stem -> paths relative to this
# package) — e.g. the streaming queries registered in extensions.py
# execute code that lives in streaming/twin.py.
_EXTRA_SOURCES = {
    "extensions": ["../streaming/twin.py"],
}


def _module_src_hash(mod) -> str:
    """Stable digest of a query module's defining source files."""
    base = _Path(mod.__file__).resolve()
    paths = [base]
    for rel in _EXTRA_SOURCES.get(base.stem, []) + _GLOBAL_SOURCES:
        paths.append((_PKG_DIR / rel).resolve())
    h = _hashlib.sha256()
    for p in paths:
        h.update(p.read_bytes())
    return h.hexdigest()[:16]


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
