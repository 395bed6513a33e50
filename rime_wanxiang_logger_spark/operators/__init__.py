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

from . import aggregates, extensions, joins, misses, scalars, scans, windows

_MODULES = [scans, misses, aggregates, windows, scalars, joins, extensions]

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


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        out.update(m.QUERIES)
    return dict(sorted(out.items()))


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(getattr(m, "ORACLE", {}))
    return {k: " ".join(v.split()) for k, v in sorted(out.items())}
