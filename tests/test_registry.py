"""Registry / verification-rotation invariants (SURVEY §6).

The r2 q43 regression shipped because a behavior-affecting edit kept a
stale green driver row. These tests pin the fix: a module whose source
no longer matches the hash frozen at verification time must sort its
queries unverified-first, so the driver's capped per-round oracle check
lands on them again.
"""

from __future__ import annotations

import json
from pathlib import Path

import rime_wanxiang_logger_spark.operators as ops


def test_stale_module_sorts_unverified_first(monkeypatch):
    name = "q01_scan_count"
    assert name in ops._DRIVER_VERIFIED
    mod = ops._OWNER[name]
    stem = Path(mod.__file__).stem
    # fresh hash -> verified bucket (sorts after unverified)
    monkeypatch.setitem(ops._FROZEN_HASHES, stem, ops._module_src_hash(mod))
    assert ops._rotation_key(name)[0] == 1
    # simulated source edit: frozen hash no longer matches -> unverified
    monkeypatch.setitem(ops._FROZEN_HASHES, stem, "0" * 16)
    assert ops._rotation_key(name)[0] == 0


def test_never_verified_query_sorts_first():
    # q56 (red r2 hash row) and q43 (stale-green regression) must be
    # outside the verified set so the r3 driver re-checks them.
    assert "q56_hash_split" not in ops._DRIVER_VERIFIED
    assert "q43_stream_hourly" not in ops._DRIVER_VERIFIED
    assert ops._rotation_key("q56_hash_split")[0] == 0
    assert ops._rotation_key("q43_stream_hourly")[0] == 0


def test_frozen_hash_file_well_formed():
    data = json.loads(ops._VERIFIED_HASH_FILE.read_text())
    stems = {Path(m.__file__).stem for m in ops._MODULES}
    assert set(data) <= stems
    assert all(
        isinstance(v, str) and len(v) == 16 for v in data.values()
    )


def test_registry_orders_unverified_before_verified():
    names = list(ops.all_queries())
    buckets = [ops._rotation_key(n)[0] for n in names]
    # monotone: all 0s (unverified) strictly before all 1s (verified)
    assert buckets == sorted(buckets)


def test_every_query_has_an_owner_module():
    assert set(ops.all_queries()) == set(ops._OWNER)
