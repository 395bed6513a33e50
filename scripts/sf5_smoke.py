#!/usr/bin/env python
"""Full-registry execution smoke at a mid-scale dir (default /tmp/sf5,
50x the bench SF): run EVERY registered query raw (no stage sharing)
to completion and record wall + row outcome per query.

Why this exists (r9): correctness is proven per-query at sf0.01
(driver) and sf1 (scale_parity.json), and the 22-query sweep subset is
timed through sf20 — but nothing guaranteed the OTHER ~96 queries even
EXECUTE above sf1. q117 proved the gap real: its first-ever raw sf5
run OOM-crashed the driver (checkpoint originStats understated the
posting list by orders of magnitude, so the static planner broadcast
it). This smoke closes that class: every registered query must
complete raw at sf5, every round the registry or data recipe changes.

Timings here are NOT scaling claims (single warm session, arbitrary
order, no idle-host gating) — the gated ratios live in
scale_proof.json. The pass/fail column is the artifact.

Run:  python scripts/sf5_smoke.py [sf_dir]      (default /tmp/sf5)
      python scripts/sf5_smoke.py [sf_dir] --only name [name...]
          targeted re-run MERGED into the standing artifact (the
          scale_proof --only pattern, r11) — for newly registered
          queries without re-paying the full ~15 min sweep.
Writes sf5_smoke.json at the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rime_wanxiang_logger_spark.operators import all_queries  # noqa: E402
from rime_wanxiang_logger_spark.session import get_spark  # noqa: E402

_ARGS = sys.argv[1:]
ONLY: list[str] | None = None
if "--only" in _ARGS:
    i = _ARGS.index("--only")
    ONLY = _ARGS[i + 1 :]
    _ARGS = _ARGS[:i]
    # ADVICE r11: an empty --only would silently run nothing and
    # still rewrite the artifact
    assert ONLY, "--only requires at least one query name"
SF_DIR = _ARGS[0] if _ARGS else "/tmp/sf5"


def main() -> None:
    spark = get_spark("sf5-smoke")
    funcs = all_queries()
    if ONLY is not None:
        missing = set(ONLY) - set(funcs)
        assert not missing, f"unknown queries: {missing}"
        funcs = {k: v for k, v in funcs.items() if k in ONLY}
    import glob

    for p in sorted(glob.glob(f"{SF_DIR}/*.parquet")):
        spark.read.parquet(p).count()  # warm footer caches

    out: dict[str, dict] = {}
    failures = 0
    for i, (name, fn) in enumerate(funcs.items(), 1):
        t0 = time.perf_counter()
        try:
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            wall = round(time.perf_counter() - t0, 2)
            out[name] = {"ok": True, "wall": wall}
            print(f"[{i:3d}] {name}: OK {wall:.1f}s", flush=True)
        except Exception as ex:  # record and continue — the artifact
            wall = round(time.perf_counter() - t0, 2)
            failures += 1
            out[name] = {
                "ok": False,
                "wall": wall,
                "err": f"{type(ex).__name__}: {str(ex)[:300]}",
            }
            print(f"[{i:3d}] {name}: FAILED {wall:.1f}s {type(ex).__name__}",
                  flush=True)
            traceback.print_exc(limit=3, file=sys.stderr)

    path = os.path.abspath(os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "sf5_smoke.json"
    ))
    sf_dir_out = SF_DIR
    if ONLY is not None and os.path.exists(path):
        # targeted mode: merge the re-run rows over the standing
        # artifact (replacing each re-run query's row wholesale).
        # ADVICE r11: preserve the standing run's top-level sf_dir —
        # it describes the bulk of the rows; targeted rows record
        # their own sf_dir only when it differs, keeping provenance
        # unambiguous either way.
        prior = json.load(open(path))
        standing = prior["queries"]
        if prior.get("sf_dir") != SF_DIR:
            # ADVICE r12: a MISSING prior sf_dir also counts as
            # "differs" — stamping this targeted run's dir over the
            # standing rows would mislabel where the bulk of them
            # were produced. Annotate the re-run rows and keep the
            # top level at the prior value (possibly null).
            for row in out.values():
                row["sf_dir"] = SF_DIR
            sf_dir_out = prior.get("sf_dir")
        standing.update(out)
        out = standing
        failures = sum(1 for v in out.values() if not v["ok"])
    with open(path, "w") as f:
        json.dump(
            {"sf_dir": sf_dir_out, "n": len(out), "failures": failures,
             "queries": out},
            f, indent=1,
        )
        f.write("\n")
    print(f"{len(out)} queries, {failures} failures -> {path}", flush=True)
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
