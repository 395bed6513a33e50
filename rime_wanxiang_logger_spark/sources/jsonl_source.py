"""Order-preserving JSONL source via the Spark 4 Python DataSource API.

Why this exists: the reference's semantics lean on FILE ORDER — the Lua
state machine consumes events in append order (input_habit_logger.lua:
356-380) and "first candidate" means list head — but Spark's built-in
JSON reader gives no row-order guarantee and no line numbers
(SURVEY §7.3.1). This source assigns every line a deterministic
``ingest_id = file_index << 32 | line_number`` at parse time, making
append order an explicit, shuffle-proof column that every
order-sensitive operator (q09 as-of replay, sessionization, T2-T4
state machines) can key on.

Scale notes:
- One InputPartition per file: files parse fully in parallel; ordering
  is per-file (exactly the producer's per-log append order), and the
  (file_index, line) encoding makes the global order total.
- Python DataSource readers execute in Python workers (Arrow-batched
  on return) — the right cost for INGEST, which is one pass that lands
  in bronze parquet (``ingest_rime_jsonl``); analytics never re-read
  the raw JSONL. The built-in JVM reader (sources/readers.py) stays
  the default where order doesn't matter.
- Malformed lines follow the engine's quarantine contract: all schema
  fields NULL + the raw line in ``_corrupt_record`` (the Go scanner's
  skip-and-warn, analyzer.go:64-74, kept queryable); a wrong-typed
  field rejects the whole line (json.Unmarshal parity).

Packaging rule: the classes are built INSIDE a factory so cloudpickle
serializes them by value — Spark runs data-source code in separate
Python processes that do not have this repo on sys.path (same
closure-only rule as every Pandas-UDF entry point in this engine; see
the verify skill's ModuleNotFoundError gotcha).

Usage:
    spark.dataSource.register(make_rime_jsonl_datasource())
    df = spark.read.format("rime_jsonl").option("path", dir_or_glob).load()
"""

from __future__ import annotations

from ..schemas import RIME_EVENT_SCHEMA


def make_rime_jsonl_datasource():
    """Build the DataSource class with all config captured as plain
    data in closures (pickles by value — no repo import on workers)."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    fields = [
        f.name for f in RIME_EVENT_SCHEMA.fields if f.name != "_corrupt_record"
    ]
    array_fields = {"source_candidates_list", "candidates"}
    int_fields = {"selected_candidate_rank"}
    bool_fields = {"has_menu"}
    typed = {
        "selected_candidate_rank": "selected_candidate_rank int",
        "source_candidates_list": "source_candidates_list array<string>",
        "candidates": "candidates array<string>",
        "has_menu": "has_menu boolean",
    }
    schema_str = "ingest_id long, " + ", ".join(
        typed.get(name, f"{name} string") for name in fields
    ) + ", _corrupt_record string"
    n_fields = len(fields)

    class _FilePartition(InputPartition):
        def __init__(self, index: int, path: str):
            self.index = index
            self.path = path

    def parse(line: str):
        import json as _json

        bad = tuple([None] * n_fields) + (line,)
        try:
            obj = _json.loads(line)
            if not isinstance(obj, dict) or obj.get("event_type") is None:
                return bad
        except ValueError:
            return bad
        out = []
        for name in fields:
            v = obj.get(name)
            if v is not None:
                if name in array_fields:
                    if not (
                        isinstance(v, list)
                        and all(isinstance(x, str) for x in v)
                    ):
                        return bad
                elif name in int_fields:
                    if isinstance(v, bool) or not isinstance(v, int):
                        return bad
                elif name in bool_fields:
                    if not isinstance(v, bool):
                        return bad
                elif not isinstance(v, str):
                    return bad
            out.append(v)
        return tuple(out) + (None,)

    class RimeJsonlReader(DataSourceReader):
        def __init__(self, options):
            import glob as _glob
            import os as _os

            path = options.get("path")
            if not path:
                raise ValueError("rime_jsonl: 'path' option is required")
            if _os.path.isdir(path):
                self._files = sorted(
                    _glob.glob(_os.path.join(path, "*.jsonl"))
                )
            else:
                self._files = sorted(_glob.glob(path)) or [path]

        def partitions(self):
            return [
                _FilePartition(i, p) for i, p in enumerate(self._files)
            ]

        def read(self, partition):
            base = partition.index << 32
            with open(partition.path, "r", encoding="utf-8") as f:
                for line_no, line in enumerate(f):
                    if line_no >= 1 << 32:
                        # ingest_id packs (file_index << 32 | line_no);
                        # past 2^32 lines the id would bleed into the
                        # next file's space and break the total order —
                        # fail loudly instead.
                        raise ValueError(
                            f"rime_jsonl: {partition.path} exceeds 2^32 "
                            "lines; ingest_id ordering cannot be "
                            "guaranteed (split the file)"
                        )
                    line = line.rstrip("\n")
                    if not line.strip():
                        continue  # blank line skip (analyzer.go:64-66)
                    yield (base | line_no, *parse(line))

    class RimeJsonlDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "rime_jsonl"

        def schema(self):
            return schema_str

        def reader(self, schema) -> RimeJsonlReader:
            return RimeJsonlReader(self.options)

    return RimeJsonlDataSource
