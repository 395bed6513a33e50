"""Malformed-input contracts for the JSONL ingest path (SURVEY §5.2.4).

The reference's tolerance spec: blank lines skipped (analyzer.go:64-66),
malformed JSON skipped with a warning (analyzer.go:70-74), missing
fields tolerated as absent/NULL (omitempty pointers, analyzer.go:15-25).
The engine must match those observable semantics — and keep the bad
rows queryable via the corrupt-record quarantine instead of losing them
to stderr.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from rime_wanxiang_logger_spark.sources.readers import (
    ingest_rime_jsonl,
    read_rime_jsonl,
    rime_events_clean,
)

GOOD = [
    {
        "event_type": "text_committed",
        "committed_text": "你好",
        "selected_candidate_rank": 0,
        "timestamp": "2026-08-13T01:00:01.250Z",
    },
    {
        "event_type": "text_committed",
        # missing rank + buffer fields — preset pruning (cli.py:341)
        "committed_text": "世界",
        "timestamp": "2026-08-13T01:00:02.000Z",
    },
    {"event_type": "session_end", "timestamp": "2026-08-13T01:01:00.000Z"},
]
BAD = [
    '{"event_type": "text_committed", "committed_text": ',  # truncated
    "not json at all",
]


def _write_log(path):
    with open(path, "w") as f:
        for r in GOOD[:2]:
            f.write(json.dumps(r) + "\n")
        f.write("\n")  # blank line — dropped by the source itself
        f.write(BAD[0] + "\n")
        f.write(json.dumps(GOOD[2]) + "\n")
        f.write(BAD[1] + "\n")


def test_malformed_lines_quarantined_not_lost(spark, tmp_path):
    log = tmp_path / "log.jsonl"
    _write_log(log)
    raw = read_rime_jsonl(spark, str(log))
    clean = rime_events_clean(raw)
    rows = clean.orderBy("timestamp").collect()
    # exactly the 3 good events survive, in timestamp order
    assert [r["event_type"] for r in rows] == [
        "text_committed",
        "text_committed",
        "session_end",
    ]
    # missing fields arrive as NULL, not as errors (omitempty parity)
    assert rows[0]["selected_candidate_rank"] == 0
    assert rows[1]["selected_candidate_rank"] is None
    # parsed event-time is populated for every clean row
    assert all(r["ts"] is not None for r in rows)


def test_corrupt_rows_queryable_after_bronze_hop(spark, tmp_path):
    log = tmp_path / "log.jsonl"
    _write_log(log)
    bronze = ingest_rime_jsonl(spark, str(log), str(tmp_path / "bronze"))
    n_bad = bronze.where(F.col("_corrupt_record").isNotNull()).count()
    n_good = bronze.where(F.col("event_type").isNotNull()).count()
    assert n_bad == len(BAD)
    assert n_good == len(GOOD)
    # the quarantined payloads are retrievable verbatim for ops triage
    kept = {
        r["_corrupt_record"]
        for r in bronze.where(F.col("_corrupt_record").isNotNull()).collect()
    }
    assert kept == set(BAD)


def test_wrong_typed_field_is_quarantined(spark, tmp_path):
    """A line whose rank is a string fails the declared schema and must
    land in quarantine — never silently coerce."""
    log = tmp_path / "log.jsonl"
    row = dict(GOOD[0])
    row["selected_candidate_rank"] = "zero"
    with open(log, "w") as f:
        f.write(json.dumps(row) + "\n")
        f.write(json.dumps(GOOD[2]) + "\n")
    bronze = ingest_rime_jsonl(spark, str(log), str(tmp_path / "bronze"))
    assert bronze.where(F.col("_corrupt_record").isNotNull()).count() == 1
    assert rime_events_clean(bronze).count() == 1


def test_ingest_observation_piggybacks_on_first_action(spark, tmp_path):
    """Quality counters must arrive with the caller's own action —
    no extra pass over the data."""
    from rime_wanxiang_logger_spark.sources.readers import (
        ingest_rime_jsonl_observed,
    )

    log = tmp_path / "log.jsonl"
    _write_log(log)
    bronze, obs = ingest_rime_jsonl_observed(
        spark, str(log), str(tmp_path / "bronze")
    )
    n = bronze.count()  # the caller's action; metrics ride along
    assert n == len(GOOD) + len(BAD)
    got = obs.get
    assert got["n_rows"] == len(GOOD) + len(BAD)
    assert got["n_corrupt"] == len(BAD)
    assert got["n_missing_ts"] == 0


def test_misses_csv_roundtrip(spark, sf_dir, tmp_path):
    """K2 closes the loop: the BOM'd Chinese-header CSV this engine
    exports (same layout as the reference CLI's export-misses file)
    must re-ingest into the exact rows that produced it — positional
    schema binding sidesteps the BOM-glued first header."""
    from rime_wanxiang_logger_spark.operators.misses import (
        export_misses_csv,
        q04_export_misses,
        read_misses_csv,
    )

    out = str(tmp_path / "misses.csv")
    src = q04_export_misses(spark, sf_dir)
    export_misses_csv(src, out)
    with open(out, "rb") as f:
        assert f.read(3) == b"\xef\xbb\xbf"  # BOM survived the sink
    # The exact header row, pinned against the reference's mapping
    # (cli.py:334-339 + the derived 错误频率, cli.py:345): one Chinese
    # header per mapped report column, unmapped engine columns
    # (event_id, report_pos) pass through under their ASCII names.
    with open(out, encoding="utf-8-sig") as f:
        header = f.readline().strip()
    assert header == (
        "event_id,用户输入,实际选择,程序预测,选择排名,错误频率,report_pos"
    ), header
    # cache() lifts Spark's corrupt-column-only query restriction
    back = read_misses_csv(spark, out).cache()
    assert back.where(F.col("_corrupt_record").isNotNull()).count() == 0
    cols = [c for c in back.columns if c != "_corrupt_record"]
    want = {tuple(str(v) for v in r) for r in src.select(*cols).collect()}
    got = {tuple(str(v) for v in r) for r in back.select(*cols).collect()}
    assert got == want and want


def test_misses_csv_quarantines_malformed(spark, sf_dir, tmp_path):
    """A torn/garbage line in a re-ingested report lands in
    _corrupt_record (the T5 contract), never fails the read, and
    leaves the good rows intact."""
    from rime_wanxiang_logger_spark.operators.misses import (
        export_misses_csv,
        q04_export_misses,
        read_misses_csv,
    )

    out = str(tmp_path / "misses.csv")
    src = q04_export_misses(spark, sf_dir)
    export_misses_csv(src, out)
    n_rows = src.count()
    with open(out, "a", encoding="utf-8") as f:
        f.write('not,a,valid,row,at,all,x,y,z,"unclosed\n')
    back = read_misses_csv(spark, out).cache()
    assert back.count() == n_rows + 1
    assert back.where(F.col("_corrupt_record").isNotNull()).count() == 1


def test_schema_evolution_merge_reads_both_generations(spark, sf_dir, tmp_path):
    """Lake reality: table schemas grow over time. Two parquet
    generations — the base events and a later one with an added
    column — must read back as ONE table under mergeSchema, with the
    union schema, nulls for the missing column in old files, and no
    rows lost. (Production pins this with an explicit schema registry;
    mergeSchema is the discovery path.)"""
    from pyspark.sql import functions as F

    from rime_wanxiang_logger_spark.sources.readers import load_table

    ev = load_table(spark, sf_dir, "events")
    out = str(tmp_path / "evolved")
    old_half = ev.where(F.col("event_id") % 2 == 0)
    new_half = ev.where(F.col("event_id") % 2 == 1).withColumn(
        "schema_ver", F.lit(2)
    )
    old_half.write.parquet(out + "/gen=1")
    new_half.write.parquet(out + "/gen=2")
    merged = spark.read.option("mergeSchema", "true").parquet(
        out + "/gen=1", out + "/gen=2"
    )
    assert "schema_ver" in merged.columns
    assert merged.count() == ev.count()
    assert merged.where(F.col("schema_ver").isNull()).count() == old_half.count()
    assert merged.where(F.col("schema_ver") == 2).count() == new_half.count()
