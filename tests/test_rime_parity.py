"""Reference-parity tests for the rime-log API (operators/rime.py).

The oracle here is a straight pandas transcription of the reference's
own analyze/export logic (cli.py:268-312, 315-359) — the reference's
"two implementations, one spec" pattern (SURVEY §5.1.1) — plus a pure-
Python sequential replay of the producer state machine for the as-of
query (SURVEY §5.2.3).

Edge semantics pinned: rank 0 = hit, top-3 strictly < 3, -1 sentinel
vs NULL pruned, score 1/(rank+1), misses strictly > 0, (freq DESC,
input ASC) ordering.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

from rime_wanxiang_logger_spark.operators.rime import (
    accuracy_summary,
    asof_replay,
    misses_report,
    session_ids,
)

COLS = [
    "event_type",
    "committed_text",
    "selected_candidate_rank",
    "source_input_buffer",
    "source_first_candidate",
    "input_buffer",
    "candidates",
    "first_candidate",
    "ingest_id",
]


def _mk_events(spark, rows):
    schema = (
        "event_type string, committed_text string,"
        " selected_candidate_rank int, source_input_buffer string,"
        " source_first_candidate string, input_buffer string,"
        " candidates array<string>, first_candidate string, ingest_id bigint"
    )
    return spark.createDataFrame(rows, schema)


def _commit(text, rank, buf=None, first=None, i=0):
    return ("text_committed", text, rank, buf, first, None, None, None, i)


def pandas_analyze(ranks):
    """Transcription of RimeManager.analyze (cli.py:283-309)."""
    s = pd.Series(ranks, dtype="Float64")
    total = len(s)
    valid = s[s.notna() & (s >= 0)]
    out = {
        "total_commits": total,
        "valid_selections": len(valid),
        "first_choice_count": int((valid == 0).sum()),
        "top3_count": int((valid < 3).sum()),
        "direct_count": int((s == -1).sum()),
    }
    if len(valid):
        out["first_choice_rate"] = out["first_choice_count"] / len(valid)
        out["top3_rate"] = out["top3_count"] / len(valid)
        out["avg_rank"] = float(valid.mean())
        out["overall_score"] = float((1.0 / (valid + 1)).mean())
    out["direct_rate"] = out["direct_count"] / total if total else None
    return out


def test_accuracy_summary_golden(spark):
    ranks = [0, 0, 1, 2, 3, -1, None]
    rows = [_commit(f"t{i}", r, i=i) for i, r in enumerate(ranks)]
    rows.append(("session_start", None, None, None, None, None, None, None, 99))
    got = accuracy_summary(_mk_events(spark, rows)).collect()[0].asDict()
    assert got["total_commits"] == 7
    assert got["valid_selections"] == 5
    assert got["first_choice_count"] == 2
    assert got["top3_count"] == 4  # rank < 3, strictly (cli.py:292)
    assert got["direct_count"] == 1  # -1 sentinel ≠ NULL (analyzer.go:110-122)
    assert got["first_choice_rate"] == 2 / 5
    assert got["top3_rate"] == 4 / 5
    assert got["avg_rank"] == 6 / 5
    assert math.isclose(
        got["overall_score"], (1 + 1 + 0.5 + 1 / 3 + 0.25) / 5, rel_tol=1e-12
    )
    assert got["direct_rate"] == 1 / 7


def test_misses_report_golden(spark):
    rows = [
        _commit("好", 1, buf="b_z", first="预1", i=0),
        _commit("好", 2, buf="b_a", first="预2", i=1),
        _commit("了", 3, buf="a_a", first="预3", i=2),
        _commit("hit", 0, buf="x", first="hit", i=3),  # not a miss
        _commit("直", -1, buf="y", first="y", i=4),  # direct, not a miss
    ]
    got = misses_report(_mk_events(spark, rows)).toPandas()
    assert list(got.columns) == [
        "user_input",
        "actual_choice",
        "predicted",
        "selected_rank",
        "err_freq",
    ]
    assert len(got) == 3  # strictly rank > 0 (cli.py:327)
    # freq desc, then user_input asc (cli.py:348)
    assert got["actual_choice"].tolist() == ["好", "好", "了"]
    assert got["user_input"].tolist() == ["b_a", "b_z", "a_a"]
    assert got["err_freq"].tolist() == [2, 2, 1]


def test_misses_report_schema_drift(spark):
    """Preset-pruned columns must not break the report (cli.py:341):
    the normal preset never writes source_input_buffer."""
    schema = (
        "event_type string, committed_text string,"
        " selected_candidate_rank int, ingest_id bigint"
    )
    rows = [("text_committed", "哈", 2, 0), ("text_committed", "哈", 1, 1)]
    got = misses_report(spark.createDataFrame(rows, schema)).toPandas()
    assert list(got.columns) == ["actual_choice", "selected_rank", "err_freq"]
    assert got["err_freq"].tolist() == [2, 2]


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ranks=st.lists(
        st.one_of(
            st.none(), st.integers(min_value=-1, max_value=12)
        ),
        min_size=1,
        max_size=40,
    )
)
def test_accuracy_summary_matches_pandas_reference(spark, ranks):
    rows = [_commit(f"t{i}", r, i=i) for i, r in enumerate(ranks)]
    got = accuracy_summary(_mk_events(spark, rows)).collect()[0].asDict()
    want = pandas_analyze(ranks)
    for k, v in want.items():
        g = got[k]
        if v is None:
            assert g is None, k
        elif isinstance(v, float):
            assert g is not None and math.isclose(g, v, rel_tol=1e-12), (k, g, v)
        else:
            assert g == v, (k, g, v)
    # invariants (SURVEY §5.2.3)
    if got["valid_selections"]:
        assert 0 <= got["first_choice_rate"] <= got["top3_rate"] <= 1
        assert 0 < got["overall_score"] <= 1


def python_replay(events):
    """Sequential replay of the producer state machine
    (input_habit_logger.lua:184-186, 356-380, consumed at 215-277)."""
    last_state = None
    session = 0
    out = {}
    for ev in events:
        kind = ev["event_type"]
        if kind == "session_start":
            session += 1
            last_state = None  # state dies with the session
        elif kind == "input_state_changed":
            last_state = (ev["input_buffer"], ev["first_candidate"])
        elif kind == "text_committed":
            out[ev["ingest_id"]] = last_state
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_asof_replay_matches_sequential_oracle(spark, data):
    n = data.draw(st.integers(min_value=3, max_value=30))
    kinds = data.draw(
        st.lists(
            st.sampled_from(
                ["session_start", "input_state_changed", "text_committed"]
            ),
            min_size=n,
            max_size=n,
        )
    )
    events, rows = [], []
    for i, kind in enumerate(kinds):
        ev = {"event_type": kind, "ingest_id": i}
        if kind == "input_state_changed":
            ev["input_buffer"] = f"buf{i}"
            ev["first_candidate"] = f"cand{i}"
        events.append(ev)
        rows.append(
            (
                kind,
                f"txt{i}" if kind == "text_committed" else None,
                None,
                None,
                None,
                ev.get("input_buffer"),
                None,
                ev.get("first_candidate"),
                i,
            )
        )
    # state must not leak across sessions: force one boundary
    want = python_replay(events)
    df = asof_replay(_mk_events(spark, rows))
    got = {
        r["ingest_id"]: (
            (r["replayed_buffer"], r["replayed_first"])
            if r["replayed_buffer"] is not None
            else None
        )
        for r in df.collect()
    }
    assert got == want


def test_session_ids(spark):
    rows = [
        ("session_start", None, None, None, None, None, None, None, 0),
        _commit("a", 0, i=1),
        ("session_end", None, None, None, None, None, None, None, 2),
        ("session_start", None, None, None, None, None, None, None, 3),
        _commit("b", 1, i=4),
    ]
    got = {
        r["ingest_id"]: r["session_id"]
        for r in session_ids(_mk_events(spark, rows)).collect()
    }
    assert got == {0: 1, 1: 1, 2: 1, 3: 2, 4: 2}
