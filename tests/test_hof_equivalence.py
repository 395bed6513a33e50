"""Property-based equivalence for the r3 projection rewrites.

q22's signatures, q23's SimHash and q76's repetition stats were
rewritten from explode→groupBy to in-row HOF folds. The oracle suite
pins them on the fixed corpus; these tests pin them on ADVERSARIAL
text hypothesis generates (empty strings, repeated separators, unicode,
single tokens, heavy repetition) against independent pure-Python
replays — two implementations, one spec (SURVEY §5.2.3).
"""

from __future__ import annotations

import hashlib
from collections import Counter

from hypothesis import HealthCheck, given, settings, strategies as st

_P = (1 << 31) - 1

# Texts that stress tokenization edges: leading/trailing/double spaces,
# unicode, repetition. Tokens are derived by BOTH sides as split(" ").
_TEXT = st.lists(
    st.sampled_from(["a", "bb", "ccc", "détente", "a", "", " ", "zz9"]),
    min_size=0,
    max_size=25,
).map(lambda ws: " ".join(ws))

_DOCS = st.lists(_TEXT, min_size=1, max_size=8)


def _mk_docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _md5_prefix_int(s: str, n_hex: int) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:n_hex], 16)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=_DOCS)
def test_minhash_signatures_match_python_replay(spark, texts):
    from rime_wanxiang_logger_spark.operators.dedup import (
        _A,
        _B,
        N_HASHES,
        SHINGLE_WORDS,
        _signatures,
    )

    def replay(text):
        w = text.split(" ")
        if len(w) < SHINGLE_WORDS:
            return None
        hs = [
            _md5_prefix_int(
                " ".join(w[i : i + SHINGLE_WORDS]), 8
            ) % _P
            for i in range(len(w) - SHINGLE_WORDS + 1)
        ]
        return tuple(
            min((_A[s] * h + _B[s]) % _P for h in hs)
            for s in range(N_HASHES)
        )

    got = {
        r["doc_id"]: tuple(r[f"h{s}"] for s in range(N_HASHES))
        for r in _signatures(_mk_docs(spark, texts)).collect()
    }
    expected = {
        i: replay(t) for i, t in enumerate(texts) if replay(t) is not None
    }
    assert got == expected


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=_DOCS)
def test_simhash_matches_python_replay(spark, texts):
    from rime_wanxiang_logger_spark.operators.dedup import q23_simhash

    def replay(text):
        toks = text.split(" ")
        s = [0] * 16
        for t in toks:
            h = _md5_prefix_int(t, 4)
            for i in range(16):
                s[i] += 1 if (h >> i) & 1 == 1 else -1
        sim = sum((1 << i) for i in range(16) if s[i] > 0)
        return (sim, sim % 256, (sim >> 8) & 255)

    # drive q23's internals through a temp parquet dir so load_table
    # resolves it like any sf_dir
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        _mk_docs(spark, texts).write.parquet(f"{d}/documents.parquet")
        got = {
            r["doc_id"]: (r["simhash"], r["band_lo"], r["band_hi"])
            for r in q23_simhash(spark, d).collect()
        }
    assert got == {i: replay(t) for i, t in enumerate(texts)}


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=_DOCS)
def test_repetition_stats_match_python_replay(spark, texts):
    from rime_wanxiang_logger_spark.operators.quality import (
        q76_repetition_stats,
    )

    import tempfile

    with tempfile.TemporaryDirectory() as d:
        _mk_docs(spark, texts).write.parquet(f"{d}/documents.parquet")
        got = {r["doc_id"]: r for r in q76_repetition_stats(spark, d).collect()}

    for i, t in enumerate(texts):
        toks = t.split(" ")
        if len(toks) < 2:
            assert i not in got
            continue
        big = [" ".join(toks[j : j + 2]) for j in range(len(toks) - 1)]
        row = got[i]
        assert row["n_words"] == len(toks)
        # compare pre-rounding ratios within half-ulp of the 9-dp round
        assert abs(row["top_word_frac"] - max(Counter(toks).values()) / len(toks)) <= 5e-10
        assert abs(row["distinct_frac"] - len(set(toks)) / len(toks)) <= 5e-10
        assert abs(
            row["dup_bigram_frac"] - (len(big) - len(set(big))) / len(big)
        ) <= 5e-10
    assert set(got) == {
        i for i, t in enumerate(texts) if len(t.split(" ")) >= 2
    }
