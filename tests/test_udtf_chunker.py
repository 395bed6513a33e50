"""UDTF surface proof: the Python-UDTF chunker must produce exactly the
rows of the native q64_chunk_windows formulation (sf0.001 — UDTFs are
the slow path; the native plan is the one that runs at scale)."""

from __future__ import annotations

from oracle_utils import assert_frames_match

from rime_wanxiang_logger_spark.operators.textstats import q64_chunk_windows
from rime_wanxiang_logger_spark.operators.udtf_chunker import chunk_windows_via_udtf

SF_SMALL = "/root/testdata/sf0.001"


def test_udtf_matches_native(spark):
    native = q64_chunk_windows(spark, SF_SMALL).toPandas()
    via_udtf = chunk_windows_via_udtf(spark, SF_SMALL).toPandas()
    assert len(native) > 0
    assert_frames_match(via_udtf, native, "udtf_chunker")


def test_chunks_cover_and_overlap(spark):
    pdf = q64_chunk_windows(spark, SF_SMALL).toPandas()
    g = pdf.groupby("doc_id")
    # every doc chunks; first chunk is idx 0; token counts within (0, W]
    assert (g["chunk_idx"].min() == 0).all()
    assert (pdf["n_chunk_tokens"] > 0).all()
    assert (pdf["n_chunk_tokens"] <= 32).all()
