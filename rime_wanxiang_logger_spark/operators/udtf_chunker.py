"""Python UDTF twin of q64_chunk_windows — the table-function API
surface (SURVEY §2.12).

The reference needs zero UDTFs (its only table-generating shape is
covered by ``explode``); this module exists to prove the engine's UDTF
extension point with a real 1→many operator, hash-matched against the
native `sequence`+`explode`+`slice` formulation in
``textstats.q64_chunk_windows``. The native version is the production
path — a row-at-a-time Python UDTF is the slow path and must never be
the 100 TB plan; keep UDTFs for semantics built-ins truly can't
express.

Not registered in the oracle inventory: q64 already carries the
DuckDB oracle; the UDTF is pinned to q64 by ``tests/test_udtf_chunker``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import udtf

from ..sources.readers import load_table
from .textstats import CHUNK_S, CHUNK_W


class _ChunkWindows:
    """Emit overlapping W-token windows at stride S; a trailing window
    is kept only if it adds ≥1 token beyond its predecessor."""

    def eval(self, doc_id, text):  # noqa: ANN001 — UDTF protocol
        words = (text or "").split(" ")
        n = len(words)
        start, idx = 1, 0
        while start <= max(n, 1):
            if start == 1 or start + (CHUNK_W - CHUNK_S) <= n:
                chunk = words[start - 1 : start - 1 + CHUNK_W]
                yield doc_id, idx, " ".join(chunk), min(CHUNK_W, n - start + 1)
            idx += 1
            start += CHUNK_S


chunk_windows_udtf = udtf(
    _ChunkWindows,
    returnType=(
        "doc_id bigint, chunk_idx int, chunk_text string, n_chunk_tokens int"
    ),
)


def chunk_windows_via_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q64's semantics through a LATERAL Python UDTF call."""
    docs = load_table(spark, sf_dir, "documents")
    spark.udtf.register("chunk_windows_tf", chunk_windows_udtf)
    return spark.sql(
        "SELECT c.* FROM {docs} d, LATERAL chunk_windows_tf(d.doc_id, d.text) c",
        docs=docs,
    )
