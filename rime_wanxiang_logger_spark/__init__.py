"""rime_wanxiang_logger_spark — a PySpark-native analytics engine.

A brand-new engine with the query/data-processing capabilities of the
reference repo `superGekFordJ/rime_wanxiang_logger` (an input-method
event logger + pandas/Go analyzers), re-expressed Spark-first:

- the JSONL event log becomes a schema'd DataFrame source (batch) and a
  Structured Streaming source (live tail);
- the hard-coded pandas/Go queries become a library of composable,
  lazily-planned DataFrame query functions (see ``operators/``);
- producer-side config filtering becomes Catalyst predicate pushdown and
  column pruning;
- the producer's in-IME state machine becomes window functions (batch)
  and stateful streaming operators (live).

Beyond reference parity, the engine ships the LLM-data-pipeline operator
set (dedup, similarity search, text analysis, multimodal plumbing)
designed for 100 TB scale.

Layout:
    session.py    SparkSession factory with scale-aware defaults
    schemas.py    event-log schema (SURVEY §1.3) + star-schema registry
    sources/      readers (parquet/JSONL PERMISSIVE), table loader
    functions/    deterministic-aggregation helpers, text/hash utils
    operators/    the full query inventory (SURVEY §2 + LLM extensions)
    streaming/    structured-streaming twin of the producer state machine
    plans/        plan-inspection utilities (explain/pushdown checks)
"""

__version__ = "0.1.0"
