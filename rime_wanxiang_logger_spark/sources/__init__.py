from .readers import load_table, read_rime_jsonl, register_views  # noqa: F401
