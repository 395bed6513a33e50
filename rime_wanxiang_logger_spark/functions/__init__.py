from .stable import dsum, davg, dsum_expr, davg_expr  # noqa: F401
