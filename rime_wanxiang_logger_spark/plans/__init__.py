from .inspect import (  # noqa: F401
    broadcast_pin_scans,
    explain_str,
    global_windows_not_on_aggregate,
    has_broadcast_join,
    is_codegen,
    op_count,
    pushed_filters,
    read_schema_columns,
    shuffle_count,
    unpartitioned_windows,
    uses_python_eval,
)
