from .io import (
    append_idempotent,
    read_settle_config,
    read_table,
    read_tables,
    sink_watermark,
)

__all__ = [
    "read_table",
    "read_tables",
    "read_settle_config",
    "append_idempotent",
    "sink_watermark",
]
