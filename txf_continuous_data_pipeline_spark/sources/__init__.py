from .io import read_table, read_tables, append_idempotent, sink_watermark

__all__ = ["read_table", "read_tables", "append_idempotent", "sink_watermark"]
