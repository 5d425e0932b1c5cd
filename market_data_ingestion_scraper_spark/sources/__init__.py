from .jsonl import DOCUMENTS_SCHEMA, read_jsonl, stream_jsonl, write_jsonl
from .tables import TABLES, load_table, load_tables, register_views

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "register_views",
    "DOCUMENTS_SCHEMA",
    "read_jsonl",
    "stream_jsonl",
    "write_jsonl",
]
