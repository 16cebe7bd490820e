from .tables import TABLES, load_table, load_tables, register_views
from .text import read_lines, read_tab_pairs, write_kv_text

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "register_views",
    "read_lines",
    "read_tab_pairs",
    "write_kv_text",
]
