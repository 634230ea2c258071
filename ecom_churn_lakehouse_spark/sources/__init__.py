from .catalog import register_tables, run_sql
from .tables import TABLES, load_events, load_table, normalized_orders

__all__ = [
    "TABLES",
    "load_events",
    "load_table",
    "normalized_orders",
    "register_tables",
    "run_sql",
]
