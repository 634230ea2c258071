from .tables import TABLES, load_events, load_table, normalized_orders

__all__ = ["TABLES", "load_events", "load_table", "normalized_orders"]
