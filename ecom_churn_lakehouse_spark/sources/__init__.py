from .tables import TABLES, load_table, normalized_orders

__all__ = ["TABLES", "load_table", "normalized_orders"]
