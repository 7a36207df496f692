from .tables import TABLES, load_table, register_views
from .datasource import ChroniclesDataSource

__all__ = ["TABLES", "load_table", "register_views", "ChroniclesDataSource"]
