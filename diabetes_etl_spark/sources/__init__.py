from .tables import FIXTURE_TABLES, load_table, register_views

__all__ = ["FIXTURE_TABLES", "load_table", "register_views"]
