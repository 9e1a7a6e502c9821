from .pages import PAGES_COLUMNS, read_pages

__all__ = ["PAGES_COLUMNS", "read_pages"]
