"""Statement routing + table-properties catalog (SURVEY.md §3 EP1, §4)."""

from .catalog import TableCatalog, TableMeta
from .router import StatementRouter

__all__ = ["StatementRouter", "TableCatalog", "TableMeta"]
