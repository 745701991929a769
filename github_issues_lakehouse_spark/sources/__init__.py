from .registry import TABLES, load_table, load_tables  # noqa: F401
from .readers import read_jsonl_issues, read_parquet, read_csv  # noqa: F401
