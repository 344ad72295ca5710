from .catalog import load_table, register_views  # noqa: F401
from . import cdx, jsonl, tenancy, txlog, warc  # noqa: F401
