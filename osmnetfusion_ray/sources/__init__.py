"""Sources / sinks: pruned parquet readers and table adapters."""

from .parquet import pages_from_documents, read_table  # noqa: F401
