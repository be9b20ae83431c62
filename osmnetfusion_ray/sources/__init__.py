"""Sources / sinks: pruned parquet readers and table adapters."""

from .osm import (load_dim_tables, load_network_gpkg,  # noqa: F401
                  load_network_snapshot, write_snapshot)
from .parquet import pages_from_documents, column_max, read_table, table_rows  # noqa: F401
