from driftdb_spark.sources.connectors import (  # noqa: F401
    read_table,
    write_table,
)
