from feature_engineering_tk_spark.sources.tables import (  # noqa: F401
    ensure_schema,
    iceberg_available,
    load_table,
    write_table,
)
