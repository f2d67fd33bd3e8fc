from manage_versions_of_data_in_data_lake_using_lakefs_spark.sources.io import (  # noqa: F401
    TABLES,
    load_table,
    load_tables,
    read_csv,
    read_orc,
    read_parquet,
    write_csv,
    write_orc,
    write_parquet,
)
