from sensomics_data_pipeline_spark.sources.readers import (  # noqa: F401
    load_table,
    load_tables,
    read_measurements_csv,
    read_raw_json,
)
