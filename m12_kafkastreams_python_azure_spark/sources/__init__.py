from m12_kafkastreams_python_azure_spark.sources.readers import (  # noqa: F401
    TPCH_TABLES,
    load_table,
    load_tables,
    mask_field,
    read_avro,
    read_json_stream_from_files,
    read_kafka_stream,
    register_views,
)
