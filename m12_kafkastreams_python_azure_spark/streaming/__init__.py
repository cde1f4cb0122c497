from m12_kafkastreams_python_azure_spark.streaming.pipeline import (  # noqa: F401
    HotelsCountStream,
    expedia_stream_projection,
    hotels_count_streaming,
    to_kafka_sink,
    write_update_to_memory,
)
