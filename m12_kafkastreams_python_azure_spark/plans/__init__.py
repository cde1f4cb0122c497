from m12_kafkastreams_python_azure_spark.plans.checks import (  # noqa: F401
    explain_str,
    has_broadcast_join,
    pushed_filters,
    scan_read_schema,
    wholestage_codegen_spans,
)
