from m12_kafkastreams_python_azure_spark.operators.enrich import (  # noqa: F401
    enrich_expedia,
    enrich_stay,
)
from m12_kafkastreams_python_azure_spark.operators.aggregate import (  # noqa: F401
    hotels_count,
)
