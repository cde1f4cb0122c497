from m12_kafkastreams_python_azure_spark.operators.enrich import (  # noqa: F401
    enrich_expedia,
    enrich_stay,
)
from m12_kafkastreams_python_azure_spark.operators.aggregate import (  # noqa: F401
    hotels_count,
)
from m12_kafkastreams_python_azure_spark.operators.api import (  # noqa: F401
    ann_topk,
    embedding_near_dup,
    near_dup_pairs,
)
