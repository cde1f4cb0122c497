from m12_kafkastreams_python_azure_spark.functions.dates import (  # noqa: F401
    STAY_CATEGORIES,
    parse_date_lenient,
    stay_category,
    stay_duration_days,
)
from m12_kafkastreams_python_azure_spark.functions.text import (  # noqa: F401
    doc_fingerprint,
    language_id,
    quality_score_cols,
    token_count,
)
from m12_kafkastreams_python_azure_spark.functions.vectors import (  # noqa: F401
    cosine_similarity,
    dot_product,
    l2_norm,
)
