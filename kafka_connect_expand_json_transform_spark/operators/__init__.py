from kafka_connect_expand_json_transform_spark.operators.expand_json import (
    expand_json,
    expand_json_nested,
)
from kafka_connect_expand_json_transform_spark.operators import (
    profiling,
    relational,
    sketches,
    timeseries,
)

__all__ = [
    "expand_json",
    "expand_json_nested",
    "profiling",
    "relational",
    "sketches",
    "timeseries",
]
