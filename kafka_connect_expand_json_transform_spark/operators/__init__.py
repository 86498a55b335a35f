from kafka_connect_expand_json_transform_spark.operators.expand_json import expand_json
from kafka_connect_expand_json_transform_spark.operators import profiling, relational

__all__ = ["expand_json", "profiling", "relational"]
