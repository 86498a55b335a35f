from kafka_connect_expand_json_transform_spark.functions import text, vectors

__all__ = ["text", "vectors"]
