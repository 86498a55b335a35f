from kafka_connect_expand_json_transform_spark.functions import text, udtf, variant, vectors

__all__ = ["text", "udtf", "variant", "vectors"]
