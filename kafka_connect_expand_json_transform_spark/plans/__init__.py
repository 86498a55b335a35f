from kafka_connect_expand_json_transform_spark.plans.queries import ORACLES, QUERIES

__all__ = ["QUERIES", "ORACLES"]
