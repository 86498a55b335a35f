from kafka_connect_expand_json_transform_spark.llmops import (
    dedup,
    multimodal,
    similarity,
    text_analysis,
)

__all__ = ["dedup", "multimodal", "similarity", "text_analysis"]
