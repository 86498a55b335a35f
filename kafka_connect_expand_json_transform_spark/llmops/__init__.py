from kafka_connect_expand_json_transform_spark.llmops import (
    curation,
    dedup,
    packing,
    multimodal,
    similarity,
    text_analysis,
)

__all__ = ["curation", "dedup", "packing", "multimodal", "similarity", "text_analysis"]
