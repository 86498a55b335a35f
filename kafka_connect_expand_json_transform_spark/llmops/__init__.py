from kafka_connect_expand_json_transform_spark.llmops import (
    curation,
    decontamination,
    dedup,
    packing,
    multimodal,
    similarity,
    splits,
    text_analysis,
)

__all__ = [
    "curation",
    "decontamination",
    "dedup",
    "packing",
    "multimodal",
    "similarity",
    "splits",
    "text_analysis",
]
