"""PySpark-native analytics engine with the capabilities of
``joshuagrisham/kafka-connect-expand-json-transform`` (a Kafka Connect SMT that
expands JSON-text fields into typed nested structs with per-record schema
inference), rebuilt Spark-first.

Reference parity (cited per module as reference file:line):
  - ``schema_inference``   — KIP-301-style JSON -> schema rules (ExpandJson.java:191-258)
  - ``operators.expand_json`` — the SMT itself, both modes, key/value (ExpandJson.java:86-129, 277-319)

Engine extensions mandated by the north star (no reference citation possible;
the reference contains no relational/streaming/LLM operators — SURVEY.md §2.1):
  - ``operators.relational`` — as-of join, top-k per group, sessionize, salted
                              join, CDC merge_upsert, dataset_diff, 2D skyline,
                              incremental view maintenance (aggregate_partials /
                              refresh_aggregate), dataset_checksum
  - ``operators.profiling``  — numeric/skew/IQR profiles, constraint_report,
                              cross-table FK orphan audit, heavy hitters
  - ``operators.graph``      — exact-arithmetic PageRank, degree-oriented
                              triangle counting
  - ``operators.sketches``   — HLL partials/rollups (batch + incremental streaming)
  - ``operators.timeseries`` — time-bucket rollup, per-key gap-fill (zero/LOCF),
                              interval-union coverage
  - ``streaming``           — watermarked windows, stateful dedup, kafka wiring
  - ``llmops``              — dedup (exact/minhash/simhash/jaccard/embedding),
                              similarity search, text analysis (TF-IDF, repetition,
                              PII), splits/stratified/domain-mix/cap, benchmark
                              decontamination, sequence packing, multimodal columns
"""

from kafka_connect_expand_json_transform_spark.session import get_spark
from kafka_connect_expand_json_transform_spark.schema_inference import (
    infer_schema_for_json,
    infer_schema_from_samples,
    infer_schema_for_column,
)
from kafka_connect_expand_json_transform_spark.operators.expand_json import expand_json

__all__ = [
    "get_spark",
    "infer_schema_for_json",
    "infer_schema_from_samples",
    "infer_schema_for_column",
    "expand_json",
]

__version__ = "0.1.0"
