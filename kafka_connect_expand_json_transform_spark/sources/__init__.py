from kafka_connect_expand_json_transform_spark.sources.batch import (
    TESTDATA_TABLES,
    load_table,
    load_tables,
    read_csv,
    read_json,
    register_testdata,
    write_parquet,
    write_sorted_parquet,
    write_zorder_parquet,
)
from kafka_connect_expand_json_transform_spark.sources import txlog
from kafka_connect_expand_json_transform_spark.sources.kafka import (
    read_kafka_stream,
    write_kafka_stream,
)

__all__ = [
    "TESTDATA_TABLES",
    "load_table",
    "load_tables",
    "read_csv",
    "read_json",
    "register_testdata",
    "read_kafka_stream",
    "write_kafka_stream",
    "write_parquet",
    "write_sorted_parquet",
    "write_zorder_parquet",
    "txlog",
]
