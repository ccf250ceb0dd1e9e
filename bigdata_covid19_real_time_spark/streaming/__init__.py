from bigdata_covid19_real_time_spark.streaming.runner import (
    CONTINENT_TABLE,
    HOTSPOTS_TABLE,
    PREDICTIONS_TABLE,
    REALTIME_TABLE,
    CovidPipeline,
    dedup_within_watermark,
)
from bigdata_covid19_real_time_spark.streaming.sources import (
    parse_json_value,
    read_jsonl_stream,
    read_kafka_stream,
    to_json_value,
    write_jsonl_batch,
    write_kafka_batch,
)
from bigdata_covid19_real_time_spark.streaming.stateful import (
    cumulative_location_stats,
)

__all__ = [
    "CovidPipeline",
    "dedup_within_watermark",
    "parse_json_value",
    "read_jsonl_stream",
    "read_kafka_stream",
    "to_json_value",
    "write_jsonl_batch",
    "write_kafka_batch",
    "cumulative_location_stats",
    "REALTIME_TABLE",
    "PREDICTIONS_TABLE",
    "CONTINENT_TABLE",
    "HOTSPOTS_TABLE",
]
