from bigdata_covid19_real_time_spark.sinks.registry import (
    ConsoleSink,
    IdempotentParquetSink,
    JdbcSink,
    MemorySink,
    ParquetSink,
    Sink,
)

__all__ = [
    "Sink",
    "MemorySink",
    "ParquetSink",
    "IdempotentParquetSink",
    "JdbcSink",
    "ConsoleSink",
]
