"""PySpark-native analytics engine with the query/data-processing
capabilities of ``MohamedTarek2412/Bigdata-covid19-real-time``.

The reference (/root/reference/spark/covid_streaming.py) is a single-file
Structured-Streaming pipeline: Kafka JSON -> clean/cast -> four branches
(realtime facts, per-location trend forecast, continent windowed rollup,
hotspot filter) -> MySQL, plus two analytical SQL views (init-db/init.sql).

This engine re-expresses all of it Spark-first:

- every transformation is a pure ``DataFrame -> DataFrame`` function
  (unit-testable without streams, reusable batch or streaming);
- sources/sinks are pluggable (kafka, files, memory, jdbc, parquet);
- the streaming runner supports the reference's exact per-micro-batch
  semantics (``parity`` mode) and a corrected incremental mode
  (``streaming`` mode) with real watermarks;
- extension operators (dedup, similarity search, text analysis,
  multimodal plumbing) are designed for 100 TB scale: broadcast where
  small, salt where skewed, no driver-side collects in the hot path.
"""

from bigdata_covid19_real_time_spark.session import get_spark
from bigdata_covid19_real_time_spark.schema import RAW_SCHEMA

__all__ = ["get_spark", "RAW_SCHEMA"]
__version__ = "0.1.0"
