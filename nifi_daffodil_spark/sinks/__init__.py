from nifi_daffodil_spark.sinks.base import TranscriptSink
from nifi_daffodil_spark.sinks.parquet_state import ParquetStateSink

__all__ = ["TranscriptSink", "ParquetStateSink"]
