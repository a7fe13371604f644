from ora_ch_spark.streaming.watermark import (
    streaming_append_bymax,
    streaming_hourly_rollup,
)

__all__ = ["streaming_append_bymax", "streaming_hourly_rollup"]
