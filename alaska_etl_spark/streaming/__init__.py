from alaska_etl_spark.streaming.incremental import (
    stream_hourly_wind,
    stream_uscrn,
    stream_wind_readings,
)

__all__ = ["stream_uscrn", "stream_wind_readings", "stream_hourly_wind"]
