"""Warehouse load protocol + the analytics query layer."""

from alaska_etl_spark.plans.warehouse import Warehouse  # noqa: F401
from alaska_etl_spark.plans.analytics import (  # noqa: F401
    forecast_vs_actual,
    lead_time_error,
)
