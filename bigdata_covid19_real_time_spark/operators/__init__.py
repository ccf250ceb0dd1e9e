from bigdata_covid19_real_time_spark.operators.predict import predict_future_trends
from bigdata_covid19_real_time_spark.operators.hotspot import detect_hotspots
from bigdata_covid19_real_time_spark.operators.aggregate import (
    continent_window_stats,
    country_rankings,
    dashboard_summary,
    top_affected_countries,
    windowed_location_stats,
)

__all__ = [
    "predict_future_trends",
    "detect_hotspots",
    "continent_window_stats",
    "country_rankings",
    "dashboard_summary",
    "top_affected_countries",
    "windowed_location_stats",
]
