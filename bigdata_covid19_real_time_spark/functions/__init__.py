from bigdata_covid19_real_time_spark.functions.cleaning import (
    clean_observations,
    sentinel_to_double,
)
from bigdata_covid19_real_time_spark.functions.enrich import enrich_observations

__all__ = ["clean_observations", "sentinel_to_double", "enrich_observations"]
