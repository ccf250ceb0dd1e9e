from bigdata_covid19_real_time_spark.sources.batch import load_table, TABLES

__all__ = ["load_table", "TABLES"]
