from spark_streaming_sql_s3_connector_spark.plans.io import load_table, register_views

__all__ = ["load_table", "register_views"]
