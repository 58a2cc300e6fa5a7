from mtail_spark.sources.logs import log_lines_from_df, read_log_lines  # noqa: F401
