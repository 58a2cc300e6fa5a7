from mtail_spark.streaming.pipeline import (  # noqa: F401
    StreamingMetricStore,
    run_program_stream,
)
