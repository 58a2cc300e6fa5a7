from mtail_spark.sources.logs import log_lines_from_df, read_log_lines  # noqa: F401
from mtail_spark.sources.sockets import (  # noqa: F401
    read_socket_lines,
    run_program_socket_stream,
)
