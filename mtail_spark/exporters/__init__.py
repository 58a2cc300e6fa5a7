from mtail_spark.exporters.formats import (  # noqa: F401
    to_collectd,
    to_graphite,
    to_json,
    to_prometheus,
    to_statsd,
    to_varz,
)
from mtail_spark.exporters.http import MetricsServer  # noqa: F401
