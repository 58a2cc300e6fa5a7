"""mtail_spark — a PySpark-native log-to-metrics analytics engine.

Re-implements the computational model of google/mtail (a streaming
log-to-metrics extractor driven by an awk-like DSL; see
reference internal/runtime/) as idiomatic Spark: the mtail DSL is
compiled once into a DataFrame expression DAG (regex extraction
projections -> guard predicates -> grouped aggregations into a metric
store), letting Catalyst/Tungsten own physical execution, instead of
interpreting bytecode per line (reference internal/runtime/vm/vm.go).

Layout:
  compiler/   mtail DSL frontend (lexer, parser, checker) + DataFrame codegen
  functions/  mtail builtin functions as Spark Column functions
  sources/    log-line sources (batch text, streaming text/socket)
  operators/  engine extensions: dedup, similarity search, text analysis
  exporters/  prometheus / json / varz / graphite / statsd formatters
  streaming/  Structured Streaming pipelines + stateful TTL semantics
  plans/      plan helpers (explain auditing, partitioning strategy)
"""

__version__ = "0.1.0"

from mtail_spark.session import get_spark  # noqa: F401
