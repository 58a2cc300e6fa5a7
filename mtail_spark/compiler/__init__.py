"""The mtail DSL frontend + Spark backends.

Pipeline (mirrors the reference's compiler stages,
reference internal/runtime/compiler/compiler.go:89-138, but emits
DataFrame plans instead of bytecode):

    parse  ->  check (scopes, decorator splice, const expansion,
               capref typing)  ->  classify  ->  backend

Backends:
- codegen.VectorizedPlan: one projection pass (regex extracts, guards,
  event-time) + one exploded update-event aggregation — for programs
  whose metrics are write-only (the common case).  Scales as a single
  scan + single shuffle.
- interp.FoldRunner: per-file ordered fold via applyInPandas — for
  programs with cross-line state (hidden metrics read back, del,
  metric reads in conditions).  Parallel across files, sequential
  within a file, which is the semantic the DSL demands.
"""

try:  # api imports pyspark; keep pure-frontend use (lexer/parser) light
    from mtail_spark.compiler.api import compile_program  # noqa: F401
except ImportError:  # pragma: no cover - during incremental build
    pass
