"""FQL — the fossil query language, compiled to Spark DataFrame plans.

Grammar parity: /root/reference/docs/grammar.md and
/root/reference/pkg/query/{scanner,parser,ast}. Execution is NOT a
port of the reference's channel pipeline (pkg/query/plan/pipeline.go);
queries compile to declarative DataFrame operations so Catalyst can
push filters into the scan, prune columns/partitions, and keep the
whole pipeline inside whole-stage codegen.
"""

from fossil_spark.fql.parser import parse
from fossil_spark.fql.compiler import compile_query, fql

__all__ = ["parse", "compile_query", "fql"]
