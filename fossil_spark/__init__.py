"""fossil_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of dburkart/fossil (time-series store +
query language + map/filter/reduce pipelines), extended with the
operators a large-scale training-data pipeline needs (dedup,
similarity search, text analysis, multimodal plumbing).

Everything is expressed Spark-first: declarative DataFrame plans that
Catalyst can optimize (pushdown, pruning, broadcast, AQE), with
Arrow-batched pandas UDFs only where built-ins cannot express the
semantics.
"""

from fossil_spark.session import get_spark

__all__ = [
    "get_spark", "EventStore", "fql",
    "FossilServer", "FossilClient", "curate_corpus", "curate_stream",
    "semantic_dedup",
]


def __getattr__(name):
    # lazy re-exports: importing fossil_spark must not require an
    # active JVM until something is actually used
    if name == "EventStore":
        from fossil_spark.store import EventStore
        return EventStore
    if name == "fql":
        from fossil_spark.fql import fql
        return fql
    if name in ("FossilServer", "FossilClient"):
        from fossil_spark import server
        return getattr(server, name)
    if name in ("curate_corpus", "curate_stream", "semantic_dedup"):
        from fossil_spark import pipelines
        return getattr(pipelines, name)
    raise AttributeError(name)
