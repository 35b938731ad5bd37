"""PySpark-native analytics engine with the capabilities of the
``cutterkom/remove-na-lgbtiq-queer-knowledge-graph`` reference pipeline.

The reference (read-only at /root/reference) is a knowledge-graph
construction pipeline: heterogeneous ingestion, relational normalization,
entity resolution (n-gram similarity joins + string distances + iterative
id remapping), RDF triple materialization, SPARQL-ish graph querying, and
network analytics.  This package re-expresses those capabilities as
idiomatic Spark DataFrame/SQL plans designed for 100 TB scale, plus the
LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing) a modern training-data pipeline needs.

Layout
------
- ``session``    : SparkSession factory tuned for the driver harness.
- ``sources``    : parquet star-schema loaders / sink idioms.
- ``functions``  : scalar column-expression helpers (strings, dates).
- ``operators``  : relational idioms, similarity/ER, dedup, text, ANN,
                   graph analytics.
- ``plans``      : BGP (triple-pattern) planner, R2RML-style materializer,
                   property-path fixpoint.
- ``streaming``  : Structured Streaming twins of the batch ops.
- ``registry``   : the (queries, oracle_sql) contract consumed by
                   ``__spark_entry__.py``.
"""

__version__ = "0.1.0"
