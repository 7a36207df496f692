"""chronicles_spark — a PySpark-native data-lake table-versioning engine.

A from-scratch rebuild of the capabilities of stettix/chronicles
("version control for big data"): immutable versioned partition storage,
a git-style commit log per table, metadata-only commit/rollback, and a
Spark write/read API — re-expressed Spark-first on the PySpark DataFrame
API, plus the large-scale training-data pipeline operators (dedup,
similarity search, text analysis, multimodal columns) a 100 TB corpus
pipeline needs.

Layout:
  core/       pure-metadata algebra (versions, partitions, paths, ops log,
              fold, diff) — no Spark dependency, fully unit-testable
  trackers/   commit-log backends (in-memory, filesystem JSON, sqlite)
  spark/      versioned write / current-view read / time travel on Spark
  operators/  dedup, similarity, text-analysis, multimodal pipeline ops
  functions/  reusable column expressions (JVM-side, no Python UDFs)
  streaming/  Structured Streaming versioned sink
"""

__version__ = "0.1.0"
