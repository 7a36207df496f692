"""Large-scale training-data pipeline operators.

Beyond the reference's versioning surface (SURVEY §2), these are the
operators a 100 TB LLM-corpus pipeline needs, each designed Spark-first:
JVM-side column expressions and array lambdas wherever possible (no Python
UDFs in hot paths), shuffle-minimal shapes (map-side signatures before any
join), and LSH/inverted-index candidate generation instead of quadratic
comparisons.
"""
