"""Logical-plan helpers: the commit-log algebra as distributed DataFrame
computations, plus the deterministic synthetic ops-log used by the oracle
harness."""
