"""Large-scale training-data pipeline operators (BASELINE.json north star):
deduplication, similarity search, text analysis, multimodal columns.

These go beyond the reference's surface; every operator is designed for the
100 TB case first (documented per function) and validated against a DuckDB
oracle at small scale where SQL-expressible.
"""
