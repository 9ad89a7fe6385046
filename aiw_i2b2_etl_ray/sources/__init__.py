"""Sources: change-log readers + deterministic synthetic generators.

The reference's read path is a declarative relational reader
(dsb/I2B2DataSourceBackend.java:63-401); ours is Parquet with column
pruning, plus seeded generators because no external data is allowed.
"""
