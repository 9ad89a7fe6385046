"""Vectorized scalar-function catalog (SURVEY.md §2.8).

Every kernel takes/returns Arrow arrays or tables; none iterate Python rows
except the cryptographic hash (per-row by nature, C-backed hashlib).
"""
