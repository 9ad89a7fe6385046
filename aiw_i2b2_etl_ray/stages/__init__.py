"""Pipeline stages: normalize -> (shuffle) -> merge -> dims.

Stage mapping to the reference ETL lifecycle
(dest/I2b2QueryResultsHandler.java — SURVEY.md §3.1):

    handleQueryResult (per-key record->row transform)  -> stages.normalize
    EK_TEMP_* staging + EK_* merge stored procedures   -> stages.merge
    dimension factories + dedup                        -> stages.dims
"""
