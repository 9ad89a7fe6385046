"""Run state: the checkpoint manifest (watermarks, lineage, schema version)."""
