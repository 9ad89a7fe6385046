"""End-user pipelines: the CDC replay flagship + operator-coverage queries
+ large-scale training-data ops (dedup, similarity, text analysis,
multimodal plumbing)."""
