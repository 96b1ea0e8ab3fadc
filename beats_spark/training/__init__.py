"""Training-data pipeline operators: dedup, similarity search, text
analysis, multimodal plumbing — the large-scale data-curation layer on
top of the log-pipeline engine."""
