"""Plan/lifecycle layer (SURVEY.md §2.8): checkpointing table store with
config-hash resume, the end-to-end dedup pipeline, and metrics."""
