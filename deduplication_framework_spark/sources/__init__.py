"""Sources & sinks (SURVEY.md §2.1): synthetic pages corpus, testdata parquet
loaders, and the checkpointing table store lives in ``plans.checkpoint``."""
