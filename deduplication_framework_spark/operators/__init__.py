"""Distributed operators (SURVEY.md §2.3-2.7): exact dedup, LSH banding,
candidate pair generation with skew salting, verification, connected
components, keeper selection, embedding dedup."""
