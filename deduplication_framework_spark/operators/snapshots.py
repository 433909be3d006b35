"""Keep-latest-snapshot selection (recrawl dedup over (url, warc_ts)).

Beyond-reference addition from the web-crawl playbook: a Common-Crawl-style
corpus carries many snapshots of the same url across crawls; most
pipelines keep only the newest capture per url before any content-level
dedup runs (the reference's first-seen-wins keeper,
``text/method/pipeline_api.py:340-370``, is the same family with the
opposite ordering and a content key instead of a url key).

Spark form: ``groupBy(keys).agg(max(struct(ts, tie, payload...)))`` —
ONE shuffle with map-side partial aggregation, deliberately NOT a
``row_number`` window: a hot key (a url recrawled millions of times, a
template page) collapses to one row per map partition BEFORE the
shuffle, where a window would ship every copy to a single straggler
task and sort it there. Same plan shape as the span keep-first
(``operators/spans.py``), pinned by the plan-guard test.

Tie-breaking is total and deterministic: the struct comparison is
lexicographic over (ts, *tie_cols), so pass a unique tie column
(event id, capture digest) to make the survivor independent of
partitioning. Payload columns ride inside the struct and are never
compared unless ts and every tie column collide.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def latest_snapshot(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    tie_cols: Sequence[str] = (),
) -> DataFrame:
    """One row per key: the row with the greatest (ts, *tie_cols).

    Output keeps every input column, keys first, original names. NULL
    timestamps sort lowest (Spark struct comparison), so a key whose every
    snapshot has a NULL ts still yields a row.
    """
    key_cols = list(key_cols)
    tie_cols = list(tie_cols)
    ordered = [ts_col, *tie_cols]
    payload = [c for c in df.columns if c not in key_cols and c not in ordered]
    picked = (
        df.groupBy(*key_cols)
        .agg(F.max(F.struct(*ordered, *payload)).alias("_w"))
        .select(*key_cols, "_w.*")
    )
    return picked.select(*df.columns)
