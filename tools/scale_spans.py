"""Span-dedup scale anchor: keep-first exact span dedup on a corpus with a
pathologically hot boilerplate span (one copy in EVERY doc) plus a shared
template block — the exact shape the min-struct aggregation in
operators/spans.py::dedup_spans_df exists for (a row_number window would
funnel all N copies of the hot span into one task; min-of-struct collapses
them map-side before the shuffle).

Usage: python tools/scale_spans.py [n_docs] [cores]   (default 200000 16)

Corpus (generated distributively with spark.range — nothing driver-side):
* every doc: 1 hot span (identical everywhere) + 19 unique spans;
* every 10th doc additionally carries the same 5-span template block.
Expected survivors are exactly computable, and the script HARD-ASSERTS
them: 19*N unique + 1 hot + 5 template spans kept; zero docs emptied
(every doc keeps its unique spans). Prints one JSON line with wall time
and docs/s.
"""

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from deduplication_framework_spark.operators.spans import dedup_spans
from deduplication_framework_spark.session import get_spark


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    spark = get_spark(
        app_name="scale-spans",
        master=f"local[{cores}]",
        shuffle_partitions=2 * cores,
    )

    hot = "all rights reserved contact the webmaster for details"
    template = "\n".join(f"template block line {j} of the shared cms" for j in range(5))
    uniq = F.concat_ws(
        "\n",
        *[F.format_string(f"unique span %d token-{j}", F.col("id")) for j in range(19)],
    )
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            "\n",
            F.lit(hot),
            uniq,
            F.when(F.col("id") % 10 == 0, F.lit(template)),
        ).alias("text"),
    )

    t0 = time.time()
    out = dedup_spans(docs, id_col="doc_id")
    agg = out.agg(
        F.sum("n_spans").alias("spans"),
        F.sum("n_kept").alias("kept"),
        F.sum((F.col("n_kept") == 0).cast("long")).alias("emptied"),
        F.count("*").alias("docs"),
    ).first()
    wall = time.time() - t0

    exp_spans = 20 * n_docs + 5 * (n_docs // 10 + (1 if n_docs % 10 else 0))
    exp_kept = 19 * n_docs + 1 + 5
    assert agg["docs"] == n_docs, agg
    assert agg["spans"] == exp_spans, (agg, exp_spans)
    assert agg["kept"] == exp_kept, (agg, exp_kept)
    assert agg["emptied"] == 0, agg

    print(json.dumps({
        "n_docs": n_docs,
        "cores": cores,
        "n_spans": int(agg["spans"]),
        "n_kept": int(agg["kept"]),
        "hot_span_copies": n_docs,
        "wall_s": round(wall, 2),
        "docs_per_s": round(n_docs / wall, 1),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
