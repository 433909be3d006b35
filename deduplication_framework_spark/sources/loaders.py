"""Dataset loaders + input gates (SURVEY.md S10, S17, S18, O5).

Reference analogs:
* S10 — JSON (line-delimited, top-level array, ``{"data": [...]}``-wrapped),
  CSV, parquet loaders (/root/reference/text/method/clean_the_dataset.py:195-268);
* S17 — precomputed-feature map with fuzzy key matching
  (/root/reference/audio/method/precomputed_utils.py:15-110): npy dict with
  name/stem/digit-normalized keys → broadcast join on a normalized key;
* S18 — random subset sampler (/root/reference/prepare_10k_subset.py:36-73);
* O5 — manifest accessibility pre-check: fail the stage when too much of
  the input is missing (/root/reference/pipelines/orchestrator.py:375-448).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_text_dataset(spark: SparkSession, path: str, fmt: str = None) -> DataFrame:
    """S10: sniff-and-load. JSON handles all three reference layouts:
    line-delimited, top-level array, and {"data": [...]} wrapping."""
    fmt = fmt or path.rsplit(".", 1)[-1].lower()
    if fmt == "parquet":
        return spark.read.parquet(path)
    if fmt == "csv":
        return spark.read.csv(path, header=True, inferSchema=True)
    if fmt in ("json", "jsonl"):
        df = spark.read.json(path)  # line-delimited first (cheap, streaming)
        if df.columns and not df.columns == ["_corrupt_record"]:
            if "data" in df.columns and len(df.columns) == 1:
                return df.select(F.explode("data").alias("row")).select("row.*")
            return df
        multi = spark.read.option("multiLine", "true").json(path)
        if "data" in multi.columns and len(multi.columns) == 1:
            return multi.select(F.explode("data").alias("row")).select("row.*")
        return multi
    raise ValueError(f"unsupported dataset format: {fmt}")


def normalize_join_key(col):
    """S17's fuzzy key: lowercase basename, extension stripped, non-alnum
    removed — so 'Track_01.wav', 'track01.WAV', '/x/track-01' all meet."""
    base = F.element_at(F.split(col, "/"), -1)
    stem = F.regexp_replace(base, r"\.[A-Za-z0-9]+$", "")
    return F.regexp_replace(F.lower(stem), r"[^a-z0-9]", "")


def join_precomputed(
    items: DataFrame,
    precomputed: DataFrame,
    item_key: str,
    pre_key: str,
    how: str = "left",
) -> DataFrame:
    """S17: attach precomputed features via broadcast join on the fuzzy
    normalized key (replaces the reference's driver-side dict probing).

    Multiple precomputed rows can normalize to the SAME fuzzy key
    ('Track_01.wav' and 'track-01.npy' → 'track01'); a dict keeps one
    value per key, so the join side is deduplicated first (deterministic:
    min original key wins) — otherwise item rows silently multiply."""
    from pyspark.sql import Window

    pre = precomputed.withColumn("_nkey", normalize_join_key(F.col(pre_key)))
    w = Window.partitionBy("_nkey").orderBy(F.col(pre_key))
    pre = (
        pre.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    it = items.withColumn("_nkey", normalize_join_key(F.col(item_key)))
    return it.join(F.broadcast(pre.drop(pre_key)), "_nkey", how).drop("_nkey")


def sample_subset(df: DataFrame, n: int, seed: int = 42) -> DataFrame:
    """S18: deterministic ~n-row sample (fraction-based, then exact limit
    ordered by a seeded hash so the subset is stable across partitionings)."""
    total = df.count()
    if total <= n:
        return df
    frac = min(1.0, (n * 1.3) / total)
    # hash every hashable column into the order key: a non-unique key
    # would leave tie order partition-dependent and the limit() cut
    # nondeterministic across parallelism levels. Only MapType (at any
    # nesting depth) is not xxhash64-able — arrays and structs hash fine,
    # and excluding them would reintroduce the tie nondeterminism for
    # frames distinguished only by a complex column.
    from pyspark.sql.types import ArrayType, MapType, StructType

    def _has_map(dt) -> bool:
        if isinstance(dt, MapType):
            return True
        if isinstance(dt, ArrayType):
            return _has_map(dt.elementType)
        if isinstance(dt, StructType):
            return any(_has_map(f.dataType) for f in dt.fields)
        return False

    hashable = [
        f.name for f in df.schema.fields if not _has_map(f.dataType)
    ]
    key = (
        F.xxhash64(*hashable, F.lit(seed))
        if hashable
        else F.xxhash64(F.lit(seed))
    )
    return df.sample(fraction=frac, seed=seed).orderBy(key).limit(n)


class InputGateError(RuntimeError):
    pass


def precondition_gate(
    df: DataFrame, col: str, max_missing_fraction: float = 0.10
) -> DataFrame:
    """O5: fail fast when more than max_missing_fraction of `col` is
    null/empty (reference samples <=10k paths and fails the stage at >10%
    missing). Returns df unchanged when the gate passes."""
    agg = df.agg(
        F.count("*").alias("n"),
        F.sum(
            F.when(
                F.col(col).isNull() | (F.length(F.col(col)) == 0), 1
            ).otherwise(0)
        ).alias("missing"),
    ).collect()[0]
    if agg.n == 0:
        raise InputGateError("input is empty")
    frac = agg.missing / agg.n
    if frac > max_missing_fraction:
        raise InputGateError(
            f"{frac:.1%} of `{col}` missing exceeds gate {max_missing_fraction:.1%}"
        )
    return df
