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


def _rate_hex_threshold(rate: float) -> str:
    """8-hex-char keep threshold for a [0,1] rate: a row is kept iff the
    first 8 hex chars of its md5 bucket compare BELOW this string.
    Fixed-width lowercase hex makes string order == numeric order, so
    both Spark and any SQL oracle decide with a plain varchar compare —
    no hex parsing, no float rounding skew between engines."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    n = int(round(rate * 16**8))
    if n >= 16**8:
        # rate 1.0 must keep EVERY row under the strict '<': 'g' sorts
        # above every hex char in both engines (plain byte order)
        return "g"
    return format(n, "08x")


def md5_bucket_col(col, salt: str):
    """8-hex-char decision bucket ``md5(f"{col}:{salt}")[:8]`` — the
    Column twin of the VARCHAR bucket in :func:`stratified_sample_sql`;
    compared against :func:`_rate_hex_threshold` strings. Shared by
    stratified sampling and leakage-safe splitting."""
    c = col if not isinstance(col, str) else F.col(col)
    return F.substring(
        F.md5(F.concat_ws(":", c.cast("string"), F.lit(salt))), 1, 8
    )


def stratified_sample(
    df: DataFrame,
    rates: dict,
    *,
    stratum_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "strat",
    default_rate: float = 0.0,
) -> DataFrame:
    """S18 at corpus scale: deterministic per-stratum Bernoulli sampling
    (dataset mixing — keep fraction ``rates[stratum]`` of each stratum).

    A row is kept iff ``md5(f"{id}:{salt}")[:8] < hex(rate * 2^32)`` for
    its stratum's rate. Pure map-side column expressions — no shuffle,
    no count job, no ordering; a row's decision depends only on its own
    id, so the sample is stable under corpus growth, repartitioning and
    engine (``stratified_sample_sql`` generates the DuckDB twin from the
    SAME thresholds — the ``canonical_url_sql`` pattern). Contrast
    ``sample_subset``: exact-n via order-and-limit, for when the target
    is a row count rather than per-stratum rates.

    Adds a ``sample_bucket`` column (the 8-hex-char bucket) so callers
    and oracles can audit the decision."""
    bucket = md5_bucket_col(id_col, salt)
    thr = F.lit(_rate_hex_threshold(default_rate))
    for stratum, rate in sorted(rates.items()):
        thr = F.when(
            F.col(stratum_col) == stratum, F.lit(_rate_hex_threshold(rate))
        ).otherwise(thr)
    return df.withColumn("sample_bucket", bucket).filter(
        F.col("sample_bucket") < thr
    )


def stratified_sample_sql(
    rates: dict,
    *,
    stratum_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "strat",
    default_rate: float = 0.0,
) -> tuple:
    """(bucket_sql, keep_predicate_sql) — the DuckDB twin of
    :func:`stratified_sample`, generated from the same thresholds.
    Stratum names and the salt are data, not SQL — embedded quotes are
    doubled so a stratum like ``o'reilly`` still generates valid SQL
    that matches the Spark side."""

    def q(s: str) -> str:
        return "'" + str(s).replace("'", "''") + "'"

    bucket = f"substring(md5({id_col}::VARCHAR || ':' || {q(salt)}), 1, 8)"
    cases = " ".join(
        f"WHEN {stratum_col} = {q(s)} THEN '{_rate_hex_threshold(r)}'"
        for s, r in sorted(rates.items())
    )
    thr = f"CASE {cases} ELSE '{_rate_hex_threshold(default_rate)}' END"
    return bucket, f"{bucket} < {thr}"
