"""Cross-engine md5-low-60-bit hash — ONE owner for the twin contract.

Several operators need a deterministic integer hash that Spark and
DuckDB compute identically (the driver-gate parity contract): DSIR's
token buckets, sequence packing's shard/order keys. The shared recipe:
the LOW 60 BITS of ``md5(expr)`` — 15 hex chars (positions 18..32)
always fit a signed BIGINT, Spark's ``conv`` is exact for 15 hex digits
(unsigned 64-bit internally), and DuckDB casts the same substring via a
``0x`` literal. Both sides are generated here so the two dialects
cannot drift (the ``langid``/``stratified_sample`` pattern).
"""

from __future__ import annotations

__all__ = ["spark_md5_low60", "duck_md5_low60"]


def spark_md5_low60(expr: str) -> str:
    """Spark SQL for the low-60-bit md5 of string expression ``expr``."""
    return (
        f"CAST(conv(substring(md5({expr}), 18, 15), 16, 10) AS BIGINT)"
    )


def duck_md5_low60(expr: str) -> str:
    """DuckDB SQL computing the identical value."""
    return f"(('0x' || substr(md5({expr}), 18, 15))::BIGINT)"
