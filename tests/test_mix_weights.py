"""Temperature mixing weights (q_source_mix_weights): hand-computed
semantics, flattening property, and the per-SF rounding-margin
preconditions the cross-engine parity relies on."""

import math

import duckdb
import pytest


def _margin(x: float) -> float:
    return abs(x % 1.0 - 0.5)


@pytest.mark.parametrize("sf", ["0.001", "0.01", "0.1"])
def test_rounding_margins_in_testdata(sf):
    """Both engines round(sqrt(n)*1e6) and round(ppm ratio)
    independently; every rounded value must sit far from a .5 boundary
    relative to cross-engine drift (sqrt is IEEE-exact-rounded, the
    ratio is one exact product + one correctly-rounded division —
    drift <= 1 ulp ~ 1e-8 at this magnitude; demand 1e-4)."""
    con = duckdb.connect()
    counts = con.execute(
        f"SELECT count(*) FROM read_parquet("
        f"'/root/testdata/sf{sf}/documents.parquet') GROUP BY source"
    ).fetchall()
    sqrt_micros = []
    for (n,) in counts:
        x = math.sqrt(n) * 1e6
        assert _margin(x) > 1e-4, (sf, n, x)
        sqrt_micros.append(round(x))
    tot = sum(sqrt_micros)
    for a in sqrt_micros:
        r = a * 1e6 / tot
        assert _margin(r) > 1e-4, (sf, a, r)


def test_alpha_half_flattens():
    # the defining property: a 100x bigger source gets only 10x the
    # weight — verify on the hand formula the query implements
    n = {"big": 10_000, "small": 100}
    sm = {k: round(math.sqrt(v) * 1e6) for k, v in n.items()}
    tot = sum(sm.values())
    ppm = {k: round(v * 1e6 / tot) for k, v in sm.items()}
    assert ppm["big"] / ppm["small"] == pytest.approx(10.0, rel=1e-3)
    assert abs(sum(ppm.values()) - 1_000_000) <= len(ppm)  # rounding slack
