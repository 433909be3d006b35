"""Local replica of the driver's correctness gate: run every queries() entry
on Spark AND its oracle_sql() on DuckDB at sf0.01, compare row count, column
names, and order-insensitive values. Usage: python tools/check_contract.py
[sf_dir] [query ...]

Both sides are fetched THROUGH PANDAS (Spark ``toPandas()``, DuckDB
``.df()``) to mirror the driver's hashing path: round-1 used ``fetchall()``,
which turned DuckDB HUGEINT into Python int and masked the driver-visible
``30.0 != 30`` float64 artifact on integer ``sum()`` columns (VERDICT.md
round 1, What's wrong #1)."""

from __future__ import annotations

import datetime
import sys
import time

sys.path.insert(0, ".")

import duckdb
import numpy as np
import pandas as pd

import __spark_entry__ as entrymod
from deduplication_framework_spark.session import get_spark
from deduplication_framework_spark.sources.pages import TESTDATA_TABLES


def _canon(v):
    """Canonical repr of one pandas cell — keeps the int-vs-float distinction
    (the artifact the gate must catch) while normalizing numpy wrappers and
    date/timestamp representation differences between the two engines."""
    if isinstance(v, np.integer):
        v = int(v)
    elif isinstance(v, np.floating):
        v = float(v)
    elif isinstance(v, np.bool_):
        v = bool(v)
    elif isinstance(v, np.ndarray):
        v = [_canon(x) for x in v.tolist()]
    if v is None or (isinstance(v, float) and v != v):
        return "NULL"
    if isinstance(v, float):
        return repr(round(v, 6))
    if isinstance(v, (pd.Timestamp, datetime.date, datetime.datetime)):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, list):
        return repr([_canon(x) for x in v])
    return repr(v)


def normalize_pdf(pdf):
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    out = [
        "|".join(_canon(v) for v in tup)
        for tup in pdf.itertuples(index=False, name=None)
    ]
    out.sort()
    return cols, out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="contract-check", master="local[8]",
                      shuffle_partitions=8)
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    if not only:
        try:
            edf = entrymod.entry(spark)
            n = edf.count()
            print(f"entry(): {n} rows, schema {edf.schema.simpleString()[:80]}")
            assert n >= 0
        except Exception as e:
            failures.append("entry")
            print(f"FAIL  entry(): {e}")
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error {e}")
            continue
        if name not in oracles:
            print(f"ok(rows-only) {name}: {len(spdf)} rows "
                  f"({time.time()-t0:.1f}s)")
            continue
        try:
            dpdf = con.execute(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error {e}")
            continue
        sc, sn = normalize_pdf(spdf)
        dc, dn = normalize_pdf(dpdf)
        status = []
        if sc != dc:
            status.append(f"cols {sc} != {dc}")
        if len(sn) != len(dn):
            status.append(f"rowcount {len(sn)} != {len(dn)}")
        elif sn != dn:
            bad = next(
                (i for i, (a, b) in enumerate(zip(sn, dn)) if a != b), None
            )
            status.append(
                f"values differ at sorted-row {bad}:\n  spark={sn[bad][:200]}\n  duck ={dn[bad][:200]}"
            )
        if status:
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(status)}")
        else:
            print(f"ok    {name}: {len(sn)} rows match ({time.time()-t0:.1f}s)")
    print(f"\n{len(failures)} failures: {failures}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
