"""Local replica of the driver's correctness gate: run every queries() entry
on Spark AND its oracle_sql() on DuckDB at sf0.01, compare row count, column
names, and order-insensitive values. Usage: python tools/check_contract.py
[sf_dir] [query ...]"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import duckdb

import __spark_entry__ as entrymod
from deduplication_framework_spark.session import get_spark
from deduplication_framework_spark.sources.pages import TESTDATA_TABLES


def normalize_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in idx:
            v = row[i]
            if isinstance(v, float):
                v = round(v, 6)
            vals.append(repr(v))
        out.append("|".join(vals))
    out.sort()
    return [cols[i] for i in idx], out


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
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error {e}")
            continue
        if name not in oracles:
            print(f"ok(rows-only) {name}: {len(srows)} rows "
                  f"({time.time()-t0:.1f}s)")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error {e}")
            continue
        sc, sn = normalize_rows(scols, srows)
        dc, dn = normalize_rows(dcols, drows)
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
