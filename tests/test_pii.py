"""PII redaction (functions/pii.py): semantics + engine parity.

The patterns are syntactic, recall-leaning (a 999.1.2.3 'IP' or a long
digit run both redact — documented stance); what these tests pin is the
sequential-redaction semantics, the per-step counts, and that the
generated DuckDB twins are bit-identical to the Spark expressions on
adversarial inputs (Java-vs-RE2 drift surface).
"""

import duckdb

from deduplication_framework_spark.functions.pii import (
    PII_RULES,
    pii_count_exprs,
    pii_count_sqls,
    redact_pii_expr,
    redact_pii_sql,
)

# (raw, redacted, n_email, n_ip, n_phone)
CASES = [
    ("write x.y+z%q@sub.example.co.uk now",
     "write <EMAIL> now", 1, 0, 0),
    ("hosts 10.0.0.1 and 256.1.2.3 and 1.2.3.4.5",
     "hosts <IP> and <IP> and <IP>.5", 0, 3, 0),   # syntactic, not semantic
    ("call +1 (555) 123-4567 or 555 867 5309.",
     "call <PHONE> or <PHONE>.", 0, 0, 2),
    ("ts 2026081809 id 1234567",
     "ts <PHONE> id 1234567", 0, 0, 1),  # >=8-char digit runs redact (recall
                                         # stance); 7 chars is under the floor
    ("no pii here at all", "no pii here at all", 0, 0, 0),
    ("a@b.cc 9.9.9.9 +44 20 7946 0958",
     "<EMAIL> <IP> <PHONE>", 1, 1, 1),
    ("mail a.b@c7.de about 8.8.8.8",                # email digits must NOT
     "mail <EMAIL> about <IP>", 1, 1, 0),          # double-count as phone
    ("", "", 0, 0, 0),
]


def _spark_rows(spark):
    df = spark.createDataFrame([(c[0],) for c in CASES], ["text"])
    counts = pii_count_exprs("text")
    return [
        tuple(r)
        for r in df.select(
            redact_pii_expr("text").alias("red"),
            counts["email"].alias("e"),
            counts["ip"].alias("i"),
            counts["phone"].alias("p"),
        ).collect()
    ]


def test_semantics(spark):
    got = _spark_rows(spark)
    for (raw, *want), g in zip(CASES, got):
        assert g == tuple(want), f"{raw!r}: {g} != {tuple(want)}"


def test_duckdb_twin_is_bit_identical(spark):
    got = _spark_rows(spark)
    con = duckdb.connect()
    con.execute("CREATE TABLE t(text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(c[0],) for c in CASES])
    sqls = pii_count_sqls("text")
    dd = con.execute(
        f"SELECT {redact_pii_sql('text')}, "
        + ", ".join(f"CAST({sqls[k]} AS INT)" for k in ("email", "ip", "phone"))
        + " FROM t"
    ).fetchall()
    assert [tuple(r) for r in dd] == got


def test_redaction_is_idempotent(spark):
    """Placeholders contain no digits/@ — a second pass is a no-op."""
    df = spark.createDataFrame([(c[1],) for c in CASES if c[1]], ["text"])
    again = [
        r.red for r in df.select(redact_pii_expr("text").alias("red")).collect()
    ]
    assert again == [c[1] for c in CASES if c[1]]


def test_rules_are_ordered_email_first():
    assert [r[0] for r in PII_RULES] == ["email", "ip", "phone"]
