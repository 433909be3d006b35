"""URL canonicalization (functions/urls.py): semantics + engine parity."""

import duckdb
import pytest

from deduplication_framework_spark.functions.urls import (
    canonical_url_expr,
    canonical_url_sql,
)

CASES = [
    # (raw, canonical)
    ("https://WWW.Example.COM:443/a/b/?utm_source=x&b=2&a=1#frag",
     "https://example.com/a/b?a=1&b=2"),
    ("http://example.com:80/", "http://example.com/"),
    ("http://example.com:8080/x", "http://example.com:8080/x"),  # non-default port kept
    ("HTTPS://example.com", "https://example.com/"),             # empty path -> /
    ("https://example.com/a//b/", "https://example.com/a//b"),   # inner // kept
    ("https://example.com/?fbclid=abc", "https://example.com/"),
    ("https://example.com/p?ref=rss&z=9&a&a=2&A=3",
     "https://example.com/p?A=3&a&a=2&ref=rss&z=9"),  # sorted, dups kept; ref is semantic
    ("not a url at all  ", "not a url at all"),                  # unparseable -> trim only
    ("ftp://Files.example.com:21/pub/", "ftp://files.example.com:21/pub"),
    ("https://example.com/p?utm_campaign=&utmx=keep&gclid=1",
     "https://example.com/p?utmx=keep"),                         # utm_ prefix, not utm*
    ("http://www.example.com:80/x/?utm_medium=a", "http://example.com/x"),
    ("", ""),
    ("https://example.com/#", "https://example.com/"),
    ("https://example.com/x?#y", "https://example.com/x"),
    ("https://sub.www.example.com/x", "https://sub.www.example.com/x"),  # www. only at start
    # trailing newline: Java's $ would match before it (RE2's would not);
    # the \z anchor makes BOTH engines take the unparseable/trim branch
    ("https://example.com/x#f\n", "https://example.com/x#f\n"),
    ("https://example.com/x\n", "https://example.com/x\n"),
]


@pytest.fixture(scope="module")
def canon_pairs(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], ["url"])
    got = [
        r.c for r in df.select(canonical_url_expr("url").alias("c")).collect()
    ]
    return got


def test_canonical_semantics(canon_pairs):
    for (raw, want), got in zip(CASES, canon_pairs):
        assert got == want, f"{raw!r}: {got!r} != {want!r}"


def test_duckdb_twin_is_bit_identical(canon_pairs):
    con = duckdb.connect()
    con.execute("CREATE TABLE t(url VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(u,) for u, _ in CASES])
    dd = [
        r[0]
        for r in con.execute(
            f"SELECT {canonical_url_sql('url')} FROM t"
        ).fetchall()
    ]
    assert dd == canon_pairs


def test_canonical_is_idempotent(spark):
    df = spark.createDataFrame([(c,) for _, c in CASES if c], ["url"])
    again = [
        r.c for r in df.select(canonical_url_expr("url").alias("c")).collect()
    ]
    assert again == [c for _, c in CASES if c]


def test_recrawl_variants_collapse_to_one_key(spark):
    """The operational point: five captures of the same page, one key."""
    variants = [
        "https://news.example.com/story/42",
        "HTTPS://WWW.NEWS.EXAMPLE.COM:443/story/42",
        "https://news.example.com/story/42/",
        "https://news.example.com/story/42?utm_source=tw&fbclid=x",
        "https://news.example.com/story/42#comments",
    ]
    df = spark.createDataFrame([(u,) for u in variants], ["url"])
    keys = {
        r.c for r in df.select(canonical_url_expr("url").alias("c")).collect()
    }
    assert keys == {"https://news.example.com/story/42"}


BLOCK_CASES = [
    # (url, host, score_milli, reason)
    ("https://www.BadSpam.example.net/x", "badspam.example.net", 0, "host"),
    ("https://ok.example.com/article/casino-review",
     "ok.example.com", 600, "pass"),       # one soft word: not enough
    ("https://ok.example.com/casino/gambling",
     "ok.example.com", 1200, "words"),     # two soft words corroborate
    ("http://warez.example.io/dl", "warez.example.io", 1000, "words"),
    ("https://PHISHING.example.com/login",
     "phishing.example.com", 1000, "words"),  # case-folded substring
    ("https://fine.example.com/news", "fine.example.com", 0, "pass"),
    ("not a url", "", 0, "pass"),
]


def test_url_block_semantics_and_parity(spark):
    from deduplication_framework_spark.functions.urls import (
        url_block_exprs,
        url_block_sqls,
    )

    df = spark.createDataFrame([(u,) for u, *_ in BLOCK_CASES], ["u"])
    e = url_block_exprs("u")
    got = (
        df.select(
            "u",
            e["host"].alias("host"),
            e["score_milli"].alias("s"),
            e["reason"].alias("r"),
        )
        .collect()
    )
    by_url = {r.u: (r.host, r.s, r.r) for r in got}
    for u, host, s, reason in BLOCK_CASES:
        assert by_url[u] == (host, s, reason), u

    p = url_block_sqls("u")
    con = duckdb.connect()
    con.register("t", df.toPandas())
    du = con.execute(
        f"SELECT u, {p['host']} AS host, {p['score_milli']} AS s, "
        f"{p['reason']} AS r FROM t"
    ).fetchall()
    assert {r[0]: tuple(r[1:]) for r in du} == by_url


def test_url_block_host_rule_beats_word_rule(spark):
    from deduplication_framework_spark.functions.urls import url_block_exprs

    df = spark.createDataFrame(
        [("https://malware.example.com/warez/casino",)], ["u"]
    )
    e = url_block_exprs("u")
    r = df.select(e["reason"].alias("r"), e["score_milli"].alias("s")).collect()[0]
    assert r.r == "host" and r.s == 1600


def test_url_block_host_rule_resists_evasion(spark):
    # port / userinfo / subdomain / case variants of a blocklisted host
    # must all still hit the host rule (review finding, part 9)
    from deduplication_framework_spark.functions.urls import (
        url_block_exprs,
        url_block_sqls,
    )

    urls = [
        "https://badspam.example.net:443/x",
        "https://badspam.example.net:8080/x",
        "https://user@badspam.example.net/x",
        "https://u:p@BadSpam.Example.NET:80/x",
        "https://a.badspam.example.net/x",
        "https://www.badspam.example.net/x",
        # NOT the blocklisted domain: similar names must pass
        "https://notbadspam.example.net/x",
        "https://badspam.example.net.evil.io/x",
    ]
    df = spark.createDataFrame([(u,) for u in urls], ["u"])
    e = url_block_exprs("u")
    got = {r.u: r.r for r in df.select("u", e["reason"].alias("r")).collect()}
    for u in urls[:6]:
        assert got[u] == "host", u
    for u in urls[6:]:
        assert got[u] == "pass", u
    p = url_block_sqls("u")
    con = duckdb.connect()
    con.register("t", df.toPandas())
    du = dict(con.execute(f"SELECT u, {p['reason']} FROM t").fetchall())
    assert du == got


def test_url_block_custom_lists(spark):
    from deduplication_framework_spark.functions.urls import (
        url_block_exprs,
    )

    df = spark.createDataFrame(
        [("https://foo.bar/baz-quux",), ("https://blocked.me/x",)], ["u"]
    )
    e = url_block_exprs(
        "u",
        hosts=("blocked.me",),
        words=(("baz", 500), ("quux", 500)),
        block_milli=1000,
    )
    got = {r.u: r.r for r in df.select("u", e["reason"].alias("r")).collect()}
    assert got["https://foo.bar/baz-quux"] == "words"
    assert got["https://blocked.me/x"] == "host"


def test_url_block_rejects_wildcard_hosts(spark):
    from deduplication_framework_spark.functions.urls import (
        url_block_exprs,
    )

    with pytest.raises(ValueError, match="blocklist host"):
        url_block_exprs("u", hosts=("bad_host.example",))
