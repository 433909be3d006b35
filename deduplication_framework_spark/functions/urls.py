"""URL canonicalization — the dedup key for web-page recrawl corpora.

Common-Crawl-style pipelines key exact dedup and keep-latest snapshots by
url (reference: the per-url byte-identity invariant; operators/snapshots
implements the keep-latest half). Raw capture urls differ in ways that
never change the fetched document: host case, ``www.``, default ports,
fragments, tracker query params, param order, trailing slash. This module
canonicalizes them with PURE JVM column expressions (regexp + array ops,
no UDF), and generates the equivalent DuckDB SQL from the SAME constants
so the two sides cannot drift (the ``langid`` pattern).

Rules (conservative — each one is identity-preserving for the fetch):

* scheme and host lowercased; leading ``www.`` dropped
* default port dropped (``:80`` http, ``:443`` https); others kept
* fragment dropped
* tracking params dropped: ``utm_*`` prefixes + exact names in
  :data:`TRACKING_PARAMS`
* surviving query params sorted (param order never reaches the server
  as semantics); empty query drops its ``?``
* trailing ``/`` dropped from a non-root path; empty path becomes ``/``
* a string that does not parse as ``scheme://authority...`` is returned
  trimmed but otherwise untouched (never invent structure)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["TRACKING_PARAMS", "canonical_url_expr", "canonical_url_sql"]

# exact param names dropped wherever they appear; utm_* is a prefix rule.
# 'ref' is deliberately NOT here: many apps use it semantically
# (branch/variant selection), so stripping it would weld distinct pages.
TRACKING_PARAMS = ("fbclid", "gclid", "msclkid", "ocid")

# one RE both engines accept (Java regex + RE2): scheme://authority
# path [?query] [#fragment] — authority/path classes exclude the next
# delimiter, so each group is unambiguous. End anchor is \z (absolute end
# of text in BOTH engines), not $: Java's $ also matches before a final
# line terminator while RE2's does not, so a url with a trailing newline
# would parse on the Spark side only and break the parity contract.
_URL_RE = (
    r"^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#.*)?\z"
)


def _param_keep_sql_pred(var: str) -> str:
    """Shared filter predicate over one ``k=v`` param string (valid in
    both Spark SQL and DuckDB): drop empties, utm_* and tracking names."""
    names = ", ".join(f"'{n}'" for n in TRACKING_PARAMS)
    # substring, not LIKE: LIKE-escape handling of '_' differs between
    # Spark string literals and DuckDB, substring is identical in both
    return (
        f"{var} <> '' "
        f"AND substring(split_part({var}, '=', 1), 1, 4) <> 'utm_' "
        f"AND NOT (split_part({var}, '=', 1) IN ({names}))"
    )


def canonical_url_expr(col: str) -> Column:
    """Canonical form of a url column (pass the COLUMN NAME — the
    expression references it several times and Spark SQL strings keep
    that readable). Pure JVM: regexp_extract + array filter/sort.

    Spark SQL string literals process backslash escapes, so the regex
    backslashes are doubled here (DuckDB literals are verbatim). Every
    extract is coalesced: a non-participating optional group is NULL in
    DuckDB and '' in Spark — parity pinned in tests/test_urls.py."""
    rx = _URL_RE.replace("\\", "\\\\")
    scheme = f"lower(coalesce(regexp_extract({col}, '{rx}', 1), ''))"
    rawhost = f"lower(coalesce(regexp_extract({col}, '{rx}', 2), ''))"
    path = f"coalesce(regexp_extract({col}, '{rx}', 3), '')"
    query = f"coalesce(regexp_extract({col}, '{rx}', 4), '')"
    host = (
        f"regexp_replace(regexp_replace({rawhost}, '^www\\\\.', ''), "
        f"CASE WHEN {scheme} = 'http' THEN ':80\\\\z' "
        f"     WHEN {scheme} = 'https' THEN ':443\\\\z' "
        f"     ELSE ':\\\\b\\\\B\\\\z' END, '')"
    )
    cpath = (
        f"CASE WHEN {path} = '' THEN '/' "
        f"WHEN {path} <> '/' AND {path} LIKE '%/' "
        f"THEN substring({path}, 1, length({path}) - 1) ELSE {path} END"
    )
    cquery = (
        f"array_join(array_sort(filter(split({query}, '&'), "
        f"p -> {_param_keep_sql_pred('p')})), '&')"
    )
    return F.expr(
        f"CASE WHEN {scheme} = '' THEN trim({col}) ELSE "
        f"concat({scheme}, '://', {host}, {cpath}, "
        f"CASE WHEN {cquery} = '' THEN '' ELSE concat('?', {cquery}) END) END"
    )


def canonical_url_sql(col: str) -> str:
    """DuckDB SQL computing the same canonical form of ``col`` —
    generated from the same regex and param constants."""
    scheme = f"lower(coalesce(regexp_extract({col}, '{_URL_RE}', 1), ''))"
    rawhost = f"lower(coalesce(regexp_extract({col}, '{_URL_RE}', 2), ''))"
    path = f"coalesce(regexp_extract({col}, '{_URL_RE}', 3), '')"
    query = f"coalesce(regexp_extract({col}, '{_URL_RE}', 4), '')"
    host = (
        f"regexp_replace(regexp_replace({rawhost}, '^www\\.', ''), "
        f"CASE WHEN {scheme} = 'http' THEN ':80\\z' "
        f"     WHEN {scheme} = 'https' THEN ':443\\z' "
        f"     ELSE ':\\b\\B\\z' END, '')"
    )
    cpath = (
        f"CASE WHEN {path} = '' THEN '/' "
        f"WHEN {path} <> '/' AND {path} LIKE '%/' "
        f"THEN substring({path}, 1, length({path}) - 1) ELSE {path} END"
    )
    # DuckDB's array_to_string of an EMPTY list is NULL, not '' — coalesce
    # to keep the no-surviving-params case identical to Spark
    cquery = (
        f"coalesce(array_to_string(list_sort(list_filter("
        f"string_split({query}, '&'), "
        f"p -> {_param_keep_sql_pred('p')})), '&'), '')"
    )
    return (
        f"CASE WHEN {scheme} = '' THEN trim({col}) ELSE "
        f"concat({scheme}, '://', {host}, {cpath}, "
        f"CASE WHEN {cquery} = '' THEN '' ELSE concat('?', {cquery}) END) END"
    )


# ---------------------------------------------------------------------------
# RefinedWeb-style URL blocking (Penedo et al. 2023 §3.1): a domain
# blocklist plus word-based URL scoring. Both rules are generated as the
# SAME SQL for Spark and DuckDB from the constants below; weights are
# integer MILLI-units so a score is a BIGINT sum — engine-exact.
# Default lists are small representative seeds (real deployments pass
# their own); matching is substring containment over the lowercased url,
# the paper's "soft" word rule.

BLOCK_HOSTS = (
    "badspam.example.net",
    "linkfarm.example.org",
    "malware.example.com",
)

# word -> milli-weight; a url whose word weights sum to >= BLOCK_MILLI
# is blocked. Weights < 1000 need corroboration (two medium words block,
# one alone does not) — the soft-matching idea from the paper.
BLOCK_WORD_MILLI = (
    ("phishing", 1000),
    ("warez", 1000),
    ("casino", 600),
    ("gambling", 600),
    ("escort", 600),
    ("torrent", 400),
    ("freedownload", 400),
)

BLOCK_MILLI = 1000


def _url_host_sql(col: str, *, spark: bool) -> str:
    # authority -> host: drop userinfo ('user@'), any ':port', case, and
    # a leading 'www.' — otherwise 'https://u@BadSpam.example.net:8080/'
    # would trivially evade the host blocklist
    rx = _URL_RE.replace("\\", "\\\\") if spark else _URL_RE
    bs = "\\\\" if spark else "\\"
    auth = f"lower(coalesce(regexp_extract({col}, '{rx}', 2), ''))"
    no_user = f"regexp_replace({auth}, '^[^@]*@', '')"
    no_port = f"regexp_replace({no_user}, ':[0-9]*{bs}z', '')"
    return f"regexp_replace({no_port}, '^www{bs}.', '')"


def _url_score_sql(col: str, words) -> str:
    # identical text in both dialects: contains() + integer CASE sum
    terms = " + ".join(
        f"CASE WHEN contains(lower({col}), '{w}') THEN {m} ELSE 0 END"
        for w, m in words
    )
    return f"CAST({terms} AS BIGINT)"


def _url_block_pieces(
    col: str, *, spark: bool, hosts, words, block_milli: int
) -> dict[str, str]:
    for h in hosts:
        # the suffix rule below uses LIKE: '%' / '_' in a host constant
        # would silently become wildcards
        if "%" in h or "_" in h or "'" in h:
            raise ValueError(f"unsupported char in blocklist host {h!r}")
    host = _url_host_sql(col, spark=spark)
    score = _url_score_sql(col, words)
    # exact host OR any subdomain of it ('a.badspam.example.net')
    host_hit = " OR ".join(
        f"{host} = '{h}' OR {host} LIKE '%.{h}'" for h in hosts
    )
    reason = (
        f"CASE WHEN {host_hit} THEN 'host' "
        f"WHEN {score} >= {block_milli} THEN 'words' "
        f"ELSE 'pass' END"
    )
    return {"host": host, "score_milli": score, "reason": reason}


def url_block_exprs(
    col: str,
    *,
    hosts=BLOCK_HOSTS,
    words=BLOCK_WORD_MILLI,
    block_milli: int = BLOCK_MILLI,
) -> dict[str, Column]:
    """Spark columns ``{host, score_milli, reason}`` for url column
    ``col`` (pass the NAME). ``reason`` is 'host' (blocklisted domain or
    any subdomain of one), 'words' (milli-weights sum >= block_milli)
    or 'pass'. Real deployments pass their own ``hosts``/``words``
    lists; the defaults are representative seeds."""
    return {
        k: F.expr(v)
        for k, v in _url_block_pieces(
            col, spark=True, hosts=hosts, words=words,
            block_milli=block_milli,
        ).items()
    }


def url_block_sqls(
    col: str,
    *,
    hosts=BLOCK_HOSTS,
    words=BLOCK_WORD_MILLI,
    block_milli: int = BLOCK_MILLI,
) -> dict[str, str]:
    """DuckDB twins of :func:`url_block_exprs`, from the same constants."""
    return _url_block_pieces(
        col, spark=False, hosts=hosts, words=words, block_milli=block_milli
    )
