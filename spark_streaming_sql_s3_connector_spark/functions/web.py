"""Web-corpus cleaning expressions: URL canonicalization.

Crawled corpora dedup and join on URLs, but raw URLs are noisy: case
drift in scheme/host, default ports, tracking parameters, fragments,
and trailing slashes make equal resources compare unequal. The
canonicalizer below is a fixed chain of regexp rewrites — pure JVM
expressions, and every pattern stays in the Java∩RE2 subset (no
pattern backrefs, no lookaround) so the DuckDB oracle evaluates the
identical chain (replacement-string backrefs are fine: ``$1`` in Spark,
``\\1`` in DuckDB).

Chain order matters and is part of the contract:

1. strip the fragment (``#...``);
2. lowercase the scheme://host prefix (path/query stay case-sensitive);
3. drop default ports (``https://h:443`` → ``https://h``, ``http://h:80``
   → ``http://h``);
4. drop tracking parameters (``utm_*``, ``gclid``, ``fbclid``) and
   collapse the separators they leave behind;
5. strip a single trailing slash.

Non-URL inputs (no ``scheme://host`` prefix) pass through trimmed but
otherwise untouched.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCHEME_HOST = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*"
# anchored to a parameter boundary so 'xgclid=5' (a different parameter)
# is never mangled; the leading separator is re-emitted by the replacement
_TRACKING = r"([?&])(utm_[A-Za-z]+|gclid|fbclid)=[^&#]*"


def canonical_url(col: Column) -> Column:
    u = F.trim(col)
    u = F.regexp_replace(u, r"#.*$", "")                       # 1. fragment
    head = F.regexp_extract(u, _SCHEME_HOST, 0)
    tail = F.regexp_replace(u, _SCHEME_HOST, "")
    u2 = F.concat(F.lower(head), tail)                         # 2. case
    # 3. ports — terminator group keeps ':4433'/':8080' hosts intact
    u2 = F.regexp_replace(u2, r"^(https://[^/?#:]*):443([/?#]|$)", r"$1$2")
    u2 = F.regexp_replace(u2, r"^(http://[^/?#:]*):80([/?#]|$)", r"$1$2")
    u2 = F.regexp_replace(u2, _TRACKING, r"$1")                # 4. tracking
    u2 = F.regexp_replace(u2, r"([?&])&+", r"$1")              #    ?&& -> ?
    u2 = F.regexp_replace(u2, r"[?&]+$", "")                   #    trailing ?/&
    u2 = F.regexp_replace(u2, r"([^/])/\?", r"$1?")           # 5. path '/' before query
    u2 = F.regexp_replace(u2, r"([^/])/$", r"$1")              #    and at end
    return F.when(head == "", u).otherwise(u2)


def canonical_url_duckdb_sql(expr: str) -> str:
    """The same chain as :func:`canonical_url` in DuckDB SQL over column
    expression ``expr`` — kept adjacent so the two stay in lockstep."""
    u = f"regexp_replace(trim({expr}), '#.*$', '')"
    head = f"regexp_extract({u}, '{_SCHEME_HOST}', 0)"
    tail = f"regexp_replace({u}, '{_SCHEME_HOST}', '')"
    u2 = f"(lower({head}) || {tail})"
    u2 = f"regexp_replace({u2}, '^(https://[^/?#:]*):443([/?#]|$)', '\\1\\2')"
    u2 = f"regexp_replace({u2}, '^(http://[^/?#:]*):80([/?#]|$)', '\\1\\2')"
    u2 = f"regexp_replace({u2}, '([?&])(utm_[A-Za-z]+|gclid|fbclid)=[^&#]*', '\\1', 'g')"
    u2 = f"regexp_replace({u2}, '([?&])&+', '\\1', 'g')"
    u2 = f"regexp_replace({u2}, '[?&]+$', '')"
    u2 = f"regexp_replace({u2}, '([^/])/\\?', '\\1?', 'g')"
    u2 = f"regexp_replace({u2}, '([^/])/$', '\\1')"
    return f"CASE WHEN {head} = '' THEN {u} ELSE {u2} END"
