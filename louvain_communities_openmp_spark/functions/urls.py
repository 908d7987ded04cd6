"""URL canonicalization — pure Catalyst (no Python in the hot path).

A crawl sees the same page under many spellings; edge building and
dedup must agree on one canonical key per page. The grammar here is
deliberately small, exact, and documented, so it is an oracle-checkable
function (driver query p_url_canonical re-implements it in SQL):

1. drop the fragment (``#...``),
2. lowercase the scheme and the host[:port] authority (paths stay
   case-sensitive per RFC 3986),
3. drop a default port (``:80`` for http, ``:443`` for https),
4. drop a trailing ``?`` with an empty query,
5. empty path → ``/``.

Deliberately NOT done (they change identity): stripping ``www.``,
decoding percent-escapes, sorting query parameters.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_AUTH = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)(.*)$"


def canonical_url(url) -> Column:
    u = F.regexp_replace(url, "#.*$", "")
    scheme = F.lower(F.regexp_extract(u, _AUTH, 1))
    host = F.lower(F.regexp_extract(u, _AUTH, 2))
    rest = F.regexp_extract(u, _AUTH, 3)
    host = F.when(scheme == "http", F.regexp_replace(host, ":80$", "")).otherwise(
        F.when(scheme == "https", F.regexp_replace(host, ":443$", "")).otherwise(host)
    )
    rest = F.regexp_replace(rest, r"\?$", "")
    rest = F.when(rest == "", F.lit("/")).otherwise(rest)
    # non-URL inputs (no scheme) pass through with only the fragment cut
    return F.when(scheme == "", u).otherwise(
        F.concat(scheme, F.lit("://"), host, rest)
    )


def host_of(url) -> Column:
    """Lowercased host (port stripped) of an absolute URL; '' if the
    input has no scheme."""
    h = F.lower(F.regexp_extract(url, _AUTH, 2))
    return F.regexp_replace(h, ":[0-9]+$", "")
