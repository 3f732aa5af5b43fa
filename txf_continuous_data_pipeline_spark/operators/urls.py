"""URL curation: canonicalization, registered-domain extraction,
domain blocklists.

Beyond-the-reference extension: web-corpus pipelines (CCNet, FineWeb,
RefinedWeb) run a URL stage BEFORE any content touch - canonicalize
the crawl URL (case, default ports, tracking params, fragments), pull
the registered domain, drop blocklisted domains, and dedup by
canonical URL - because it is the only stage whose cost does not
scale with document bytes. Everything here is pure JVM column
expressions (regexp + array ops), zero shuffle, and value-checkable
in oracle SQL.

Canonicalization rules (the conservative common core of the public
pipelines):
  - scheme and host lowercase; path case PRESERVED (case-sensitive)
  - default port stripped (:443 for https, :80 for http)
  - leading ``www.`` stripped from the host
  - fragment dropped
  - ``utm_*`` tracking params dropped; surviving params SORTED so
    param order cannot split a URL's identity; empty query dropped
  - empty path normalized to ``/``

``registered_domain`` is the last two host labels - the
public-suffix-list-free approximation (a real deployment swaps in a
PSL lookup table as a broadcast join; the seam is this function).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_URL_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]+)([^?#]*)(\?[^#]*)?(#.*)?$"


def _part(url: Column, group: int) -> Column:
    return F.regexp_extract(url, _URL_RE, group)


def canonicalize_url(url: Column) -> Column:
    """Canonical form of an absolute http(s) URL (rules above). A
    string that does not parse as a URL canonicalizes to NULL - the
    quarantine convention (count them, don't crash)."""
    scheme = F.lower(_part(url, 1))
    hostport = F.lower(_part(url, 2))
    # only strip the port that is the scheme's default
    host = F.when(
        (scheme == "https") & hostport.endswith(":443"),
        F.regexp_replace(hostport, ":443$", ""),
    ).when(
        (scheme == "http") & hostport.endswith(":80"),
        F.regexp_replace(hostport, ":80$", ""),
    ).otherwise(hostport)
    # strip EVERY leading www label, not just one - canonicalization
    # must be idempotent (a dedup stage fed a mix of raw and already-
    # canonical URLs gives 'www.www.ex.com' and 'www.ex.com' the same
    # identity only if both collapse to 'ex.com')
    host = F.regexp_replace(host, r"^(www\.)+", "")
    path = _part(url, 3)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    rawq = _part(url, 4)
    params = F.array_sort(
        F.filter(
            F.split(F.regexp_replace(rawq, r"^\?", ""), "&"),
            lambda p: (p != "") & ~p.startswith("utm_"),
        )
    )
    query = F.when(
        F.size(params) > 0,
        F.concat(F.lit("?"), F.array_join(params, "&")),
    ).otherwise(F.lit(""))
    out = F.concat(scheme, F.lit("://"), host, path, query)
    return F.when(_part(url, 1) == "", F.lit(None)).otherwise(out)


def registered_domain(canonical_url: Column) -> Column:
    """Last two labels of the URL's HOST (PSL-free approximation; swap
    in a broadcast public-suffix table here for a production crawl).
    Userinfo and port are stripped from the authority first - a
    canonical URL legitimately keeps a non-default port
    ('http://ex.com:443/p'), and a blocklist keyed on 'ex.com' must
    still match it."""
    authority = F.lower(_part(canonical_url, 2))
    host = F.regexp_replace(
        F.regexp_replace(authority, "^[^@/]*@", ""), ":[0-9]+$", ""
    )
    labels = F.split(host, r"\.")
    return F.when(
        F.size(labels) >= 2,
        F.concat_ws(".", F.slice(labels, -2, 2)),
    ).otherwise(host)
