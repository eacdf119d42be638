"""URL canonicalization for Common-Crawl-style corpora.

The dedup key for web pages is the *canonical* URL: crawls see the
same page as ``HTTP://Example.COM:80/a/`` and
``http://example.com/a?utm=…#frag``.  Canonicalization here follows
RFC 3986 §6 syntax-based normalization (lowercase scheme+host, drop
default port, drop fragment) plus the two crawl-practice rules every
large pipeline adds (sort query parameters, strip trailing path
slashes).  No reference counterpart (ferenda keys on basefile, not
URL) — this is a first-class training-data extension per the build
brief.

Paired forms like ``normalize_space``: :func:`canonical_url` (pure
Python, for tests/golden fixtures) and :func:`canonical_url_col`
(pure Column — regexp/split/sort inside whole-stage codegen, so the
canonical key is computed during the scan with zero Python and zero
shuffle; the groupBy on the key is then the ONLY exchange in a
URL-dedup job).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"


def canonical_url(url: str) -> str:
    """Pure-Python twin of :func:`canonical_url_col`."""
    no_frag = re.sub(r"#.*$", "", url)
    m = re.match(_SCHEME_RE + r"([^/?]*)([^?]*)(?:\?(.*))?$", no_frag)
    if not m:
        return no_frag
    scheme = m.group(1).lower()
    host = m.group(2).lower()
    path = re.sub(r"/+$", "", m.group(3) or "")
    query = m.group(4)
    if scheme == "http":
        host = re.sub(r":80$", "", host)
    elif scheme == "https":
        host = re.sub(r":443$", "", host)
    out = f"{scheme}://{host}{path}"
    if query:
        out += "?" + "&".join(sorted(query.split("&")))
    return out


def canonical_url_col(url: Column) -> Column:
    """Column form: RFC 3986 syntax normalization + query-param sort
    + trailing-slash strip, all JVM-side."""
    no_frag = F.regexp_replace(url, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(no_frag, _SCHEME_RE, 1))
    host = F.lower(F.regexp_extract(no_frag, _SCHEME_RE + r"([^/?]*)", 2))
    path = F.regexp_replace(
        F.regexp_extract(no_frag, _SCHEME_RE + r"[^/?]*([^?]*)", 2),
        r"/+$", "")
    query = F.regexp_extract(no_frag, r"\?(.*)$", 1)
    host = (F.when(scheme == "http", F.regexp_replace(host, r":80$", ""))
            .when(scheme == "https", F.regexp_replace(host, r":443$", ""))
            .otherwise(host))
    base = F.concat(scheme, F.lit("://"), host, path)
    return F.when(
        scheme == "", no_frag
    ).when(
        query != "",
        F.concat(base, F.lit("?"),
                 F.array_join(F.array_sort(F.split(query, "&")), "&"))
    ).otherwise(base)
