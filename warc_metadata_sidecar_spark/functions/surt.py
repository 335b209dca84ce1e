"""SURT URL canonicalization + timestamp-14 (reference S1/S2).

The reference calls the `surt` library (sidecar2cdxj.py:35) and warcio's
iso_date_to_timestamp (:36). Neither needs Python here: both are expressible
as native column expressions, which keeps the CDXJ index stage entirely
inside WholeStageCodegen (no Python stage at all — SURVEY.md §3.2).

`py_surt` is the same algorithm as a pure-Python function; it drives the
single-threaded frontier reference simulator and test oracles, guaranteeing
engine/simulator key-space equality (the north rule's URL-seen-set check).

Canonicalization (deterministic, documented subset of the surt library):
  scheme dropped; userinfo dropped; port dropped; host lowercased and a
  leading 'www.' stripped; host components reversed and comma-joined; ')' ;
  then the path+query lowercased ('' -> '/').
  e.g. https://www.UNT.edu/About?X=1 -> 'edu,unt)/about?x=1'
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCHEME_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*://")
_AUTHORITY_RE = re.compile(r"^([^/?#]*)")

# the same three regexes, shared verbatim with the SQL forms below
SCHEME_PATTERN = "^[a-zA-Z][a-zA-Z0-9+.-]*://"
USERINFO_PATTERN = "^[^/@]*@"
PORT_PATTERN = ":[0-9]+$"


def py_surt(url: str | None) -> str | None:
    """Pure-Python twin of `surt_col` (bit-identical output)."""
    if not url:
        return None
    no_scheme = _SCHEME_RE.sub("", url)
    authority = _AUTHORITY_RE.match(no_scheme).group(1)
    rest = no_scheme[len(authority):] or "/"
    host = re.sub(USERINFO_PATTERN, "", authority)
    host = re.sub(PORT_PATTERN, "", host).lower()
    host = re.sub(r"^www\.", "", host)
    return ",".join(reversed(host.split("."))) + ")" + rest.lower()


def surt_col(url: Column) -> Column:
    """Native SURT: regexp + split + reverse + array_join, no UDF."""
    no_scheme = F.regexp_replace(url, SCHEME_PATTERN, "")
    authority = F.regexp_extract(no_scheme, "^([^/?#]*)", 1)
    rest = F.substring(no_scheme, F.length(authority) + 1, 1 << 30)
    rest = F.when(F.length(rest) == 0, F.lit("/")).otherwise(rest)
    host = F.lower(
        F.regexp_replace(F.regexp_replace(authority, USERINFO_PATTERN, ""), PORT_PATTERN, "")
    )
    host = F.regexp_replace(host, "^www\\.", "")
    return F.when(
        url.isNull() | (F.length(url) == 0), F.lit(None).cast("string")
    ).otherwise(
        F.concat(F.array_join(F.reverse(F.split(host, "\\.")), ","), F.lit(")"), F.lower(rest))
    )


def host_col(url: Column) -> Column:
    """Lowercased registrable host (no www-strip — politeness keys on the
    actual host the crawler would hit; N1)."""
    no_scheme = F.regexp_replace(url, SCHEME_PATTERN, "")
    authority = F.regexp_extract(no_scheme, "^([^/?#]*)", 1)
    return F.lower(
        F.regexp_replace(F.regexp_replace(authority, USERINFO_PATTERN, ""), PORT_PATTERN, "")
    )


def py_host(url: str | None) -> str | None:
    if not url:
        return None
    no_scheme = _SCHEME_RE.sub("", url)
    authority = _AUTHORITY_RE.match(no_scheme).group(1)
    host = re.sub(USERINFO_PATTERN, "", authority)
    return re.sub(PORT_PATTERN, "", host).lower()


def timestamp14_col(ts: Column) -> Column:
    """ISO-8601 timestamp -> 14-digit key (warcio.iso_date_to_timestamp,
    sidecar2cdxj.py:36) — native date_format, session TZ pinned to UTC."""
    return F.date_format(ts, "yyyyMMddHHmmss")
