"""SURT URL canonicalization + timestamp-14 (reference S1/S2).

The reference calls the `surt` library (sidecar2cdxj.py:35) and warcio's
iso_date_to_timestamp (:36). Neither needs Python here: both are expressible
as native column expressions, which keeps the CDXJ index stage entirely
inside WholeStageCodegen (no Python stage at all — SURVEY.md §3.2).

`py_surt` is the same algorithm as a pure-Python function; it drives the
single-threaded frontier reference simulator and test oracles, guaranteeing
engine/simulator key-space equality (the north rule's URL-seen-set check).

Canonicalization (deterministic, documented subset of the surt library's
default canonicalizer — the rules real crawl URLs hit):
  scheme dropped; userinfo dropped; port dropped; fragment dropped; host
  lowercased and a leading 'www[0-9]*.' stripped; host components reversed
  and comma-joined; ')'; path+query lowercased ('' -> '/'); a path
  ';jsessionid=...' segment stripped; session-id query params (jsessionid,
  phpsessid, sid, cfid, cftoken, aspsessionid*) dropped; remaining query
  params SORTED; an emptied query's '?' removed.
  e.g. https://www.UNT.edu/About?b=2&a=1&PHPSESSID=x -> 'edu,unt)/about?a=1&b=2'
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCHEME_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*://")
_AUTHORITY_RE = re.compile(r"^([^/?#]*)")

# the same regexes, shared verbatim with the SQL forms below
SCHEME_PATTERN = "^[a-zA-Z][a-zA-Z0-9+.-]*://"
USERINFO_PATTERN = "^[^/@]*@"
PORT_PATTERN = ":[0-9]+$"
WWW_PATTERN = "^www[0-9]*\\."
FRAGMENT_PATTERN = "#.*$"
JSESSIONID_PATH_PATTERN = ";jsessionid=[^?#]*"
SESSION_PARAM_PATTERN = "^(jsessionid|phpsessid|sid|cfid|cftoken|aspsessionid[a-z0-9]*)="


def _py_canonical_rest(rest: str) -> str:
    """Lowercase + session-strip + query-sort the path?query part."""
    rest = re.sub(FRAGMENT_PATTERN, "", rest).lower()
    rest = re.sub(JSESSIONID_PATH_PATTERN, "", rest)
    if "?" in rest:
        path, _, query = rest.partition("?")
        args = [a for a in query.split("&") if a and not re.match(SESSION_PARAM_PATTERN, a)]
        rest = path + ("?" + "&".join(sorted(args)) if args else "")
    return rest or "/"


def py_surt(url: str | None) -> str | None:
    """Pure-Python twin of `surt_col` (bit-identical output)."""
    if not url:
        return None
    no_scheme = _SCHEME_RE.sub("", url)
    authority = _AUTHORITY_RE.match(no_scheme).group(1)
    rest = _py_canonical_rest(no_scheme[len(authority):])
    host = re.sub(USERINFO_PATTERN, "", authority)
    host = re.sub(PORT_PATTERN, "", host).lower()
    host = re.sub(WWW_PATTERN, "", host)
    return ",".join(reversed(host.split("."))) + ")" + rest


def _canonical_rest_col(rest: Column) -> Column:
    rest = F.lower(F.regexp_replace(rest, FRAGMENT_PATTERN, ""))
    rest = F.regexp_replace(rest, JSESSIONID_PATH_PATTERN, "")
    path = F.substring_index(rest, "?", 1)
    query = F.when(
        F.instr(rest, "?") > 0, F.substring(rest, F.instr(rest, "?") + 1, 1 << 30)
    ).otherwise(F.lit(""))
    args = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda a: (F.length(a) > 0) & ~a.rlike(SESSION_PARAM_PATTERN),
        )
    )
    rebuilt = F.when(
        F.size(args) > 0, F.concat(path, F.lit("?"), F.array_join(args, "&"))
    ).otherwise(path)
    return F.when(F.length(rebuilt) == 0, F.lit("/")).otherwise(rebuilt)


def surt_col(url: Column) -> Column:
    """Native SURT: regexp + split + sort + array_join, no UDF."""
    no_scheme = F.regexp_replace(url, SCHEME_PATTERN, "")
    authority = F.regexp_extract(no_scheme, "^([^/?#]*)", 1)
    rest = _canonical_rest_col(F.substring(no_scheme, F.length(authority) + 1, 1 << 30))
    host = F.lower(
        F.regexp_replace(F.regexp_replace(authority, USERINFO_PATTERN, ""), PORT_PATTERN, "")
    )
    host = F.regexp_replace(host, WWW_PATTERN, "")
    return F.when(
        url.isNull() | (F.length(url) == 0), F.lit(None).cast("string")
    ).otherwise(
        F.concat(F.array_join(F.reverse(F.split(host, "\\.")), ","), F.lit(")"), rest)
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
