"""Crawl-trap detection — URL-shape heuristics that keep a frontier from
drowning in calendars, session mazes, and parameter explosions.

Reference anchor: the reference ingests whatever WARC it is given
(warc_metadata_sidecar.py never sees a frontier); a production crawler
must refuse trap URLs BEFORE fetch or the politeness budget is spent on
an infinite calendar. These are the classic heuristics (Heritrix's
pathological-path / too-many-path-segments rules, public crawler
literature), expressed as ONE native projection — no UDF, no explode, no
shuffle:

  depth            path segments (split + filter empties)
  max_seg_repeat   most-repeated path segment — the /cal/2026/cal/2026
                   signature — via a higher-order transform/filter pair
                   (O(d^2) per URL with d = path depth, tiny; stays
                   inside whole-stage codegen instead of an explode +
                   groupBy shuffle)
  n_params         query parameters
  has_session_id   (?i) phpsessid|jsessionid|sessionid|cfid|sid as a
                   parameter name
  url_len          total URL length
  is_trap          any of: depth > max_depth, max_seg_repeat >=
                   repeat_limit, n_params > max_params, url_len >
                   max_len, session id present

Scale: pure column arithmetic over the frontier scan; predicate-able
(the is_trap filter pushes into the same projection), zero exchanges.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SESSION_RE = r"(?i)(?:^|[?&])(?:phpsessid|jsessionid|sessionid|cfid|sid)="


def _segments(url: Column) -> Column:
    path = F.regexp_extract(url, r"^[a-z][a-z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    return F.filter(F.split(path, "/"), lambda s: s != "")


def trap_flags(
    frontier: DataFrame,
    url_col: str = "url",
    max_depth: int = 12,
    repeat_limit: int = 3,
    max_params: int = 8,
    max_len: int = 512,
) -> DataFrame:
    """One row per input row with the trap signals appended:
    (*, depth, max_seg_repeat, n_params, has_session_id, url_len,
    is_trap)."""
    url = F.col(url_col)
    segs = _segments(url)
    depth = F.size(segs).cast("long")
    max_rep = F.coalesce(
        F.array_max(
            F.transform(segs, lambda s: F.size(F.filter(segs, lambda z: z == s)))
        ),
        F.lit(0),
    ).cast("long")
    query = F.regexp_extract(url, r"\?([^#]*)", 1)
    n_params = F.when(query == "", F.lit(0)).otherwise(
        F.size(F.split(query, "&"))
    ).cast("long")
    has_session = F.concat(F.lit("?"), query).rlike(SESSION_RE)
    url_len = F.length(url).cast("long")
    is_trap = (
        (depth > max_depth)
        | (max_rep >= repeat_limit)
        | (n_params > max_params)
        | (url_len > max_len)
        | has_session
    )
    return frontier.select(
        "*",
        depth.alias("depth"),
        max_rep.alias("max_seg_repeat"),
        n_params.alias("n_params"),
        has_session.alias("has_session_id"),
        url_len.alias("url_len"),
        is_trap.alias("is_trap"),
    )
