"""The iterative crawl driver: rounds of select -> fetch -> annotate ->
discover -> checkpoint (N5/N6/N7).

Iterative batch over table snapshots, not Structured Streaming: the north
rule demands reproducible crawl ordering, and deterministic rounds make
ordering a pure data property (SURVEY.md §1.2, §7.4). Each round is one
Spark job; the driver loop only moves tiny metric scalars — all row data
stays distributed.

Driver-action budget (VERDICT r1 #3): metrics ride `observe()` on the plans
that run anyway, so a round executes exactly THREE jobs —
  1. ranked checkpoint (carries candidate/selected/carryover observations),
  2. frontier checkpoint (carries fetched/new-link observations),
  3. sharded filter update (cost O(|round delta| + shards), never O(|seen|)).
`seen` is never separately materialized: it is a lazy union of scheduled
filters over the per-round checkpointed ranked frames (each union leg is an
in-memory scan). Skew stats come from an optional 4th cheap agg over the
checkpointed (in-memory) frontier, on by default for lineage fidelity.

URL-seen (N2): the tiered bloom+cuckoo filter lives in a sharded `filters`
table updated INCREMENTALLY each round with only that round's newly
scheduled keys (frontier/seen.py update_filter_shards) — the r1 full
rebuild-from-seen is gone. The filters table is checkpointed alongside
frontier/seen so resume restores it without rescanning seen.

Checkpoint/lineage (N6): every round writes frontier/seen/schedule/filters
parquet snapshots under out_dir/round=R/ (parquet `_SUCCESS` markers give
atomic visibility) plus a lineage row. `resume_round` finds the latest
complete snapshot; re-running the loop from there reproduces the identical
schedule because no state lives outside the snapshots.

"Fetch" in the sandbox is an equi-join against the synthetic documents
corpus (N5 — no network); discovered links are a pure function of the
fetched page id, mirrored bit-for-bit by the single-threaded simulator.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from warc_metadata_sidecar_spark.frontier.canonical import canonicalize
from warc_metadata_sidecar_spark.frontier.scheduler import DEFAULT_BUDGET, rank_round
from warc_metadata_sidecar_spark.frontier.seen import (
    DEFAULT_SHARDS,
    load_sharded,
    update_filter_shards,
)
from warc_metadata_sidecar_spark.frontier import seen as seen_mod

# deterministic link model: page p links to (p*31+17)%N, (p*57+5)%N,
# (p*91+1)%N in the same 50-host universe (simulator twin in simulator.py)
LINK_MULTS = (31, 57, 91)
LINK_ADDS = (17, 5, 1)


def extract_hrefs(
    documents: DataFrame,
    url_col: str = "url",
    distinct: bool = True,
    edge_kinds: tuple[str, ...] = ("href",),
) -> DataFrame:
    """REAL link discovery: hrefs from fetched page text, native expressions
    only (regexp_extract_all + relative resolution). Returns
    (parent_url, url).

    `edge_kinds` (VERDICT r5 #6, opt-in — the default stays the
    urljoin-oracle-compatible href surface) selects which attributes emit
    edges:
      - 'href': every href= attribute (<a>, <link>, <area>);
      - 'src': src= attributes (<img>, <script>, <iframe> media edges;
        lazy-load 'data-src' deliberately excluded);
      - 'srcset': each candidate URL of srcset= lists (descriptors like
        '2x'/'640w' stripped);
      - 'meta_refresh': the url= target of a numeric-delay content=
        attribute ('0;url=...');
      - 'css_url': url(...) references and @import targets found in
        INLINE CSS only — style= attribute values and <style> block
        bodies (VERDICT r6 missing #4). External stylesheets are fetch
        targets (their href already emits via 'href'), so their inner
        urls belong to the round that fetches them, not this page;
      - 'script_url': absolute http(s) string literals inside <script>
        block bodies (VERDICT r6 missing #4). Relative strings in JS
        are NOT emitted — without executing the script there is no
        principled base to resolve them against (string concatenation,
        router prefixes), and a wrong guess poisons the frontier;
        conservative absolute-only is the crawler norm.
    All kinds share one staged text and the same RFC 3986 resolution.

    Resolution (RFC 3986 subset, r4):
      - absolute http(s) links kept (any scheme case), path dot-segments
        normalized;
      - protocol-relative '//host/p' gets the parent's scheme;
      - root-relative '/p' resolves against the parent's scheme+host;
      - query-only '?q' keeps the parent's full path (RFC 3986 §5.3);
      - directory-relative 'p' and './p' resolve against the parent's
        directory; '.'/'..' segments collapse PATH-ONLY per RFC 3986
        §5.2.4, implemented EXACTLY as a native segment-stack fold
        (any run length, any depth — r5 closes the 4-rung cap); excess
        '..' above the root clamps at the root like a browser does (the
        authority and query never participate, so resolution can never
        leave the parent's origin);
      - other schemes (mailto:, javascript:, data:, ...) and pure
        fragments are dropped;
      - a `<base href>` tag redefines the resolution base like a browser
        (r5): an absolute http(s) base replaces the document URL for all
        relative forms; a root-relative base ('/b/') rebases onto the
        document's origin; other/invalid base values are ignored. The
        emitted parent_url stays the REAL page URL either way.

    This is the production discovery path for ingested pages; the crawl
    LOOP keeps the synthetic deterministic link model (extract_links) so its
    schedule stays bit-reproducible against the single-threaded simulator.
    """
    from warc_metadata_sidecar_spark.operators.sidecar import payload_text_col

    unknown = set(edge_kinds) - {
        "href", "src", "srcset", "meta_refresh", "css_url", "script_url"
    }
    if unknown or not edge_kinds:
        raise ValueError(f"unknown edge_kinds: {sorted(unknown)}")
    # payload text staged ONCE (the with_surt CSE lesson: two HOF-bearing
    # expressions over payload_text_col() would decode the spans twice);
    # the base-stripped text likewise staged once — every edge-kind
    # extraction reads the SAME _stripped column, so the regexp_replace
    # runs once however many kinds are on.
    # The base tag's own href must not become a crawl edge: DELETE the
    # whole `<base ...>` tag span before extraction (VERDICT r5 #3 — the
    # old single-whitespace lookbehind leaked attribute-before-href forms
    # like '<base target="_x" href="/b/">' into the link list). Tag-span
    # removal handles any attribute order / whitespace run; an
    # unterminated base tag (no '>') is malformed HTML and keeps the old
    # best-effort behavior.
    staged = documents.select(
        F.col(url_col).alias("parent_url"), payload_text_col().alias("_text")
    ).select(
        "parent_url",
        F.regexp_extract(
            F.col("_text"),
            r"""(?i)<base\s[^>]*?href\s*=\s*["']([^"'#>]+)""",
            1,
        ).alias("_base_href"),
        F.regexp_replace(F.col("_text"), r"(?i)<base\s[^>]*>", " ").alias("_stripped"),
    )
    # CSS / JS scopes staged as named columns (the with_surt CSE lesson):
    # each scope text is referenced by TWO extraction patterns below, and a
    # repeated inline subtree would re-run the scope regexes per reference.
    if "css_url" in edge_kinds:
        # style= attribute values (backreference pairs the opening quote, so
        # url('...') inside style="..." survives) + <style> block bodies,
        # joined with a separator no URL may contain
        style_attrs = F.regexp_extract_all(
            F.col("_stripped"),
            F.lit(r"""(?i)(?<![\w-])style\s*=\s*(["'])((?:(?!\1).)*)"""),
            F.lit(2),
        )
        style_blocks = F.regexp_extract_all(
            F.col("_stripped"), F.lit(r"(?is)<style[^>]*>(.*?)</style>"), F.lit(1)
        )
        staged = staged.withColumn(
            "_css_text", F.array_join(F.concat(style_attrs, style_blocks), "\n")
        )
    if "script_url" in edge_kinds:
        staged = staged.withColumn(
            "_js_text",
            F.array_join(
                F.regexp_extract_all(
                    F.col("_stripped"),
                    F.lit(r"(?is)<script[^>]*>(.*?)</script>"),
                    F.lit(1),
                ),
                "\n",
            ),
        )
    kind_arrays = []
    if "href" in edge_kinds:
        kind_arrays.append(
            F.regexp_extract_all(
                F.col("_stripped"), F.lit(r"""(?i)href\s*=\s*["']([^"'#>]+)"""), F.lit(1)
            )
        )
    if "src" in edge_kinds:
        # (?<![\w-]) keeps 'data-src'/'lowsrc' lazy-load attributes out
        kind_arrays.append(
            F.regexp_extract_all(
                F.col("_stripped"),
                F.lit(r"""(?i)(?<![\w-])src\s*=\s*["']([^"'#>]+)"""),
                F.lit(1),
            )
        )
    if "srcset" in edge_kinds:
        # attribute value -> comma-separated candidates -> URL before the
        # optional width/density descriptor; empty entries (trailing
        # commas) are dropped by the post-explode length filter
        vals = F.regexp_extract_all(
            F.col("_stripped"),
            F.lit(r"""(?i)(?<![\w-])srcset\s*=\s*["']([^"'>]+)"""),
            F.lit(1),
        )
        kind_arrays.append(
            F.flatten(
                F.transform(
                    vals,
                    lambda v: F.transform(
                        F.split(v, ","),
                        lambda s: F.regexp_extract(F.trim(s), r"^(\S+)", 1),
                    ),
                )
            )
        )
    if "meta_refresh" in edge_kinds:
        kind_arrays.append(
            F.regexp_extract_all(
                F.col("_stripped"),
                F.lit(r"""(?i)content\s*=\s*["']\s*\d[\d.]*\s*;\s*url\s*=\s*([^"'>]+)"""),
                F.lit(1),
            )
        )
    if "css_url" in edge_kinds:
        # url(path) / url('path') / url("path") — the optional quote is
        # consumed outside the group; pure-fragment refs (url(#filter),
        # SVG-internal) truncate to '' and drop at the length filter —
        # plus quote-less `@import "x.css"` forms (with-url() imports are
        # already caught by the url( pattern)
        kind_arrays.append(
            F.concat(
                F.regexp_extract_all(
                    F.col("_css_text"),
                    F.lit(r"""(?i)url\(\s*["']?([^"'()\s#>]+)"""),
                    F.lit(1),
                ),
                F.regexp_extract_all(
                    F.col("_css_text"),
                    F.lit(r"""(?i)@import\s+["']([^"'#>]+)"""),
                    F.lit(1),
                ),
            )
        )
    if "script_url" in edge_kinds:
        kind_arrays.append(
            F.regexp_extract_all(
                F.col("_js_text"),
                F.lit(r"""(?i)["'](https?://[^"'\s<>#]+)"""),
                F.lit(1),
            )
        )
    base = _with_base_cols(
        staged.select(
            "parent_url",
            "_base_href",
            (F.concat(*kind_arrays) if len(kind_arrays) > 1 else kind_arrays[0]).alias("_hrefs"),
        )
    )
    links = base.select(
        "parent_url", "_origin", "_scheme", "_base_url", "_dir",
        F.explode("_hrefs").alias("_href"),
        # srcset parsing can yield empty candidates (trailing commas);
        # an empty href must not resolve to the parent directory itself
    ).filter(F.length("_href") > 0)
    links = _resolve_refs(links)
    # distinct is the public-API contract; the crawl loop passes
    # distinct=False — rank_round's candidate dedup already collapses by
    # canonical URL, so the extra exchange per round would be pure waste
    return links.distinct() if distinct else links


def _with_base_cols(base: DataFrame) -> DataFrame:
    """Stage the resolution-base columns (_base_url/_origin/_scheme/_dir)
    next to an existing `parent_url`/`_base_href` pair. The effective base
    URL: <base href> absolute wins, root-relative rebases onto the
    document origin, anything else falls back to the document URL (staged
    columns — the with_surt CSE lesson)."""
    doc_origin = F.regexp_extract(
        F.col("parent_url"), r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1
    )
    base = base.withColumn(
        "_base_url",
        F.when(F.col("_base_href").rlike("(?i)^https?://"), F.col("_base_href"))
        .when(
            F.col("_base_href").startswith("/")
            & ~F.col("_base_href").startswith("//")
            & (F.length(doc_origin) > 0),
            F.concat(doc_origin, F.col("_base_href")),
        )
        .otherwise(F.col("parent_url")),
    )
    base = base.withColumn(
        "_origin",
        F.regexp_extract(F.col("_base_url"), r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1),
    ).withColumn(
        "_scheme",
        F.regexp_extract(F.col("_base_url"), r"^([a-zA-Z][a-zA-Z0-9+.-]*):", 1),
    )
    # base directory incl. trailing slash; a path-less base's dir is
    # origin + '/'
    parent_dir = F.when(
        F.regexp_replace(F.col("_base_url"), r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", "")
        .startswith("/"),
        F.regexp_replace(
            F.regexp_replace(F.col("_base_url"), r"[?#].*$", ""), r"[^/]*$", ""
        ),
    ).otherwise(F.concat(F.col("_origin"), F.lit("/")))
    return base.withColumn("_dir", parent_dir)


def _resolve_refs(links: DataFrame, extra: tuple[str, ...] = ()) -> DataFrame:
    """RFC 3986 reference resolution over a frame carrying `parent_url`,
    the _with_base_cols quartet, one `_href` per row, and optional
    passthrough columns -> (parent_url, url, *extra); other-scheme and
    unresolvable refs are dropped."""
    href = F.col("_href")
    has_origin = F.length("_origin") > 0
    resolved = (
        F.when(href.rlike("(?i)^https?://"), href)  # schemes are case-insensitive
        .when(href.rlike("^[a-zA-Z][a-zA-Z0-9+.-]*:"), F.lit(None))  # other schemes
        .when(href.startswith("//") & (F.length("_scheme") > 0),
              F.concat(F.lower(F.col("_scheme")), F.lit(":"), href))
        # query-only reference: RFC 3986 §5.3 keeps the base's FULL path
        # ('/a/b.html' + '?x' -> '/a/b.html?x', not the parent directory)
        .when(href.startswith("?") & has_origin,
              F.concat(F.regexp_replace(F.col("_base_url"), r"[?#].*$", ""), href))
        .when(href.startswith("/") & has_origin, F.concat(F.col("_origin"), href))
        .when(has_origin, F.concat(F.col("_dir"), href))
    )
    # Dot-segment removal on the PATH ONLY (RFC 3986 §5.2.4): the authority
    # and query must never participate — a whole-URL collapse would eat
    # '://host/../' into the hostname, and queries legitimately carry
    # '/../'. Implemented as ONE native `aggregate` fold over the split
    # segments — an exact segment stack, so any run of '/./' and any '..'
    # depth resolves in a single pass (no rung cap); '..' with nothing left
    # to pop clamps at the root marker, same as a browser. Precondition
    # (guaranteed by construction above): a non-empty _path starts with '/',
    # so the stack's first pushed element is the '' root marker.
    # Intermediates are STAGED columns: the conditional chains would
    # otherwise re-evaluate per downstream reference (Catalyst CSE skips
    # conditional branches — the with_surt lesson).
    links = (
        links.select("parent_url", *extra, resolved.alias("_resolved"))
        .filter(F.col("_resolved").isNotNull())
        .withColumn(
            "_pref",
            F.regexp_extract("_resolved", r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1),
        )
        .withColumn("_rest", F.expr(f"substring(_resolved, length(_pref) + 1, {1 << 30})"))
        .withColumn("_path", F.regexp_extract("_rest", r"^([^?#]*)", 1))
        .withColumn("_query", F.expr(f"substring(_rest, length(_path) + 1, {1 << 30})"))
        .withColumn("_segs", F.expr("split(_path, '/')"))
        .withColumn(
            "_stack",
            F.expr(
                """
                aggregate(_segs, cast(array() as array<string>),
                  (acc, s) -> CASE
                    WHEN s = '.' THEN acc
                    WHEN s = '..' THEN
                      CASE WHEN size(acc) <= 1 THEN acc
                           ELSE slice(acc, 1, size(acc) - 1) END
                    ELSE concat(acc, array(s)) END)
                """
            ),
        )
        # a trailing '.' or '..' resolves to a DIRECTORY (§5.2.4 replaces it
        # with '/'), so the joined path regains its trailing slash
        .withColumn(
            "_p",
            F.expr(
                """
                CASE WHEN _path = '' THEN ''
                     ELSE array_join(
                       CASE WHEN element_at(_segs, -1) IN ('.', '..')
                            THEN concat(_stack, array(''))
                            ELSE _stack END, '/')
                END
                """
            ),
        )
    )
    return links.select(
        "parent_url", *extra, F.concat("_pref", "_p", "_query").alias("url")
    ).filter(F.col("url").isNotNull())


def extract_anchor_texts(
    documents: DataFrame, url_col: str = "url", distinct: bool = False
) -> DataFrame:
    """(parent_url, url, anchor) for every `<a href>...</a>` element: the
    href resolves through the SAME base-tag + RFC 3986 pipeline as
    extract_hrefs; `anchor` is the link's VISIBLE text — inner markup
    stripped, whitespace runs collapsed, edges trimmed (an image-only
    anchor yields ''). Anchor text is the classic webgraph signal the
    reference's ecosystem feeds to indexing/ranking; aggregated per
    target it also labels documents for training data (query-document
    pairs). Anchors whose href is fragment-only or non-http(s) scheme
    drop, like every other discovery surface.

    Scale: pure projection + explode per anchor — no shuffle in the
    extractor itself; aggregation (groupBy target) is the caller's one
    exchange, map-side combined."""
    from warc_metadata_sidecar_spark.operators.sidecar import payload_text_col

    staged = documents.select(
        F.col(url_col).alias("parent_url"), payload_text_col().alias("_text")
    ).select(
        "parent_url",
        F.regexp_extract(
            F.col("_text"),
            r"""(?i)<base\s[^>]*?href\s*=\s*["']([^"'#>]+)""",
            1,
        ).alias("_base_href"),
        F.regexp_replace(F.col("_text"), r"(?i)<base\s[^>]*>", " ").alias("_stripped"),
    )
    # whole-element matches (group 0), then per-element href/text pulls;
    # the value may carry a #fragment (resolution strips it via the same
    # [^"'#>] class extract_hrefs uses)
    matches = F.regexp_extract_all(
        F.col("_stripped"),
        F.lit(
            r"""(?is)<a\s[^>]*?href\s*=\s*["'][^"'#>]+(?:#[^"'>]*)?["'][^>]*>.*?</a>"""
        ),
        F.lit(0),
    )
    rows = staged.select(
        "parent_url", "_base_href", F.explode(matches).alias("_m")
    ).select(
        "parent_url",
        "_base_href",
        F.regexp_extract(F.col("_m"), r"""(?is)href\s*=\s*["']([^"'#>]+)""", 1).alias(
            "_href"
        ),
        F.trim(
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_extract(F.col("_m"), r"(?is)^<a\b[^>]*>(.*)</a>$", 1),
                    r"(?s)<[^>]*>",
                    " ",
                ),
                r"\s+",
                " ",
            )
        ).alias("anchor"),
    ).filter(F.length("_href") > 0)
    out = _resolve_refs(
        _with_base_cols(rows).select(
            "parent_url", "_origin", "_scheme", "_base_url", "_dir", "_href", "anchor"
        ),
        extra=("anchor",),
    )
    return out.distinct() if distinct else out


def extract_links(fetched: DataFrame, universe: int) -> DataFrame:
    """Discovered URLs from fetched pages — native expressions only."""
    page = F.regexp_extract(F.col("url"), r"/page/(\d+)$", 1).cast("long")
    links = F.array(
        *[
            (page * F.lit(m) + F.lit(a)) % F.lit(universe)
            for m, a in zip(LINK_MULTS, LINK_ADDS)
        ]
    )
    return (
        fetched.select(F.col("url").alias("parent_url"), F.explode(links).alias("p"))
        .select(
            F.format_string(
                "https://host%02d.example.com/page/%d", (F.col("p") % 50).cast("int"), F.col("p")
            ).alias("url"),
            "parent_url",
        )
    )


@dataclass
class RoundMetrics:
    round: int
    candidates: int
    selected: int
    fetched: int
    new_links: int
    seen_after: int
    max_partition_rows: int = 0
    min_partition_rows: int = 0
    # per-round executor shuffle bytes (read/write deltas from the status
    # API) — the N2 scale evidence: with the bucketed seen layout these stay
    # flat as |seen| grows. -1 = not measured (spark.ui.enabled=false).
    shuffle_read_bytes: int = -1
    shuffle_write_bytes: int = -1


def shuffle_totals(spark: SparkSession) -> tuple[int, int] | None:
    """Cumulative (shuffle_read_bytes, shuffle_write_bytes) across all stages
    from the status REST API; None when the UI is disabled.

    The endpoint only lists retained stages (spark.ui.retainedStages,
    default 1000): once a long run evicts stages, cumulative sums can
    SHRINK between samples — callers must treat a negative delta as
    unmeasured (run_crawl records -1), and measurement sessions should
    raise retainedStages (BENCH/seen_shuffle.py does)."""
    import json as _json
    import urllib.request

    ui = spark.sparkContext.uiWebUrl
    if not ui:
        return None
    app_id = spark.sparkContext.applicationId
    try:
        # short timeout: a hung UI endpoint must not block the crawl loop
        # (the except only catches errors, not hangs)
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages", timeout=5
        ) as fh:
            stages = _json.load(fh)
    except Exception:
        return None
    return (
        sum(s.get("shuffleReadBytes", 0) for s in stages),
        sum(s.get("shuffleWriteBytes", 0) for s in stages),
    )


def _obs_int(obs: Observation, key: str, fallback_df: DataFrame) -> int:
    """Observed metric with an exact fallback. AQE's empty-relation
    propagation can prune a CollectMetrics node when its subtree turns out
    empty at runtime (e.g. a round that discovers ZERO links — real-href
    discovery over a page with no markup): the observation then completes
    with an EMPTY row and `.get` raises converting it (Py4JJavaError from
    toPyRow) or the key is absent (KeyError). Only those two symptoms take
    the fallback — one extra count() job on the same frame; any other
    failure (connection loss, interrupt) surfaces instead of silently
    re-executing plans. The common path stays at the observed-for-free
    metric."""
    from py4j.protocol import Py4JJavaError

    try:
        return int(obs.get[key] or 0)
    except (Py4JJavaError, KeyError):
        return int(fallback_df.count())


def _filters_state_bytes(filters_df: DataFrame | None) -> int:
    """Aggregate serialized size of the sharded filter states — the
    auto-switch signal for the seen-lookup path. Cheap: the filters frame
    is always a localCheckpoint'ed num_shards-row table."""
    if filters_df is None:
        return 0
    row = filters_df.agg(F.sum(F.length("state")).alias("b")).first()
    return int(row.b or 0)


@dataclass
class CrawlResult:
    schedule: DataFrame  # (round, canonical_url, host, url, priority, rnk)
    seen: DataFrame  # (canonical_url, first_round)
    annotated: DataFrame | None
    lineage: list[RoundMetrics] = field(default_factory=list)


def _partition_rows(df: DataFrame) -> DataFrame:
    """(partition, rows) over a checkpointed frame — the per-partition
    lineage the north rule asks for (cheap: in-memory scan, 1 agg)."""
    return df.groupBy(F.spark_partition_id().alias("partition")).agg(
        F.count(F.lit(1)).alias("rows")
    )


def _skew_stats(df: DataFrame) -> tuple[int, int]:
    rows = (
        _partition_rows(df)
        .agg(F.max("rows").alias("mx"), F.min("rows").alias("mn"))
        .first()
    )
    return (rows.mx or 0, rows.mn or 0)


def _ckpt_dir(out_dir: str, rnd: int, name: str) -> str:
    return os.path.join(out_dir, f"round={rnd}", name)


def _snapshot_ok(out_dir: str, rnd: int, name: str) -> bool:
    return os.path.exists(os.path.join(out_dir, f"round={rnd}", name, "_SUCCESS"))


def _seen_chain_ok(out_dir: str, rnd: int) -> bool:
    """True when `seen` is fully reconstructible at round `rnd`: a full
    snapshot at some base b <= rnd (or b = -1, all-delta history) and an
    unbroken seen/seen_delta chain for every round in (b, rnd]. A gap
    (e.g. a partially copied or cleaned-up intermediate round) would
    silently drop that round's keys and re-schedule already-crawled URLs —
    so a round above a gap is NOT a valid resume point."""
    base = -1
    for r in range(rnd, -1, -1):
        if _snapshot_ok(out_dir, r, "seen"):
            base = r
            break
    return all(
        _snapshot_ok(out_dir, r, "seen") or _snapshot_ok(out_dir, r, "seen_delta")
        for r in range(base + 1, rnd + 1)
    )


def resume_round(spark: SparkSession, out_dir: str) -> int:
    """Latest round R with complete snapshots AND an unbroken seen chain,
    or -1. Complete = parquet _SUCCESS marker present for frontier plus the
    seen snapshot — the full `seen` copy (union layout) or the O(delta)
    `seen_delta` (bucketed layout). The chain check walks back to the last
    full snapshot: a missing intermediate delta invalidates every later
    round (its keys are unrecoverable), so resume falls back to the latest
    round BELOW the gap instead of silently re-scheduling crawled URLs."""
    if not os.path.isdir(out_dir):
        return -1
    candidates = sorted(
        (
            int(entry.split("=")[1])
            for entry in os.listdir(out_dir)
            if entry.startswith("round=")
        ),
        reverse=True,
    )
    for rnd in candidates:
        frontier_ok = _snapshot_ok(out_dir, rnd, "frontier")
        seen_ok = _snapshot_ok(out_dir, rnd, "seen") or _snapshot_ok(
            out_dir, rnd, "seen_delta"
        )
        if frontier_ok and seen_ok and _seen_chain_ok(out_dir, rnd):
            return rnd
    return -1


def run_crawl(
    spark: SparkSession,
    documents: DataFrame,
    seeds: DataFrame,
    robots: DataFrame,
    rounds: int = 3,
    universe: int = 1000,
    default_budget: int = DEFAULT_BUDGET,
    use_bloom: bool = True,
    annotate: bool = False,
    media: DataFrame | None = None,
    out_dir: str | None = None,
    num_shards: int = DEFAULT_SHARDS,
    skew_stats: bool = True,
    bucketed_seen: bool = False,
    prune_salts: int | None = 16,
    seen_lookup: str = "auto",
    broadcast_state_limit: int = 64 << 20,
    discovery: str = "synthetic",
    link_fn=None,
    edge_kinds: tuple[str, ...] = ("href",),
) -> CrawlResult:
    """Run `rounds` politeness rounds from `seeds` over the documents corpus.

    Every round:
      1. canonicalize frontier (N1)
      2. URL-seen filter: sharded tiered prefilter + exact anti-join (N2)
      3. politeness selection: robots deny + per-host budget window (N3/N4)
      4. fetch = equi-join into documents on url (N5)
      5. sidecar-annotate fetched rows (the §2a stage) when annotate=True;
         with out_dir the rows checkpoint per round (round=R/annotated) and
         the returned frame is ONE parquet scan — constant plan depth at
         any round count, and a resume keeps earlier rounds' annotations
         (VERDICT r4 #3); without out_dir a lazy in-memory union is
         returned (fine for tests/few rounds — its plan grows O(rounds))
      6. discover links -> next round's frontier appends (N7: appends are
         repartitioned on canonical-url hash via host_salt)
      7. checkpoint + lineage (N6)

    bucketed_seen=True (requires out_dir) stores `seen` as a hash-bucketed
    table (VERDICT r2 #1): the exact anti-join backstop then co-locates on
    the bucketed side with NO exchange — per-round shuffle bytes stay
    O(|maybe-seen|) instead of O(|seen|) — and the per-round checkpoint
    writes only the O(delta) `seen_delta` instead of re-copying the full
    seen set. Schedule/seen results are identical in both layouts (pinned
    by tests). On resume an existing table whose row count matches the
    reconstructed seen set is REUSED as-is — no O(|seen|) drop-and-rewrite
    (VERDICT r3 #5).

    seen_lookup selects how the tiered prefilter states are probed
    (VERDICT r3 #2): 'broadcast' collects the compressed shard states
    through the driver (fast while they are small), 'shardjoin' probes
    them where they live via a cogroup (no driver collect — the 10^10-key
    path), and 'auto' (default) switches to shardjoin once the aggregate
    state size exceeds broadcast_state_limit (default 64 MB, the session's
    autoBroadcastJoinThreshold). All paths return identical rows (pinned
    by tests + the url_seen_shardjoin oracle).

    discovery selects link discovery for the next round's frontier
    (VERDICT r4 #2): 'synthetic' (default) keeps the deterministic link
    model so the schedule stays bit-reproducible against the
    single-threaded simulator; 'hrefs' runs real href extraction +
    RFC 3986 resolution (`extract_hrefs`) over the fetched pages' text
    spans — the production path for ingested corpora (the reference
    processes real fetched records, warc_metadata_sidecar.py:205).
    `link_fn` overrides both: a callable taking the fetched-pages frame
    (columns url + spans) and returning (parent_url, url) rows.
    `edge_kinds` forwards to extract_hrefs in 'hrefs' mode (r6): which
    attribute surfaces emit crawl edges (href / src / srcset /
    meta_refresh / css_url / script_url); the default keeps the
    href-only oracle surface.
    """
    empty_seen = spark.createDataFrame([], "canonical_url string, first_round int")
    if bucketed_seen and out_dir is None:
        raise ValueError("bucketed_seen requires out_dir (the table's location)")
    if discovery not in ("synthetic", "hrefs"):
        raise ValueError(f"unknown discovery mode: {discovery!r}")

    start_round = 0
    filters_df: DataFrame | None = None
    seen_tbl: str | None = None
    n_seen = 0
    resumed_seen: DataFrame | None = None
    if out_dir is not None:
        done = resume_round(spark, out_dir)
        if done >= 0:
            start_round = done + 1
            frontier = spark.read.parquet(_ckpt_dir(out_dir, done, "frontier"))
            # Reconstruct seen across MIXED layouts (a union-layout history
            # continued in bucketed mode writes full `seen` snapshots for
            # early rounds and O(delta) `seen_delta` for later ones): take
            # the LATEST full snapshot as the base, then union every delta
            # after it — dropping either side would silently re-schedule
            # already-crawled URLs.
            base_round = -1
            for r in range(done, -1, -1):
                if os.path.exists(
                    os.path.join(_ckpt_dir(out_dir, r, "seen"), "_SUCCESS")
                ):
                    base_round = r
                    break
            parts = []
            if base_round >= 0:
                parts.append(spark.read.parquet(_ckpt_dir(out_dir, base_round, "seen")))
            parts.extend(
                spark.read.parquet(_ckpt_dir(out_dir, r, "seen_delta"))
                for r in range(base_round + 1, done + 1)
                if os.path.exists(
                    os.path.join(_ckpt_dir(out_dir, r, "seen_delta"), "_SUCCESS")
                )
            )
            if parts:
                resumed_seen = parts[0]
                for p in parts[1:]:
                    resumed_seen = resumed_seen.unionByName(p)
            else:
                resumed_seen = empty_seen
            seen = resumed_seen
            n_seen = seen.count()
            filters_path = _ckpt_dir(out_dir, done, "filters")
            if os.path.exists(os.path.join(filters_path, "_SUCCESS")):
                filters_df = spark.read.parquet(filters_path).localCheckpoint(eager=True)
            elif use_bloom and n_seen:
                # legacy checkpoint without a filters table: one-time
                # executor-side rebuild from the seen snapshot
                filters_df = update_filter_shards(
                    spark, seen, None, num_shards=num_shards
                ).localCheckpoint(eager=True)
        else:
            frontier = canonicalize(seeds)
            seen = empty_seen
    else:
        frontier = canonicalize(seeds)
        seen = empty_seen
    if bucketed_seen:
        # Reuse a valid existing table instead of drop-and-rewrite (VERDICT
        # r3 #5: at 10^10 seen rows a rebuild is a full-corpus rewrite just
        # to resume). Valid = registered/registerable over the existing
        # bucketed files AND row count equal to the reconstructed seen set
        # (a count mismatch means the table ran ahead of the checkpoint —
        # e.g. a crash between append and snapshot — so rebuild from the
        # checkpointed truth). Every later round is an O(delta) append —
        # the anti-join's seen side never shuffles.
        seen_tbl = seen_mod.reuse_or_create_seen_bucketed(
            spark,
            os.path.join(out_dir, "seen_table"),
            df=resumed_seen,
            expected_rows=n_seen if start_round > 0 else 0,
        )
        seen = spark.table(seen_tbl)

    fetch_target = documents.select(
        "url", F.col("doc_id").alias("f_doc_id"), F.col("spans").alias("f_spans")
    )
    schedules: list[DataFrame] = []
    annotated_parts: list[DataFrame] = []
    # rounds whose annotated snapshot belongs to THIS run's lineage: rounds
    # below a genuine resume point, plus rounds this run writes. A stale
    # round=R/annotated dir from an unrelated prior run in a reused out_dir
    # (e.g. its frontier snapshots were wiped so the crawl restarted fresh)
    # must NOT leak into the returned frame.
    ann_rounds: list[int] = (
        [r for r in range(start_round) if out_dir and _snapshot_ok(out_dir, r, "annotated")]
        if start_round > 0
        else []
    )
    lineage: list[RoundMetrics] = []
    # the state-size measurement feeds only the auto switch — explicit
    # broadcast/shardjoin selections skip the per-round agg job
    measure_state = use_bloom and seen_lookup == "auto"
    state_bytes = _filters_state_bytes(filters_df) if measure_state else 0

    for rnd in range(start_round, rounds):
        shuffle_before = shuffle_totals(spark)
        # N2: tiered prefilter served from the sharded filters table —
        # loaded (fixed-size states), never rebuilt from the seen set.
        # 'shardjoin' probes the states where they live (cogroup, no
        # driver collect/broadcast — the 10^10-key path); 'broadcast'
        # collects the compressed states (the small-state fast path);
        # 'auto' switches on measured aggregate state size. Identical rows
        # either way (pinned by tests).
        lookup = seen_lookup
        if lookup == "auto":
            lookup = "shardjoin" if state_bytes > broadcast_state_limit else "broadcast"
        if (
            use_bloom
            and lookup == "shardjoin"
            and filters_df is not None
            and n_seen > 0
        ):
            new_candidates = seen_mod.filter_new_shardjoin(
                spark, frontier, seen, filters_df, num_shards=num_shards
            )
        else:
            seen_filter: seen_mod.ShardedSeenFilter | None = None
            if use_bloom and filters_df is not None and n_seen > 0:
                seen_filter = load_sharded(filters_df, num_shards)
            new_candidates = seen_mod.filter_new(spark, frontier, seen, seen_filter)

        # candidate count observed upstream: fills when the ranked
        # checkpoint (the one action consuming this plan) executes
        obs_cand = Observation(f"cand_r{rnd}")
        new_candidates = new_candidates.observe(
            obs_cand, F.count(F.lit(1)).alias("candidates")
        )
        obs_rank = Observation(f"rank_r{rnd}")
        # N3 mega-host guard (VERDICT r2 #2): two-phase top-k is the default
        # — the per-host window's single task sorts <= budget*prune_salts
        # rows; phase-1-pruned rows flow into carryover unchanged, so the
        # schedule is provably identical (rank_round docstring, tests)
        ranked = rank_round(
            new_candidates, robots, default_budget, round_no=rnd,
            prune_salts=prune_salts,
        ).withColumn("round", F.lit(rnd))
        ranked = ranked.observe(
            obs_rank,
            F.sum(F.when(F.col("scheduled"), 1).otherwise(0)).alias("selected"),
        )
        # THE round materialization: selected/carryover/schedule/seen are all
        # cheap filters over this one in-memory frame (action 1 of 3)
        ranked = ranked.localCheckpoint(eager=True)
        n_candidates = _obs_int(obs_cand, "candidates", new_candidates)
        n_selected = _obs_int(
            obs_rank, "selected", ranked.filter(F.col("scheduled"))
        )

        selected = ranked.filter(F.col("scheduled")).drop("eligible", "scheduled")
        carryover = ranked.filter(~F.col("scheduled")).drop(
            "eligible", "scheduled", "rnk", "round"
        )

        obs_fetch = Observation(f"fetch_r{rnd}")
        fetched = selected.join(fetch_target, "url", "inner").observe(
            obs_fetch, F.count(F.lit(1)).alias("fetched")
        )

        if annotate and n_selected:
            from warc_metadata_sidecar_spark.operators.sidecar import sidecar_rows

            docs_for_round = documents.join(
                selected.select("url").distinct(), "url", "left_semi"
            )
            ann = sidecar_rows(docs_for_round, media)
            if out_dir is not None:
                # VERDICT r4 #3: checkpoint annotated rows per round like the
                # other round outputs — the returned frame is ONE parquet
                # scan over the round dirs, so driver plan depth stays
                # constant as rounds grow and no leg re-reads `documents`
                # at consumption time. Durable: resume picks earlier rounds'
                # snapshots back up (the lazy-union path lost them).
                ann.write.mode("overwrite").parquet(
                    _ckpt_dir(out_dir, rnd, "annotated")
                )
                ann_rounds.append(rnd)
            else:
                annotated_parts.append(ann)

        if link_fn is not None or discovery == "hrefs":
            # real discovery consumes the SAME fetched plan (the fetch
            # observation still fills), spans renamed to the documents shape
            fetched_pages = fetched.withColumnRenamed("f_spans", "spans")
            links = (
                link_fn(fetched_pages)
                if link_fn is not None
                else extract_hrefs(fetched_pages, distinct=False, edge_kinds=edge_kinds)
            )
        else:
            links = extract_links(fetched, universe)
        obs_links = Observation(f"links_r{rnd}")
        new_frontier = canonicalize(
            links.select(
                "url",
                F.lit(None).cast("string").alias("canonical_url"),
                F.lit(None).cast("string").alias("host"),
                F.lit(None).cast("int").alias("host_salt"),
                F.lit(None).cast("double").alias("priority"),
                F.lit(rnd + 1).alias("discovery_round"),
                F.lit(0).cast("long").alias("seq"),
                "parent_url",
            )
        ).observe(obs_links, F.count(F.lit(1)).alias("new_links"))

        seen_delta = selected.select(
            "canonical_url", F.col("round").alias("first_round")
        )
        if bucketed_seen:
            # O(delta) bucketed append; next round's anti-join reads the
            # table snapshot including these files, exchange-free
            seen_mod.append_seen_bucketed(seen_delta, seen_tbl)
            seen = spark.table(seen_tbl)
        else:
            seen = seen.unionByName(seen_delta)
        n_seen += n_selected

        # N7: keep the frontier partitioned on the salted url-hash key so the
        # next round's dedup groupBy reuses the partitioning; carryover rows
        # (budget overflow + crawl-delay-gated hosts) re-enter the queue
        # (action 2 of 3 — fills the fetch/link observations upstream of it)
        frontier = (
            new_frontier.unionByName(
                carryover.withColumn("parent_url", F.lit(None).cast("string")),
                allowMissingColumns=True,
            )
            .repartition(max(spark.sparkContext.defaultParallelism, 4), "host_salt")
            .localCheckpoint(eager=True)
        )
        n_fetched = _obs_int(obs_fetch, "fetched", fetched)
        n_links = _obs_int(obs_links, "new_links", new_frontier)

        # N2 incremental: fold ONLY this round's newly scheduled keys into
        # the sharded filter states (action 3 of 3; O(delta + shards))
        if use_bloom and n_selected:
            filters_df = update_filter_shards(
                spark,
                selected.select("canonical_url"),
                filters_df,
                num_shards=num_shards,
            ).localCheckpoint(eager=True)
            if measure_state:
                state_bytes = _filters_state_bytes(filters_df)

        mx, mn = _skew_stats(frontier) if skew_stats else (0, 0)
        shuffle_after = shuffle_totals(spark)
        sr, sw = (
            (shuffle_after[0] - shuffle_before[0], shuffle_after[1] - shuffle_before[1])
            if shuffle_before is not None and shuffle_after is not None
            else (-1, -1)
        )
        if sr < 0 or sw < 0:  # stage eviction between samples: unmeasured
            sr, sw = -1, -1
        lineage.append(
            RoundMetrics(
                round=rnd,
                candidates=n_candidates,
                selected=n_selected,
                fetched=n_fetched,
                new_links=n_links,
                seen_after=n_seen,
                max_partition_rows=mx,
                min_partition_rows=mn,
                shuffle_read_bytes=sr,
                shuffle_write_bytes=sw,
            )
        )
        schedules.append(selected)

        if out_dir is not None:
            frontier.write.mode("overwrite").parquet(_ckpt_dir(out_dir, rnd, "frontier"))
            if bucketed_seen:
                # the bucketed table IS the persistent seen store; the round
                # snapshot records only this round's delta (O(delta), not a
                # full O(|seen|) re-copy)
                seen_delta.write.mode("overwrite").parquet(
                    _ckpt_dir(out_dir, rnd, "seen_delta")
                )
            else:
                seen.write.mode("overwrite").parquet(_ckpt_dir(out_dir, rnd, "seen"))
            selected.write.mode("overwrite").parquet(_ckpt_dir(out_dir, rnd, "schedule"))
            if filters_df is not None:
                filters_df.write.mode("overwrite").parquet(
                    _ckpt_dir(out_dir, rnd, "filters")
                )
            lineage_df = spark.createDataFrame([vars(m) for m in lineage[-1:]])
            lineage_df.write.mode("append").parquet(os.path.join(out_dir, "lineage"))
            # N6: per-partition lineage of the checkpointed frontier
            _partition_rows(frontier).withColumn("round", F.lit(rnd)).write.mode(
                "append"
            ).parquet(os.path.join(out_dir, "partition_lineage"))

    if schedules:
        schedule = schedules[0]
        for s in schedules[1:]:
            schedule = schedule.unionByName(s)
    else:
        schedule = spark.createDataFrame(
            [], "canonical_url string, url string, host string, host_salt int, "
            "priority double, discovery_round int, seq long, rnk int, round int"
        )

    annotated = None
    if annotate and out_dir is not None:
        # one multi-path scan over this lineage's annotated snapshots —
        # rounds below the resume point plus rounds written by this run
        # (the in-memory union could only ever cover the latter; stale dirs
        # from an unrelated prior run are excluded by construction)
        ann_dirs = [_ckpt_dir(out_dir, r, "annotated") for r in sorted(ann_rounds)]
        if ann_dirs:
            annotated = spark.read.parquet(*ann_dirs)
    elif annotated_parts:
        annotated = annotated_parts[0]
        for a in annotated_parts[1:]:
            annotated = annotated.unionByName(a)

    return CrawlResult(
        schedule=schedule.select(
            "round", "canonical_url", "host", "url", "priority", "rnk"
        ),
        seen=seen,
        annotated=annotated,
        lineage=lineage,
    )
