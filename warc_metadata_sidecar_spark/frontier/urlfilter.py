"""URL blocklist filtering (UT1-style) — domain-suffix + path-keyword
gates over crawl/corpus URLs, the RefinedWeb/FineWeb "URL filtering"
curation stage.

Reference parity note: the reference sidecar annotates every record it
is handed (warc_metadata_sidecar.py:205) and leaves URL policy to the
crawler; real pipelines front-load a blocklist pass (the public UT1
lists: ~4M blocked registrable domains + keyword lists) before any
fetch or extraction spend. This extends SURVEY §2's N-ops frontier
family the same way robots/politeness do.

Semantics
---------
* domain gate: a URL is blocked when its host equals a blocklist entry
  or ends with "." + entry (registrable-suffix match, the UT1
  contract). When several entries match (e.g. "badads.net" AND
  "tracker.badads.net"), the MOST SPECIFIC (longest, i.e. most-label)
  suffix is reported.
* keyword gate: the path+query substring (everything after the
  authority) is scanned case-insensitively for any blocked word on an
  ASCII word boundary; the LEFTMOST match is reported lowercased.
* keep = no domain match AND no keyword match.

Scale shape (100 TB corpus, 4M-domain blocklist)
------------------------------------------------
* The host has at most a handful of labels; every blocklist entry is an
  END-anchored label suffix. So instead of exploding the corpus or
  LIKE-scanning 4M patterns, we stage the last-j-label suffixes
  (j = 1..max_labels) as `max_labels` NAMED columns (the with_surt CSE
  lesson) and LEFT-JOIN the deduped blocklist once per depth.
* broadcast mode (default, UT1 fits executor memory): all `max_labels`
  joins are BroadcastHashJoins — ZERO exchanges on the corpus, the
  whole gate is map-side (plan-pinned in tests/test_frontier.py).
  The blocklist broadcasts ONCE and is reused by every join.
* shuffle mode (blocklist beyond broadcast budget): classic explode ->
  repartition-join -> min-depth re-aggregation on a synthetic row id,
  2 exchanges on exploded (row, suffix) pairs — never on full rows;
  payload columns rejoin by row id afterwards. Same result set
  (equality-tested), pick via mode="shuffle" or the row-count
  threshold.
* the keyword gate is ONE whole-stage-codegen regexp projection —
  no Python, no shuffle, list compiled into a single alternation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from warc_metadata_sidecar_spark.functions.surt import host_col

# ASCII word-boundary, case-insensitive; group 1 = the matched word.
_WORD_TPL = r"(?i)\b({})\b"


def _escaped_alternation(words: tuple[str, ...] | list[str]) -> str:
    import re as _re

    return _WORD_TPL.format("|".join(_re.escape(w.lower()) for w in sorted(words)))


def blocklist_filter(
    df: DataFrame,
    blocked_domains: DataFrame,
    blocked_words: tuple[str, ...] | list[str] = (),
    url_col: str = "url",
    max_labels: int = 8,
    mode: str = "broadcast",
) -> DataFrame:
    """Annotate `df` with (host, blocked_domain, blocked_word, keep).

    blocked_domains: one-column DataFrame `domain` (lowercase registrable
    suffixes; deduped here). mode="broadcast" keeps the corpus map-side
    (see module docstring); mode="shuffle" is the beyond-broadcast route.
    Hosts deeper than `max_labels` labels are matched on their last
    `max_labels` suffixes only — UT1 entries are registrable domains
    (2-4 labels), so 8 covers every published list."""
    if mode not in ("broadcast", "shuffle"):
        raise ValueError(f"unknown mode: {mode}")
    bl = blocked_domains.select(F.lower("domain").alias("domain")).distinct()
    out = df.withColumn("host", host_col(F.col(url_col)))
    path = F.regexp_replace(
        F.col(url_col), r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", ""
    )
    if blocked_words:
        word = F.lower(F.regexp_extract(path, _escaped_alternation(blocked_words), 1))
        out = out.withColumn(
            "blocked_word", F.when(word != "", word).otherwise(F.lit(None))
        )
    else:
        out = out.withColumn("blocked_word", F.lit(None).cast("string"))

    labels = F.split(F.col("host"), r"\.")
    # _sfx{j}: the last-j-label suffix (NULL when the host is shallower) —
    # staged as named columns so Catalyst CSEs the split once.
    for j in range(1, max_labels + 1):
        out = out.withColumn(
            f"_sfx{j}",
            F.when(
                F.size(labels) >= j, F.array_join(F.slice(labels, -j, j), ".")
            ),
        )

    if mode == "broadcast":
        for j in range(1, max_labels + 1):
            bj = F.broadcast(bl.withColumnRenamed("domain", f"_bd{j}"))
            out = out.join(bj, out[f"_sfx{j}"] == bj[f"_bd{j}"], "left")
        # most-specific = most labels = highest j
        matched = F.coalesce(
            *[F.col(f"_bd{j}") for j in range(max_labels, 0, -1)]
        )
        out = out.withColumn("blocked_domain", matched)
        drop = [f"_sfx{j}" for j in range(1, max_labels + 1)] + [
            f"_bd{j}" for j in range(1, max_labels + 1)
        ]
    else:
        rid = F.monotonically_increasing_id()
        out = out.withColumn("_rid", rid)
        pairs = out.select(
            "_rid",
            F.explode(
                F.filter(
                    F.array(*[F.col(f"_sfx{j}") for j in range(1, max_labels + 1)]),
                    lambda s: s.isNotNull(),
                )
            ).alias("_sfx"),
        )
        hits = (
            pairs.join(bl, pairs["_sfx"] == bl["domain"])
            .groupBy("_rid")
            .agg(
                F.max(
                    F.struct(F.size(F.split("domain", r"\.")).alias("n"), F.col("domain"))
                )["domain"].alias("blocked_domain")
            )
        )
        out = out.join(hits, "_rid", "left")
        drop = [f"_sfx{j}" for j in range(1, max_labels + 1)] + ["_rid"]
    out = out.drop(*drop)
    return out.withColumn(
        "keep",
        F.col("blocked_domain").isNull() & F.col("blocked_word").isNull(),
    )
