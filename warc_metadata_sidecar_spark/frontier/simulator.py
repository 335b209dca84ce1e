"""Single-threaded reference crawl simulator.

The north rule's correctness gate: "given the same seed list and politeness
budget, the scheduler reproduces the reference implementation's crawl
ordering and final URL-seen set". The reference repo has no crawler — this
simulator IS the reference semantics, written as the obvious sequential
loop (dict + sorted lists, no Spark), sharing only the pure scalar twins
(py_canonicalize / py_priority / link model constants) with the engine.

Equality asserted in tests: (round, canonical_url) schedule sets, per-host
per-round ordering, and the final seen set.
"""

from __future__ import annotations

from warc_metadata_sidecar_spark.frontier.canonical import py_canonicalize
from warc_metadata_sidecar_spark.frontier.crawl import LINK_ADDS, LINK_MULTS
from warc_metadata_sidecar_spark.frontier.scheduler import py_rule_match


def simulate_crawl(
    seed_urls: list[str],
    doc_urls: set[str],
    robots: list[dict],
    rounds: int = 3,
    universe: int = 1000,
    default_budget: int = 2,
    schedule_detail: list | None = None,
) -> tuple[list[tuple[int, str]], set[str]]:
    """Returns (schedule [(round, canonical_url) in selection order], seen set).

    When `schedule_detail` (a list) is passed, every selected row is also
    appended to it as a dict with the engine schedule's full column set
    (round, canonical_url, host, url, priority, rnk) — the source of the
    crawl_rounds DuckDB VALUES oracle (driver_queries._crawl_rounds_oracle_sql)."""
    rules: dict[str, list[tuple[str, bool]]] = {}
    budget: dict[str, int] = {}
    delay: dict[str, int] = {}
    for r in robots:
        if r["path_prefix"] is not None:
            rules.setdefault(r["host"], []).append((r["path_prefix"], bool(r["allowed"])))
        if r["path_prefix"] is None and r["allowed"]:
            budget[r["host"]] = min(r["budget"], budget.get(r["host"], 1 << 30))
            delay[r["host"]] = min(r["crawl_delay_s"] or 1, delay.get(r["host"], 1 << 30))

    frontier: list[str] = list(seed_urls)
    seen: set[str] = set()
    schedule: list[tuple[int, str]] = []

    for rnd in range(rounds):
        # dedup by canonical url, keep min raw url as representative
        by_canon: dict[str, str] = {}
        for url in frontier:
            cu, _, _ = py_canonicalize(url)
            if cu in seen:
                continue
            if cu not in by_canon or url < by_canon[cu]:
                by_canon[cu] = url

        # robots deny on path prefix (dropped permanently)
        per_host: dict[str, list[tuple[float, str, str]]] = {}
        for cu, url in by_canon.items():
            cu2, host, priority = py_canonicalize(url)
            no_scheme = url.split("://", 1)[-1] if "://" in url else url
            path = no_scheme[len(no_scheme.split("/", 1)[0]):] if "/" in no_scheme else ""
            # RFC 9309 longest-match (scheduler.apply_robots twin): the most
            # specific matching rule decides, ties prefer Allow, no match
            # allows — max((len, allowed)) mirrors the struct ordering
            matches = [
                (len(p), a) for p, a in rules.get(host, []) if py_rule_match(path, p)
            ]
            if matches and not max(matches)[1]:
                continue
            per_host.setdefault(host, []).append((priority, cu2, url))

        # per-host: crawl-delay gating (host eligible when rnd % delay == 0),
        # then top-budget by (priority desc, canonical asc); the remainder
        # carries into the next round's frontier (queue semantics)
        selected: list[tuple[str, str]] = []  # (canonical, url)
        carryover: list[str] = []
        for host in sorted(per_host):
            rows = sorted(per_host[host], key=lambda t: (-t[0], t[1]))
            if rnd % delay.get(host, 1) != 0:
                carryover.extend(url for _, _, url in rows)
                continue
            b = budget.get(host, default_budget)
            for rnk, (priority, cu, url) in enumerate(rows[:b], start=1):
                selected.append((cu, url))
                if schedule_detail is not None:
                    schedule_detail.append(
                        {
                            "round": rnd,
                            "canonical_url": cu,
                            "host": host,
                            "url": url,
                            "priority": priority,
                            "rnk": rnk,
                        }
                    )
            carryover.extend(url for _, _, url in rows[b:])

        next_frontier: list[str] = list(carryover)
        for cu, url in selected:
            schedule.append((rnd, cu))
            seen.add(cu)
            if url in doc_urls:  # fetch success
                page = int(url.rsplit("/", 1)[-1])
                for m, a in zip(LINK_MULTS, LINK_ADDS):
                    p = (page * m + a) % universe
                    next_frontier.append(f"https://host{p % 50:02d}.example.com/page/{p}")
        frontier = next_frontier

    return schedule, seen
