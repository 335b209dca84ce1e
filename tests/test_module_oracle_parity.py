"""Module <-> SQL-twin parity (VERDICT r1 task 6).

CORRECTNESS_r{N}.json validates the SQL twins in driver_queries.py against
DuckDB; these tests close the remaining gap by asserting the composable
engine API (operators/dedup.py, operators/similarity.py) produces EXACTLY
the twins' rows on the same driver corpus — so the oracle green transfers
to the modules users actually call.
"""

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from warc_metadata_sidecar_spark.operators.dedup import (
    exact_dedup,
    minhash_dedup,
    simhash_dedup_buckets,
)
from warc_metadata_sidecar_spark.operators.similarity import ivf_topk

dq = entry_mod.driver_queries
SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpus(spark):
    dq.register_views(spark, SF_DIR)
    sql = dq._render(
        "WITH "
        + dq.CORPUS_CTE
        + " SELECT CAST(doc_id AS BIGINT) AS doc_id, text FROM corpus",
        dq.SPARK,
    )
    return spark.sql(sql).cache()


def _rows(df, float_cols=(), ndigits=4):
    out = []
    for r in df.collect():
        d = r.asDict()
        out.append(
            tuple(
                round(float(d[c]), ndigits) if c in float_cols and d[c] is not None else d[c]
                for c in sorted(d)
            )
        )
    return sorted(out, key=str)


def test_exact_dedup_module_matches_twin(spark, corpus):
    dq.register_views(spark, SF_DIR)
    twin = spark.sql(dq.spark_sql_for("dedup_exact"))
    mod = exact_dedup(corpus)
    assert _rows(mod) == _rows(twin)


def test_minhash_module_matches_twin(spark, corpus):
    dq.register_views(spark, SF_DIR)
    twin = spark.sql(dq.spark_sql_for("dedup_minhash_lsh"))
    mod = minhash_dedup(corpus, threshold=0.6)
    assert _rows(mod, float_cols={"jaccard"}) == _rows(twin, float_cols={"jaccard"})


def test_simhash_module_matches_twin(spark, corpus):
    dq.register_views(spark, SF_DIR)
    twin = spark.sql(dq.spark_sql_for("dedup_simhash"))
    mod = simhash_dedup_buckets(corpus)
    assert _rows(mod) == _rows(twin)


def test_ivf_module_matches_twin(spark):
    dq.register_views(spark, SF_DIR)
    twin = spark.sql(dq.spark_sql_for("ann_ivf_top1"))
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    mod = (
        ivf_topk(emb, k=1, dims=8)
        .select("vec_id", "neighbor_id", F.round("sim", 4).alias("sim"))
    )
    assert _rows(mod, float_cols={"sim"}) == _rows(twin, float_cols={"sim"})


def test_lm_module_matches_twin(spark):
    """operators/lm.py (train + broadcast-model score) produces exactly the
    dual-dialect lm_perplexity statement's rows — the CCNet-style gate's
    composable form is pinned by the same oracle green."""
    from warc_metadata_sidecar_spark.operators.lm import lm_perplexity

    dq.register_views(spark, SF_DIR)
    twin = spark.sql(dq.spark_sql_for("lm_perplexity"))
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    mod = lm_perplexity(docs)
    assert _rows(mod, float_cols={"bits_per_char"}) == _rows(
        twin, float_cols={"bits_per_char"}
    )


def test_compression_ratio_orders_repetitive_below_prose(spark):
    """operators/quality.compression_ratio: a templated/repeated page
    compresses far below prose, prose below noise; values equal the same
    CPython zlib arithmetic computed directly; empty text drops."""
    import zlib

    from warc_metadata_sidecar_spark.operators.quality import compression_ratio

    rep = "click here to subscribe " * 200
    prose = (
        "The quick brown fox jumps over the lazy dog while seventeen "
        "violinists rehearse an entirely different passage nearby. "
    ) * 20
    import hashlib

    # genuinely high-entropy (hex of chained md5 — a modular formula would
    # be periodic and compress BELOW prose)
    noise = "".join(
        hashlib.md5(bytes([i % 256, i // 256])).hexdigest() for i in range(64)
    )
    docs = spark.createDataFrame(
        [(0, rep), (1, prose), (2, noise), (3, "")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in compression_ratio(docs).collect()}
    assert 3 not in got  # empty text drops (0/0)
    for i, t in ((0, rep), (1, prose), (2, noise)):
        raw = t.encode("utf-8")
        assert got[i].n_bytes == len(raw)
        assert got[i].ratio == round(len(zlib.compress(raw, 6)) / len(raw), 6)
    assert got[0].ratio < got[1].ratio < got[2].ratio
    assert got[0].ratio < 0.05  # boilerplate is drastically compressible


def test_stupid_backoff_branches_hand_computed(spark):
    """operators/lm.stupid_backoff on a tiny hand corpus: each backoff
    branch's score is checked against arithmetic done by hand —
    trigram branch c3/c_ctx, bigram branch 0.4*c23/c_u2, unigram floor
    0.4^2*(c+1)/(N+V) — including the held-out-unseen-word case."""
    import math

    from warc_metadata_sidecar_spark.operators.lm import stupid_backoff

    train = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the cat ran"), (3, "a dog sat")],
        "doc_id long, text string",
    )
    # N = 9 tokens, V = 6 distinct {the,cat,sat,ran,a,dog}
    query = spark.createDataFrame(
        [(10, "the cat sat on mat"), (11, "cat the cat"), (12, "x")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in stupid_backoff(train, query).collect()}
    # doc 10: (the cat sat) trigram branch 1/2; (cat sat on) + (sat on mat)
    # fall through to the unigram floor 0.16 * 1 / 15
    s_floor = 0.4 * 0.4 * 1 / 15
    exp10 = -(math.log(1 / 2) + 2 * math.log(s_floor)) / 3
    assert got[10].n_tri == 3
    assert got[10].nll_per_tok == round(exp10, 4)
    # doc 11: single position (cat the cat) — trigram unseen, backoff
    # bigram 'the cat' c=2, unigram 'the' c=2 -> 0.4 * 2/2
    assert got[11].n_tri == 1
    assert got[11].nll_per_tok == round(-math.log(0.4), 4)
    # doc 12: < 3 words -> no trigram positions, dropped
    assert 12 not in got


def test_substring_spans_module_matches_twin(spark):
    """operators/dedup.exact_substring_spans == the dual-dialect
    substring_spans statement on the planted corpus; the planted exact
    copy (+1M) and its original are fully covered by one span."""
    from warc_metadata_sidecar_spark.operators.dedup import exact_substring_spans

    dq.register_views(spark, SF_DIR)
    twin = _rows(spark.sql(dq.spark_sql_for("substring_spans")))
    corpus = spark.sql(
        dq._render(
            "WITH " + dq.CORPUS_CTE
            + " SELECT CAST(doc_id AS BIGINT) AS doc_id, text FROM corpus",
            dq.SPARK,
        )
    )
    mod = _rows(exact_substring_spans(corpus, k=10))
    assert mod == twin and len(mod) > 0
    spans = {r["doc_id"]: r for r in exact_substring_spans(corpus, k=10).collect()}
    orig0 = {r["doc_id"]: len(r["text"].split(" ")) for r in corpus.where("doc_id IN (0, 1000000)").collect()}
    for d, nw in orig0.items():
        assert (spans[d]["tok_start"], spans[d]["tok_end"]) == (1, nw), d


def test_ccnet_buckets_module_matches_twin(spark):
    """operators/lm.perplexity_buckets (exact ntile path) == the
    dual-dialect ccnet_buckets statement; the approxQuantile scale path
    agrees on >=99% of docs (cut-point ties only)."""
    from warc_metadata_sidecar_spark.operators.lm import perplexity_buckets

    dq.register_views(spark, SF_DIR)
    twin = {
        r["doc_id"]: (r["bits_per_char"], r["bucket"])
        for r in spark.sql(dq.spark_sql_for("ccnet_buckets")).collect()
    }
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    mod = {
        r["doc_id"]: (r["bits_per_char"], r["bucket"])
        for r in perplexity_buckets(docs).collect()
    }
    assert mod == twin
    buckets = {b for _, b in mod.values()}
    assert buckets == {"head", "middle", "tail"}
    ap = {r["doc_id"]: r["bucket"] for r in perplexity_buckets(docs, approx=True).collect()}
    agree = sum(1 for d in twin if ap[d] == twin[d][1]) / len(twin)
    assert agree >= 0.99


def test_gopher_module_matches_twin(spark):
    """operators/quality.py repetition_signals produces exactly the
    dual-dialect gopher_repetition statement's rows on the same planted
    corpus (both drop rules fire: tripled docs trip dup5, boilerplate docs
    trip top2)."""
    from warc_metadata_sidecar_spark.operators.quality import repetition_signals

    dq.register_views(spark, SF_DIR)
    twin = spark.sql(dq.spark_sql_for("gopher_repetition"))
    gdocs = spark.sql(
        dq._render(
            "WITH " + dq.GOPHER_CTE
            + " SELECT CAST(doc_id AS BIGINT) AS doc_id, text FROM gdocs",
            dq.SPARK,
        )
    )
    mod = repetition_signals(gdocs)
    fc = {"top2_frac", "dup5_frac"}
    assert _rows(mod, float_cols=fc) == _rows(twin, float_cols=fc)
    # both rules discriminate on this corpus
    kept = {r["keep"] for r in mod.collect()}
    assert kept == {True, False}


def test_gopher_document_module_matches_twin(spark):
    """operators/quality.document_signals == the dual-dialect
    gopher_quality statement on the planted corpus, and each planted slot
    trips exactly its intended rule."""
    from warc_metadata_sidecar_spark.operators.quality import document_signals

    dq.register_views(spark, SF_DIR)
    twin = spark.sql(dq.spark_sql_for("gopher_quality"))
    gq = spark.sql(
        dq._render(
            "WITH " + dq.GQUAL_CTE
            + " SELECT CAST(doc_id AS BIGINT) AS doc_id, text FROM gq",
            dq.SPARK,
        )
    )
    mod = document_signals(gq)
    fc = {"mean_word_len", "symbol_ratio", "bullet_frac", "ellipsis_frac", "alpha_frac"}
    assert _rows(mod, float_cols=fc) == _rows(twin, float_cols=fc)
    by_slot = {r["doc_id"] % 17: r for r in sorted(mod.collect(), key=lambda r: -r["doc_id"])}
    assert by_slot[1]["bullet_frac"] > 0.9
    assert by_slot[2]["ellipsis_frac"] > 0.3
    assert by_slot[3]["symbol_ratio"] > 0.1
    assert by_slot[4]["alpha_frac"] < 0.8 and by_slot[4]["n_stop"] == 0
    assert by_slot[5]["n_stop"] < 2 and by_slot[5]["alpha_frac"] == 1.0
    assert by_slot[6]["mean_word_len"] > 10
    assert by_slot[7]["keep"] is True
    kept = {r["keep"] for r in mod.collect()}
    assert kept == {True, False}


def test_c4_module_matches_twin(spark):
    """operators/quality.c4_signals == the dual-dialect c4_filters
    statement on the planted corpus; c4_clean keeps exactly the keep=True
    pages with line-filtered text."""
    from warc_metadata_sidecar_spark.operators.quality import c4_clean, c4_signals

    dq.register_views(spark, SF_DIR)
    twin = spark.sql(dq.spark_sql_for("c4_filters"))
    gc4 = spark.sql(
        dq._render(
            "WITH " + dq.GC4_CTE
            + " SELECT CAST(doc_id AS BIGINT) AS doc_id, text FROM gc4",
            dq.SPARK,
        )
    )
    mod = c4_signals(gc4)
    assert _rows(mod) == _rows(twin)
    by_slot = {r["doc_id"] % 19: r for r in sorted(mod.collect(), key=lambda r: -r["doc_id"])}
    assert by_slot[2]["has_lorem"] and not by_slot[2]["keep"]
    assert by_slot[3]["has_brace"] and not by_slot[3]["keep"]
    assert by_slot[4]["n_kept_lines"] == 5 and by_slot[4]["keep"]  # js line cut
    assert by_slot[7]["n_sentences"] == 3 and not by_slot[7]["keep"]
    assert by_slot[8]["has_blockword"] and not by_slot[8]["keep"]
    cleaned = c4_clean(gc4)
    keep_ids = {r["doc_id"] for r in mod.where("keep").collect()}
    assert {r["doc_id"] for r in cleaned.collect()} == keep_ids
    # a cleaned page's lines all end in terminal punctuation
    sample = cleaned.where(F.col("doc_id") % 19 == 4).first()
    assert all(
        ln.endswith((".", "!", "?", '"')) and "javascript" not in ln
        for ln in sample["text"].split("\n")
    )


def test_quality_gates_zero_shuffle(spark):
    """document_signals / c4_signals are pure projections: no Exchange,
    no Join anywhere in their plans (the BENCH/NEWOPS.md claim)."""
    from warc_metadata_sidecar_spark.operators.quality import c4_signals, document_signals

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    for fn in (document_signals, c4_signals):
        plan = fn(docs)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and "Join" not in plan, fn.__name__


def test_shard_manifest_single_agg_exchange(spark):
    """shard_manifest costs one aggregation exchange and nothing else."""
    from warc_metadata_sidecar_spark.operators.shards import shard_manifest

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = shard_manifest(docs, 8)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_paragraph_dedup_module_matches_twin(spark):
    """operators/dedup.paragraph_dedup == the dual-dialect SQL twin on the
    planted-paragraph fixture (shared boilerplate line + colliding 8-word
    slices), and the module plan costs exactly 2 exchanges (window on the
    paragraph md5 + the single reassembly groupBy — no self-join)."""
    import duckdb

    from warc_metadata_sidecar_spark.operators.dedup import paragraph_dedup

    dq.register_views(spark, SF_DIR)
    fix = spark.sql(
        "WITH " + dq._render(dq._pded_cte(dq.SPARK), dq.SPARK)
        + " SELECT doc_id, text FROM pd"
    )
    out = paragraph_dedup(fix)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 2 and "Join" not in plan
    got = sorted(
        (int(r.doc_id), int(r.n_paras), int(r.n_kept), r.text) for r in out.collect()
    )
    con = duckdb.connect()
    for t in dq.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    exp = sorted(
        (int(a), int(b), int(c), d)
        for a, b, c, d in con.execute(dq.duck_sql_for("paragraph_dedup")).fetchall()
    )
    assert got == exp
    # the fixture genuinely exercises dedup: some docs lose paragraphs,
    # the shared boilerplate survives exactly once corpus-wide
    assert any(k < p for _, p, k, _ in exp)
    boiler = "subscribe to our newsletter for updates"
    assert sum(t.count(boiler) for _, _, _, t in exp) == 1


def test_dsir_module_matches_twin(spark):
    """operators/sampling.dsir_select == the dual-dialect SQL twin
    (target = lang='en', k=100), and the plan keeps the scale shape:
    top-k is TakeOrderedAndProject (never a global sort) and the
    log-ratio/membership joins are broadcasts."""
    import duckdb

    from warc_metadata_sidecar_spark.operators.sampling import dsir_select

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = dsir_select(docs, docs.filter(F.col("lang") == "en"), k=100)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan
    got = sorted(
        (int(r.doc_id), round(float(r.lw), 4), bool(r.selected)) for r in out.collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    exp = sorted(
        (int(a), round(float(b), 4), bool(c))
        for a, b, c in con.execute(dq.duck_sql_for("dsir_select")).fetchall()
    )
    assert got == exp
    assert sum(1 for _, _, s in exp if s) == 100


def test_top_ngrams_module_matches_twin(spark):
    """operators/quality.top_ngrams == the dual-dialect SQL twin, and the
    plan's top-k is TakeOrderedAndProject over a map-side-combined count
    (never a global Sort)."""
    import duckdb

    from warc_metadata_sidecar_spark.operators.quality import top_ngrams

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = top_ngrams(docs, n=2, k=20)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    got = [(r.gram, int(r.n_occurrences)) for r in out.collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    exp = [(g, int(c)) for g, c in con.execute(dq.duck_sql_for("top_ngrams")).fetchall()]
    assert got == exp


def test_boilerplate_filter_module_matches_twin(spark):
    """operators/dedup.boilerplate_filter == the dual-dialect SQL twin on
    the planted-paragraph fixture: the shared subscribe footer (df = N/3)
    disappears from EVERY doc (vs paragraph_dedup's keep-first), and the
    plan is the documented 3-exchange shape (distinct pair hash, df
    groupBy reuse, reassembly) with one lh equi-join."""
    import duckdb

    from warc_metadata_sidecar_spark.operators.dedup import boilerplate_filter

    dq.register_views(spark, SF_DIR)
    fix = spark.sql(
        "WITH " + dq._render(dq._pded_cte(dq.SPARK), dq.SPARK)
        + " SELECT doc_id, text FROM pd"
    )
    out = boilerplate_filter(fix, max_docs=2)
    got = sorted(
        (int(r.doc_id), int(r.n_lines), int(r.n_kept), r.text) for r in out.collect()
    )
    con = duckdb.connect()
    for t in dq.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    exp = sorted(
        (int(a), int(b), int(c), d)
        for a, b, c, d in con.execute(dq.duck_sql_for("boilerplate_lines")).fetchall()
    )
    assert got == exp
    boiler = "subscribe to our newsletter for updates"
    assert sum(t.count(boiler) for _, _, _, t in exp) == 0  # dropped everywhere
    assert any(k < n for _, n, k, _ in exp)


def test_containment_direction_is_asymmetric(spark):
    """containment_pairs on the planted quote-inclusion fixture: every
    quoter (id+700000) points at its source above threshold, while the
    reverse direction (long doc -> short quote) stays below it — for
    sources long enough that the asymmetry is a mathematical fact. A
    source of n words has n-2 shingles and shares at most 10 with its
    12-word quote, so reverse containment <= 10/(n-2): only sources with
    n >= 23 (bound < 0.5) participate in the reverse assertion — a SHORT
    source legitimately IS contained in its quoter (doc 84 at one
    testdata generation had 14 words -> reverse containment 10/12)."""
    import duckdb

    from warc_metadata_sidecar_spark.operators.dedup import containment_pairs

    dq.register_views(spark, SF_DIR)
    fix = spark.sql(
        "WITH " + dq._render(dq._cont_cte(dq.SPARK), dq.SPARK)
        + " SELECT doc_id, text FROM qc"
    )
    rows = {(r.id_a, r.id_b): r.containment for r in containment_pairs(fix).collect()}
    words = dict(
        duckdb.sql(
            f"SELECT doc_id, len(string_split(text, ' ')) FROM "
            f"'{SF_DIR}/documents.parquet' WHERE doc_id % 7 = 0 AND doc_id < 500"
        ).fetchall()
    )
    quoters = [i for i in range(0, 500, 7)]
    hit = sum(1 for q in quoters if (q + 700000, q) in rows)
    assert hit >= len(quoters) - 2  # boundary shingles may collide away
    long_sources = [q for q in quoters if words[q] >= 23]
    assert len(long_sources) >= 10  # the fixture must actually test something
    for q in long_sources:
        assert (q, q + 700000) not in rows  # reverse stays sub-threshold
