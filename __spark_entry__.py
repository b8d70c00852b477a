"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship BM25 search with the real engine (code-aware
Arrow-UDF tokenizer chain) on sf0.001.

``queries()`` / ``oracle_sql()`` — operator coverage from SURVEY.md §2
(core engine) and §2.11 (training-data pipeline extension: textstats,
dedup, similarity search, multimodal, clustering), each Spark
implementation paired with an ANSI-SQL oracle DuckDB runs on the same
parquet where expressible (29 of 37 queries — including connected
components via a recursive CTE), rows-only otherwise.
Oracle-checked full-text queries use the SQL-expressible tokenizer
(lower + split on ``[^a-z0-9]+``, mahout_spark.operators.stats.
simple_term_frequencies) so both engines compute identical token streams;
the stemming analyzer-chain pipeline is golden-tested against the
reference's own logged values in tests/ instead (Porter isn't expressible
in SQL), and exercised here by the rows-only-checked ``engine_*`` entries.

Float determinism rules used throughout (cross-engine hash equality):
  * money sums -> exact integer cents/micros (no float accumulation),
  * scores -> round(x, 6) applied identically on both sides,
  * ranking -> always on the rounded score with a total-order tiebreak.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BM25_QUERY_TERMS = ["spark", "query", "data"]
BM25_K1, BM25_B = 1.2, 0.75


def _load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# memoized index builds (round-5 contract-cost fix)
#
# Round 4's contract ran 62 hermetic per-query index builds (~28 min at
# sf0.01) and starved the driver's budget — CORRECTNESS_r04.json came back
# empty. Every engine_* query is read-only against the index it builds, so
# one build per distinct knob set (mode / positions / lang_col / n_buckets /
# corpus subset) now serves all of them from a process-lifetime cache dir;
# build_index(resume=True) makes repeat calls metadata-only. Queries that
# MUTATE index state (tombstones, compaction, snapshot+delete) run against a
# hardlink clone of the shared base: parquet data files are immutable under
# the catalog's staged-write contract so hardlinks are safe to share, while
# the in-place-appended metadata (_meta.json, _lineage.jsonl, _SUCCESS,
# tombstone side files) is real-copied per clone.
# ---------------------------------------------------------------------------

_IDX_CACHE_ROOT: str | None = None
_IDX_MEMO: dict = {}


def _idx_cache_root() -> str:
    global _IDX_CACHE_ROOT
    if _IDX_CACHE_ROOT is None:
        import atexit
        import shutil
        import tempfile

        root = os.environ.get("MSDRV_IDX_CACHE")
        if root:
            os.makedirs(root, exist_ok=True)
        else:
            root = tempfile.mkdtemp(prefix="msdrv_idxcache_")
            atexit.register(shutil.rmtree, root, ignore_errors=True)
        _IDX_CACHE_ROOT = root
    return _IDX_CACHE_ROOT


def _corpus_fingerprint(sf_dir: str) -> str:
    """Stat-level fingerprint of documents.parquet so a cache dir pinned
    via MSDRV_IDX_CACHE can never serve an index built from regenerated
    testdata (path + file sizes + mtimes; no data read)."""
    import hashlib

    p = os.path.join(sf_dir, "documents.parquet")
    parts = [os.path.abspath(sf_dir)]
    if os.path.isdir(p):
        for fn in sorted(os.listdir(p)):
            st = os.stat(os.path.join(p, fn))
            parts.append(f"{fn}:{st.st_size}:{st.st_mtime_ns}")
    elif os.path.exists(p):
        st = os.stat(p)
        parts.append(f"doc:{st.st_size}:{st.st_mtime_ns}")
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:12]


def _shared_index(spark, sf_dir, *, mode="simple", positions=False,
                  lang_col=None, n_buckets=8, docs=None, tag=""):
    """Build-once-per-process index over sf_dir's documents (or a derived
    ``docs`` subset named by ``tag``). Tier builders (permuterm, gram,
    suggest) may add their derived tables to the shared catalog — those
    writes are idempotent, epoch-gated, and invisible to queries that do
    not read them."""
    key = (os.path.abspath(sf_dir), mode, positions, lang_col, n_buckets,
           tag)
    cat = _IDX_MEMO.get(key)
    if cat is not None:
        return cat
    import hashlib

    from mahout_spark.index.build import build_index

    if docs is None:
        docs = _load(spark, sf_dir, "documents")
    name = hashlib.sha256(
        "|".join(map(str, key + (_corpus_fingerprint(sf_dir),))).encode()
    ).hexdigest()[:12]
    cat = build_index(
        spark, docs, out_dir=os.path.join(_idx_cache_root(), name),
        content_col="text", id_cols=["doc_id"], mode=mode,
        positions=positions, lang_col=lang_col, n_buckets=n_buckets,
        resume=True,
    )
    _IDX_MEMO[key] = cat
    return cat


def _cloned_index(spark, sf_dir, *, mode="simple", positions=False):
    """Private mutable clone of the shared base index for queries that
    write index state. Returns (catalog, tmpdir); the caller owns tmpdir
    cleanup. Parquet files are hardlinked (never modified in place — the
    catalog only stages + renames + unlinks), everything else is copied."""
    import shutil
    import tempfile

    base = _shared_index(spark, sf_dir, mode=mode, positions=positions)
    dst = tempfile.mkdtemp(prefix="msdrv_mut_")

    def _cp(src, d):
        if src.endswith(".parquet"):
            try:
                os.link(src, d)
                return
            except OSError:
                pass
        shutil.copy2(src, d)

    clone_root = os.path.join(dst, "idx")
    shutil.copytree(base.root, clone_root, copy_function=_cp)
    from mahout_spark.sources.catalog import ParquetCatalog

    return ParquetCatalog(clone_root), dst


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 top-10 over sf0.001 documents with the real analyzer
    chain (tokenize -> stop -> Porter), query analyzed the same way."""
    from mahout_spark.query import CorpusScorer
    from mahout_spark.tokenize import tokenize_text

    docs = _load(spark, "/root/testdata/sf0.001", "documents")
    scorer = CorpusScorer(docs, content_col="text", id_cols=["doc_id"])
    q = tokenize_text(" ".join(BM25_QUERY_TERMS))
    return scorer.search(q, k=10)


# ---------------------------------------------------------------------------
# shared Spark building blocks (simple tokenizer pipeline)
# ---------------------------------------------------------------------------

def _simple_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mahout_spark.operators.stats import simple_term_frequencies

    docs = _load(spark, sf_dir, "documents")
    return simple_term_frequencies(docs, "text", "doc_id")


def _corpus_scalars(spark: SparkSession, sf_dir: str, tf: DataFrame) -> tuple[int, float]:
    n_docs = _load(spark, sf_dir, "documents").count()
    row = (
        tf.groupBy("doc_id").agg(F.max("doclen").alias("dl"))
        .agg(F.avg("dl")).first()
    )
    return n_docs, float(row[0])


def _bm25_scored(spark, sf_dir, terms):
    from mahout_spark.functions import bm25_expr
    from mahout_spark.operators.stats import document_frequency

    tf = _simple_tf(spark, sf_dir)
    n_docs, avgdl = _corpus_scalars(spark, sf_dir, tf)
    dfreq = document_frequency(tf)
    return (
        tf.filter(F.col("term").isin(terms))
        .join(dfreq, "term")
        .withColumn(
            "contrib",
            bm25_expr(F.col("tf"), F.col("df"), F.col("doclen"),
                      n_docs, avgdl, BM25_K1, BM25_B),
        )
    )


def _bm25_topk(spark, sf_dir, terms, k, mode_all):
    scored = _bm25_scored(spark, sf_dir, terms)
    agg = scored.groupBy("doc_id").agg(
        F.round(F.sum("contrib"), 6).alias("score"),
        F.count(F.lit(1)).alias("matched"),
    )
    if mode_all:
        agg = agg.filter(F.col("matched") == len(terms))
    return (
        agg.select("doc_id", "score")
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
    )


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def q_wordcount(spark, sf_dir):
    """A1: corpus wordcount (reference wordcount artifact)."""
    return _simple_tf(spark, sf_dir).groupBy("term").agg(
        F.sum("tf").alias("cnt")
    )


def q_document_frequency(spark, sf_dir):
    """A4: exact df per term (reference tfidf/df-count)."""
    from mahout_spark.operators.stats import document_frequency

    return document_frequency(_simple_tf(spark, sf_dir))


def q_doclen(spark, sf_dir):
    """A6: per-doc length (BM25 normalizer)."""
    return _simple_tf(spark, sf_dir).groupBy("doc_id").agg(
        F.max("doclen").alias("doclen")
    )


def q_tfidf_top5_per_doc(spark, sf_dir):
    """A5+O1-O3: reference TF-IDF formula, per-doc top-5 with rank."""
    from mahout_spark.functions import tfidf_expr
    from mahout_spark.operators.stats import document_frequency

    tf = _simple_tf(spark, sf_dir)
    n_docs = _load(spark, sf_dir, "documents").count()
    scored = tf.join(document_frequency(tf), "term").withColumn(
        "score", F.round(tfidf_expr(F.col("tf"), F.col("df"), n_docs), 6)
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("doc_id", "term", "score", "rank")
    )


def q_bm25_topk_or(spark, sf_dir):
    """O7/J5: BM25 top-10, OR semantics, rank-identical ordering."""
    return _bm25_topk(spark, sf_dir, BM25_QUERY_TERMS, 10, False)


def q_bm25_topk_and(spark, sf_dir):
    """J5: posting-list intersection (AND) + BM25 top-10."""
    return _bm25_topk(spark, sf_dir, BM25_QUERY_TERMS, 10, True)


def q_dedup_exact(spark, sf_dir):
    """Exact dedup by content hash-group: keep min doc_id per text, report
    groups with duplicates."""
    docs = _load(spark, sf_dir, "documents")
    return (
        docs.groupBy("text")
        .agg(F.min("doc_id").alias("keep_doc_id"),
             F.count(F.lit(1)).alias("n_copies"))
        .filter(F.col("n_copies") > 1)
        .select("keep_doc_id", "n_copies")
    )


def q_tpch_pricing_summary(spark, sf_dir):
    """TPC-H Q1-style aggregation; money in exact integer cents/micros so
    the sums are order-independent (cross-engine deterministic)."""
    li = _load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1997-06-30")
    )
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc = F.round(F.col("l_discount") * 100).cast("long")
    tax = F.round(F.col("l_tax") * 100).cast("long")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            F.sum(cents).alias("sum_base_cents"),
            F.sum(cents * (100 - disc)).alias("sum_disc_c4"),
            F.sum(cents * (100 - disc) * (100 + tax)).alias("sum_charge_c6"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_revenue_by_nation(spark, sf_dir):
    """Join chain customer⋈orders⋈nation with broadcast dims, exact cents."""
    orders = _load(spark, sf_dir, "orders")
    cust = _load(spark, sf_dir, "customer")
    nation = _load(spark, sf_dir, "nation")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(cents).alias("revenue_cents"),
             F.count(F.lit(1)).alias("n_orders"))
    )


def q_events_top3_per_user(spark, sf_dir):
    """Window top-k over the events table (O1-O3 on a non-text table)."""
    ev = _load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("value").desc(), F.col("event_id").asc()
    )
    return (
        ev.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("user_id", "event_id", "value", "rank")
    )


def q_engine_bm25_search(spark, sf_dir):
    """Real analyzer chain (Arrow UDF, Porter) BM25 search — not
    SQL-expressible; driver records rows-only check."""
    from mahout_spark.query import CorpusScorer
    from mahout_spark.tokenize import tokenize_text

    docs = _load(spark, sf_dir, "documents")
    scorer = CorpusScorer(docs, content_col="text", id_cols=["doc_id"])
    return scorer.search(tokenize_text(" ".join(BM25_QUERY_TERMS)), k=10)


def q_engine_indexed_bm25(spark, sf_dir):
    """The flagship INDEXED path end-to-end: build the posting-block
    index (analyzer chain, bucket-partitioned, block-max metadata) into a
    temp dir, then answer the standard query with WAND block-max top-k.
    Rows-only driver check; rank/score identity with the naive scorer and
    a numpy oracle is pytest-gated (tests/test_index.py)."""
    from mahout_spark.index.wand import topk
    from mahout_spark.tokenize import tokenize_text

    cat = _shared_index(spark, sf_dir, mode="text")
    result = topk(
        spark, cat, tokenize_text(" ".join(BM25_QUERY_TERMS)), k=10
    )
    # materialize before the temp index dir is removed
    rows = result.collect()
    return spark.createDataFrame(rows, result.schema)


def q_engine_indexed_bm25_simple(spark, sf_dir):
    """The indexed WAND path made DuckDB-hash-checkable end-to-end: build
    the posting-block index with the SQL-expressible SIMPLE tokenizer
    (mode='simple' routes stats.term_frequencies through the same
    split/lower stream the oracle's _TOK_CTE computes), then answer the
    standard query with block-max WAND. Because the index machinery is
    tokenizer-agnostic, this drives build → block encode → bucket pruning
    → WAND → merge under the already-green bm25_topk_or oracle — the
    engine's most correctness-dense component gets a driver-verified
    rows+schema+hash row, not just pytest gates."""
    from mahout_spark.index.wand import topk

    cat = _shared_index(spark, sf_dir)
    result = topk(spark, cat, BM25_QUERY_TERMS, k=10).select(
        "doc_id", F.round("score", 6).alias("score")
    )
    rows = result.collect()
    return spark.createDataFrame(rows, result.schema)


def q_engine_mad(spark, sf_dir):
    """median_absolute_deviation agg (X152, exact regime): median and
    MAD of n_chars over the OR match set — both exact interpolated
    percentiles, the fixpoint ES's t-digest converges to."""
    from mahout_spark.index.aggs import facet_mad

    docs = _load(spark, sf_dir, "documents")
    cat = _shared_index(spark, sf_dir)
    return facet_mad(
        spark, cat, docs, " OR ".join(BM25_QUERY_TERMS), "n_chars")


def q_engine_boxplot(spark, sf_dir):
    """boxplot agg (X152): (min, q1, q2, q3, max) of n_chars over the
    OR match set, exact interpolation."""
    from mahout_spark.index.aggs import facet_boxplot

    docs = _load(spark, sf_dir, "documents")
    cat = _shared_index(spark, sf_dir)
    return facet_boxplot(
        spark, cat, docs, " OR ".join(BM25_QUERY_TERMS), "n_chars")


def q_engine_string_stats(spark, sf_dir):
    """string_stats agg (X152): length stats + character-distribution
    Shannon entropy of the source field over the OR match set; the
    entropy fold is the char-ordered running sum (alphabet-sized
    window), which the oracle replays verbatim."""
    from mahout_spark.index.aggs import string_stats

    docs = _load(spark, sf_dir, "documents")
    cat = _shared_index(spark, sf_dir)
    return string_stats(
        spark, cat, docs, " OR ".join(BM25_QUERY_TERMS), "source")


def q_engine_percentile_ranks(spark, sf_dir):
    """percentile_ranks aggregation (X135, the inverse of X87's
    percentiles): for n_chars values 300/500/900, the percentage of the
    match set at or below each — the exact discrete rank convention
    (100·|{x <= v}|/n), which the oracle replays verbatim."""
    from mahout_spark.index.aggs import percentile_ranks

    docs = _load(spark, sf_dir, "documents")
    cat = _shared_index(spark, sf_dir)
    return percentile_ranks(
        spark, cat, docs, " OR ".join(BM25_QUERY_TERMS), "n_chars",
        (300, 500, 900),
    )


def q_engine_reshard_search(spark, sf_dir):
    """Reshard-without-re-analysis (X142, the ES _shrink/_split
    lifecycle op): reshard the shared index from docs_per_shard 2^14 to
    64 (analysis artifacts hardlink; only the posting encode re-runs),
    then answer the standard BM25 query. Scoring is sharding-invariant,
    so the oracle is the SAME total ordering as
    engine_indexed_bm25_simple — a MATCH proves the re-encoded blocks,
    bounds, and shard routing are all correct under the new layout."""
    import shutil
    import tempfile

    from mahout_spark.index.build import reshard_index
    from mahout_spark.index.wand import topk

    base = _shared_index(spark, sf_dir)
    dst = tempfile.mkdtemp(prefix="msdrv_rs_")
    try:
        cat = reshard_index(
            spark, base, os.path.join(dst, "idx"), docs_per_shard=64,
            block_size=8)
        result = topk(spark, cat, BM25_QUERY_TERMS, k=10).select(
            "doc_id", F.round("score", 6).alias("score"))
        rows = result.collect()
    finally:
        shutil.rmtree(dst, ignore_errors=True)
    return spark.createDataFrame(rows, result.schema)


def q_engine_phrase_prefix(spark, sf_dir):
    """match_phrase_prefix (X139, the ES search-as-you-type primitive):
    the phrase 'table s*' — last slot is any dictionary term starting
    with 's' (6 expansions at sf0.01, under the 50 cap), one positional
    kernel pass, per-doc score = the BEST matching variant's BM25 sum
    (pinned convention; ES's MultiPhrase idf blend is not exactly
    replayable). The oracle enumerates the expansions from the token
    stream and replays match + scoring per variant relationally."""
    from mahout_spark.index.phrase import phrase_prefix_topk

    cat = _shared_index(spark, sf_dir, positions=True)
    result = phrase_prefix_topk(
        spark, cat, ["table"], "s", k=10
    ).select("doc_id", F.round("score", 6).alias("score"))
    rows = result.collect()
    return spark.createDataFrame(rows, result.schema)


PHRASE_QUERY = ["table", "scan"]
DELETE_MOD = 7


def q_engine_delete_search(spark, sf_dir):
    """Tombstone deletion (X43, index/delete.py): build the simple-mode
    index, delete every doc with doc_id % DELETE_MOD == 0 (an O(1)
    metadata write — postings untouched), and run the standard BM25
    query. Lucene semantics, oracle-pinned: deleted docs vanish from
    results immediately, but df/avgdl/N keep their PRE-delete values
    until compaction — so the oracle is the full-corpus BM25 relation
    with only the final candidate set restricted to live docs."""
    import shutil

    from mahout_spark.index.delete import delete_docs
    from mahout_spark.index.wand import topk

    docs = _load(spark, sf_dir, "documents")
    cat, out = _cloned_index(spark, sf_dir)
    try:
        delete_docs(
            spark, cat,
            docs.filter(F.col("doc_id") % DELETE_MOD == 0)
            .select("doc_id"),
        )
        result = topk(spark, cat, BM25_QUERY_TERMS, k=10).select(
            "doc_id", F.round("score", 6).alias("score")
        )
        rows = result.collect()
        return spark.createDataFrame(rows, result.schema)
    finally:
        shutil.rmtree(out, ignore_errors=True)


def q_engine_dedup_delete_search(spark, sf_dir):
    """Mass-delete fed by dedup (X74 — the exact scenario round-3's
    VERDICT flagged as the wrong shape for driver-collected tombstones):
    exact-dedup the corpus (keep min doc_id per text group), tombstone
    every OTHER copy as a DataFrame with the relational masking regime
    FORCED (DELETED_MAX_COLLECT=0 — the 10^8-delete code path, cogrouped
    per-shard slices, zero driver collect), then run the standard BM25
    query. Lucene delete semantics: stats stay pre-delete, so the oracle
    is the full-corpus BM25 relation with candidates restricted to the
    dedup survivors."""
    import shutil

    from mahout_spark.index import delete as del_mod
    from mahout_spark.index.delete import delete_docs
    from mahout_spark.index.wand import topk

    docs = _load(spark, sf_dir, "documents")
    cat, out = _cloned_index(spark, sf_dir)
    old_cap = del_mod.DELETED_MAX_COLLECT
    try:
        keep = docs.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
        dups = docs.select("doc_id").join(
            keep.select("doc_id"), "doc_id", "left_anti"
        )
        del_mod.DELETED_MAX_COLLECT = 0  # force the mass-delete regime
        delete_docs(spark, cat, dups)
        result = topk(spark, cat, BM25_QUERY_TERMS, k=10).select(
            "doc_id", F.round("score", 6).alias("score")
        )
        rows = result.collect()
        return spark.createDataFrame(rows, result.schema)
    finally:
        del_mod.DELETED_MAX_COLLECT = old_cap
        shutil.rmtree(out, ignore_errors=True)


def q_engine_delete_purge_search(spark, sf_dir):
    """Purge-at-compaction (X43's reclamation half): same deletes as
    engine_delete_search, then compact_index(purge_deleted=True) — tf_raw
    and docstats shed the tombstoned rows, df/avgdl/N recompute, postings
    re-encode. The oracle is therefore the BM25 relation computed over
    the LIVE corpus only: post-purge scores must equal a from-scratch
    build over the surviving docs (block-level equality is pytest-gated
    in tests/test_delete.py; this pins the score side to DuckDB)."""
    import shutil

    from mahout_spark.index.compact import compact_index
    from mahout_spark.index.delete import delete_docs
    from mahout_spark.index.wand import topk

    docs = _load(spark, sf_dir, "documents")
    cat, out = _cloned_index(spark, sf_dir)
    try:
        delete_docs(
            spark, cat,
            docs.filter(F.col("doc_id") % DELETE_MOD == 0)
            .select("doc_id"),
        )
        compact_index(spark, cat)
        result = topk(spark, cat, BM25_QUERY_TERMS, k=10).select(
            "doc_id", F.round("score", 6).alias("score")
        )
        rows = result.collect()
        return spark.createDataFrame(rows, result.schema)
    finally:
        shutil.rmtree(out, ignore_errors=True)


def q_engine_phrase_search(spark, sf_dir):
    """Exact-phrase retrieval over the POSITIONAL index (X38): build with
    positions=True + the SQL-expressible simple tokenizer, then rank docs
    containing the contiguous token sequence PHRASE_QUERY by the BM25 sum
    of its terms (index/phrase.py kernel: rarest-first AND intersection ->
    composite doc<<44|pos occurrence keys -> searchsorted adjacency). The
    DuckDB oracle reconstructs the normalized token stream as a
    space-joined string and phrase-matches with LIKE — a fully independent
    relation — so adjacency, positional codec round-trip, and scoring are
    all hash-checked end-to-end."""
    from mahout_spark.index.phrase import phrase_topk

    cat = _shared_index(spark, sf_dir, positions=True)
    result = phrase_topk(spark, cat, PHRASE_QUERY, k=10).select(
        "doc_id", F.round("score", 6).alias("score")
    )
    rows = result.collect()
    return spark.createDataFrame(rows, result.schema)


PROX_TERMS = ["data", "merge"]
PROX_WINDOW = 8
SNIPPET_CONTEXT = 3
BOOL_QUERY = '("table scan" OR merge) AND data NOT stream'
PREFIX_QUERY = "s* AND window"


def q_engine_boolean_search(spark, sf_dir):
    """Boolean query-language retrieval (X41) over the positional index:
    BOOL_QUERY exercises every connective — a phrase leaf, OR, AND, and
    NOT subtraction — compiled by queryparse.parse onto the shard kernel
    (index/boolquery.py); scoring is the BM25 sum of the query's positive
    terms. The DuckDB oracle evaluates the same tree with SQL set
    operations (UNION / INTERSECT / EXCEPT over per-term doc sets, LIKE
    on the token stream for the phrase leaf) — a fully independent
    relation."""
    from mahout_spark.index.boolquery import boolean_topk

    cat = _shared_index(spark, sf_dir, positions=True)
    result = boolean_topk(spark, cat, BOOL_QUERY, k=10).select(
        "doc_id", F.round("score", 6).alias("score")
    )
    rows = result.collect()
    return spark.createDataFrame(rows, result.schema)


def q_engine_prefix_search(spark, sf_dir):
    """Prefix (wildcard) retrieval (X42): PREFIX_QUERY's ``s*`` expands
    against the index lexicon (capped at the 64 highest-df matches — the
    sf0.01 vocabulary has 6, so expansion is exhaustive and the SQL
    LIKE-relation oracle is exact) and the expanded OR is AND-ed with a
    plain term. No positions needed — runs on the standard index."""
    from mahout_spark.index.boolquery import boolean_topk

    cat = _shared_index(spark, sf_dir)
    result = boolean_topk(spark, cat, PREFIX_QUERY, k=10).select(
        "doc_id", F.round("score", 6).alias("score")
    )
    rows = result.collect()
    return spark.createDataFrame(rows, result.schema)


FUZZY_QUERY = "slot~2 AND group"


def q_engine_fuzzy_search(spark, sf_dir):
    """Fuzzy (edit-distance) retrieval (X47): FUZZY_QUERY's ``slot~2``
    expands against the index lexicon to the terms within Levenshtein
    distance 2 (ranked distance asc, df desc, term asc, capped at 64 —
    the sf0.01 vocabulary has 2 matches, slow at d=1 and sort at d=2, so
    expansion is exhaustive and the SQL levenshtein relation is exact),
    OR-scored and AND-ed with a plain term. 'slot' itself is NOT in the
    corpus, so this exercises pure-fuzzy recall. The DuckDB oracle
    recomputes the expansion set with its own independent levenshtein
    implementation."""
    from mahout_spark.index.boolquery import boolean_topk

    cat = _shared_index(spark, sf_dir)
    result = boolean_topk(spark, cat, FUZZY_QUERY, k=10).select(
        "doc_id", F.round("score", 6).alias("score")
    )
    rows = result.collect()
    return spark.createDataFrame(rows, result.schema)


BOOST_QUERY = "table^3 OR (scan AND data)^0.5 OR merge"


def q_engine_boost_search(spark, sf_dir):
    """Boosted boolean retrieval (X50): BOOST_QUERY exercises a term
    boost, a group boost over an AND, and an unboosted branch. Weights
    fold into the kernel's idf table (score is linear in idf), so this
    checks the fold plus the match semantics stay boost-invariant. The
    DuckDB oracle evaluates the same tree with SQL set ops and scales
    each term's BM25 contribution with an explicit CASE weight table."""
    from mahout_spark.index.boolquery import boolean_topk

    cat = _shared_index(spark, sf_dir)
    result = boolean_topk(spark, cat, BOOST_QUERY, k=10).select(
        "doc_id", F.round("score", 6).alias("score")
    )
    rows = result.collect()
    return spark.createDataFrame(rows, result.schema)


BATCH_QUERIES = {
    "q_and": "table AND data",
    "q_ornot": "scan OR merge NOT stream",
    "q_prefix": "mer* OR data",
}


def q_engine_boolean_batch(spark, sf_dir):
    """Batched boolean retrieval (X58): three query shapes (AND,
    OR-with-NOT, prefix) answered in ONE job from a shared per-shard
    decode, ranked per query by a partitioned window. The DuckDB oracle
    recomputes each query's relation independently and UNION ALLs them
    with the same per-query ROW_NUMBER cut."""
    from mahout_spark.index.boolquery import boolean_topk_batch

    cat = _shared_index(spark, sf_dir)
    result = boolean_topk_batch(
        spark, cat, BATCH_QUERIES, k=10
    ).select(
        "query_id", "doc_id",
        F.round("score", 6).alias("score"),
        F.col("rank").cast("long").alias("rank"),
    )
    rows = result.collect()
    return spark.createDataFrame(rows, result.schema)


def q_engine_filtered_search(spark, sf_dir):
    """Filter-context retrieval (X61): the standard OR query restricted
    to the docs a metadata predicate (lang='en') selects, scores
    untouched by the filter (the ES query-vs-filter-context contract).
    Oracle: the same full-corpus BM25 relation joined to the documents
    table on the predicate."""
    from mahout_spark.index.boolquery import filtered_topk

    docs = _load(spark, sf_dir, "documents")
    cat = _shared_index(spark, sf_dir)
    result = filtered_topk(
        spark, cat, " OR ".join(BM25_QUERY_TERMS),
        docs.filter(F.col("lang") == "en"), k=10,
    ).select("doc_id", F.round("score", 6).alias("score"))
    rows = result.collect()
    return spark.createDataFrame(rows, result.schema)


def q_engine_range_search(spark, sf_dir):
    """Range-filter query syntax (X75): Lucene ``field:[lo TO hi]``
    range conjuncts parsed out of the query string, compiled to a docs
    table predicate, and run through the adaptive filter-context plan —
    filter semantics, scores untouched. Oracle: the same full-corpus
    BM25 relation joined to documents on the BETWEEN predicate."""
    from mahout_spark.index.rangequery import ranged_topk

    docs = _load(spark, sf_dir, "documents")
    cat = _shared_index(spark, sf_dir)
    q = f"({' OR '.join(BM25_QUERY_TERMS)}) AND n_chars:[200 TO 450]"
    result = ranged_topk(spark, cat, docs, q, k=10).select(
        "doc_id", F.round("score", 6).alias("score")
    )
    rows = result.collect()
    return spark.createDataFrame(rows, result.schema)


def q_engine_sorted_search(spark, sf_dir):
    """Sort-by-field retrieval (X76, the ES ``sort`` parameter): the
    match set ordered by a corpus column instead of relevance — BM25
    never runs. Oracle: the SQL match set joined to documents, ordered
    by the same column with the doc_id tiebreak."""
    from mahout_spark.index.ranking import sorted_topk

    docs = _load(spark, sf_dir, "documents")
    cat = _shared_index(spark, sf_dir)
    result = sorted_topk(
        spark, cat, docs, " OR ".join(BM25_QUERY_TERMS),
        "-n_chars", k=15,
    )
    rows = result.collect()
    return spark.createDataFrame(rows, result.schema)


def q_engine_match_count(spark, sf_dir):
    """Count API (X77, the ES ``_count`` endpoint): the match-set size
    of a boolean query with NOT — one partial-aggregated scalar, no
    scoring. Oracle: count over the SQL set-op relation."""
    from mahout_spark.index.aggs import match_count

    cat = _shared_index(spark, sf_dir)
    result = match_count(spark, cat, "(spark OR query) AND data")
    rows = result.collect()
    return spark.createDataFrame(rows, result.schema)


def q_engine_cardinality(spark, sf_dir):
    """Cardinality aggregation (X77, ES ``cardinality`` agg, exact
    regime): distinct lang / source values over the match set. Oracle:
    COUNT(DISTINCT ...) over the same relation."""
    from mahout_spark.index.aggs import facet_cardinality

    docs = _load(spark, sf_dir, "documents")
    cat = _shared_index(spark, sf_dir)
    result = facet_cardinality(
        spark, cat, docs, " OR ".join(BM25_QUERY_TERMS),
        ["lang", "source"],
    )
    rows = result.collect()
    return spark.createDataFrame(rows, result.schema)


def q_engine_function_score(spark, sf_dir):
    """function_score retrieval (X78, ES field_value_factor): BM25
    blended with a per-doc signal column —
    ``score = bm25 * (2 * log1p(0.01 * n_chars))`` — components
    returned for auditability. Oracle: the unrounded BM25 relation
    joined to documents with the same arithmetic."""
    from mahout_spark.index.ranking import function_score_topk

    docs = _load(spark, sf_dir, "documents")
    cat = _shared_index(spark, sf_dir)
    result = function_score_topk(
        spark, cat, docs, " OR ".join(BM25_QUERY_TERMS),
        "n_chars", k=10, factor=0.01, modifier="log1p", weight=2.0,
        boost_mode="multiply",
    ).select(
        "doc_id", F.round("score", 6).alias("score"),
        F.round("bm25", 6).alias("bm25"), F.round("fn", 6).alias("fn"),
    )
    rows = result.collect()
    return spark.createDataFrame(rows, result.schema)


def q_engine_term_vectors(spark, sf_dir):
    """Term vectors (X79, the ES ``_termvectors`` API): per-doc term
    stats (tf, doclen, corpus df) read from the row-form forward index
    with the doc_id predicate pushed to parquet. Oracle: the token
    stream recounted per doc and joined to the df relation."""
    from mahout_spark.index.diag import term_vectors

    cat = _shared_index(spark, sf_dir)
    result = term_vectors(spark, cat, [0, 1, 2, 3, 4])
    rows = result.collect()
    return spark.createDataFrame(rows, result.schema)


def q_date_histogram(spark, sf_dir):
    """Calendar date_histogram (X80, the ES date_histogram agg with
    calendar intervals): daily tumbling buckets over the events
    stream with count/sum/avg of the value column. Oracle: DuckDB
    date_trunc — Spark and DuckDB agree on calendar-truncation
    semantics, which is the point of the test."""
    from mahout_spark.operators.timeseries import date_histogram

    events = _load(spark, sf_dir, "events")
    return date_histogram(events, "ts", "day", "value")


def q_ingest_pipeline(spark, sf_dir):
    """Ingest pipeline (X151, the ES _ingest processor chain compiled
    to one codegen projection): set a constant tag, lowercase text,
    strip vowels via gsub into a derived column, token-count it via
    split+convert... each processor an ES-shaped declaration, applied
    in order. The oracle replays every processor as plain SQL."""
    from mahout_spark.sources.ingest_pipeline import ingest_pipeline

    docs = _load(spark, sf_dir, "documents").select(
        "doc_id", "text", "source", "n_chars")
    out = ingest_pipeline(docs, [
        {"set": {"field": "pipeline_tag", "value": "r5"}},
        {"lowercase": {"field": "text", "target_field": "lc"}},
        {"gsub": {"field": "lc", "pattern": "[aeiou]",
                  "replacement": "", "target_field": "novowel"}},
        {"split": {"field": "lc", "separator": "[^a-z0-9]+",
                   "target_field": "toks"}},
        {"rename": {"field": "source", "target_field": "src"}},
        {"convert": {"field": "n_chars", "type": "double"}},
        {"trim": {"field": "novowel"}},
        {"remove": {"field": "text"}},
    ])
    # arrays are unhashable in the driver canonicalizer: project size
    return out.select(
        "doc_id", "pipeline_tag", "src",
        F.col("n_chars").alias("n_chars_d"),
        F.length("novowel").alias("novowel_len"),
        F.size(F.filter(F.col("toks"), lambda t: t != ""))
        .cast("long").alias("n_toks"),
    )


def q_weighted_sample(spark, sf_dir):
    """Weighted sampling without replacement (X149, Efraimidis-Spirakis
    with the replayable permutation as the uniform draw): 100 docs by
    n_chars weight. The oracle replays u, ln(u)/w at round-6, and the
    (key desc, id) cut."""
    from mahout_spark.operators.curation import weighted_sample

    docs = _load(spark, sf_dir, "documents").select(
        "doc_id", F.col("n_chars").cast("double").alias("w"))
    return weighted_sample(docs, k=100, weight_col="w")


def q_funnel(spark, sf_dir):
    """Ordered funnel (X146, the ClickHouse windowFunnel shape, pinned
    to the replayable greedy-earliest chain): view → click → purchase
    with a 24 h conversion window, one row per user who viewed. The
    oracle replays the chain as sequential min-aggregate CTEs."""
    from mahout_spark.operators.behavior import funnel

    return funnel(
        _load(spark, sf_dir, "events"),
        ["view", "click", "purchase"], window_s=86400)


def q_retention(spark, sf_dir):
    """Retention cohorts (X147): users cohort by first-event day;
    per (cohort, day offset ≤ 7) distinct active members + the
    retention fraction. Fully relational triangle — the oracle replays
    cohorting, distinct activity marks, and the ratio."""
    from mahout_spark.operators.behavior import retention_cohorts

    return retention_cohorts(
        _load(spark, sf_dir, "events"), period="day", max_offset=7)


def q_rollup_day(spark, sf_dir):
    """Hypertable rollup (X145, the TimescaleDB continuous-aggregate
    shape): materialize the hour→day tier ladder (the day tier FOLDS
    the hour tier — raw events are aggregated exactly once), then
    answer the day query from the materialized tier. The oracle
    aggregates raw events directly per day, so a MATCH certifies the
    tier fold is lossless (counts/sums/min/max reassociate; avg derived
    from sum/count at read)."""
    import shutil
    import tempfile

    from mahout_spark.operators.rollup import rollup_build, rollup_query

    ev = _load(spark, sf_dir, "events")
    dst = tempfile.mkdtemp(prefix="msdrv_ru_")
    try:
        rollup_build(spark, ev, dst, intervals=("hour", "day"))
        result = rollup_query(spark, dst, "day")
        rows = result.collect()
    finally:
        shutil.rmtree(dst, ignore_errors=True)
    return spark.createDataFrame(rows, result.schema)


def q_asof_join(spark, sf_dir):
    """As-of join (X143, the kdb/pandas merge_asof primitive): every
    'click' event joined to the latest same-user 'view' at-or-before
    its timestamp — the union-and-window plan (one key exchange, no
    range explosion). The oracle is DuckDB's NATIVE ASOF LEFT JOIN — a
    fully independent implementation of the semantics."""
    from mahout_spark.operators.joins import asof_join

    ev = _load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "value")
    return asof_join(clicks, views, on="user_id", ts_col="ts")


def q_asof_join_tolerance(spark, sf_dir):
    """X143 with a 2-hour tolerance: matches farther back than 7200 s
    void to NULL (exact integer-microsecond arithmetic both engines)."""
    from mahout_spark.operators.joins import asof_join

    ev = _load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "value")
    return asof_join(clicks, views, on="user_id", ts_col="ts",
                     tolerance_s=7200)


RANGE_BANDS = [(0.0, 5.0, "low"), (5.0, 20.0, "mid"),
               (20.0, 100.0, "high"), (0.0, 50.0, "wide")]


def q_range_join(spark, sf_dir):
    """Range join (X144): events banded by value against an OVERLAPPING
    interval table (a row can land in 'mid' AND 'wide') via the binned
    equi-join — the plan is gated to contain NO nested-loop join. The
    oracle is the plain inequality join."""
    from mahout_spark.operators.joins import range_join

    ev = _load(spark, sf_dir, "events").select("event_id", "value")
    bands = spark.createDataFrame(
        RANGE_BANDS, "lo double, hi double, band string")
    return range_join(ev, bands, "value", bin_width=8.0).select(
        "event_id", "value", "band")


def q_auto_date_histogram(spark, sf_dir):
    """auto_date_histogram (X138): the finest calendar interval whose
    ACTUAL distinct-bucket count fits target_buckets=20 — at sf0.01 the
    ladder walks hour(720) → day(30) → week(5 ≤ 20), so the oracle must
    reproduce both the choice and the weekly buckets."""
    from mahout_spark.operators.timeseries import auto_date_histogram

    events = _load(spark, sf_dir, "events")
    return auto_date_histogram(events, "ts", target_buckets=20,
                               value_col="value")


def q_events_date_math(spark, sf_dir):
    """Date-math range query (X107, ES `now-20d/d`): events in
    [now-20d/d, now-5d/d) against the pinned now 2024-01-28T12:30:00
    (replayable — ES pipelines pass `now` for the same reason), rolled
    up per event_type. The bounds resolve driver-side to literals, so
    the scan prunes on row-group ts stats; the oracle re-derives them
    with interval arithmetic — independent of the python resolver."""
    from datetime import datetime

    from mahout_spark.functions.datemath import date_math_filter

    events = _load(spark, sf_dir, "events")
    sel = date_math_filter(
        events, "ts", gte="now-20d/d", lt="now-5d/d",
        now=datetime(2024, 1, 28, 12, 30, 0),
    )
    return (
        sel.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 6).alias("sum_value"))
        .orderBy("event_type")
    )


def q_events_sessions(spark, sf_dir):
    """Session windows (X110, Spark session_window / the gaps-and-
    islands rollup): per-user sessions at a 30-minute gap over the
    events table (batch body of the streaming operator — the stream ≡
    batch identity is pytest-gated). Oracle: classic lag + cumulative
    break-flag SQL with the same closed-boundary merge rule."""
    from mahout_spark.streaming.windows import sessionized_event_stats

    return sessionized_event_stats(
        _load(spark, sf_dir, "events"), gap="30 minutes")


def q_histogram_serial_diff(spark, sf_dir):
    """serial_diff pipeline agg (X117, ES serial_diff): lag-7
    differencing of the daily histogram's sum_value — the weekly-
    seasonality remover."""
    from mahout_spark.operators.timeseries import (
        bucket_serial_diff,
        date_histogram,
    )

    events = _load(spark, sf_dir, "events")
    return bucket_serial_diff(
        date_histogram(events, "ts", "day", "value"), "sum_value", lag=7)


def q_histogram_normalize(spark, sf_dir):
    """normalize pipeline agg (X113, ES normalize z-score): the daily
    histogram's sum_value z-scored across its sibling buckets
    (population σ, the ES formula)."""
    from mahout_spark.operators.timeseries import (
        bucket_normalize,
        date_histogram,
    )

    events = _load(spark, sf_dir, "events")
    return bucket_normalize(
        date_histogram(events, "ts", "day", "value"), "sum_value",
        "z-score")


def q_histogram_pipeline(spark, sf_dir):
    """Pipeline aggregations (X93, ES derivative / cumulative_sum /
    moving_avg): the daily date_histogram's sum_value run through all
    three pipeline metrics (trailing window 3). The window runs over
    the already-aggregated bucket relation — bounded by the time axis,
    not the corpus."""
    from mahout_spark.operators.timeseries import (
        bucket_pipeline,
        date_histogram,
    )

    events = _load(spark, sf_dir, "events")
    return bucket_pipeline(
        date_histogram(events, "ts", "day", "value"), "sum_value",
        window=3,
    )


def q_histogram_top_buckets(spark, sf_dir):
    """bucket_selector + bucket_sort pipeline aggs (X94, ES HAVING +
    sorted/paged bucket truncation): daily date_histogram, buckets with
    n_events >= 10 kept, re-ordered by sum_value desc (bucket asc on
    ties), page from=2 size=7. Both run over the already-aggregated
    bucket relation."""
    from mahout_spark.operators.timeseries import (
        bucket_selector,
        bucket_sort,
        date_histogram,
    )

    events = _load(spark, sf_dir, "events")
    kept = bucket_selector(
        date_histogram(events, "ts", "day", "value"), "n_events >= 10")
    return bucket_sort(
        kept, sort=[("sum_value", "desc")], size=7, offset=2)


def q_histogram_stats(spark, sf_dir):
    """Sibling pipeline aggs (X104, ES stats_bucket / min_bucket /
    max_bucket): one row of cross-bucket statistics over the daily
    histogram's sum_value, extremes carrying their bucket keys (ties
    pinned to the first bucket asc)."""
    from mahout_spark.operators.timeseries import (
        bucket_stats,
        date_histogram,
    )

    events = _load(spark, sf_dir, "events")
    return bucket_stats(
        date_histogram(events, "ts", "day", "value"), "sum_value")


def q_passage_search(spark, sf_dir):
    """Passage retrieval with parent-doc rollup (X81, MaxP / ES
    inner_hits): chunk-level BM25 over the chunk corpus, each doc
    ranked by its best passage. Fully relational — the oracle
    reproduces the chunk arithmetic and the whole scoring relation in
    SQL."""
    from mahout_spark.operators.passage import passage_topk

    docs = _load(spark, sf_dir, "documents")
    result = passage_topk(
        docs, BM25_QUERY_TERMS, k=10, chunk_tokens=24, overlap=8,
    ).select(
        "doc_id", "chunk_id", F.round("score", 6).alias("score")
    )
    rows = result.collect()
    return spark.createDataFrame(rows, result.schema)


def q_engine_did_you_mean(spark, sf_dir):
    """Whole-query spell correction (X82, the ES phrase-suggester
    shape): per-token best lexicon correction by (distance asc, df
    desc, term asc), present tokens kept. Oracle: DuckDB's independent
    levenshtein over the df relation per token."""
    from mahout_spark.index.boolquery import did_you_mean

    cat = _shared_index(spark, sf_dir)
    result = did_you_mean(spark, cat, "sparkk dtaa query")
    rows = result.collect()
    return spark.createDataFrame(rows, result.schema)


def q_engine_filtered_ann(spark, sf_dir):
    """Attribute-filtered ANN (X83, the ES kNN ``filter`` model) in the
    FULL-PROBE regime, where adaptive over-probing + exact rerank is
    provably the filtered brute force — the oracle is the exact cosine
    relation restricted to the predicate. The approximate regime's
    over-probe escalation is test-gated in tests/."""
    from mahout_spark.operators.similarity import (
        add_ivf_cells,
        ivf_ann_topk_filtered,
        ivf_train_centroids,
    )

    emb = _load(spark, sf_dir, "embeddings")
    qvec = [float(x)
            for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    cents = ivf_train_centroids(emb, n_cells=IVF_CELLS, sample_n=1024)
    cells = add_ivf_cells(emb, cents)
    return ivf_ann_topk_filtered(
        cells, qvec, cents, F.col("label") == 2, k=10, n_probes=IVF_CELLS,
    )


def q_engine_pq_ann(spark, sf_dir):
    """Product-quantized ANN (X84, the FAISS PQ analog) in the
    FULL-RERANK regime: ADC candidate selection over the m-byte codes
    with ``rerank >= corpus`` makes every row a candidate and the exact
    cosine rerank decides — provably brute force, so the oracle is the
    plain exact cosine relation. The ADC-only recall regime (the 100 TB
    bandwidth path) is test-gated in tests/test_pq.py."""
    from mahout_spark.operators.pq import add_pq_codes, pq_ann_topk, pq_train

    emb = _load(spark, sf_dir, "embeddings")
    qvec = [float(x)
            for x in emb.filter(F.col("vec_id") == 7).first()["embedding"]]
    books = pq_train(emb, m=16, n_codes=256, sample_n=1024)
    coded = add_pq_codes(emb, books)
    return pq_ann_topk(coded, qvec, books, k=10, rerank=10**9)


def q_engine_sq_ann(spark, sf_dir):
    """Scalar int8 quantized ANN (X90, the ES int8 kNN model) in the
    FULL-RERANK regime: quantized candidate selection with ``rerank >=
    corpus`` makes every row a candidate and the exact cosine rerank
    decides — provably brute force, so the oracle is the plain exact
    cosine relation (query vector = row 11). Quantized-only recall is
    test-gated in tests/test_quant.py."""
    from mahout_spark.operators.quant import add_sq_codes, sq_ann_topk, \
        sq_train

    emb = _load(spark, sf_dir, "embeddings")
    qvec = [float(x)
            for x in emb.filter(F.col("vec_id") == 11).first()["embedding"]]
    lo, hi = sq_train(emb)
    coded = add_sq_codes(emb, lo, hi)
    return sq_ann_topk(coded, qvec, lo, hi, k=10, rerank=10**9)


def q_engine_bbq_ann(spark, sf_dir):
    """Binary-quantized ANN (X95, the ES BBQ kNN model) in the
    FULL-RERANK regime: 1-bit-per-dimension sign codes select
    candidates, and ``rerank >= corpus`` makes every row a candidate so
    the exact cosine rerank decides — provably brute force, so the
    oracle is the plain exact cosine relation (query vector = row 7).
    Binary-only candidate recall is test-gated in tests/test_binquant.py."""
    from mahout_spark.operators.binquant import add_bq_codes, bq_ann_topk, \
        bq_train

    emb = _load(spark, sf_dir, "embeddings")
    qvec = [float(x)
            for x in emb.filter(F.col("vec_id") == 7).first()["embedding"]]
    mean = bq_train(emb)
    coded = add_bq_codes(emb, mean)
    return bq_ann_topk(coded, qvec, mean, k=10, rerank=10**9)


def _chunk_children(spark, sf_dir):
    """The parent-child fixture (X100): children = the X78 chunk corpus
    with a per-chunk match score = tf('data') in the chunk — simple and
    exactly SQL-replayable; only chunks containing the term match."""
    from mahout_spark.operators.textstats import chunk_documents

    chunks = chunk_documents(
        _load(spark, sf_dir, "documents"),
        chunk_tokens=CHUNK_TOKENS, overlap=CHUNK_OVERLAP,
    )
    tf = F.size(F.filter(
        F.split(F.col("chunk_text"), " "), lambda t: t == "data"))
    return (
        chunks.withColumn("score", tf.cast("double"))
        .filter(F.col("score") > 0)
        .select(F.col("doc_id").alias("parent_id"), "chunk_id",
                "n_chunk_tokens", "score")
    )


def q_engine_has_child(spark, sf_dir):
    """has_child query (X100, the ES join-field): parent docs with >= 2
    chunks containing 'data', scored by the SUM of the chunks'
    tf('data') (score_mode=sum), with the child count attached. The
    child side aggregates BEFORE the join — one partial-agg exchange."""
    from mahout_spark.operators.parentjoin import has_child

    docs = _load(spark, sf_dir, "documents").select("doc_id", "source")
    return has_child(
        docs, _chunk_children(spark, sf_dir),
        score_mode="sum", min_children=2,
    )


def q_engine_has_parent(spark, sf_dir):
    """has_parent query (X100): chunks whose parent doc has
    source = 'src3', parent score = n_chars copied to every child
    (ES score mode). Ordered (parent, chunk)."""
    from mahout_spark.operators.parentjoin import has_parent
    from mahout_spark.operators.textstats import chunk_documents

    chunks = chunk_documents(
        _load(spark, sf_dir, "documents"),
        chunk_tokens=CHUNK_TOKENS, overlap=CHUNK_OVERLAP,
    ).select(F.col("doc_id").alias("parent_id"), "chunk_id",
             "n_chunk_tokens")
    pm = (
        _load(spark, sf_dir, "documents")
        .filter(F.col("source") == "src3")
        .select("doc_id", F.col("n_chars").cast("double").alias("score"))
    )
    return has_parent(chunks, pm, score=True).orderBy(
        "parent_id", "chunk_id")


#: The mixture fixture (X103): exact binary-fraction proportions so the
#: python-side normalization (sum = exactly 1.0) and the SQL oracle's
#: raw p agree bit-for-bit in the threshold arithmetic.
MIX_TARGET = {"src1": 0.5, "src2": 0.25, "src3": 0.25}
MIX_SEED = 7


def q_mixture_sample(spark, sf_dir):
    """Domain-mixture resampling (X103, fixed-mixture data balancing):
    deterministic stratified downsample of documents to the
    src1:src2:src3 = 2:1:1 target — per-source keep thresholds on the
    X86 multiplicative-hash permutation, corpus streamed through one
    broadcast-join filter."""
    from mahout_spark.operators.curation import mixture_sample

    return mixture_sample(
        _load(spark, sf_dir, "documents"), MIX_TARGET, seed=MIX_SEED,
    ).select("doc_id", "source")


def q_mixture_stats(spark, sf_dir):
    """The X103 mixture audit: per target source, corpus count, keep
    rate, kept count, and achieved proportion of the sampled corpus."""
    from mahout_spark.operators.curation import mixture_stats

    return mixture_stats(
        _load(spark, sf_dir, "documents"), MIX_TARGET, seed=MIX_SEED)


def q_repetition_signals(spark, sf_dir):
    """Gopher repetition filters (X98, Rae et al. 2021 table A1): per
    doc, duplicate-line fraction + duplicate-line char fraction, the
    top word-2-gram char fraction, and the duplicated word-5-gram char
    fraction — the MassiveText quality gate between heuristic scoring
    and dedup. Zero-exchange Arrow-batch pass; the oracle replays the
    identical multiset arithmetic via unnest + window SQL."""
    from mahout_spark.operators.curation import repetition_signals

    return repetition_signals(_load(spark, sf_dir, "documents"))


def q_lm_quality(spark, sf_dir):
    """CCNet-style LM perplexity bucketing (X128, Wenzek et al. 2020):
    add-1 unigram LM trained on the deterministic reference slice
    (doc_id % 10 == 0), per-doc token cross entropy via an ORDERED
    per-doc running-sum window (hash-stable float folding), tertile
    head/middle/tail buckets from interpolation-free discrete cut
    points. The oracle replays the LM, the ordered fold, and the
    ranked thresholds verbatim."""
    from mahout_spark.operators.curation import lm_quality

    return lm_quality(_load(spark, sf_dir, "documents"))


def q_c4_filters(spark, sf_dir):
    """C4 heuristic cleaning (X129, Raffel et al. 2020 §2.2): the
    fixture corpus has no line structure, so the query first derives a
    deterministic line-structured corpus — 8-token lines, terminated
    with '.' when (doc_id + line_idx) % 4 != 0 — in pure array
    expressions both engines share, then applies the full rule set:
    line floor of 3 words, terminal punctuation, 'stream' as the
    line-drop policy word, 'vector' as the document policy word,
    'slow filter' as the banned phrase, sentence floor of 5. The
    oracle replays the derivation AND every rule."""
    from mahout_spark.operators.curation import c4_filters

    docs = _load(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
        lambda x: x != "",
    )
    lined = (
        docs.filter(F.col("text").isNotNull())
        .select("doc_id", toks.alias("_tk"))
        .filter(F.size("_tk") > 0)
        .select(
            "doc_id",
            F.array_join(
                F.transform(
                    F.sequence(
                        F.lit(0),
                        ((F.size("_tk") - 1) / 8).cast("int"),
                    ),
                    lambda i: F.concat(
                        F.array_join(
                            F.slice(F.col("_tk"), i * 8 + 1, 8), " "),
                        F.when(
                            ((F.col("doc_id") + i) % 4) != 0, F.lit(".")
                        ).otherwise(F.lit("")),
                    ),
                ),
                "\n",
            ).alias("text"),
        )
    )
    return c4_filters(
        lined,
        min_words_per_line=3,
        min_sentences=5,
        line_drop_words=("stream",),
        banned_words=("vector",),
        banned_phrases=("slow filter",),
    )


def q_gopher_filters(spark, sf_dir):
    """Gopher quality gate (X130, Rae et al. 2021 table A1): like
    q_c4_filters the query first derives a deterministic line-structured
    corpus — 6-token lines; every line bulleted ('- ') when doc_id%11==0;
    '...' endings on every line when doc_id%17==0 (drives the
    symbol-to-word rule) or on every third line when doc_id%13==0
    (drives the line-ellipsis rule); '.' otherwise — then applies the
    full gate incl. the X98 repetition thresholds. min_words=20 and
    min_stop_hits=1 fit the fixture (its vocabulary carries 'the' but
    no second Gopher stop word). The oracle replays the derivation,
    every doc-level rule, AND the repetition signals."""
    from mahout_spark.operators.curation import gopher_filters

    docs = _load(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
        lambda x: x != "",
    )
    lined = (
        docs.filter(F.col("text").isNotNull())
        .select("doc_id", toks.alias("_tk"))
        .filter(F.size("_tk") > 0)
        .select(
            "doc_id",
            F.array_join(
                F.transform(
                    F.sequence(
                        F.lit(0),
                        ((F.size("_tk") - 1) / 6).cast("int"),
                    ),
                    lambda i: F.concat(
                        F.when(F.col("doc_id") % 11 == 0, F.lit("- "))
                        .otherwise(F.lit("")),
                        F.array_join(
                            F.slice(F.col("_tk"), i * 6 + 1, 6), " "),
                        F.when(F.col("doc_id") % 17 == 0, F.lit("..."))
                        .when(
                            ((F.col("doc_id") % 13) == 0)
                            & ((i % 3) == 0),
                            F.lit("..."),
                        )
                        .otherwise(F.lit(".")),
                    ),
                ),
                "\n",
            ).alias("text"),
        )
    )
    return gopher_filters(lined, min_words=20, min_stop_hits=1)


def _curated(spark, sf_dir):
    """The X131 pipeline fixture: train split (doc_id % 97 != 0) plus
    PLANTED exact duplicates — a +1,000,000-id copy of every train doc
    with doc_id % 89 == 0 — so canonical selection has real work (the
    fixture corpus itself has no duplicate texts); eval = the % 97 == 0
    split; 4-grams as in q_decontaminate; min_quality 0.55 (drops the
    low tail, keeps the bulk)."""
    from mahout_spark.operators.curation import curate_pipeline

    train, test = _contam_split(spark, sf_dir)
    train = train.select("doc_id", "text")
    planted = train.filter(F.col("doc_id") % 89 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text")
    return curate_pipeline(
        train.unionAll(planted), test,
        min_quality=0.55, decon_n=4)


def q_curate_pipeline(spark, sf_dir):
    """End-to-end curation funnel (X131): quality gate -> exact dedup
    (canonical = min id per sha256) -> decontamination, sequential
    first-drop-wins disposition per doc. The oracle replays every stage
    relationally (dedup on exact text equality — a MATCH doubles as a
    sha collision check on the planted duplicates)."""
    return _curated(spark, sf_dir)


def q_curate_stats(spark, sf_dir):
    """The X131 one-row funnel audit (docs in/kept + per-stage drops)."""
    from mahout_spark.operators.curation import curate_stats

    return curate_stats(_curated(spark, sf_dir))


def _planted_lines(spark, sf_dir):
    """The X132/X133 fixture: the corpus has no line structure OR
    cross-document repetition, so derive both deterministically in pure
    shared array expressions — 8-token '.'-terminated body lines, plus
    a PLANTED header line on every doc_id % 3 == 0 doc and footer line
    on every % 5 == 0 doc (the repeated chrome the operators exist to
    find). The oracle replays the derivation on line STRINGS."""
    docs = _load(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
        lambda x: x != "",
    )
    body = F.transform(
        F.sequence(F.lit(0), ((F.size("_tk") - 1) / 8).cast("int")),
        lambda i: F.concat(
            F.array_join(F.slice(F.col("_tk"), i * 8 + 1, 8), " "),
            F.lit("."),
        ),
    )
    header = F.when(
        F.col("doc_id") % 3 == 0,
        F.array(F.lit("shared header banner.")),
    ).otherwise(F.array().cast("array<string>"))
    footer = F.when(
        F.col("doc_id") % 5 == 0,
        F.array(F.lit("shared footer notice.")),
    ).otherwise(F.array().cast("array<string>"))
    return (
        docs.filter(F.col("text").isNotNull())
        .select("doc_id", toks.alias("_tk"))
        .filter(F.size("_tk") > 0)
        .select(
            "doc_id",
            F.array_join(F.concat(header, body, footer), "\n")
            .alias("text"),
        )
    )


def q_dedup_lines(spark, sf_dir):
    """Corpus-wide line-level exact dedup (X132, the MassiveText/Dolma
    paragraph-dedup stage): first occurrence by (doc_id, line index)
    keeps the line, every later copy drops — the planted header/footer
    survive only in their lowest-id carrier. Oracle replays on line
    strings, so MATCH doubles as an xxhash64 collision check."""
    from mahout_spark.operators.curation import dedup_lines

    return dedup_lines(_planted_lines(spark, sf_dir))


def q_line_dedup_stats(spark, sf_dir):
    """The X132 one-row audit (docs / lines in / kept / dropped)."""
    from mahout_spark.operators.curation import (
        dedup_lines, line_dedup_stats)

    return line_dedup_stats(dedup_lines(_planted_lines(spark, sf_dir)))


def q_boilerplate_lines(spark, sf_dir):
    """The X133 boilerplate list: lines in >= 25 distinct docs (only
    the planted header/footer qualify — body lines are corpus text)."""
    from mahout_spark.operators.curation import boilerplate_lines

    return boilerplate_lines(_planted_lines(spark, sf_dir), min_df=25)


def q_remove_boilerplate(spark, sf_dir):
    """X133 removal: EVERY occurrence of a >= 25-df line drops (unlike
    X132 no copy survives); per-doc counts + cleaned text."""
    from mahout_spark.operators.curation import remove_boilerplate

    return remove_boilerplate(_planted_lines(spark, sf_dir), min_df=25)


def q_dsir_weights(spark, sf_dir):
    """DSIR importance weights (X134, Xie et al. 2023): log2 ratio of
    the target-slice (doc_id % 10 == 0) unigram LM to the whole-corpus
    LM, ordered-fold per doc — the data-selection signal."""
    from mahout_spark.operators.curation import dsir_weights

    return dsir_weights(_load(spark, sf_dir, "documents"))


def q_dsir_sample(spark, sf_dir):
    """X134 deterministic selection: top-50 docs by importance ratio
    (desc, id asc) — the RNG-free Gumbel-top-k stand-in."""
    from mahout_spark.operators.curation import dsir_sample

    return dsir_sample(_load(spark, sf_dir, "documents"), k=50)


def q_token_budget(spark, sf_dir):
    """Token-budget selection (X137): rank by the X10 quality score
    (desc, id asc), keep the prefix within 10,000 tokens (~37% of the
    sf0.01 corpus' 27k). The oracle replays quality, the ordered
    running total, and the prefix cut with one window."""
    from mahout_spark.operators.curation import token_budget_select

    return token_budget_select(
        _load(spark, sf_dir, "documents"), budget_tokens=10_000)


def q_domain_cap(spark, sf_dir):
    """Per-domain cap (X136, the RefinedWeb/FineWeb fix for a handful
    of giant domains dominating a crawl): keep at most 10 docs per
    source, selected by the seed-42 multiplicative permutation — exact
    via the skew-safe two-phase (salted per-partition top-cap, then a
    cap-bounded re-rank). The oracle replays the permutation and a
    single per-source rank."""
    from mahout_spark.operators.curation import domain_cap

    return domain_cap(
        _load(spark, sf_dir, "documents"), max_per_domain=10
    ).select("doc_id", "source")


def q_domain_cap_stats(spark, sf_dir):
    """The X136 per-domain audit (n_docs / n_kept / kept_frac)."""
    from mahout_spark.operators.curation import domain_cap_stats

    return domain_cap_stats(
        _load(spark, sf_dir, "documents"), max_per_domain=10)


def q_multi_match_search(spark, sf_dir):
    """multi_match best_fields / dis_max (X97, ES `multi_match` with
    `title^2` and tie_breaker 0.3): title field = the doc's first 5
    tokens (the fixture's derived short field — SQL-replayable), body =
    full text; per-field BM25 with FIELD-LOCAL stats (df/avgdl/docCount
    from that field's postings), dis_max combine, top 10."""
    from mahout_spark.operators.multimatch import (
        field_bm25_scores,
        multi_match_combine,
    )

    docs = _load(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
        lambda x: x != "",
    )
    title_docs = docs.select(
        "doc_id", F.array_join(F.slice(toks, 1, 5), " ").alias("text"))
    return multi_match_combine(
        {
            "title": field_bm25_scores(title_docs, BM25_QUERY_TERMS),
            "body": field_bm25_scores(docs, BM25_QUERY_TERMS),
        },
        boosts={"title": 2.0}, tie_breaker=0.3, k=10,
    )


def q_combined_fields(spark, sf_dir):
    """combined_fields / BM25F (X106, ES combined_fields): title (first
    5 tokens, weight 2) and body merge into ONE virtual field BEFORE
    saturation — tf' = Σ w_f·tf_f, dl' = Σ w_f·dl_f, df over the union
    — the principled fix for dis_max's weak-everywhere-beats-
    strong-somewhere failure. Same fixture fields as multi_match_search
    so the two ranking models are directly comparable."""
    from mahout_spark.operators.multimatch import combined_fields_topk

    docs = _load(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
        lambda x: x != "",
    )
    title_docs = docs.select(
        "doc_id", F.array_join(F.slice(toks, 1, 5), " ").alias("text"))
    return combined_fields_topk(
        {"title": title_docs, "body": docs}, BM25_QUERY_TERMS,
        weights={"title": 2.0}, k=10,
    )


def _geo_points(spark, sf_dir):
    """The geo fixture: deterministic lat/lon derived from event_id with
    exact integer modulo arithmetic (SQL-replayable bit-for-bit — the
    divisions are of exact integers by 100.0, one IEEE rounding each).
    Latitudes stay within ±85 so no fixture point sits on a pole."""
    ev = _load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        (((F.col("event_id") * 7919) % 17000) / 100.0 - 85.0).alias("lat"),
        (((F.col("event_id") * 104729) % 36000) / 100.0 - 180.0)
        .alias("lon"),
        "value",
    )


_GEO_POINTS_SQL = """
        SELECT event_id,
               ((event_id * 7919) % 17000) / 100.0 - 85.0 AS lat,
               ((event_id * 104729) % 36000) / 100.0 - 180.0 AS lon,
               value
        FROM events
"""


def q_geo_distance(spark, sf_dir):
    """geo_distance query + sort (X96, ES radius search): fixture points
    within 2000 km of Paris, nearest first (ties on event_id), haversine
    on the WGS84 mean radius rounded to 1 mm. The operator's bounding-box
    prefilter keeps the trig off cold rows; the oracle runs the raw
    haversine over everything — MATCH proves the box never clips a hit."""
    from mahout_spark.operators.geo import geo_distance_search

    return geo_distance_search(
        _geo_points(spark, sf_dir), 48.8566, 2.3522, 2000.0, k=50)


def q_geo_bounds(spark, sf_dir):
    """geo_bounds + geo_centroid (X153) over the fixture points inside
    a European-ish box — the tight bounding box corners (ES top-left /
    bottom-right convention) and the degree-space centroid, one row
    combined."""
    from mahout_spark.operators.geo import (
        geo_bounding_box, geo_bounds, geo_centroid)

    pts = geo_bounding_box(
        _geo_points(spark, sf_dir), 35.0, 60.0, -10.0, 30.0)
    return geo_bounds(pts).crossJoin(geo_centroid(pts))


def q_geo_grid(spark, sf_dir):
    """geohash_grid-style bucket agg (X96): fixture points on the 32x32
    linear lat/lon integer grid, count + sum(value) + geo_centroid per
    cell, densest 20 cells first (ties on cell key)."""
    from mahout_spark.operators.geo import geo_grid_agg

    return geo_grid_agg(
        _geo_points(spark, sf_dir), 32, value_col="value", top=20)


def q_engine_mmr_ann(spark, sf_dir):
    """MMR-diversified retrieval (X108): exact cosine top-50 candidate
    fetch (distributed), then the Carbonell-Goldstein greedy rerank at
    λ=0.6 — rows-only (the greedy selection is iterative, not
    SQL-expressible; parity vs a python recompute of the same trace is
    pytest-gated in tests/test_mmr.py)."""
    from mahout_spark.operators.similarity import mmr_rerank

    emb = _load(spark, sf_dir, "embeddings")
    qvec = [float(x)
            for x in emb.filter(F.col("vec_id") == 3).first()["embedding"]]
    return mmr_rerank(emb, qvec, k=10, fetch=50, lambda_=0.6)


def _contam_split(spark, sf_dir):
    """The decontamination fixture: eval set = every 97th doc by id, train
    = the rest (deterministic, SQL-replayable split of the one corpus)."""
    docs = _load(spark, sf_dir, "documents")
    return (docs.filter(F.col("doc_id") % 97 != 0),
            docs.filter(F.col("doc_id") % 97 == 0))


def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination (X85, the GPT-3 appendix-C standard):
    train docs sharing >= 1 distinct word 4-gram with the eval split —
    (doc_id, n_shared). n=4 rather than the conventional 13 because the
    synthetic 31-word corpus has no 13-gram overlap at all — same
    operator, denser check. The eval gram set is broadcast; the corpus
    is never shuffled. Oracle: the same n-gram set-intersection relation
    on gram STRINGS (the engine joins on xxhash64 — MATCH doubles as
    the collision-freedom check)."""
    from mahout_spark.operators.curation import contaminated_docs

    train, test = _contam_split(spark, sf_dir)
    return contaminated_docs(train, test, n=4)


def q_contamination_pairs(spark, sf_dir):
    """Contamination attribution (X85): which EVAL doc leaked into which
    train doc — (train_id, test_id, n_shared distinct 4-grams)."""
    from mahout_spark.operators.curation import contamination_pairs

    train, test = _contam_split(spark, sf_dir)
    return contamination_pairs(train, test, n=4)


def q_pack_sequences(spark, sf_dir):
    """Sequence packing (X86, concat-and-chunk): per-doc placement in the
    seed-42 shuffled 64-token-sequence packing — (doc_id, n_tokens,
    offset, seq_first, seq_last). The Spark side computes the prefix sum
    with the two-phase distributed form (no global window); the oracle
    is ONE SQL window cumsum over the same multiplicative-permutation
    key — MATCH proves the distributed decomposition exact."""
    from mahout_spark.operators.curation import pack_documents

    docs = _load(spark, sf_dir, "documents")
    return pack_documents(docs, seq_len=64, seed=42)


def q_packing_stats(spark, sf_dir):
    """Packing summary (X86): sequences produced, tail padding, and
    boundary-crossing docs for the seed-42 / 64-token packing — one row,
    one partial aggregation."""
    from mahout_spark.operators.curation import pack_documents, packing_stats

    docs = _load(spark, sf_dir, "documents")
    return packing_stats(pack_documents(docs, seq_len=64, seed=42), 64)


def q_engine_percentiles(spark, sf_dir):
    """Percentiles aggregation (X87, ES ``percentiles`` agg, exact
    regime): n_chars quantiles over the match set — linear
    interpolation, the SQL quantile_cont contract, so the DuckDB oracle
    is exact. The approx (Greenwald-Khanna) regime is test-gated."""
    from mahout_spark.index.aggs import facet_percentiles

    docs = _load(spark, sf_dir, "documents")
    cat = _shared_index(spark, sf_dir)
    result = facet_percentiles(
        spark, cat, docs, " OR ".join(BM25_QUERY_TERMS), "n_chars",
        (0.25, 0.5, 0.75, 0.95),
    )
    rows = result.collect()
    return spark.createDataFrame(rows, result.schema)


def q_engine_extended_stats(spark, sf_dir):
    """Extended stats aggregation (X91, ES ``extended_stats``): the
    seven moments of n_chars over the match set, derived from ES's own
    sum/sumOfSquares formulation so the SQL oracle's IEEE arithmetic is
    bit-identical."""
    from mahout_spark.index.aggs import extended_stats

    docs = _load(spark, sf_dir, "documents")
    cat = _shared_index(spark, sf_dir)
    result = extended_stats(
        spark, cat, docs, " OR ".join(BM25_QUERY_TERMS), "n_chars",
    )
    rows = result.collect()
    return spark.createDataFrame(rows, result.schema)


def q_engine_composite(spark, sf_dir):
    """Composite aggregation (X88, the ES ``composite`` agg): one
    mid-stream page of the (lang × 100-wide n_chars histogram) bucket
    space over a match set — strictly after the ("en", 100.0) cursor,
    key-ordered, 10 buckets. The cursor predicate and LIMIT cut after
    ONE partial-agg shuffle — page N costs page 1."""
    from mahout_spark.index.aggs import composite_agg

    docs = _load(spark, sf_dir, "documents")
    cat = _shared_index(spark, sf_dir)
    result = composite_agg(
        spark, cat, docs, "table OR scan OR data",
        ["lang", ("n_chars", 100.0)], size=10, after=("en", 100.0),
    )
    rows = result.collect()
    return spark.createDataFrame(rows, result.schema)


def q_engine_top_hits(spark, sf_dir):
    """Terms + top_hits aggregation (X89): the 3 most-populated lang
    buckets of the "table OR scan" match set, each with its top-3 BM25
    hits. Oracle: the full SQL relation — bucket counts, ROW_NUMBER per
    lang over the un-cut BM25 agg, both cuts."""
    from mahout_spark.index.aggs import top_hits_agg

    docs = _load(spark, sf_dir, "documents")
    cat = _shared_index(spark, sf_dir)
    result = top_hits_agg(
        spark, cat, docs, "table OR scan", "lang", n_buckets=3, size=3,
    )
    rows = result.collect()
    return spark.createDataFrame(rows, result.schema)


def q_engine_sorted_scan(spark, sf_dir):
    """Index-time sorting (X92, the Lucene/ES index-sorting model): the
    corpus written hive-partitioned by ordered n_chars buckets, then a
    top-20 sorted scan that reads ONLY the shortest bucket prefix
    covering 20 rows (partition-pruned; plan-gated in tests). Provably
    identical to the full ORDER BY — which is exactly the oracle."""
    import shutil
    import tempfile

    from mahout_spark.operators.sortedtable import (
        sorted_scan_topk,
        write_sorted_table,
    )

    docs = _load(spark, sf_dir, "documents")
    out = tempfile.mkdtemp(prefix="msdrv_srt_")
    try:
        path = out + "/bychars"
        write_sorted_table(docs, "n_chars", path, n_buckets=16)
        result = sorted_scan_topk(
            spark, path, k=20, cols=["doc_id", "n_chars"])
        rows = result.collect()
        return spark.createDataFrame(rows, result.schema)
    finally:
        shutil.rmtree(out, ignore_errors=True)


def q_engine_federated_search(spark, sf_dir):
    """Federated multi-index search (X59): the corpus split by doc_id
    parity into TWO independently-built indexes, queried through
    federated_topk under GLOBAL statistics (the dfs_query_then_fetch
    model). Because global stats make the federation score-identical to
    one union index, the oracle is the same full-corpus BM25 relation as
    engine_indexed_bm25_simple, plus the owning-index column recomputed
    from the parity split."""
    from mahout_spark.index.federated import federated_topk

    docs = _load(spark, sf_dir, "documents")
    cats = {
        name: _shared_index(spark, sf_dir, docs=docs.filter(pred), tag=name)
        for name, pred in (
            ("even", F.col("doc_id") % 2 == 0),
            ("odd", F.col("doc_id") % 2 == 1),
        )
    }
    result = federated_topk(
        spark, cats, BM25_QUERY_TERMS, k=10
    ).select(
        F.col("index").alias("src"), "doc_id",
        F.round("score", 6).alias("score"),
    )
    rows = result.collect()
    return spark.createDataFrame(rows, result.schema)


FED_BOOL_QUERY = "mer* OR data NOT stream"


def q_engine_federated_boolean(spark, sf_dir):
    """Federated boolean search (X67): the full query language across a
    parity-split two-index fleet — prefix expansion merged on GLOBAL df,
    kernels run under global stats, so the result is identical to the
    union index's boolean_topk. Oracle: the union-relation SQL set-op
    tree (expansion via LIKE over the global df table, honoring the
    parser's precedence: mer* OR (data AND NOT stream)) plus the
    parity owner column."""
    from mahout_spark.index.federated import federated_boolean_topk

    docs = _load(spark, sf_dir, "documents")
    cats = {
        name: _shared_index(spark, sf_dir, docs=docs.filter(pred), tag=name)
        for name, pred in (
            ("even", F.col("doc_id") % 2 == 0),
            ("odd", F.col("doc_id") % 2 == 1),
        )
    }
    result = federated_boolean_topk(
        spark, cats, FED_BOOL_QUERY, k=10
    ).select(
        F.col("index").alias("src"), "doc_id",
        F.round("score", 6).alias("score"),
    )
    rows = result.collect()
    return spark.createDataFrame(rows, result.schema)


def q_engine_index_stats(spark, sf_dir):
    """Index diagnostics (X69): the corpus-derivable summary columns
    (n_docs, n_terms, n_postings, avgdl) must agree with a from-scratch
    DuckDB recount of the token stream — an end-to-end consistency audit
    of meta + lexicon."""
    from mahout_spark.index.diag import index_stats

    cat = _shared_index(spark, sf_dir)
    result = index_stats(spark, cat).select(
        F.col("n_docs").cast("long").alias("n_docs"),
        "n_terms", "n_postings", "avgdl",
    )
    rows = result.collect()
    return spark.createDataFrame(rows, result.schema)


def q_engine_content_sha(spark, sf_dir):
    """The north-rule per-row invariant as an oracled relation: the
    standard BM25 top-10 joined to the index's STORED content sha256 —
    DuckDB recomputes the same ranking and hashes the source text
    itself, so a MATCH proves sha equality per result row against the
    source table (plus verify_content_integrity returns zero violations
    over the whole corpus, asserted here before returning)."""
    from mahout_spark.index.diag import verify_content_integrity
    from mahout_spark.index.wand import topk

    docs = _load(spark, sf_dir, "documents")
    cat = _shared_index(spark, sf_dir)
    violations = verify_content_integrity(spark, cat, docs).count()
    if violations:
        raise AssertionError(
            f"content integrity violated for {violations} docs"
        )
    stored = cat.read(spark, "docstats").select("doc_id", "content_sha")
    result = (
        topk(spark, cat, BM25_QUERY_TERMS, k=10)
        .join(F.broadcast(stored), "doc_id")
        .select("doc_id", F.round("score", 6).alias("score"),
                "content_sha")
    )
    rows = result.collect()
    return spark.createDataFrame(rows, result.schema)


def q_engine_percolate(spark, sf_dir):
    """Percolation (X68, ES percolator): the BATCH_QUERIES registry
    (AND, OR-with-NOT, prefix) matched against every document in one
    stateless JVM projection — (doc_id, query_id) per hit. Oracle: each
    stored query's match relation as SQL set ops, UNION ALLed under its
    query_id label."""
    from mahout_spark.index.percolate import percolate

    docs = _load(spark, sf_dir, "documents")
    return percolate(spark, BATCH_QUERIES, docs)


def q_engine_percolate_prefiltered(spark, sf_dir):
    """Prefiltered percolation (X73, the ES percolator's 10^5-registry
    tier): the same BATCH_QUERIES registry routed through the
    required-term candidate index + interpreted verify
    (percolate_prefiltered) — results are contract-identical to
    q_engine_percolate, so the SAME DuckDB oracle checks both (and the
    driver hash doubles as the cross-evaluator parity gate)."""
    from mahout_spark.index.percolate import percolate_prefiltered

    docs = _load(spark, sf_dir, "documents")
    return percolate_prefiltered(spark, BATCH_QUERIES, docs)


SUGGEST_WORD = "hat"


def q_engine_suggest(spark, sf_dir):
    """Spell suggestion (X57, Lucene DirectSpellChecker analog): the 5
    lexicon terms nearest SUGGEST_WORD by (edit distance asc, df desc,
    term asc), word itself excluded — 'hat' has 5 distance-2 neighbors
    in this vocabulary, so the cap and the df tie-breaks are exercised. The DuckDB oracle recomputes the
    ranking with its independent levenshtein over the token relation."""
    from mahout_spark.index.boolquery import suggest_terms

    cat = _shared_index(spark, sf_dir)
    rows = suggest_terms(spark, cat, SUGGEST_WORD, n=5, max_edits=2)
    return spark.createDataFrame(
        rows, "term string, dist long, df long"
    )


COLLAPSE_QUERY = "table OR scan"
COLLAPSE_N = 3


def q_engine_collapse_search(spark, sf_dir):
    """Result collapsing (X56, the ES collapse / Lucene grouping model):
    top COLLAPSE_N docs per `lang` over the FULL ranked match set of
    COLLAPSE_QUERY — built on score_matches (the no-cut ranked match
    set) + one PARTITIONED window, parallel by group. The DuckDB oracle
    recomputes the whole relation: un-cut BM25 agg joined to documents,
    ROW_NUMBER per lang."""
    from mahout_spark.index.boolquery import collapse_topk

    docs = _load(spark, sf_dir, "documents")
    cat = _shared_index(spark, sf_dir)
    result = collapse_topk(
        spark, cat, docs, COLLAPSE_QUERY, "lang", n=COLLAPSE_N,
    ).select(
        "lang", F.col("rank").cast("long").alias("rank"), "doc_id",
        F.round("score", 6).alias("score"),
    )
    rows = result.collect()
    return spark.createDataFrame(rows, result.schema)


SYN_QUERY = "join AND data"
SYNONYMS = {"join": ["merge"]}


def q_engine_synonym_search(spark, sf_dir):
    """Query-time synonyms with df-blending (X55, Lucene SynonymQuery):
    `join` expands to the (join OR merge) group — one clause — and BOTH
    members score with the group's MAX df, so the rarer synonym cannot
    out-rank its head. The DuckDB oracle recomputes the group-max df and
    the blended idf relationally."""
    from mahout_spark.index.boolquery import boolean_topk

    cat = _shared_index(spark, sf_dir)
    result = boolean_topk(
        spark, cat, SYN_QUERY, k=10, synonyms=SYNONYMS,
        synonym_blend=True,
    ).select("doc_id", F.round("score", 6).alias("score"))
    rows = result.collect()
    return spark.createDataFrame(rows, result.schema)


EXPLAIN_QUERY = "table AND data"


def q_engine_explain(spark, sf_dir):
    """Score explanation (X54, Lucene Explanation analog): one row per
    (top-k doc, present positive term) with tf, doclen, raw idf, boost
    weight, and the term's BM25 contribution; `score` repeats the doc
    total. The DuckDB oracle reproduces the whole relation — contrib
    table joined to the top-k cut — so the breakdown itself is
    hash-checked, not just the ranking."""
    from mahout_spark.index.boolquery import explain_topk

    cat = _shared_index(spark, sf_dir)
    result = explain_topk(spark, cat, EXPLAIN_QUERY, k=10).select(
        "doc_id",
        F.round("score", 6).alias("score"),
        "term", "tf", "doclen",
        F.round("idf", 6).alias("idf"),
        F.round("weight", 6).alias("weight"),
        F.round("contrib", 6).alias("contrib"),
    )
    rows = result.collect()
    return spark.createDataFrame(rows, result.schema)


WILDCARD_QUERY = "*e AND ?a??"


def q_engine_wildcard_search(spark, sf_dir):
    """General-wildcard retrieval (X53, Lucene * / ? syntax anywhere in
    the word): each pattern expands against the lexicon (df desc, term
    asc, capped) and OR-scores as plain BM25; the AND intersects the two
    expansion groups' match sets. The DuckDB oracle recomputes both
    expansions with regexp_matches over the SAME anchored regex
    translation (exhaustive under the cap on this vocabulary) and the
    same BM25 sum."""
    from mahout_spark.index.boolquery import boolean_topk

    cat = _shared_index(spark, sf_dir)
    result = boolean_topk(spark, cat, WILDCARD_QUERY, k=10).select(
        "doc_id", F.round("score", 6).alias("score")
    )
    rows = result.collect()
    return spark.createDataFrame(rows, result.schema)


REGEXP_QUERY = "/m[aeiou]rge|str[aeiou]am/ AND /qu[a-z]+/"


def q_engine_regexp_search(spark, sf_dir):
    """Regexp retrieval (X62, Lucene RegexpQuery /pattern/ syntax):
    each pattern expands against the lexicon via the anchored JVM rlike
    (df desc, term asc, capped) and OR-scores as plain BM25; the AND
    intersects the two expansion groups' match sets. The DuckDB oracle
    recomputes both expansions with regexp_matches over the same
    anchored pattern (Java-and-RE2 common subset; exhaustive under the
    cap on this vocabulary) and the same BM25 sum."""
    from mahout_spark.index.boolquery import boolean_topk

    cat = _shared_index(spark, sf_dir)
    result = boolean_topk(spark, cat, REGEXP_QUERY, k=10).select(
        "doc_id", F.round("score", 6).alias("score")
    )
    rows = result.collect()
    return spark.createDataFrame(rows, result.schema)


def q_engine_wildcard_permuterm(spark, sf_dir):
    """Permuterm-tier wildcard retrieval (X71): the SAME wildcard query
    as engine_wildcard_search, served through the rotation-prefix
    dictionary (build_permuterm) for its single-star leaf — a MATCH
    against the same oracle proves the tier is a pure physical
    optimization (identical expansions, identical ranking)."""
    from mahout_spark.index.boolquery import boolean_topk
    from mahout_spark.index.permuterm import build_permuterm

    cat = _shared_index(spark, sf_dir)
    if not cat.read_meta("postings").get("permuterm"):
        build_permuterm(spark, cat)
    result = boolean_topk(spark, cat, WILDCARD_QUERY, k=10).select(
        "doc_id", F.round("score", 6).alias("score")
    )
    rows = result.collect()
    return spark.createDataFrame(rows, result.schema)


GRAM_FUZZY_QUERY = "vektor~2 AND data"


def q_engine_fuzzy_gramtier(spark, sf_dir):
    """Gram-tier fuzzy retrieval (X72): ``vektor~2`` (stem length 6 —
    inside the tier's soundness domain) expands through the bigram
    count-filter table instead of the vocabulary scan; a MATCH against
    the independent DuckDB levenshtein relation proves the tier is a
    pure physical optimization."""
    from mahout_spark.index.boolquery import boolean_topk
    from mahout_spark.index.gramindex import build_gramindex

    cat = _shared_index(spark, sf_dir)
    if not cat.read_meta("postings").get("gramindex"):
        build_gramindex(spark, cat)
    result = boolean_topk(spark, cat, GRAM_FUZZY_QUERY, k=10).select(
        "doc_id", F.round("score", 6).alias("score")
    )
    rows = result.collect()
    return spark.createDataFrame(rows, result.schema)


MSM_QUERY = "table OR scan OR merge OR data"
MSM_M = 2


def q_engine_msm_search(spark, sf_dir):
    """minimum_should_match retrieval (X52, the Lucene/ES BooleanQuery
    mm semantics): docs matching at least MSM_M of MSM_QUERY's clauses,
    BM25-scored over the present positive terms like every boolean
    query. The DuckDB oracle counts distinct matching clause terms per
    doc with GROUP BY/HAVING — relational mm — and recomputes the same
    BM25 sum."""
    from mahout_spark.index.boolquery import boolean_topk

    cat = _shared_index(spark, sf_dir)
    result = boolean_topk(
        spark, cat, MSM_QUERY, k=10, minimum_should_match=MSM_M
    ).select("doc_id", F.round("score", 6).alias("score"))
    rows = result.collect()
    return spark.createDataFrame(rows, result.schema)


AFTER_QUERY = "table OR scan"


def q_engine_search_after(spark, sf_dir):
    """Cursor pagination (X51, the search_after model): page 1's last
    row (FULL-precision score + doc_id) becomes the cursor; page 2
    returns the rows strictly after it in (score desc, doc_id asc)
    order. Deterministic kernels recompute bit-identical scores, so the
    cursor's float equality is exact, and the per-shard after-filter
    runs before the top-k cut (page N costs page 1 — no offset
    materialization). The DuckDB oracle checks page 2 IS ranks 11-20 of
    the deep ranking (LIMIT/OFFSET over the same relation)."""
    from mahout_spark.index.boolquery import boolean_topk

    cat = _shared_index(spark, sf_dir)
    page1 = boolean_topk(spark, cat, AFTER_QUERY, k=10).collect()
    cursor = (page1[-1]["score"], page1[-1]["doc_id"])
    result = boolean_topk(
        spark, cat, AFTER_QUERY, k=10, after=cursor
    ).select("doc_id", F.round("score", 6).alias("score"))
    rows = result.collect()
    return spark.createDataFrame(rows, result.schema)


MLT_DOC_ID = 42
MLT_MAX_TERMS = 5


def q_engine_mlt_search(spark, sf_dir):
    """More-like-this retrieval (X48, index/mlt.py): the top
    MLT_MAX_TERMS tf-idf terms of document MLT_DOC_ID (engine formula
    sqrt(tf)*(1+ln(N/(df+1))), score desc / term asc — deterministic)
    run as a BM25 OR query through the WAND kernel, the source doc
    excluded from its own neighborhood. The DuckDB oracle recomputes
    term selection AND retrieval relationally from the token stream —
    both MLT stages are hash-checked end-to-end."""
    from mahout_spark.index.mlt import more_like_doc

    docs = _load(spark, sf_dir, "documents")
    cat = _shared_index(spark, sf_dir)
    result = more_like_doc(
        spark, cat, docs, MLT_DOC_ID, content_col="text", k=10,
        max_query_terms=MLT_MAX_TERMS,
    ).select("doc_id", F.round("score", 6).alias("score"))
    rows = result.collect()
    return spark.createDataFrame(rows, result.schema)


def q_engine_facet_search(spark, sf_dir):
    """Facet aggregation over the FULL boolean match set (X45,
    boolquery.matching_docs + facet_counts): BOOL_QUERY's match set
    stays a distributed DataFrame, the corpus table is semi-joined on
    it, and counts roll up per (lang, source) — the standard search-
    engine facet plan (Lucene facets over a filter), here expressed as
    one shuffle join + one partial-aggregated count. The DuckDB oracle
    recomputes the same boolean tree with SQL set ops and groups the
    matching documents directly."""
    from mahout_spark.index.boolquery import facet_counts

    docs = _load(spark, sf_dir, "documents")
    cat = _shared_index(spark, sf_dir, positions=True)
    result = (
        facet_counts(spark, cat, docs, BOOL_QUERY, ["lang", "source"])
        .orderBy("lang", "source")
    )
    rows = result.collect()
    return spark.createDataFrame(rows, result.schema)


FIELD_QUERY = "lang:es table scan"


def q_engine_field_search(spark, sf_dir):
    """Fielded search (X46, Lucene `field:value` syntax): the parser
    compiles `lang:es` to the synthetic tag term the indexer posts per
    document (`lang:<lower(lang_col)>`, tf=1, excluded from doclen), so
    the query is an AND of the tag with the text terms and the tag
    SCORES like any BM25 leaf. The DuckDB oracle recomputes the tag's
    contribution from first principles: df(tag) = count of indexed docs
    with that lang, tf=1, the doc's text-token doclen — fully
    independent of the posting machinery."""
    from mahout_spark.index.boolquery import boolean_topk

    cat = _shared_index(spark, sf_dir, lang_col="lang")
    result = boolean_topk(spark, cat, FIELD_QUERY, k=10).select(
        "doc_id", F.round("score", 6).alias("score")
    )
    rows = result.collect()
    return spark.createDataFrame(rows, result.schema)


def q_engine_proximity_search(spark, sf_dir):
    """Unordered within-window retrieval (NEAR/W, X39) over the positional
    index: docs where PROX_TERMS co-occur within PROX_WINDOW + 1
    consecutive token positions, scored by the BM25 sum of the terms
    (index/phrase.py proximity kernel: AND intersection -> composite
    occurrence keys -> one searchsorted window probe per term per anchor).
    The DuckDB oracle joins per-term 0-based token positions
    (generate_subscripts) on |p1 - p2| <= window — exact for the two
    distinct query terms — fully independent of the kernel's key
    arithmetic."""
    from mahout_spark.index.phrase import proximity_topk

    cat = _shared_index(spark, sf_dir, positions=True)
    result = proximity_topk(
        spark, cat, PROX_TERMS, PROX_WINDOW, k=10
    ).select("doc_id", F.round("score", 6).alias("score"))
    rows = result.collect()
    return spark.createDataFrame(rows, result.schema)


def q_phrase_snippets(spark, sf_dir):
    """Snippet extraction (X40): for every doc containing PHRASE_QUERY as
    a contiguous token sequence, the first occurrence's 0-based token
    index and a ±SNIPPET_CONTEXT-token window — the engine analog of the
    reference's snippet report (MahoutTermFinderMwkSnpt*.java renders
    matched docs as the matching region). Pure JVM expressions, one
    narrow scan (operators/snippets.py)."""
    from mahout_spark.operators.snippets import phrase_snippets

    docs = _load(spark, sf_dir, "documents")
    return phrase_snippets(
        docs, PHRASE_QUERY, content_col="text", context=SNIPPET_CONTEXT
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# training-data pipeline operators (textstats / dedup / similarity /
# multimodal) — SURVEY.md §2 extension set
# ---------------------------------------------------------------------------

EMB_NEARDUP_THRESHOLD = 0.4
JACCARD_K, JACCARD_THRESHOLD, JACCARD_RARE_DF = 3, 0.5, 10


def q_token_stats(spark, sf_dir):
    """Token accounting: word/distinct/BPE-estimate counts per doc."""
    from mahout_spark.operators.textstats import token_counts

    return token_counts(_load(spark, sf_dir, "documents"))


def q_quality_scores(spark, sf_dir):
    """Gopher-style per-doc quality heuristics + combined score."""
    from mahout_spark.operators.textstats import quality_scores

    return quality_scores(_load(spark, sf_dir, "documents"))


def q_lang_id(spark, sf_dir):
    """Marker-profile language ID with deterministic argmax."""
    from mahout_spark.operators.textstats import lang_id

    return lang_id(_load(spark, sf_dir, "documents"))


def q_fingerprint(spark, sf_dir):
    """Positional document fingerprint (order-sensitive 64-bit checksum)."""
    from mahout_spark.operators.textstats import fingerprints

    return fingerprints(_load(spark, sf_dir, "documents"))


def _localize(spark, df, cleanup):
    """Materialize ``df``, release the operator's checkpoint blocks, and
    return the rows as a local DataFrame (same schema/values). Keeps
    bench/driver sessions at baseline block-manager storage after every
    dedup query instead of waiting for GC + ContextCleaner."""
    from mahout_spark.checkpoint import release

    rows = df.collect()
    release(cleanup)
    return spark.createDataFrame(rows, df.schema)


def q_jaccard_neardup(spark, sf_dir):
    """Near-dup pairs: exact Jaccard over word 3-shingles with rare-shingle
    candidate blocking."""
    from mahout_spark.operators.dedup import jaccard_neardup_pairs

    cleanup = []
    return _localize(spark, jaccard_neardup_pairs(
        _load(spark, sf_dir, "documents"),
        k=JACCARD_K, threshold=JACCARD_THRESHOLD, rare_df_max=JACCARD_RARE_DF,
        cleanup=cleanup,
    ), cleanup)


def q_embedding_neardup(spark, sf_dir):
    """Exact cosine near-dup pairs over the embeddings table."""
    from mahout_spark.operators.dedup import embedding_neardup_pairs

    return embedding_neardup_pairs(
        _load(spark, sf_dir, "embeddings"), threshold=EMB_NEARDUP_THRESHOLD
    )


def q_engine_significant_text(spark, sf_dir):
    """significant_text (X150, the ES API whose point is
    filter_duplicate_text): the corpus is the train split PLUS planted
    exact duplicates (every % 89 == 0 doc copied at +1,000,000 — the
    X131 fixture shape), indexed as its own tagged shared build. The
    duplicates inflate every fg_df in plain significant_terms; the
    dedup-to-canonical foreground must report the UN-inflated counts —
    the oracle replays dedup + JLH relationally."""
    from mahout_spark.index.aggs import significant_text

    docs = _load(spark, sf_dir, "documents").select("doc_id", "text")
    train = docs.filter(F.col("doc_id") % 97 != 0)
    planted = train.filter(F.col("doc_id") % 89 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text")
    cat = _shared_index(
        spark, sf_dir, docs=train.unionAll(planted), tag="dup")
    cleanup: list = []
    result = significant_text(
        spark, cat, "table AND data", n=10, cleanup=cleanup)
    return _localize(spark, result, cleanup)


def q_engine_significant_terms(spark, sf_dir):
    """Significant-terms aggregation (X65, ES significant_terms / JLH):
    terms over-represented in the 'table AND data' match set vs the
    corpus. Oracle recomputes foreground df from the match set, background
    df from the token stream, and the same JLH formula."""
    from mahout_spark.index.aggs import significant_terms

    cat = _shared_index(spark, sf_dir)
    cleanup: list = []
    result = significant_terms(
        spark, cat, "table AND data", n=10, cleanup=cleanup
    )
    return _localize(spark, result, cleanup)


def q_engine_alias_search(spark, sf_dir):
    """Alias cutover (X109, the ES alias / zero-downtime reindex
    model): alias → half-corpus index, rebuild the full corpus
    offline, ONE atomic repoint, then search THROUGH the alias. The
    oracle is the full-corpus BM25 relation — MATCH proves resolution
    follows the swap, not the original target."""
    import shutil
    import tempfile

    from mahout_spark.index.alias import AliasRegistry
    from mahout_spark.index.wand import topk

    docs = _load(spark, sf_dir, "documents")
    out = tempfile.mkdtemp(prefix="msdrv_alias_")
    try:
        half = _shared_index(
            spark, sf_dir, docs=docs.filter(F.col("doc_id") % 2 == 0),
            tag="even",
        )
        reg = AliasRegistry(os.path.join(out, "reg"))
        reg.set_alias("docs", half.root)
        full = _shared_index(spark, sf_dir)
        reg.set_alias("docs", full.root)  # the atomic cutover
        result = topk(
            spark, reg.resolve("docs"), BM25_QUERY_TERMS, k=10
        ).select("doc_id", F.round("score", 6).alias("score"))
        return spark.createDataFrame(result.collect(), result.schema)
    finally:
        shutil.rmtree(out, ignore_errors=True)


def q_engine_disk_usage(spark, sf_dir):
    """_disk_usage API (X120): per-table file/byte/row accounting of the
    index — rows-only (sizes are filesystem facts, not SQL-derivable;
    row-count/byte agreement is pytest-gated against real scans + an
    os.walk). The dictionary tiers are ensured FIRST (meta-gated, no-op
    when present) so the reported table set is the full 6-table catalog
    regardless of which contract queries ran earlier in the process —
    the shared-index refactor made table presence order-dependent
    otherwise."""
    from mahout_spark.index.diag import disk_usage
    from mahout_spark.index.gramindex import build_gramindex
    from mahout_spark.index.permuterm import build_permuterm

    cat = _shared_index(spark, sf_dir)
    meta = cat.read_meta("postings")
    if not meta.get("permuterm"):
        build_permuterm(spark, cat)
    if not meta.get("gramindex"):
        build_gramindex(spark, cat)
    result = disk_usage(spark, cat)
    return spark.createDataFrame(result.collect(), result.schema)


def q_engine_search_template(spark, sf_dir):
    """Search template (X119, the ES mustache model): the standard
    boolean query rendered from '("{{p}}" OR {{a}}) AND {{m}} NOT
    {{x}}' with injection-guarded parameter substitution, then run
    exactly like engine_boolean_search — MATCH against the literal
    query's oracle proves rendering is semantics-preserving."""
    from mahout_spark.index.boolquery import boolean_topk
    from mahout_spark.index.queryparse import render_template

    cat = _shared_index(spark, sf_dir, positions=True)
    rendered = render_template(
        '("{{p}}" OR {{a}}) AND {{m}} NOT {{x}}',
        dict(p="table scan", a="merge", m="data", x="stream"))
    result = boolean_topk(spark, cat, rendered, k=10).select(
        "doc_id", F.round("score", 6).alias("score"))
    return spark.createDataFrame(result.collect(), result.schema)


def q_engine_highlight(spark, sf_dir):
    """ES ``highlight`` over ANY boolean query (X121, round-4 VERDICT
    ask #6 — phrase_snippets covered phrase queries only): BOOL_QUERY's
    match set from the positional index kernel, each matching doc
    rendered as the ±3-token window around the FIRST occurrence of any
    positive leaf term with matched tokens wrapped in <em> tags. The
    DuckDB oracle recomputes the match relation with SQL set ops (LIKE
    on the token stream for the phrase leaf) and rebuilds the identical
    fragment with list_position / inclusive list slicing /
    list_transform — a fully independent relation, so window arithmetic,
    tag wrapping, and match semantics are all hash-checked."""
    from mahout_spark.index.boolquery import highlight

    docs = _load(spark, sf_dir, "documents")
    cat = _shared_index(spark, sf_dir, positions=True)
    result = highlight(spark, cat, docs, BOOL_QUERY, context=3)
    rows = result.collect()
    return spark.createDataFrame(rows, result.schema)


LTR_QUERIES = {
    "q0": BM25_QUERY_TERMS,
    "q1": ["table", "scan", "merge"],
}
LTR_K = 20


LTR_WEIGHTS = {"bm25": 1.0, "dl_ratio": -0.5, "idf_sum": 0.2,
               "tf_max": 0.05}


def q_engine_ltr_rescore(spark, sf_dir):
    """Linear LTR model application (X141, the ES sltr rescorer): the
    X126 features for the top-20 BM25 candidates, scored as
    0.1 + Σ w·feature in weight-NAME-sorted fold order (the model file
    is data — the score replays from the feature relation), re-ranked
    to the top 10 per query. The oracle rebuilds features AND the model
    arithmetic relationally."""
    from mahout_spark.index.ltr import ltr_rescore

    cat = _shared_index(spark, sf_dir)
    result = ltr_rescore(
        spark, cat, LTR_QUERIES, LTR_WEIGHTS, k=10, fetch=LTR_K,
        intercept=0.1,
    )
    rows = result.collect()
    return spark.createDataFrame(rows, result.schema)


def q_engine_ltr_features(spark, sf_dir):
    """LTR feature extraction (X126, the ES learning-to-rank plugin's
    featureset model): per (query, top-20 candidate) the model-ready
    features — BM25, matched terms, tf sums, idf mass, length signals —
    computed from INDEX statistics in one batch plan (shared-decode
    topk_batch candidates, bucket-pruned tf read semi-joined to the
    candidate set). The DuckDB oracle recomputes every feature from the
    raw token stream: a MATCH pins candidate selection, rank order, and
    each feature's arithmetic."""
    from mahout_spark.index.ltr import ltr_features

    cat = _shared_index(spark, sf_dir)
    result = ltr_features(spark, cat, LTR_QUERIES, k=LTR_K)
    rows = result.collect()
    return spark.createDataFrame(rows, result.schema)


SPAN_N = 8


def q_dedup_spans(spark, sf_dir):
    """Exact-substring duplicated spans (X125 — Lee et al.'s ExactSubstr
    dedup re-expressed relationally): maximal runs of verbatim-repeated
    SPAN_N-token windows across the corpus, canonical (first) occurrence
    exempt. The Spark side shuffles xxhash64 shingle keys; the DuckDB
    oracle compares EXACT shingle strings and rebuilds the same
    gaps-and-islands merge with window functions — so a MATCH also
    certifies zero hash collisions at this scale."""
    from mahout_spark.operators.dedup import duplicated_spans

    docs = _load(spark, sf_dir, "documents")
    return duplicated_spans(docs, n=SPAN_N)


def q_engine_rank_eval(spark, sf_dir):
    """_rank_eval API (X124): the standard WAND top-10 evaluated against
    graded judgments derived relationally from the corpus (grade = how
    many of the query's terms a doc contains, 1-3) — precision@10,
    recall@10, MRR, NDCG@10 in one relational plan. Ranks recompute on
    the 6-dp-rounded score (doc_id tiebreak) on BOTH sides so the DCG
    position arithmetic is bit-comparable; the DuckDB oracle rebuilds
    every metric from the independent BM25 relation with window
    functions."""
    from mahout_spark.index.wand import topk
    from mahout_spark.operators.rankeval import rank_eval

    cat = _shared_index(spark, sf_dir)
    w = Window.orderBy(
        F.round("score", 6).desc(), F.col("doc_id").asc()
    )
    res = (
        topk(spark, cat, BM25_QUERY_TERMS, k=10)
        .withColumn("rank", F.row_number().over(w))
        .select(F.lit("q0").alias("query_id"), "doc_id", "rank")
    )
    tf = _simple_tf(spark, sf_dir)
    jud = (
        tf.filter(F.col("term").isin(BM25_QUERY_TERMS))
        .groupBy("doc_id")
        .agg(F.countDistinct("term").alias("grade"))
        .select(F.lit("q0").alias("query_id"), "doc_id", "grade")
    )
    result = rank_eval(res, jud, k=10)
    rows = result.collect()
    return spark.createDataFrame(rows, result.schema)


def q_engine_delete_by_query(spark, sf_dir):
    """_delete_by_query (X118, the ES API): tombstone every 'stream'
    matcher — the match kernel's id relation flows straight into the
    tombstone append, never visiting the driver — then run the standard
    BM25 query. Same Lucene visibility contract as engine_delete_search:
    matchers vanish, stats stay pre-delete until compaction."""
    import shutil

    from mahout_spark.index.delete import delete_by_query
    from mahout_spark.index.wand import topk

    cat, out = _cloned_index(spark, sf_dir)
    try:
        delete_by_query(spark, cat, "stream")
        result = topk(spark, cat, BM25_QUERY_TERMS, k=10).select(
            "doc_id", F.round("score", 6).alias("score"))
        return spark.createDataFrame(result.collect(), result.schema)
    finally:
        shutil.rmtree(out, ignore_errors=True)


def q_engine_snapshot_restore(spark, sf_dir):
    """Snapshot/restore (X105, the ES _snapshot filesystem repository):
    build → snapshot → DESTRUCTIVELY delete docs from the live index →
    restore → run the standard WAND query on the RESTORED catalog. The
    oracle is the plain undeleted BM25 relation — MATCH proves the
    restore is lossless and isolated from post-snapshot mutation."""
    import shutil

    from mahout_spark.index.delete import delete_docs
    from mahout_spark.index.snapshot import restore_index, snapshot_index
    from mahout_spark.index.wand import topk

    cat, out = _cloned_index(spark, sf_dir)
    try:
        snapshot_index(cat, os.path.join(out, "repo"), "s1")
        live = topk(spark, cat, BM25_QUERY_TERMS, k=3).collect()
        delete_docs(spark, cat, [r["doc_id"] for r in live])
        restored = restore_index(
            os.path.join(out, "repo"), "s1", os.path.join(out, "rst"))
        result = topk(spark, restored, BM25_QUERY_TERMS, k=10).select(
            "doc_id", F.round("score", 6).alias("score"))
        return spark.createDataFrame(result.collect(), result.schema)
    finally:
        shutil.rmtree(out, ignore_errors=True)


def q_engine_span_first(spark, sf_dir):
    """span_first query (X102, Lucene/ES span_first): docs where the
    PHRASE_QUERY span occurs ENTIRELY within the first 12 token
    positions (span end start+L <= 12), BM25-scored like phrase search.
    The oracle phrase-matches the space-joined prefix of the normalized
    token stream — fully independent of the composite-key kernel."""
    from mahout_spark.index.phrase import span_first_topk

    cat = _shared_index(spark, sf_dir, positions=True)
    result = span_first_topk(
        spark, cat, PHRASE_QUERY, end=12, k=10
    ).select("doc_id", F.round("score", 6).alias("score"))
    return spark.createDataFrame(result.collect(), result.schema)


def q_engine_terms_enum(spark, sf_dir):
    """terms_enum API (X111, ES _terms_enum): index terms with prefix
    's' in term order with doc frequencies — one filtered lexicon scan
    (vocabulary-sized, never postings)."""
    from mahout_spark.index.aggs import terms_enum

    cat = _shared_index(spark, sf_dir)
    result = terms_enum(spark, cat, "s", n=10)
    return spark.createDataFrame(result.collect(), result.schema)


def q_engine_top_metrics(spark, sf_dir):
    """top_metrics agg (X112, ES top_metrics): lang/source at the 5
    largest n_chars of the 'data' match set (ties on doc_id)."""
    from mahout_spark.index.aggs import top_metrics_agg

    docs = _load(spark, sf_dir, "documents")
    cat = _shared_index(spark, sf_dir)
    result = top_metrics_agg(
        spark, cat, docs, "data", "n_chars", ["lang", "source"],
        size=5,
    )
    return spark.createDataFrame(result.collect(), result.schema)


def q_engine_t_test(spark, sf_dir):
    """Welch t_test agg (X114, ES t_test heteroscedastic): is n_chars
    different between the 'table' and 'stream' match sets? Moments-
    derived sample variances (exact for the integer column), the same
    expression tree in the oracle."""
    from mahout_spark.index.aggs import t_test_agg

    docs = _load(spark, sf_dir, "documents")
    cat = _shared_index(spark, sf_dir)
    result = t_test_agg(
        spark, cat, docs, "table", "stream", "n_chars")
    return spark.createDataFrame(result.collect(), result.schema)


def q_engine_matrix_stats(spark, sf_dir):
    """matrix_stats agg (X115, ES matrix_stats): population variances /
    covariance / Pearson correlation between n_chars and the derived
    token count over the 'data' match set — exact moment arithmetic."""
    from mahout_spark.index.aggs import matrix_stats_agg

    docs = _load(spark, sf_dir, "documents")
    cat = _shared_index(spark, sf_dir)
    wdocs = docs.withColumn(
        "n_toks",
        F.size(F.filter(F.split(F.lower("text"), "[^a-z0-9]+"),
                        lambda t: t != "")))
    result = matrix_stats_agg(
        spark, cat, wdocs, "data", "n_chars", "n_toks")
    return spark.createDataFrame(result.collect(), result.schema)


def q_engine_multi_terms(spark, sf_dir):
    """multi_terms agg (X116, ES multi_terms): (lang, source) compound
    buckets over the 'data' match set, most-populated first with the
    key-tuple tie pin, sum(n_chars) attached."""
    from mahout_spark.index.aggs import multi_terms_agg

    docs = _load(spark, sf_dir, "documents")
    cat = _shared_index(spark, sf_dir)
    result = multi_terms_agg(
        spark, cat, docs, "data", ["lang", "source"], n=10,
        value_col="n_chars")
    return spark.createDataFrame(result.collect(), result.schema)


def q_engine_rare_terms(spark, sf_dir):
    """rare_terms aggregation (X99, ES rare_terms): the 10 RAREST terms
    of the 'table OR data' match set by foreground doc count (fg_df asc,
    term asc) — the long-tail complement of the terms agg, exact where
    ES approximates with a CuckooFilter."""
    from mahout_spark.index.aggs import rare_terms

    cat = _shared_index(spark, sf_dir)
    cleanup: list = []
    result = rare_terms(
        spark, cat, "table OR data", n=10, cleanup=cleanup)
    return _localize(spark, result, cleanup)


def q_engine_filters_agg(spark, sf_dir):
    """filters aggregation (X99, ES filters): named buckets with match
    counts, INCLUDING the zero bucket for a never-matching term."""
    from mahout_spark.index.aggs import filters_agg

    cat = _shared_index(spark, sf_dir)
    cleanup: list = []
    result = filters_agg(
        spark, cat,
        {"has_data": "data", "has_table": "table",
         "both": "data AND table", "never": "zzzznotaword"},
        cleanup=cleanup,
    )
    return _localize(spark, result, cleanup)


def q_engine_adjacency(spark, sf_dir):
    """adjacency_matrix aggregation (X99, ES adjacency_matrix): doc
    counts for each filter and each filter pair intersection (a&b keys),
    zero intersections omitted."""
    from mahout_spark.index.aggs import adjacency_matrix

    cat = _shared_index(spark, sf_dir)
    cleanup: list = []
    result = adjacency_matrix(
        spark, cat, {"d": "data", "q": "query", "t": "table"},
        cleanup=cleanup,
    )
    return _localize(spark, result, cleanup)


def q_engine_range_agg(spark, sf_dir):
    """range aggregation (X101, ES range): named n_chars buckets over
    the 'table OR data' match set — from-inclusive/to-exclusive,
    OVERLAPPING ranges allowed (each is an independent conditional
    aggregate in one pass), empty buckets included with NULL metrics."""
    from mahout_spark.index.aggs import range_agg

    docs = _load(spark, sf_dir, "documents")
    cat = _shared_index(spark, sf_dir)
    result = range_agg(
        spark, cat, docs, "table OR data", "n_chars",
        [("a_small", None, 500.0), ("b_mid", 400.0, 900.0),
         ("c_large", 900.0, None)],
    )
    return spark.createDataFrame(result.collect(), result.schema)


def q_engine_weighted_avg(spark, sf_dir):
    """weighted_avg aggregation (X101, ES weighted_avg): n_chars
    weighted by (doc_id % 7 + 1) over the 'data' match set."""
    from mahout_spark.index.aggs import weighted_avg

    docs = _load(spark, sf_dir, "documents")
    cat = _shared_index(spark, sf_dir)
    wdocs = docs.withColumn("w", (F.col("doc_id") % 7 + 1))
    result = weighted_avg(spark, cat, wdocs, "data", "n_chars", "w")
    return spark.createDataFrame(result.collect(), result.schema)


def q_engine_facet_histogram(spark, sf_dir):
    """Numeric histogram facet (X66, ES histogram agg): n_chars in
    width-200 buckets over the 'table OR data' match set. Oracle:
    the same bucket arithmetic over the SQL match set."""
    from mahout_spark.index.aggs import facet_histogram

    docs = _load(spark, sf_dir, "documents")
    cat = _shared_index(spark, sf_dir)
    result = facet_histogram(
        spark, cat, docs, "table OR data", "n_chars", 200
    )
    rows = result.collect()
    return spark.createDataFrame(rows, result.schema)


RESCORE_WINDOW = 50
RESCORE_W = 0.5
RRF_DEPTH = 50
RRF_K = 60


def q_engine_rescore_search(spark, sf_dir):
    """Two-phase rescoring (X63, the ES rescore model): BM25 top-window
    re-ranked by query_weight*bm25 + rescore_weight*cosine(vec_id=0
    query vector). Oracle recomputes the UNROUNDED BM25 window relation,
    DuckDB's own list-op cosine (rounded to 6, as the engine rounds),
    and the same linear combination."""
    from mahout_spark.index.hybrid import rescore_topk

    emb = _load(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in
            emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    cat = _shared_index(spark, sf_dir)
    result = rescore_topk(
        spark, cat, " OR ".join(BM25_QUERY_TERMS), emb, qvec,
        k=10, window=RESCORE_WINDOW,
        query_weight=1.0, rescore_weight=RESCORE_W,
    ).select(
        "doc_id", "score",
        F.round("bm25", 6).alias("bm25"), "cosine",
    )
    rows = result.collect()
    return spark.createDataFrame(rows, result.schema)


def q_engine_hybrid_search(spark, sf_dir):
    """Reciprocal-rank fusion (X64): BM25 top-depth fused with cosine
    top-depth via sum(1/(rrf_k+rank)). Oracle recomputes both rankings
    independently (ROW_NUMBER over the unrounded BM25 relation and the
    rounded cosine relation) and the same RRF sum over a FULL OUTER
    join."""
    from mahout_spark.index.hybrid import hybrid_topk

    emb = _load(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in
            emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    cat = _shared_index(spark, sf_dir)
    result = hybrid_topk(
        spark, cat, " OR ".join(BM25_QUERY_TERMS), emb, qvec,
        k=10, depth=RRF_DEPTH, rrf_k=RRF_K,
    ).select(
        "doc_id", "score",
        F.col("lex_rank").cast("long").alias("lex_rank"),
        F.col("vec_rank").cast("long").alias("vec_rank"),
    )
    rows = result.collect()
    return spark.createDataFrame(rows, result.schema)


def q_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-10 to the vec_id=0 query vector."""
    from mahout_spark.operators.similarity import brute_force_cosine_topk

    emb = _load(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    return brute_force_cosine_topk(emb, qvec, k=10)


def q_media_meta(spark, sf_dir):
    """Multimodal manifest pass: byte count + sha256 per media payload."""
    from mahout_spark.operators.multimodal import binary_meta, pack_media

    return binary_meta(pack_media(_load(spark, sf_dir, "documents"), "text"))


def q_engine_minhash_neardup(spark, sf_dir):
    """MinHash+LSH near-dup (Arrow-UDF signatures; rows-only check —
    blake2b hashing is not SQL-expressible)."""
    from mahout_spark.operators.dedup import minhash_lsh_pairs

    cleanup = []
    return _localize(spark, minhash_lsh_pairs(
        _load(spark, sf_dir, "documents"),
        threshold=JACCARD_THRESHOLD, k=JACCARD_K, cleanup=cleanup,
    ), cleanup)


def q_engine_simhash_neardup(spark, sf_dir):
    """SimHash hamming≤3 near-dup pairs (rows-only check)."""
    from mahout_spark.operators.dedup import simhash_neardup_pairs

    cleanup = []
    return _localize(spark, simhash_neardup_pairs(
        _load(spark, sf_dir, "documents"), cleanup=cleanup
    ), cleanup)


def q_engine_ann_topk(spark, sf_dir):
    """LSH-bucketed approximate NN top-10 (rows-only check; recall vs
    brute force asserted in tests/)."""
    from mahout_spark.operators.similarity import lsh_ann_topk

    emb = _load(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    # nbits sized for sandbox corpora (2^6 buckets); at 10^9 vectors this
    # would be 16-20 bits so buckets stay ~10^4-10^5 vectors.
    return lsh_ann_topk(emb, qvec, k=10, nbits=6, n_probes=7)


IVF_CELLS = 8


def q_engine_ivf_topk(spark, sf_dir):
    """IVF approximate NN (X49): spherical-k-means coarse quantizer over
    a bounded deterministic sample, cell assignment per vector, probe +
    exact cosine rerank. Run in the FULL-PROBE regime (n_probes =
    n_cells) where IVF is provably identical to brute force — the DuckDB
    cosine relation hash-checks that the train/assign/probe/rerank
    plumbing is lossless end-to-end. The approximate regime (n_probes <
    n_cells) is recall-gated in tests/ like the LSH path."""
    from mahout_spark.operators.similarity import (
        ivf_ann_topk,
        ivf_train_centroids,
    )

    emb = _load(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    cents = ivf_train_centroids(emb, n_cells=IVF_CELLS, sample_n=1024)
    return ivf_ann_topk(emb, qvec, cents, k=10, n_probes=IVF_CELLS)


def q_engine_media_decode(spark, sf_dir):
    """mapInPandas media decode stage with the deterministic fake decoder
    (rows-only check; plumbing correctness asserted in tests/). The
    ``features array<float>`` column is serialized to a CSV string for the
    driver (its canonicalizer sorts rows — arrays aren't hashable there);
    library callers get the typed array from decode_media directly."""
    from mahout_spark.operators.multimodal import decode_media, pack_media

    decoded = decode_media(
        pack_media(_load(spark, sf_dir, "documents"), "text")
    )
    return decoded.select(
        "doc_id", "media_type", "n_bytes", "width", "height",
        F.concat_ws(
            ",",
            F.transform(
                "features",
                lambda x: F.format_string("%.6f", x.cast("double")),
            ),
        ).alias("features_csv"),
    )


def q_report_lines(spark, sf_dir):
    """Reference report format (MahoutTermFinderMwk.java:114-116):
    '<doc>: <int(score*10) lpad 3> <term>' over the per-doc top-5 TF-IDF
    terms, globally sorted like run.sh's `| sort`."""
    from mahout_spark.report import report_lines

    scored = q_tfidf_top5_per_doc(spark, sf_dir).select(
        "doc_id", "term", "score"
    )
    return report_lines(scored)


STRATA = [  # (name, max n_chars bound, md5-prefix keep threshold)
    ("short", 100, "40"),   # ~25% of short docs
    ("medium", 300, "20"),  # ~12.5%
    ("long", None, "10"),   # ~6.25%
]


def q_corpus_summary(spark, sf_dir):
    """One-row corpus rollup (docs, empty docs, distinct texts, vocab,
    token mass) — the pre-flight sanity pass a pipeline runs before
    dedup/filtering. Two partial aggs cross-joined; no corpus shuffle."""
    from mahout_spark.operators.textstats import tokens_expr

    docs = _load(spark, sf_dir, "documents")
    toks = tokens_expr(F.col("text"))
    doc_stats = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.size(toks) == 0).cast("long")).alias("n_empty_docs"),
        F.count_distinct(F.md5(F.col("text"))).alias("n_distinct_texts"),
    )
    tf = _simple_tf(spark, sf_dir)
    term_stats = tf.agg(
        F.count_distinct("term").alias("n_terms"),
        F.sum("tf").cast("long").alias("n_tokens"),
    )
    return doc_stats.crossJoin(term_stats)


def q_stratified_sample(spark, sf_dir):
    """Stratified deterministic sampling: per-length stratum, keep docs
    whose md5(text) prefix clears the stratum's threshold — reproducible
    across engines/cluster sizes, with per-stratum rates (the eval-split
    carving pattern where strata must be sampled at different densities)."""
    docs = _load(spark, sf_dir, "documents")
    n = F.length(F.col("text"))
    stratum = (
        F.when(n < STRATA[0][1], F.lit(STRATA[0][0]))
        .when(n < STRATA[1][1], F.lit(STRATA[1][0]))
        .otherwise(F.lit(STRATA[2][0]))
    )
    thresh = (
        F.when(stratum == STRATA[0][0], F.lit(STRATA[0][2]))
        .when(stratum == STRATA[1][0], F.lit(STRATA[1][2]))
        .otherwise(F.lit(STRATA[2][2]))
    )
    return (
        docs.select(
            "doc_id", stratum.alias("stratum"),
            n.cast("long").alias("n_chars"),
            F.substring(F.md5(F.col("text")), 1, 2).alias("h"),
        )
        .filter(F.col("h") < thresh)
        .select("doc_id", "stratum", "n_chars")
    )


def q_report_full(spark, sf_dir):
    """Reference full score-dump report (report_full2.txt:3-5): one line
    per document with the COMPLETE {term=score, ...} map, not just the
    top-k. The reference iterates a HashMap (nondeterministic order —
    documented quirk); here entries are deterministically ordered by
    (score desc, term asc). Scores fixed-formatted to 6 decimals so both
    engines render identical strings."""
    from mahout_spark.functions import tfidf_expr
    from mahout_spark.operators.stats import document_frequency

    tf = _simple_tf(spark, sf_dir)
    n_docs = _load(spark, sf_dir, "documents").count()
    scored = tf.join(document_frequency(tf), "term").select(
        "doc_id", "term",
        F.round(tfidf_expr(F.col("tf"), F.col("df"), n_docs), 6)
        .alias("score"),
    )
    # struct sort on (-score, term) = (score desc, term asc); negation of
    # a double is exact, so -(-score) restores the rounded value
    entries = F.array_sort(
        F.collect_list(
            F.struct((-F.col("score")).alias("ns"), F.col("term").alias("t"))
        )
    )
    agg = scored.groupBy("doc_id").agg(entries.alias("es"))
    line = F.concat(
        F.col("doc_id").cast("string"),
        F.lit(": {"),
        F.concat_ws(
            ", ",
            F.transform(
                "es",
                lambda s: F.concat(
                    s["t"], F.lit("="), F.format_string("%.6f", -s["ns"])
                ),
            ),
        ),
        F.lit("}"),
    )
    return agg.select(line.alias("line"))


def q_tpch_q3_topk(spark, sf_dir):
    """TPC-H Q3-style: top-10 open orders by pre-discount revenue (exact
    cents), broadcast customer filter."""
    cust = _load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = _load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15")
    )
    li = _load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15")
    )
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc = F.round(F.col("l_discount") * 100).cast("long")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(cents * (100 - disc)).alias("revenue_c4"))
        .orderBy(F.col("revenue_c4").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


def q_tpch_promo_share(spark, sf_dir):
    """TPC-H Q14-style: per part type prefix, lineitem revenue share
    (exact cents numerator/denominator as integers)."""
    part = _load(spark, sf_dir, "part")
    li = _load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-09-01"))
        & (F.col("l_shipdate") < F.lit("1995-10-01"))
    )
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc = F.round(F.col("l_discount") * 100).cast("long")
    rev = cents * (100 - disc)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.split(F.col("p_type"), " ").getItem(0).alias("type_prefix"))
        .agg(
            F.sum(rev).alias("revenue_c4"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


CHUNK_TOKENS, CHUNK_OVERLAP = 24, 8
# PII patterns (emails, bare IPv4s, 10+-digit runs) — same regexes inlined
# in the oracle SQL; fullmatch-free so both engines substitute all hits.
PII_EMAIL = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
PII_IPV4 = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
PII_LONGNUM = "[0-9]{10,}"
# identical patterns on the DuckDB side (RE2 accepts this syntax as-is)
PII_EMAIL_SQL, PII_IPV4_SQL, PII_LONGNUM_SQL = PII_EMAIL, PII_IPV4, PII_LONGNUM
SAMPLE_PCT_HEX = "0d"  # keep docs whose md5 first byte < 0x0d (~5%)


def q_pii_redact(spark, sf_dir):
    """Training-data PII scrub: replace emails, IPv4s and long digit runs
    with typed placeholders; reports docs whose text changed. Pure JVM
    regexp_replace chain."""
    docs = _load(spark, sf_dir, "documents")
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), PII_EMAIL, "<EMAIL>"),
            PII_IPV4, "<IP>",
        ),
        PII_LONGNUM, "<NUM>",
    )
    return (
        docs.select("doc_id", red.alias("redacted"),
                    (red != F.col("text")).alias("changed"))
        .select("doc_id", "redacted", "changed")
    )


def q_hash_sample(spark, sf_dir):
    """Deterministic content-hash sampling (~5%): keep docs whose
    md5(text) first hex byte < 0x0d. Reproducible across engines, runs
    and cluster sizes — the sampling primitive for eval-split carving
    where row-position sampling is nondeterministic."""
    docs = _load(spark, sf_dir, "documents")
    return docs.filter(
        F.substring(F.md5(F.col("text")), 1, 2) < SAMPLE_PCT_HEX
    ).select("doc_id", "n_chars")


def q_chunk_documents(spark, sf_dir):
    """Training-data chunking: overlapping token windows per document."""
    from mahout_spark.operators.textstats import chunk_documents

    return chunk_documents(
        _load(spark, sf_dir, "documents"),
        chunk_tokens=CHUNK_TOKENS, overlap=CHUNK_OVERLAP,
    )


DIST_DOC_LIMIT = 50


def q_doc_distances(spark, sf_dir):
    """Reference distance-measure probe as relational algebra: pairwise
    Tanimoto distance over simple-tokenizer TF-IDF weights (docs with
    doc_id < 50 — all-pairs output bounded)."""
    from mahout_spark.functions import tfidf_expr
    from mahout_spark.operators.clustering import pairwise_doc_distances
    from mahout_spark.operators.stats import document_frequency

    tf = _simple_tf(spark, sf_dir)
    n_docs = _load(spark, sf_dir, "documents").count()
    weights = (
        tf.join(document_frequency(tf), "term")
        .withColumn("score", tfidf_expr(F.col("tf"), F.col("df"), n_docs))
        .filter(F.col("doc_id") < DIST_DOC_LIMIT)
    )
    return pairwise_doc_distances(
        weights, "tanimoto", term_col="term"
    )


def q_engine_dedup_groups(spark, sf_dir):
    """Near-dup pairs → canonical dedup groups via iterative connected
    components. Oracle-checked: DuckDB computes the same components with
    a recursive-CTE transitive closure over the symmetric pair relation."""
    from mahout_spark.operators.dedup import (
        dedup_groups_from_pairs,
        jaccard_neardup_pairs,
    )

    cleanup = []
    pairs = jaccard_neardup_pairs(
        _load(spark, sf_dir, "documents"),
        k=JACCARD_K, threshold=JACCARD_THRESHOLD, rare_df_max=JACCARD_RARE_DF,
        cleanup=cleanup,
    )
    return _localize(
        spark, dedup_groups_from_pairs(pairs, cleanup=cleanup), cleanup
    )


def q_engine_embedding_neardup_lsh(spark, sf_dir):
    """LSH-bucketed embedding near-dup: candidate pairs from hyperplane
    buckets, exact-cosine verified — the scale path whose exact-pairwise
    counterpart is the oracle-checked embedding_neardup. Rows-only check;
    precision asserted in tests (every emitted pair is exact-verified)."""
    from mahout_spark.operators.similarity import lsh_neardup_pairs

    return lsh_neardup_pairs(
        _load(spark, sf_dir, "embeddings"),
        threshold=EMB_NEARDUP_THRESHOLD, nbits=8,
    )


def q_semantic_dedup(spark, sf_dir):
    """SemDeDup (X140, Abbas et al. 2023): IVF-clustered embedding
    dedup — within each cell, members >= 0.9 cosine-similar to an
    already-kept vector drop; keep order = ascending centroid cosine
    (the least cluster-typical representative survives). Rows-only
    check (the k-means quantizer is not SQL-replayable); the greedy is
    python-oracle-verified per cell in tests, and the disposition's
    internal consistency (dup_of points at a kept row in the same
    cell) is asserted there too."""
    from mahout_spark.operators.similarity import semantic_dedup

    return semantic_dedup(
        _load(spark, sf_dir, "embeddings"), threshold=0.9, n_cells=8)


def q_engine_cluster_docs(spark, sf_dir):
    """Document clustering (reference Canopy→FKM pipeline re-expressed as
    TF-IDF vectors + cosine k-means; golden-tested against
    report_clusters.txt in tests/test_clustering.py). Rows-only check —
    k-means assignments aren't SQL-expressible."""
    from mahout_spark.operators.clustering import (
        cluster_report,
        kmeans_doc_clusters,
    )

    docs = _load(spark, sf_dir, "documents").limit(200)
    report = cluster_report(kmeans_doc_clusters(docs, k=8), min_size=2)
    # members array<bigint> -> CSV string: the driver canonicalizer sorts
    # rows and can't hash list cells; library callers use cluster_report.
    return report.select(
        "cluster", "n_docs",
        F.concat_ws(",", F.col("members").cast("array<string>"))
        .alias("members_csv"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "wordcount": q_wordcount,
        "document_frequency": q_document_frequency,
        "doclen": q_doclen,
        "tfidf_top5_per_doc": q_tfidf_top5_per_doc,
        "bm25_topk_or": q_bm25_topk_or,
        "bm25_topk_and": q_bm25_topk_and,
        "dedup_exact": q_dedup_exact,
        "tpch_pricing_summary": q_tpch_pricing_summary,
        "revenue_by_nation": q_revenue_by_nation,
        "events_top3_per_user": q_events_top3_per_user,
        "engine_indexed_bm25_simple": q_engine_indexed_bm25_simple,
        "engine_federated_search": q_engine_federated_search,
        "engine_federated_boolean": q_engine_federated_boolean,
        "engine_filtered_search": q_engine_filtered_search,
        "engine_range_search": q_engine_range_search,
        "engine_sorted_search": q_engine_sorted_search,
        "engine_match_count": q_engine_match_count,
        "engine_cardinality": q_engine_cardinality,
        "engine_function_score": q_engine_function_score,
        "engine_term_vectors": q_engine_term_vectors,
        "date_histogram": q_date_histogram,
        "auto_date_histogram": q_auto_date_histogram,
        "asof_join": q_asof_join,
        "asof_join_tolerance": q_asof_join_tolerance,
        "range_join": q_range_join,
        "rollup_day": q_rollup_day,
        "funnel": q_funnel,
        "retention": q_retention,
        "weighted_sample": q_weighted_sample,
        "ingest_pipeline": q_ingest_pipeline,
        "histogram_pipeline": q_histogram_pipeline,
        "histogram_top_buckets": q_histogram_top_buckets,
        "histogram_stats": q_histogram_stats,
        "histogram_normalize": q_histogram_normalize,
        "histogram_serial_diff": q_histogram_serial_diff,
        "events_date_math": q_events_date_math,
        "events_sessions": q_events_sessions,
        "passage_search": q_passage_search,
        "engine_did_you_mean": q_engine_did_you_mean,
        "engine_filtered_ann": q_engine_filtered_ann,
        "engine_pq_ann": q_engine_pq_ann,
        "engine_sq_ann": q_engine_sq_ann,
        "engine_bbq_ann": q_engine_bbq_ann,
        "geo_distance": q_geo_distance,
        "geo_bounds": q_geo_bounds,
        "geo_grid": q_geo_grid,
        "multi_match_search": q_multi_match_search,
        "combined_fields": q_combined_fields,
        "repetition_signals": q_repetition_signals,
        "lm_quality": q_lm_quality,
        "c4_filters": q_c4_filters,
        "gopher_filters": q_gopher_filters,
        "curate_pipeline": q_curate_pipeline,
        "curate_stats": q_curate_stats,
        "dedup_lines": q_dedup_lines,
        "line_dedup_stats": q_line_dedup_stats,
        "boilerplate_lines": q_boilerplate_lines,
        "remove_boilerplate": q_remove_boilerplate,
        "dsir_weights": q_dsir_weights,
        "dsir_sample": q_dsir_sample,
        "domain_cap": q_domain_cap,
        "domain_cap_stats": q_domain_cap_stats,
        "token_budget": q_token_budget,
        "mixture_sample": q_mixture_sample,
        "mixture_stats": q_mixture_stats,
        "engine_has_child": q_engine_has_child,
        "engine_has_parent": q_engine_has_parent,
        "decontaminate": q_decontaminate,
        "contamination_pairs": q_contamination_pairs,
        "pack_sequences": q_pack_sequences,
        "packing_stats": q_packing_stats,
        "engine_percentiles": q_engine_percentiles,
        "engine_percentile_ranks": q_engine_percentile_ranks,
        "engine_mad": q_engine_mad,
        "engine_boxplot": q_engine_boxplot,
        "engine_string_stats": q_engine_string_stats,
        "engine_extended_stats": q_engine_extended_stats,
        "engine_composite": q_engine_composite,
        "engine_sorted_scan": q_engine_sorted_scan,
        "engine_top_hits": q_engine_top_hits,
        "engine_delete_search": q_engine_delete_search,
        "engine_dedup_delete_search": q_engine_dedup_delete_search,
        "engine_delete_purge_search": q_engine_delete_purge_search,
        "engine_phrase_search": q_engine_phrase_search,
        "engine_phrase_prefix": q_engine_phrase_prefix,
        "engine_reshard_search": q_engine_reshard_search,
        "engine_proximity_search": q_engine_proximity_search,
        "engine_boolean_search": q_engine_boolean_search,
        "engine_prefix_search": q_engine_prefix_search,
        "engine_fuzzy_search": q_engine_fuzzy_search,
        "engine_fuzzy_gramtier": q_engine_fuzzy_gramtier,
        "engine_boost_search": q_engine_boost_search,
        "engine_wildcard_search": q_engine_wildcard_search,
        "engine_wildcard_permuterm": q_engine_wildcard_permuterm,
        "engine_regexp_search": q_engine_regexp_search,
        "engine_rescore_search": q_engine_rescore_search,
        "engine_significant_terms": q_engine_significant_terms,
        "engine_significant_text": q_engine_significant_text,
        "engine_search_template": q_engine_search_template,
        "engine_highlight": q_engine_highlight,
        "engine_rank_eval": q_engine_rank_eval,
        "engine_ltr_features": q_engine_ltr_features,
        "engine_ltr_rescore": q_engine_ltr_rescore,
        "dedup_spans": q_dedup_spans,
        "engine_delete_by_query": q_engine_delete_by_query,
        "engine_snapshot_restore": q_engine_snapshot_restore,
        "engine_alias_search": q_engine_alias_search,
        "engine_span_first": q_engine_span_first,
        "engine_terms_enum": q_engine_terms_enum,
        "engine_top_metrics": q_engine_top_metrics,
        "engine_rare_terms": q_engine_rare_terms,
        "engine_multi_terms": q_engine_multi_terms,
        "engine_t_test": q_engine_t_test,
        "engine_matrix_stats": q_engine_matrix_stats,
        "engine_filters_agg": q_engine_filters_agg,
        "engine_adjacency": q_engine_adjacency,
        "engine_range_agg": q_engine_range_agg,
        "engine_weighted_avg": q_engine_weighted_avg,
        "engine_facet_histogram": q_engine_facet_histogram,
        "engine_hybrid_search": q_engine_hybrid_search,
        "engine_explain": q_engine_explain,
        "engine_synonym_search": q_engine_synonym_search,
        "engine_collapse_search": q_engine_collapse_search,
        "engine_suggest": q_engine_suggest,
        "engine_boolean_batch": q_engine_boolean_batch,
        "engine_percolate": q_engine_percolate,
        "engine_percolate_prefiltered": q_engine_percolate_prefiltered,
        "engine_index_stats": q_engine_index_stats,
        "engine_content_sha": q_engine_content_sha,
        "engine_msm_search": q_engine_msm_search,
        "engine_search_after": q_engine_search_after,
        "engine_mlt_search": q_engine_mlt_search,
        "engine_facet_search": q_engine_facet_search,
        "engine_field_search": q_engine_field_search,
        "phrase_snippets": q_phrase_snippets,
        "token_stats": q_token_stats,
        "quality_scores": q_quality_scores,
        "lang_id": q_lang_id,
        "fingerprint": q_fingerprint,
        "jaccard_neardup": q_jaccard_neardup,
        "embedding_neardup": q_embedding_neardup,
        "cosine_topk": q_cosine_topk,
        "media_meta": q_media_meta,
        "engine_ivf_topk": q_engine_ivf_topk,
        "engine_dedup_groups": q_engine_dedup_groups,
        "chunk_documents": q_chunk_documents,
        "pii_redact": q_pii_redact,
        "doc_distances": q_doc_distances,
        "hash_sample": q_hash_sample,
        "corpus_summary": q_corpus_summary,
        "stratified_sample": q_stratified_sample,
        "report_lines": q_report_lines,
        "report_full": q_report_full,
        "tpch_q3_topk": q_tpch_q3_topk,
        "tpch_promo_share": q_tpch_promo_share,
        # --- rows-only tail -------------------------------------------------
        # The 8 documented non-SQL-expressible queries (iterative/stochastic
        # or hash-seeded semantics DuckDB cannot reproduce) sit LAST so the
        # driver's correctness window spends every slot on oracle-checkable
        # entries (round-3 VERDICT ask #1).
        "engine_bm25_search": q_engine_bm25_search,
        "engine_indexed_bm25": q_engine_indexed_bm25,
        "engine_minhash_neardup": q_engine_minhash_neardup,
        "engine_simhash_neardup": q_engine_simhash_neardup,
        "engine_ann_topk": q_engine_ann_topk,
        "engine_media_decode": q_engine_media_decode,
        "engine_cluster_docs": q_engine_cluster_docs,
        "engine_embedding_neardup_lsh": q_engine_embedding_neardup_lsh,
        "semantic_dedup": q_semantic_dedup,
        "engine_mmr_ann": q_engine_mmr_ann,
        "engine_disk_usage": q_engine_disk_usage,
    }


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

_TOK_CTE = """
WITH tok AS (
    SELECT doc_id,
           unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
    FROM documents WHERE text IS NOT NULL
), tf AS (
    SELECT doc_id, term, count(*) AS tf
    FROM tok WHERE term <> '' GROUP BY doc_id, term
), dl AS (
    SELECT doc_id, sum(tf) AS doclen FROM tf GROUP BY doc_id
), dfreq AS (
    SELECT term, count(*) AS df FROM tf GROUP BY term
), scal AS (
    SELECT (SELECT count(*) FROM documents) AS n_docs,
           (SELECT avg(doclen) FROM dl) AS avgdl
)
"""

_BM25_CONTRIB = (
    "ln(1.0 + (scal.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5)) * "
    "(tf.tf * {k1_1}) / "
    "(tf.tf + {k1} * (1.0 - {b} + {b} * dl.doclen / scal.avgdl))"
).format(k1_1=BM25_K1 + 1.0, k1=BM25_K1, b=BM25_B)

_TERMS_IN = "('" + "', '".join(BM25_QUERY_TERMS) + "')"

_BM25_BASE = _TOK_CTE + f"""
, contrib AS (
    SELECT tf.doc_id,
           {_BM25_CONTRIB} AS c
    FROM tf
    JOIN dfreq USING (term)
    JOIN dl ON tf.doc_id = dl.doc_id
    CROSS JOIN scal
    WHERE tf.term IN {_TERMS_IN}
), agg AS (
    SELECT doc_id, round(sum(c), 6) AS score, count(*) AS matched
    FROM contrib GROUP BY doc_id
)
"""

def _field_bm25_cte(p: str, tok_src: str) -> str:
    """Per-FIELD BM25 CTE chain (X97): tf/doclen/df/scalars computed
    from ``tok_src``'s postings only — field-local stats, n_docs = docs
    with >= 1 token in the field (the ES per-field docCount). Emits
    ``{p}score(doc_id, score)`` with the unrounded per-field sum."""
    contrib = (
        "ln(1.0 + (s.nd - d.df + 0.5) / (d.df + 0.5)) * "
        "(tf.tf * {k1_1}) / "
        "(tf.tf + {k1} * (1.0 - {b} + {b} * dl.dl / s.ad))"
    ).format(k1_1=BM25_K1 + 1.0, k1=BM25_K1, b=BM25_B)
    return f"""
        {p}tf AS (
            SELECT doc_id, term, count(*) AS tf FROM {tok_src}
            WHERE term <> '' GROUP BY 1, 2
        ), {p}dl AS (
            SELECT doc_id, sum(tf) AS dl FROM {p}tf GROUP BY 1
        ), {p}df AS (
            SELECT term, count(*) AS df FROM {p}tf GROUP BY 1
        ), {p}scal AS (
            SELECT count(*) AS nd, avg(dl) AS ad FROM {p}dl
        ), {p}score AS (
            SELECT tf.doc_id, sum({contrib}) AS score
            FROM {p}tf tf
            JOIN {p}df d USING (term)
            JOIN {p}dl dl ON tf.doc_id = dl.doc_id
            CROSS JOIN {p}scal s
            WHERE tf.term IN {_TERMS_IN}
            GROUP BY tf.doc_id
        )"""


def _chunk_cte() -> str:
    """The X78 chunk-window CTE chain (same arithmetic as the
    chunk_documents oracle): emits ``exploded(doc_id, ts, chunk_id)``
    plus the slice bounds via CHUNK_TOKENS/CHUNK_OVERLAP."""
    stride = CHUNK_TOKENS - CHUNK_OVERLAP
    return f"""
        toks AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(text),
                                                  '[^a-z0-9]+'),
                               t -> t <> '') AS ts
            FROM documents
        ), counted AS (
            SELECT doc_id, ts, len(ts) AS n,
                   CASE WHEN len(ts) <= 0 THEN 0
                        ELSE CAST(floor(greatest(len(ts) - {CHUNK_TOKENS},
                                                 0) / {stride}) AS BIGINT)
                             + 1
                             + CASE WHEN len(ts) > {CHUNK_TOKENS}
                                     AND (len(ts) - {CHUNK_TOKENS})
                                         % {stride} > 0
                                    THEN 1 ELSE 0 END
                   END AS n_chunks
            FROM toks
        ), exploded AS (
            SELECT doc_id, ts,
                   unnest(generate_series(0, CAST(n_chunks AS INTEGER) - 1))
                       AS chunk_id
            FROM counted WHERE n_chunks > 0
        )"""


_CHUNK_SLICE = (
    f"ts[chunk_id * {CHUNK_TOKENS - CHUNK_OVERLAP} + 1"
    f" : chunk_id * {CHUNK_TOKENS - CHUNK_OVERLAP} + {CHUNK_TOKENS}]"
)


_DYM_TOKENS = ["sparkk", "dtaa", "query"]


def _dym_block(i: int, tok: str) -> str:
    """One per-token SELECT of the did_you_mean oracle: the present-term
    branch (distance 0, own df) or DuckDB's independent levenshtein best
    within 2 edits, ranked (dist asc, df desc, term asc) like
    suggest_terms."""
    return f"""
        SELECT {i} AS pos, '{tok}' AS token,
               coalesce(p.term, s.term) AS suggestion,
               CAST(CASE WHEN p.term IS NOT NULL THEN 0 ELSE s.dist END
                    AS INTEGER) AS distance,
               CAST(coalesce(p.df, s.df) AS BIGINT) AS df
        FROM (SELECT 1 AS one)
        LEFT JOIN (SELECT term, df FROM dfreq WHERE term = '{tok}') p
               ON TRUE
        LEFT JOIN (SELECT term, levenshtein('{tok}', term) AS dist, df
                   FROM dfreq
                   WHERE term <> '{tok}'
                     AND levenshtein('{tok}', term) <= 2
                   ORDER BY dist ASC, df DESC, term ASC LIMIT 1) s
               ON p.term IS NULL
    """


_DYM_SQL = (
    _TOK_CTE
    + "SELECT * FROM ("
    + " UNION ALL ".join(_dym_block(i, t) for i, t in enumerate(_DYM_TOKENS))
    + ") ORDER BY pos"
)


def _textstats_sql() -> dict[str, str]:
    from mahout_spark.operators.textstats import LANG_MARKERS, STOP30

    tok = ("list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), "
           "t -> t <> '')")
    stop_in = "('" + "','".join(STOP30) + "')"
    alpha = ("length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'))"
             "::DOUBLE / length(lower(text))")
    stopr = (f"CASE WHEN len({tok}) > 0 THEN len(list_filter({tok}, "
             f"t -> t IN {stop_in}))::DOUBLE / len({tok}) ELSE 0.0 END")
    lang_unions = "\n UNION ALL ".join(
        f"SELECT doc_id, '{code}' AS lang, CAST(len(list_intersect(ts, "
        f"[{', '.join(repr(w) for w in words)}])) AS BIGINT) AS hits FROM toks"
        for code, words in sorted(LANG_MARKERS.items())
    )
    return {
        "token_stats": f"""
        SELECT doc_id,
               CAST(length(text) AS BIGINT) AS n_chars,
               CAST(len({tok}) AS BIGINT) AS n_tokens,
               CAST(len(list_distinct({tok})) AS BIGINT) AS n_distinct,
               CAST(coalesce(list_sum(list_transform({tok},
                   t -> CAST(ceil(length(t)/4.0) AS BIGINT))), 0)
                   AS BIGINT) AS bpe_est
        FROM documents
        """,
        "quality_scores": f"""
        SELECT doc_id,
               CAST(len({tok}) AS BIGINT) AS n_tokens,
               round({alpha}, 6) AS alpha_ratio,
               round({stopr}, 6) AS stop_ratio,
               round(0.4 * ({alpha})
                   + 0.3 * least(1.0, 5.0 * ({stopr}))
                   + 0.3 * least(1.0, len({tok}) / 50.0), 6) AS quality
        FROM documents WHERE length(text) > 0
        """,
        "lang_id": f"""
        WITH toks AS (
            SELECT doc_id, list_distinct({tok}) AS ts FROM documents
        ), hits AS ({lang_unions})
        SELECT doc_id,
               CASE WHEN hits > 0 THEN lang ELSE 'und' END AS pred_lang,
               hits
        FROM (
            SELECT doc_id, lang, hits, row_number() OVER (
                PARTITION BY doc_id ORDER BY hits DESC, lang ASC
            ) AS rn FROM hits
        ) WHERE rn = 1
        """,
        "fingerprint": """
        SELECT doc_id,
               CAST(coalesce(list_sum(list_transform(
                   generate_series(1, length(substring(text, 1, 256))),
                   i -> CAST(ascii(substring(substring(text, 1, 256), i, 1))
                        * (((i - 1) % 64) + 1) AS BIGINT))), 0)
                   AS BIGINT) AS fp
        FROM documents
        """,
    }


def _gram_ctes(tok: str, n: int) -> str:
    """Distinct word n-grams per doc as gram STRINGS (decontamination
    oracle; ts[i:i+n-1] is DuckDB's inclusive n-element slice)."""
    return f"""
        toksg AS (
            SELECT doc_id, {tok} AS ts FROM documents WHERE text IS NOT NULL
        ), gg AS (
            SELECT DISTINCT doc_id, g FROM (
                SELECT doc_id, unnest(list_transform(
                    generate_series(1, greatest(0, len(ts) - {n - 1})),
                    i -> array_to_string(ts[i:i+{n - 1}], ' '))) AS g
                FROM toksg)
        )"""


def _mix_ctes() -> str:
    """Mixture oracle CTEs (X103): the identical rate arithmetic —
    T = min(n/p) over exact-binary-fraction targets, rate = p·T/n,
    integer threshold floor(rate·P) on the seed-7 multiplicative
    permutation. Emits ``thr(source, n, rate, t)`` and
    ``kept(doc_id, source)``."""
    from mahout_spark.operators.curation import PACK_MOD, pack_multiplier

    mult = pack_multiplier(MIX_SEED)
    vals = ", ".join(
        f"('{s}', {p!r})" for s, p in sorted(MIX_TARGET.items()))
    names = ", ".join(f"'{s}'" for s in sorted(MIX_TARGET))
    return f"""
        tgt AS (SELECT * FROM (VALUES {vals}) AS t(source, p)),
        cnt AS (
            SELECT source, count(*) AS n FROM documents
            WHERE source IN ({names}) GROUP BY source
        ),
        j AS (
            SELECT t.source, c.n, t.p, c.n / t.p AS cap
            FROM cnt c JOIN tgt t USING (source)
        ),
        thr AS (
            SELECT source, n, p * (SELECT min(cap) FROM j) / n AS rate,
                   CAST(floor(p * (SELECT min(cap) FROM j) / n
                              * {PACK_MOD}) AS BIGINT) AS t
            FROM j
        ),
        kept AS (
            SELECT d.doc_id, d.source FROM documents d
            JOIN thr ON d.source = thr.source
            WHERE (d.doc_id * {mult}) % {PACK_MOD} < thr.t
        )"""


def _pack_ctes(tok: str) -> str:
    """Packing oracle CTEs: token counts, the seed-42 multiplicative
    permutation key (pack_multiplier(42) — same constant the engine
    uses), and ONE global window cumsum offset."""
    from mahout_spark.operators.curation import PACK_MOD, pack_multiplier

    return f"""
        tpk AS (
            SELECT doc_id, len({tok}) AS n_tokens,
                   (doc_id * {pack_multiplier(42)}) % {PACK_MOD} AS k
            FROM documents WHERE text IS NOT NULL
        ), o AS (
            SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
                   CAST(coalesce(sum(n_tokens) OVER (ORDER BY k, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS BIGINT) AS "offset"
            FROM tpk WHERE n_tokens > 0
        )"""


def _pipeline_sql() -> dict[str, str]:
    tok = ("list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), "
           "t -> t <> '')")
    kk = JACCARD_K - 1
    dot = ("list_sum(list_transform(generate_series(1, len(a.embedding)), "
           "i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))")
    nrm = ("sqrt(list_sum(list_transform(generate_series(1, len(embedding)), "
           "i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE)))")
    qdot = ("list_sum(list_transform(generate_series(1, len(e.embedding)), "
            "i -> e.embedding[i]::DOUBLE * q.embedding[i]::DOUBLE))")
    jaccard_ctes = f"""
        toks AS (
            SELECT doc_id, {tok} AS ts FROM documents
        ), sh AS (
            SELECT DISTINCT doc_id, sh FROM (
                SELECT doc_id, unnest(list_transform(
                    generate_series(1, greatest(0, len(ts) - {kk})),
                    i -> array_to_string(ts[i:i+{kk}], ' '))) AS sh
                FROM toks
            )
        ), sizes AS (
            SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
        ), rare AS (
            SELECT sh FROM sh GROUP BY sh
            HAVING count(*) <= {JACCARD_RARE_DF}
        ), cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM sh a JOIN rare USING (sh) JOIN sh b USING (sh)
            WHERE a.doc_id < b.doc_id
        ), inter AS (
            SELECT doc_a, doc_b, count(*) AS i
            FROM cand
            JOIN sh sa ON sa.doc_id = doc_a
            JOIN sh sb ON sb.doc_id = doc_b AND sb.sh = sa.sh
            GROUP BY doc_a, doc_b
        ), jpairs AS (
            SELECT doc_a, doc_b,
                   round(i::DOUBLE / (na.n_sh + nb.n_sh - i), 6) AS jaccard
            FROM inter
            JOIN sizes na ON na.doc_id = doc_a
            JOIN sizes nb ON nb.doc_id = doc_b
            WHERE round(i::DOUBLE / (na.n_sh + nb.n_sh - i), 6)
                  >= {JACCARD_THRESHOLD}
        )"""
    return {
        "jaccard_neardup": "WITH " + jaccard_ctes + """
        SELECT doc_a, doc_b, jaccard FROM jpairs
        """,
        # connected components as a recursive CTE: reach(u, label) closes
        # the symmetric edge relation transitively; min(label) per node is
        # the component minimum — the same keep-min rule as the engine's
        # label propagation. (UNION deduplicates, so the recursion
        # terminates.)
        "engine_dedup_groups": "WITH RECURSIVE " + jaccard_ctes + """,
        edges AS (
            SELECT doc_a AS u, doc_b AS v FROM jpairs
            UNION
            SELECT doc_b AS u, doc_a AS v FROM jpairs
        ), reach(u, label) AS (
            SELECT u, u FROM (SELECT DISTINCT u FROM edges)
            UNION
            SELECT e.u, r.label FROM edges e JOIN reach r ON e.v = r.u
        )
        SELECT u AS doc_id, CAST(min(label) AS BIGINT) AS keep_id
        FROM reach GROUP BY u
        """,
        "embedding_neardup": f"""
        WITH n AS (
            SELECT vec_id, embedding, {nrm} AS nrm FROM embeddings
        )
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round({dot} / (a.nrm * b.nrm), 6) AS cosine
        FROM n a JOIN n b ON a.vec_id < b.vec_id
        WHERE round({dot} / (a.nrm * b.nrm), 6) >= {EMB_NEARDUP_THRESHOLD}
        """,
        # significant-terms oracle: fg df over the SQL match set, bg df
        # from the token stream, same JLH formula and rounding
        "engine_significant_terms": _TOK_CTE + """
        , matched AS (
            SELECT doc_id FROM tf WHERE term = 'table'
            INTERSECT
            SELECT doc_id FROM tf WHERE term = 'data'
        ), fg AS (
            SELECT term, count(*) AS fg_df
            FROM tf JOIN matched USING (doc_id) GROUP BY term
        ), s2 AS (
            SELECT (SELECT count(*) FROM matched) AS n_m,
                   (SELECT count(*) FROM documents) AS n
        )
        SELECT f.term, f.fg_df, d.df AS bg_df,
               round(((f.fg_df / n_m) - (d.df / n))
                   * ((f.fg_df / n_m) / (d.df / n)), 6) AS score
        FROM fg f JOIN dfreq d USING (term) CROSS JOIN s2
        ORDER BY score DESC, f.term ASC LIMIT 10
        """,
        # span_first oracle (X102): the phrase must sit entirely inside
        # the first 12 tokens, so LIKE over the space-joined 12-token
        # PREFIX of the normalized stream is exact (a crossing
        # occurrence cannot appear in the prefix string); scoring is the
        # phrase oracle's BM25 sum
        "engine_span_first": _TOK_CTE + f"""
        , stream AS (
            SELECT doc_id,
                   ' ' || array_to_string(list_filter(
                       string_split_regex(lower(text), '[^a-z0-9]+'),
                       t -> t <> '')[1:12], ' ') || ' ' AS s
            FROM documents WHERE text IS NOT NULL
        ), span_docs AS (
            SELECT doc_id FROM stream
            WHERE s LIKE '% {' '.join(PHRASE_QUERY)} %'
        ), contrib AS (
            SELECT tf.doc_id, {_BM25_CONTRIB} AS c
            FROM tf
            JOIN dfreq USING (term)
            JOIN dl ON tf.doc_id = dl.doc_id
            CROSS JOIN scal
            WHERE tf.term IN ('{"', '".join(sorted(set(PHRASE_QUERY)))}')
        ), agg AS (
            SELECT doc_id, round(sum(c), 6) AS score
            FROM contrib JOIN span_docs USING (doc_id)
            GROUP BY doc_id
        )
        SELECT doc_id, score FROM agg
        ORDER BY score DESC, doc_id ASC LIMIT 10
        """,
        # terms_enum oracle (X111): prefix-filtered vocabulary in term
        # order
        "engine_terms_enum": _TOK_CTE + """
        SELECT term, CAST(df AS BIGINT) AS df FROM dfreq
        WHERE term LIKE 's%'
        ORDER BY term ASC LIMIT 10
        """,
        # top_metrics oracle (X112): metric values at the largest sort
        # values of the match set
        "engine_top_metrics": _TOK_CTE + """
        , matched AS (
            SELECT DISTINCT doc_id FROM tf WHERE term = 'data'
        )
        SELECT doc_id, n_chars, lang, source
        FROM documents JOIN matched USING (doc_id)
        WHERE n_chars IS NOT NULL
        ORDER BY n_chars DESC, doc_id ASC LIMIT 5
        """,
        # multi_terms oracle (X116): compound-key counts with the same
        # tie pin
        "engine_multi_terms": _TOK_CTE + """
        , matched AS (
            SELECT DISTINCT doc_id FROM tf WHERE term = 'data'
        )
        SELECT lang, source, CAST(count(*) AS BIGINT) AS doc_count,
               round(sum(n_chars), 6) AS sum_value
        FROM documents JOIN matched USING (doc_id)
        WHERE lang IS NOT NULL AND source IS NOT NULL
        GROUP BY lang, source
        ORDER BY doc_count DESC, lang ASC, source ASC LIMIT 10
        """,
        # t_test oracle (X114): identical moment-derived Welch math
        "engine_t_test": _TOK_CTE + """
        , ma AS (SELECT DISTINCT doc_id FROM tf WHERE term = 'table'),
        mb AS (SELECT DISTINCT doc_id FROM tf WHERE term = 'stream'),
        mom AS (
            SELECT
                (SELECT count(*) FROM documents JOIN ma USING (doc_id)
                 WHERE n_chars IS NOT NULL) AS n_a,
                (SELECT sum(CAST(n_chars AS DOUBLE)) FROM documents
                 JOIN ma USING (doc_id) WHERE n_chars IS NOT NULL) AS s_a,
                (SELECT sum(CAST(n_chars AS DOUBLE)
                            * CAST(n_chars AS DOUBLE)) FROM documents
                 JOIN ma USING (doc_id) WHERE n_chars IS NOT NULL) AS q_a,
                (SELECT count(*) FROM documents JOIN mb USING (doc_id)
                 WHERE n_chars IS NOT NULL) AS n_b,
                (SELECT sum(CAST(n_chars AS DOUBLE)) FROM documents
                 JOIN mb USING (doc_id) WHERE n_chars IS NOT NULL) AS s_b,
                (SELECT sum(CAST(n_chars AS DOUBLE)
                            * CAST(n_chars AS DOUBLE)) FROM documents
                 JOIN mb USING (doc_id) WHERE n_chars IS NOT NULL) AS q_b
        ), d AS (
            SELECT CAST(n_a AS BIGINT) AS n_a, s_a / n_a AS m_a,
                   CASE WHEN n_a >= 2
                        THEN (q_a - s_a * s_a / n_a) / (n_a - 1) END AS s2_a,
                   CAST(n_b AS BIGINT) AS n_b, s_b / n_b AS m_b,
                   CASE WHEN n_b >= 2
                        THEN (q_b - s_b * s_b / n_b) / (n_b - 1) END AS s2_b
            FROM mom
        )
        SELECT n_a, round(m_a, 6) AS mean_a, round(s2_a, 6) AS var_a,
               n_b, round(m_b, 6) AS mean_b, round(s2_b, 6) AS var_b,
               round(CASE WHEN n_a >= 2 AND n_b >= 2
                           AND s2_a / n_a + s2_b / n_b > 0
                          THEN (m_a - m_b)
                               / sqrt(s2_a / n_a + s2_b / n_b) END, 6)
                   AS t_stat
        FROM d
        """,
        # matrix_stats oracle (X115): identical moment arithmetic
        "engine_matrix_stats": _TOK_CTE + """
        , matched AS (SELECT DISTINCT doc_id FROM tf WHERE term = 'data'),
        base AS (
            SELECT CAST(n_chars AS DOUBLE) AS x,
                   CAST(len(list_filter(string_split_regex(lower(text),
                        '[^a-z0-9]+'), t -> t <> '')) AS DOUBLE) AS y
            FROM documents JOIN matched USING (doc_id)
            WHERE n_chars IS NOT NULL AND text IS NOT NULL
        ), mom AS (
            SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
                   sum(x * x) AS qx, sum(y * y) AS qy,
                   sum(x * y) AS pxy
            FROM base
        ), d AS (
            SELECT CAST(n AS BIGINT) AS n,
                   sx / n AS mean_x, sy / n AS mean_y,
                   qx / n - (sx / n) * (sx / n) AS var_x,
                   qy / n - (sy / n) * (sy / n) AS var_y,
                   pxy / n - (sx / n) * (sy / n) AS cov_xy
            FROM mom
        )
        SELECT n, round(mean_x, 6) AS mean_x, round(mean_y, 6) AS mean_y,
               round(var_x, 6) AS var_x, round(var_y, 6) AS var_y,
               round(cov_xy, 6) AS cov_xy,
               round(CASE WHEN var_x > 0 AND var_y > 0
                          THEN cov_xy / sqrt(var_x * var_y) END, 6)
                   AS corr_xy
        FROM d
        """,
        # rare_terms oracle (X99): foreground term doc counts over the
        # SQL match set, rarest first
        "engine_rare_terms": _TOK_CTE + """
        , matched AS (
            SELECT DISTINCT doc_id FROM tf
            WHERE term IN ('table', 'data')
        )
        SELECT term, CAST(count(*) AS BIGINT) AS fg_df
        FROM tf JOIN matched USING (doc_id)
        GROUP BY term ORDER BY fg_df ASC, term ASC LIMIT 10
        """,
        # filters oracle (X99): one scalar count per named filter,
        # including the zero bucket
        "engine_filters_agg": _TOK_CTE + """
        SELECT * FROM (
            SELECT 'both' AS bucket, CAST((
                SELECT count(*) FROM (
                    SELECT doc_id FROM tf WHERE term = 'data'
                    INTERSECT
                    SELECT doc_id FROM tf WHERE term = 'table')
            ) AS BIGINT) AS doc_count
            UNION ALL
            SELECT 'has_data', CAST((SELECT count(DISTINCT doc_id)
                FROM tf WHERE term = 'data') AS BIGINT)
            UNION ALL
            SELECT 'has_table', CAST((SELECT count(DISTINCT doc_id)
                FROM tf WHERE term = 'table') AS BIGINT)
            UNION ALL
            SELECT 'never', CAST((SELECT count(DISTINCT doc_id)
                FROM tf WHERE term = 'zzzznotaword') AS BIGINT)
        ) ORDER BY bucket
        """,
        # adjacency_matrix oracle (X99): diagonal + pair intersection
        # counts, zero rows omitted
        "engine_adjacency": _TOK_CTE + """
        , md AS (SELECT DISTINCT doc_id FROM tf WHERE term = 'data'),
        mq AS (SELECT DISTINCT doc_id FROM tf WHERE term = 'query'),
        mt AS (SELECT DISTINCT doc_id FROM tf WHERE term = 'table')
        SELECT * FROM (
            SELECT 'd' AS key,
                   CAST((SELECT count(*) FROM md) AS BIGINT) AS doc_count
            UNION ALL SELECT 'd&q', CAST((SELECT count(*)
                FROM md JOIN mq USING (doc_id)) AS BIGINT)
            UNION ALL SELECT 'd&t', CAST((SELECT count(*)
                FROM md JOIN mt USING (doc_id)) AS BIGINT)
            UNION ALL SELECT 'q', CAST((SELECT count(*) FROM mq)
                AS BIGINT)
            UNION ALL SELECT 'q&t', CAST((SELECT count(*)
                FROM mq JOIN mt USING (doc_id)) AS BIGINT)
            UNION ALL SELECT 't', CAST((SELECT count(*) FROM mt)
                AS BIGINT)
        ) WHERE doc_count > 0 ORDER BY key
        """,
        # range-agg oracle (X101): one conditional aggregate per named
        # range over the SQL match set, empty buckets NULL-metric'd
        "engine_range_agg": _TOK_CTE + """
        , matched AS (
            SELECT DISTINCT doc_id FROM tf
            WHERE term IN ('table', 'data')
        ), base AS (
            SELECT CAST(n_chars AS DOUBLE) AS v
            FROM documents JOIN matched USING (doc_id)
            WHERE n_chars IS NOT NULL
        )
        SELECT * FROM (
            SELECT 'a_small' AS bucket,
                   CAST(count(CASE WHEN v < 500 THEN 1 END) AS BIGINT)
                       AS doc_count,
                   round(sum(CASE WHEN v < 500 THEN v END), 6)
                       AS sum_value,
                   round(avg(CASE WHEN v < 500 THEN v END), 6)
                       AS avg_value
            FROM base
            UNION ALL
            SELECT 'b_mid',
                   CAST(count(CASE WHEN v >= 400 AND v < 900 THEN 1 END)
                        AS BIGINT),
                   round(sum(CASE WHEN v >= 400 AND v < 900 THEN v END), 6),
                   round(avg(CASE WHEN v >= 400 AND v < 900 THEN v END), 6)
            FROM base
            UNION ALL
            SELECT 'c_large',
                   CAST(count(CASE WHEN v >= 900 THEN 1 END) AS BIGINT),
                   round(sum(CASE WHEN v >= 900 THEN v END), 6),
                   round(avg(CASE WHEN v >= 900 THEN v END), 6)
            FROM base
        ) ORDER BY bucket
        """,
        # weighted_avg oracle (X101)
        "engine_weighted_avg": _TOK_CTE + """
        , matched AS (
            SELECT DISTINCT doc_id FROM tf WHERE term = 'data'
        )
        SELECT round(sum(v * w) / sum(w), 6) AS weighted_avg,
               CAST(count(*) AS BIGINT) AS n_docs
        FROM (
            SELECT CAST(n_chars AS DOUBLE) AS v,
                   CAST(doc_id % 7 + 1 AS DOUBLE) AS w
            FROM documents JOIN matched USING (doc_id)
            WHERE n_chars IS NOT NULL
        )
        """,
        # histogram-facet oracle: same floor(x/width)*width buckets over
        # the SQL match set
        "engine_facet_histogram": _TOK_CTE + """
        , matched AS (
            SELECT DISTINCT doc_id FROM tf
            WHERE term IN ('table', 'data')
        )
        SELECT floor(d.n_chars / 200.0) * 200.0 AS bucket,
               count(*) AS n_docs
        FROM documents d JOIN matched USING (doc_id)
        WHERE d.n_chars IS NOT NULL
        GROUP BY 1 ORDER BY bucket
        """,
        # rescore oracle: UNROUNDED bm25 window relation + DuckDB's own
        # list-op cosine (rounded 6, as the engine rounds) + the same
        # linear combination — two-phase retrieval recomputed end-to-end
        "engine_rescore_search": _TOK_CTE + f"""
        , contrib AS (
            SELECT tf.doc_id, {_BM25_CONTRIB} AS c
            FROM tf
            JOIN dfreq USING (term)
            JOIN dl ON tf.doc_id = dl.doc_id
            CROSS JOIN scal
            WHERE tf.term IN {_TERMS_IN}
        ), aggr AS (
            SELECT doc_id, sum(c) AS score FROM contrib GROUP BY doc_id
        ), base AS (
            SELECT doc_id, score FROM aggr
            ORDER BY score DESC, doc_id ASC LIMIT {RESCORE_WINDOW}
        ), q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
        cosd AS (
            SELECT e.vec_id AS doc_id,
                   round({qdot} / ({nrm.replace('embedding', 'e.embedding')}
                       * (SELECT {nrm} FROM q)), 6) AS cos
            FROM embeddings e CROSS JOIN q
            JOIN base b ON e.vec_id = b.doc_id
        )
        SELECT b.doc_id,
               round(1.0 * b.score + {RESCORE_W} * coalesce(c.cos, 0), 6)
                   AS score,
               round(b.score, 6) AS bm25,
               coalesce(c.cos, 0.0) AS cosine
        FROM base b LEFT JOIN cosd c USING (doc_id)
        ORDER BY score DESC, b.doc_id ASC LIMIT 10
        """,
        # RRF oracle: both rankings recomputed independently, fused with
        # the same 1/(k+rank) sum over a FULL OUTER join
        "engine_hybrid_search": _TOK_CTE + f"""
        , contrib AS (
            SELECT tf.doc_id, {_BM25_CONTRIB} AS c
            FROM tf
            JOIN dfreq USING (term)
            JOIN dl ON tf.doc_id = dl.doc_id
            CROSS JOIN scal
            WHERE tf.term IN {_TERMS_IN}
        ), aggr AS (
            SELECT doc_id, sum(c) AS score FROM contrib GROUP BY doc_id
        ), lexr AS (
            SELECT doc_id, ROW_NUMBER() OVER (
                ORDER BY score DESC, doc_id ASC) AS lex_rank
            FROM (SELECT doc_id, score FROM aggr
                  ORDER BY score DESC, doc_id ASC LIMIT {RRF_DEPTH})
        ), q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
        cosall AS (
            SELECT e.vec_id AS doc_id,
                   round({qdot} / ({nrm.replace('embedding', 'e.embedding')}
                       * (SELECT {nrm} FROM q)), 6) AS cos
            FROM embeddings e CROSS JOIN q
        ), vecr AS (
            SELECT doc_id, ROW_NUMBER() OVER (
                ORDER BY cos DESC, doc_id ASC) AS vec_rank
            FROM (SELECT doc_id, cos FROM cosall
                  ORDER BY cos DESC, doc_id ASC LIMIT {RRF_DEPTH})
        )
        SELECT doc_id,
               round(coalesce(1.0 / ({RRF_K} + lex_rank), 0)
                   + coalesce(1.0 / ({RRF_K} + vec_rank), 0), 6) AS score,
               CAST(lex_rank AS BIGINT) AS lex_rank,
               CAST(vec_rank AS BIGINT) AS vec_rank
        FROM lexr FULL OUTER JOIN vecr USING (doc_id)
        ORDER BY score DESC, doc_id ASC LIMIT 10
        """,
        "cosine_topk": f"""
        WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
        n AS (
            SELECT e.vec_id,
                   round({qdot} / ({nrm.replace('embedding', 'e.embedding')}
                       * (SELECT {nrm} FROM q)), 6) AS cosine
            FROM embeddings e CROSS JOIN q
        )
        SELECT vec_id, cosine FROM n
        ORDER BY cosine DESC, vec_id ASC LIMIT 10
        """,
        # IVF full-probe oracle: with n_probes = n_cells the cell filter
        # passes every vector, so IVF ≡ exact brute-force cosine — the
        # relation is identical to cosine_topk's. This hash-checks the
        # quantizer/assignment/probe/rerank plumbing is lossless; the
        # approximate regime is recall-gated in tests/.
        "engine_ivf_topk": f"""
        WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
        n AS (
            SELECT e.vec_id,
                   round({qdot} / ({nrm.replace('embedding', 'e.embedding')}
                       * (SELECT {nrm} FROM q)), 6) AS cosine
            FROM embeddings e CROSS JOIN q
        )
        SELECT vec_id, cosine FROM n
        ORDER BY cosine DESC, vec_id ASC LIMIT 10
        """,
        # filtered-ANN oracle: the full-probe regime is provably the
        # filtered brute force, so the relation is engine_ivf_topk's
        # restricted by the attribute predicate
        "engine_filtered_ann": f"""
        WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
        n AS (
            SELECT e.vec_id,
                   round({qdot} / ({nrm.replace('embedding', 'e.embedding')}
                       * (SELECT {nrm} FROM q)), 6) AS cosine
            FROM embeddings e CROSS JOIN q
            WHERE e.label = 2
        )
        SELECT vec_id, cosine FROM n
        ORDER BY cosine DESC, vec_id ASC LIMIT 10
        """,
        # PQ-ANN oracle: rerank >= corpus makes ADC selection total and
        # the exact rerank decides, so the relation is plain brute-force
        # cosine (query vector = row 7)
        "engine_pq_ann": f"""
        WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 7),
        n AS (
            SELECT e.vec_id,
                   round({qdot} / ({nrm.replace('embedding', 'e.embedding')}
                       * (SELECT {nrm} FROM q)), 6) AS cosine
            FROM embeddings e CROSS JOIN q
        )
        SELECT vec_id, cosine FROM n
        ORDER BY cosine DESC, vec_id ASC LIMIT 10
        """,
        # SQ-ANN oracle (X90): rerank >= corpus makes quantized selection
        # total and the exact rerank decides — plain brute-force cosine
        # (query vector = row 11)
        "engine_sq_ann": f"""
        WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 11),
        n AS (
            SELECT e.vec_id,
                   round({qdot} / ({nrm.replace('embedding', 'e.embedding')}
                       * (SELECT {nrm} FROM q)), 6) AS cosine
            FROM embeddings e CROSS JOIN q
        )
        SELECT vec_id, cosine FROM n
        ORDER BY cosine DESC, vec_id ASC LIMIT 10
        """,
        # binary quantization (X95): full-rerank regime is provably the
        # exact cosine relation, query vector = row 7
        "engine_bbq_ann": f"""
        WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 7),
        n AS (
            SELECT e.vec_id,
                   round({qdot} / ({nrm.replace('embedding', 'e.embedding')}
                       * (SELECT {nrm} FROM q)), 6) AS cosine
            FROM embeddings e CROSS JOIN q
        )
        SELECT vec_id, cosine FROM n
        ORDER BY cosine DESC, vec_id ASC LIMIT 10
        """,
        # geo_distance (X96): the raw haversine over ALL fixture points
        # (no box prefilter — MATCH proves the engine's box never clips
        # a hit); identical expression tree so the only libm exposure is
        # last-ulp trig, absorbed by the 1e-6 rounding
        "geo_distance": f"""
        WITH p AS ({_GEO_POINTS_SQL}),
        d AS (
            SELECT event_id, lat, lon, value,
                   round((2.0 * 6371.0088) * asin(sqrt(least(
                       sin(radians(lat - 48.8566) / 2)
                           * sin(radians(lat - 48.8566) / 2)
                       + cos(radians(48.8566)) * cos(radians(lat))
                           * sin(radians(lon - 2.3522) / 2)
                           * sin(radians(lon - 2.3522) / 2),
                       1.0))), 6) AS distance_km
            FROM p
        )
        SELECT * FROM d WHERE distance_km <= 2000.0
        ORDER BY distance_km ASC, event_id ASC LIMIT 50
        """,
        # geo_bounds + geo_centroid (X153): exact min/max corners (ES
        # top-left/bottom-right convention) + degree-space mean
        "geo_bounds": f"""
        WITH p AS ({_GEO_POINTS_SQL}),
        b AS (
            SELECT lat, lon FROM p
            WHERE lat BETWEEN 35.0 AND 60.0
              AND lon BETWEEN -10.0 AND 30.0
        )
        SELECT max(lat) AS top_left_lat,
               min(lon) AS top_left_lon,
               min(lat) AS bottom_right_lat,
               max(lon) AS bottom_right_lon,
               round(avg(lat), 6) AS lat,
               round(avg(lon), 6) AS lon,
               CAST(count(*) AS BIGINT) AS count
        FROM b
        """,
        # geo grid agg (X96): exact integer floor arithmetic on the
        # linear lat/lon grid — no transcendentals near cell boundaries
        "geo_grid": f"""
        WITH p AS ({_GEO_POINTS_SQL})
        SELECT CAST(least(floor((lon + 180.0) / 360.0 * 32), 31)
                   AS BIGINT) AS cell_x,
               CAST(least(floor((lat + 90.0) / 180.0 * 32), 31)
                   AS BIGINT) AS cell_y,
               CAST(count(*) AS BIGINT) AS n_points,
               round(sum(value), 6) AS sum_value,
               round(avg(lat), 6) AS centroid_lat,
               round(avg(lon), 6) AS centroid_lon
        FROM p WHERE lat IS NOT NULL AND lon IS NOT NULL
        GROUP BY 1, 2
        ORDER BY n_points DESC, cell_x ASC, cell_y ASC
        LIMIT 20
        """,
        # multi_match best_fields (X97): per-field BM25 with field-local
        # stats (title = first 5 tokens, body = full text), dis_max
        # combine with title^2 and tie_breaker 0.3; the winning-field
        # tie pins to field name asc via the same windowed min
        "multi_match_search": f"""
        WITH ttok AS (
            SELECT doc_id,
                   unnest(list_filter(
                       string_split_regex(lower(text), '[^a-z0-9]+'),
                       x -> x <> '')[1:5]) AS term
            FROM documents WHERE text IS NOT NULL
        ), btok AS (
            SELECT doc_id,
                   unnest(string_split_regex(lower(text), '[^a-z0-9]+'))
                       AS term
            FROM documents WHERE text IS NOT NULL
        ), {_field_bm25_cte('t', 'ttok')}, {_field_bm25_cte('b', 'btok')},
        u AS (
            SELECT doc_id, score * 2.0 AS s, 'title' AS field FROM tscore
            UNION ALL
            SELECT doc_id, score AS s, 'body' AS field FROM bscore
        ), u2 AS (
            SELECT *, max(s) OVER (PARTITION BY doc_id) AS w_mx FROM u
        ), agg AS (
            SELECT doc_id, max(s) AS mx, sum(s) AS sm,
                   min(CASE WHEN s = w_mx THEN field END) AS best_field
            FROM u2 GROUP BY doc_id
        )
        SELECT doc_id, round(mx + 0.3 * (sm - mx), 6) AS score, best_field
        FROM agg ORDER BY score DESC, doc_id ASC LIMIT 10
        """,
        # combined_fields / BM25F (X106): the identical virtual-field
        # arithmetic — weighted tf/dl merge BEFORE saturation, df over
        # the union
        "combined_fields": f"""
        WITH ttok AS (
            SELECT doc_id,
                   unnest(list_filter(
                       string_split_regex(lower(text), '[^a-z0-9]+'),
                       x -> x <> '')[1:5]) AS term
            FROM documents WHERE text IS NOT NULL
        ), btok AS (
            SELECT doc_id,
                   unnest(string_split_regex(lower(text), '[^a-z0-9]+'))
                       AS term
            FROM documents WHERE text IS NOT NULL
        ), ttf AS (
            SELECT doc_id, term, count(*) * 2.0 AS wtf FROM ttok
            WHERE term <> '' GROUP BY 1, 2
        ), btf AS (
            SELECT doc_id, term, count(*) * 1.0 AS wtf FROM btok
            WHERE term <> '' GROUP BY 1, 2
        ), u AS (
            SELECT * FROM ttf UNION ALL SELECT * FROM btf
        ), tfc AS (
            SELECT doc_id, term, sum(wtf) AS tfp FROM u GROUP BY 1, 2
        ), dlc AS (
            SELECT doc_id, sum(wdl) AS dlp FROM (
                SELECT doc_id, sum(wtf) AS wdl FROM ttf GROUP BY 1
                UNION ALL
                SELECT doc_id, sum(wtf) AS wdl FROM btf GROUP BY 1
            ) GROUP BY doc_id
        ), cscal AS (
            SELECT count(*) AS nd, avg(dlp) AS ad FROM dlc
        ), cdf AS (
            SELECT term, count(*) AS df FROM tfc GROUP BY term
        ), contrib AS (
            SELECT tfc.doc_id,
                   ln(1.0 + (s.nd - d.df + 0.5) / (d.df + 0.5))
                   * (tfc.tfp * {BM25_K1 + 1.0})
                   / (tfc.tfp + {BM25_K1} * (1.0 - {BM25_B}
                      + {BM25_B} * dlc.dlp / s.ad)) AS c
            FROM tfc
            JOIN cdf d USING (term)
            JOIN dlc ON tfc.doc_id = dlc.doc_id
            CROSS JOIN cscal s
            WHERE tfc.term IN {_TERMS_IN}
        )
        SELECT doc_id, round(sum(c), 6) AS score FROM contrib
        GROUP BY doc_id ORDER BY score DESC, doc_id ASC LIMIT 10
        """,
        # mixture resampling (X103): identical rate + threshold
        # arithmetic on the same permutation key
        "mixture_sample": "WITH " + _mix_ctes() + """
        SELECT doc_id, source FROM kept
        """,
        "mixture_stats": "WITH " + _mix_ctes() + """
        SELECT thr.source, CAST(thr.n AS BIGINT) AS n_docs,
               round(thr.rate, 6) AS rate,
               CAST(coalesce(k.c, 0) AS BIGINT) AS n_kept,
               round(coalesce(k.c, 0) / (SELECT count(*) FROM kept), 6)
                   AS achieved_p
        FROM thr LEFT JOIN (
            SELECT source, count(*) AS c FROM kept GROUP BY source
        ) k USING (source)
        ORDER BY thr.source
        """,
        # Gopher repetition signals (X98): the identical per-doc multiset
        # arithmetic via unnest + window — duplicate occurrences = count
        # beyond the first per distinct line/gram; top-gram tie pins to
        # the lexicographically smallest; dup-gram coverage capped at 1
        "repetition_signals": """
        WITH base AS (
            SELECT doc_id, text FROM documents
            WHERE text IS NOT NULL AND length(text) > 0
        ), lines AS (
            SELECT doc_id,
                   unnest(list_filter(string_split(text, chr(10)),
                                      x -> x <> '')) AS ln
            FROM base
        ), lc AS (
            SELECT doc_id, ln, count(*) AS c, length(ln) AS l
            FROM lines GROUP BY 1, 2
        ), lstat AS (
            SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_lines,
                   round(CAST(sum(c - 1) AS DOUBLE) / sum(c), 6)
                       AS dup_line_frac,
                   CASE WHEN sum(c * l) > 0
                        THEN round(CAST(sum((c - 1) * l) AS DOUBLE)
                                   / sum(c * l), 6)
                        ELSE 0.0 END AS dup_line_char_frac
            FROM lc GROUP BY doc_id
        ), tnorm AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(text),
                                                  '[^a-z0-9]+'),
                               x -> x <> '') AS tk,
                   length(array_to_string(list_filter(
                       string_split_regex(lower(text), '[^a-z0-9]+'),
                       x -> x <> ''), ' ')) AS nl
            FROM base
        ), g2 AS (
            SELECT doc_id,
                   unnest(list_transform(generate_series(1, len(tk) - 1),
                          i -> tk[i] || ' ' || tk[i + 1])) AS g
            FROM tnorm WHERE len(tk) >= 2
        ), g2c AS (
            SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY 1, 2
        ), top2 AS (
            SELECT t.doc_id,
                   round(t.c * length(t.g) / n.nl, 6) AS f
            FROM (SELECT doc_id, g, c,
                         row_number() OVER (PARTITION BY doc_id
                             ORDER BY c DESC, g ASC) AS rn
                  FROM g2c) t
            JOIN tnorm n USING (doc_id)
            WHERE t.rn = 1 AND n.nl > 0
        ), g5 AS (
            SELECT doc_id,
                   unnest(list_transform(generate_series(1, len(tk) - 4),
                          i -> tk[i] || ' ' || tk[i + 1] || ' '
                               || tk[i + 2] || ' ' || tk[i + 3] || ' '
                               || tk[i + 4])) AS g
            FROM tnorm WHERE len(tk) >= 5
        ), g5c AS (
            SELECT doc_id, g, count(*) AS c FROM g5 GROUP BY 1, 2
        ), dup5 AS (
            SELECT c.doc_id,
                   round(least(1.0, sum(c.c * length(c.g))
                                    / any_value(n.nl)), 6) AS f
            FROM g5c c JOIN tnorm n USING (doc_id)
            WHERE c.c >= 2 AND n.nl > 0 GROUP BY c.doc_id
        )
        SELECT b.doc_id,
               coalesce(l.n_lines, CAST(0 AS BIGINT)) AS n_lines,
               coalesce(l.dup_line_frac, 0.0) AS dup_line_frac,
               coalesce(l.dup_line_char_frac, 0.0) AS dup_line_char_frac,
               coalesce(t.f, 0.0) AS top2gram_char_frac,
               coalesce(d.f, 0.0) AS dup5gram_char_frac
        FROM base b
        LEFT JOIN lstat l USING (doc_id)
        LEFT JOIN top2 t USING (doc_id)
        LEFT JOIN dup5 d USING (doc_id)
        """,
        # LM perplexity bucketing (X128): add-1 unigram LM on the
        # doc_id%10 reference slice; per-doc cross entropy folded in
        # term order (ordered window = the engine's exact summation
        # order); tertile cuts = max H among the ceil(n/3)/ceil(2n/3)
        # lowest (H, doc_id) rows — discrete, no quantile interpolation
        "lm_quality": """
        WITH tokq AS (
            SELECT doc_id,
                   unnest(string_split_regex(lower(text), '[^a-z0-9]+'))
                       AS term
            FROM documents WHERE text IS NOT NULL
        ), tfq AS (
            SELECT doc_id, term, count(*) AS tf
            FROM tokq WHERE term <> '' GROUP BY 1, 2
        ), dlq AS (
            SELECT doc_id, sum(tf) AS doclen FROM tfq GROUP BY doc_id
        ), refc AS (
            SELECT term, sum(tf) AS cnt FROM tfq
            WHERE doc_id % 10 = 0 GROUP BY term
        ), tot AS (
            SELECT sum(cnt) AS t, count(*) AS v FROM refc
        ), lm AS (
            SELECT term, log2((cnt + 1.0) / (t + v + 1.0)) AS logp
            FROM refc, tot
        ), oov AS (
            SELECT log2(1.0 / (t + v + 1.0)) AS logp FROM tot
        ), contrib AS (
            SELECT tfq.doc_id, tfq.term, dlq.doclen,
                   tfq.tf * coalesce(lm.logp, oov.logp) AS c
            FROM tfq JOIN dlq USING (doc_id)
            LEFT JOIN lm USING (term), oov
        ), h AS (
            SELECT doc_id, CAST(doclen AS BIGINT) AS n_tokens,
                   round(-cum / doclen, 6) AS cross_entropy
            FROM (
                SELECT doc_id, doclen,
                       sum(c) OVER (PARTITION BY doc_id ORDER BY term
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS cum,
                       row_number() OVER (PARTITION BY doc_id
                           ORDER BY term DESC) AS rn
                FROM contrib
            ) WHERE rn = 1
        ), ranked AS (
            SELECT cross_entropy,
                   row_number() OVER (
                       ORDER BY cross_entropy, doc_id) AS rn,
                   count(*) OVER () AS n
            FROM h
        ), thr AS (
            SELECT max(CASE WHEN rn <= ceil(n / 3.0)
                            THEN cross_entropy END) AS t1,
                   max(CASE WHEN rn <= ceil(2 * n / 3.0)
                            THEN cross_entropy END) AS t2
            FROM ranked
        )
        SELECT doc_id, n_tokens, cross_entropy,
               CASE WHEN cross_entropy <= t1 THEN 'head'
                    WHEN cross_entropy <= t2 THEN 'middle'
                    ELSE 'tail' END AS bucket
        FROM h, thr
        """,
        # C4 cleaning (X129): replay the derived 8-token-line corpus
        # ('.' when (doc_id+li)%4 != 0), then every rule — word floor,
        # terminal punct, 'stream' line drop, 'vector'/'slow filter'
        # doc policy, sentence floor of 5 on the cleaned text
        "c4_filters": """
        WITH tk AS (
            SELECT doc_id,
                   list_filter(
                       string_split_regex(lower(text), '[^a-z0-9]+'),
                       x -> x <> '') AS tk
            FROM documents WHERE text IS NOT NULL
        ), tok AS (
            SELECT doc_id, unnest(tk) AS term,
                   generate_subscripts(tk, 1) AS p
            FROM tk WHERE len(tk) > 0
        ), lin AS (
            SELECT doc_id, (p - 1) // 8 AS li,
                   string_agg(term, ' ' ORDER BY p)
                     || CASE WHEN (doc_id + (p - 1) // 8) % 4 <> 0
                             THEN '.' ELSE '' END AS line,
                   count(*) AS wc
            FROM tok GROUP BY doc_id, (p - 1) // 8
        ), marked AS (
            SELECT *, (wc >= 3
                       AND regexp_matches(line, '[.!?\"]$')
                       AND NOT contains(line, 'stream')) AS keepl
            FROM lin
        ), per AS (
            SELECT doc_id,
                   count(*) AS n_lines,
                   count(*) FILTER (WHERE keepl) AS n_lines_kept,
                   coalesce(string_agg(line, chr(10) ORDER BY li)
                            FILTER (WHERE keepl), '') AS clean_text,
                   string_agg(line, chr(10) ORDER BY li) AS full_text
            FROM marked GROUP BY doc_id
        ), scored AS (
            SELECT doc_id, n_lines, n_lines_kept, clean_text,
                   CAST(len(regexp_extract_all(clean_text, '[.!?]'))
                        AS BIGINT) AS n_sentences,
                   CASE
                     WHEN contains(full_text, 'vector')
                          THEN 'banned_word'
                     WHEN contains(full_text, 'slow filter')
                          THEN 'banned_phrase'
                     WHEN contains(full_text, '{') THEN 'brace'
                     WHEN len(regexp_extract_all(clean_text, '[.!?]'))
                          < 5 THEN 'too_few_sentences'
                   END AS drop_reason
            FROM per
        )
        SELECT doc_id, drop_reason IS NULL AS kept, drop_reason,
               n_lines, n_lines_kept, n_sentences, clean_text
        FROM scored
        """,
        # Gopher gate (X130): replay the derived 6-token-line corpus
        # ('- ' prefix when doc_id%11=0; '...' every line when %17=0,
        # every 3rd line when %13=0, else '.'), then every doc rule AND
        # the X98 repetition signals, thresholds in table-A1 order
        "gopher_filters": """
        WITH tk AS (
            SELECT doc_id,
                   list_filter(
                       string_split_regex(lower(text), '[^a-z0-9]+'),
                       x -> x <> '') AS tk
            FROM documents WHERE text IS NOT NULL
        ), tok AS (
            SELECT doc_id, unnest(tk) AS term,
                   generate_subscripts(tk, 1) AS p
            FROM tk WHERE len(tk) > 0
        ), lin AS (
            SELECT doc_id, (p - 1) // 6 AS li,
                   CASE WHEN doc_id % 11 = 0 THEN '- ' ELSE '' END
                     || string_agg(term, ' ' ORDER BY p)
                     || CASE WHEN doc_id % 17 = 0 THEN '...'
                             WHEN doc_id % 13 = 0
                                  AND ((p - 1) // 6) % 3 = 0 THEN '...'
                             ELSE '.' END AS line
            FROM tok GROUP BY doc_id, (p - 1) // 6
        ), base AS (
            SELECT doc_id, string_agg(line, chr(10) ORDER BY li) AS text
            FROM lin GROUP BY doc_id
        ), met AS (
            SELECT doc_id,
                   list_filter(string_split_regex(text, '\\s+'),
                               x -> x <> '') AS words,
                   list_filter(string_split(text, chr(10)),
                               x -> x <> '') AS lns,
                   length(text) - length(replace(text, '#', ''))
                       AS n_hash,
                   len(regexp_extract_all(text, '\\.\\.\\.')) AS n_ell,
                   list_intersect(
                       list_filter(
                           string_split_regex(lower(text),
                                              '[^a-z0-9]+'),
                           x -> x <> ''),
                       ['the','be','to','of','and','that','have','with']
                   ) AS stops
            FROM base
        ), m2 AS (
            SELECT doc_id,
                   CAST(len(words) AS BIGINT) AS n_words,
                   round(CASE WHEN len(words) > 0 THEN
                       CAST(list_sum(list_transform(
                           words, w -> length(w))) AS DOUBLE)
                       / len(words) ELSE 0.0 END, 6) AS mean_word_len,
                   round(CASE WHEN len(words) > 0 THEN
                       CAST(n_hash + n_ell AS DOUBLE) / len(words)
                       ELSE 0.0 END, 6) AS symbol_ratio,
                   round(CASE WHEN len(lns) > 0 THEN
                       CAST(len(list_filter(lns, l ->
                           regexp_matches(trim(l), '^[-*•]')))
                           AS DOUBLE) / len(lns)
                       ELSE 0.0 END, 6) AS bullet_frac,
                   round(CASE WHEN len(lns) > 0 THEN
                       CAST(len(list_filter(lns, l ->
                           ends_with(trim(l), '...'))) AS DOUBLE)
                           / len(lns)
                       ELSE 0.0 END, 6) AS ellipsis_frac,
                   round(CASE WHEN len(words) > 0 THEN
                       CAST(len(list_filter(words, w ->
                           regexp_matches(w, '[A-Za-z]'))) AS DOUBLE)
                           / len(words)
                       ELSE 0.0 END, 6) AS alpha_frac,
                   CAST(len(stops) AS BIGINT) AS stop_hits
            FROM met
        ), rlines AS (
            SELECT doc_id, line, count(*) AS c, length(line) AS l
            FROM lin GROUP BY 1, 2
        ), lstat AS (
            SELECT doc_id,
                   round(CAST(sum(c - 1) AS DOUBLE) / sum(c), 6)
                       AS dup_line_frac,
                   CASE WHEN sum(c * l) > 0
                        THEN round(CAST(sum((c - 1) * l) AS DOUBLE)
                                   / sum(c * l), 6)
                        ELSE 0.0 END AS dup_line_char_frac
            FROM rlines GROUP BY doc_id
        ), tnorm AS (
            SELECT b.doc_id, k.tk,
                   length(array_to_string(k.tk, ' ')) AS nl
            FROM base b JOIN tk k USING (doc_id)
        ), g2 AS (
            SELECT doc_id,
                   unnest(list_transform(generate_series(1, len(tk) - 1),
                          i -> tk[i] || ' ' || tk[i + 1])) AS g
            FROM tnorm WHERE len(tk) >= 2
        ), g2c AS (
            SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY 1, 2
        ), top2 AS (
            SELECT t.doc_id,
                   round(t.c * length(t.g) / n.nl, 6) AS f
            FROM (SELECT doc_id, g, c,
                         row_number() OVER (PARTITION BY doc_id
                             ORDER BY c DESC, g ASC) AS rn
                  FROM g2c) t
            JOIN tnorm n USING (doc_id)
            WHERE t.rn = 1 AND n.nl > 0
        ), g5 AS (
            SELECT doc_id,
                   unnest(list_transform(generate_series(1, len(tk) - 4),
                          i -> tk[i] || ' ' || tk[i + 1] || ' '
                               || tk[i + 2] || ' ' || tk[i + 3] || ' '
                               || tk[i + 4])) AS g
            FROM tnorm WHERE len(tk) >= 5
        ), g5c AS (
            SELECT doc_id, g, count(*) AS c FROM g5 GROUP BY 1, 2
        ), dup5 AS (
            SELECT c.doc_id,
                   round(least(1.0, sum(c.c * length(c.g))
                                    / any_value(n.nl)), 6) AS f
            FROM g5c c JOIN tnorm n USING (doc_id)
            WHERE c.c >= 2 AND n.nl > 0 GROUP BY c.doc_id
        ), joined AS (
            SELECT m.*,
                   coalesce(l.dup_line_frac, 0.0) AS dup_line_frac,
                   coalesce(l.dup_line_char_frac, 0.0)
                       AS dup_line_char_frac,
                   coalesce(t.f, 0.0) AS top2gram_char_frac,
                   coalesce(d.f, 0.0) AS dup5gram_char_frac
            FROM m2 m
            LEFT JOIN lstat l USING (doc_id)
            LEFT JOIN top2 t USING (doc_id)
            LEFT JOIN dup5 d USING (doc_id)
        ), scored AS (
            SELECT *,
                   CASE WHEN n_words < 20 THEN 'too_few_words'
                        WHEN n_words > 100000 THEN 'too_many_words'
                        WHEN mean_word_len < 3.0 OR mean_word_len > 10.0
                             THEN 'word_length'
                        WHEN symbol_ratio > 0.1 THEN 'symbol_ratio'
                        WHEN bullet_frac > 0.9 THEN 'bullet_lines'
                        WHEN ellipsis_frac > 0.3 THEN 'ellipsis_lines'
                        WHEN alpha_frac < 0.8 THEN 'alpha_words'
                        WHEN stop_hits < 1 THEN 'stop_words'
                        WHEN dup_line_frac > 0.3 THEN 'dup_lines'
                        WHEN dup_line_char_frac > 0.2
                             THEN 'dup_line_chars'
                        WHEN top2gram_char_frac > 0.2 THEN 'top_ngram'
                        WHEN dup5gram_char_frac > 0.15 THEN 'dup_ngram'
                   END AS drop_reason
            FROM joined
        )
        SELECT doc_id, drop_reason IS NULL AS kept, drop_reason,
               n_words, mean_word_len, symbol_ratio, bullet_frac,
               ellipsis_frac, alpha_frac, stop_hits,
               dup_line_frac, dup_line_char_frac,
               top2gram_char_frac, dup5gram_char_frac
        FROM scored
        """,
        # has_child (X100): chunk windows -> tf('data') per chunk ->
        # per-parent count/sum with the >= 2 window
        "engine_has_child": "WITH " + _chunk_cte() + f"""
        , chunks AS (
            SELECT doc_id, chunk_id,
                   len(list_filter({_CHUNK_SLICE}, t -> t = 'data')) AS tf
            FROM exploded
        ), matched AS (
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_children,
                   round(sum(CAST(tf AS DOUBLE)), 6) AS score
            FROM chunks WHERE tf > 0
            GROUP BY doc_id HAVING count(*) >= 2
        )
        SELECT d.doc_id, d.source, m.n_children, m.score
        FROM documents d JOIN matched m USING (doc_id)
        """,
        # has_parent (X100): every chunk of a src3 parent, the parent's
        # n_chars copied down as the score
        "engine_has_parent": "WITH " + _chunk_cte() + f"""
        SELECT e.doc_id AS parent_id,
               CAST(e.chunk_id AS INTEGER) AS chunk_id,
               CAST(len({_CHUNK_SLICE}) AS BIGINT) AS n_chunk_tokens,
               round(CAST(d.n_chars AS DOUBLE), 6) AS parent_score
        FROM exploded e
        JOIN documents d ON e.doc_id = d.doc_id AND d.source = 'src3'
        ORDER BY parent_id, chunk_id
        """,
        # decontamination (X85): distinct 4-gram intersection on gram
        # STRINGS — the engine joins on xxhash64, so MATCH doubles as
        # the hash-collision-freedom check (n=4 because the synthetic
        # 31-word corpus leaves 13-gram overlap empty; same operator)
        "decontaminate": "WITH " + _gram_ctes(tok, 4) + """
        , eg AS (SELECT DISTINCT g FROM gg WHERE doc_id % 97 = 0),
        tg AS (SELECT doc_id, g FROM gg WHERE doc_id % 97 <> 0)
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared
        FROM tg JOIN eg USING (g) GROUP BY doc_id
        """,
        "contamination_pairs": "WITH " + _gram_ctes(tok, 4) + """
        SELECT a.doc_id AS train_id, b.doc_id AS test_id,
               CAST(count(*) AS BIGINT) AS n_shared
        FROM gg a JOIN gg b USING (g)
        WHERE a.doc_id % 97 <> 0 AND b.doc_id % 97 = 0
        GROUP BY 1, 2
        """,
        # packing (X86): ONE global window cumsum over the same
        # multiplicative-permutation key the engine uses — MATCH proves
        # the engine's two-phase distributed prefix sum exact
        "pack_sequences": "WITH " + _pack_ctes(tok) + """
        SELECT doc_id, n_tokens, "offset",
               "offset" // 64 AS seq_first,
               ("offset" + n_tokens - 1) // 64 AS seq_last
        FROM o
        """,
        "packing_stats": "WITH " + _pack_ctes(tok) + """
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
               CAST((sum(n_tokens) + 63) // 64 AS BIGINT) AS n_sequences,
               CAST(((sum(n_tokens) + 63) // 64) * 64 - sum(n_tokens)
                    AS BIGINT) AS tail_padding,
               CAST(sum(CASE WHEN ("offset" + n_tokens - 1) // 64
                             > "offset" // 64 THEN 1 ELSE 0 END)
                    AS BIGINT) AS boundary_docs
        FROM o
        """,
        "doc_distances": _TOK_CTE + f"""
        , w AS (
            SELECT tf.doc_id, tf.term,
                   sqrt(tf.tf) * (1.0 + ln(scal.n_docs / (dfreq.df + 1.0))) AS w
            FROM tf JOIN dfreq USING (term) CROSS JOIN scal
            WHERE tf.doc_id < {DIST_DOC_LIMIT}
        ), norms AS (
            SELECT doc_id, sum(w * w) AS n2 FROM w GROUP BY doc_id
        ), dots AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, sum(a.w * b.w) AS dot
            FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        )
        SELECT na.doc_id AS doc_a, nb.doc_id AS doc_b,
               round(1.0 - coalesce(dot, 0.0)
                     / (na.n2 + nb.n2 - coalesce(dot, 0.0)), 6) AS distance
        FROM norms na
        JOIN norms nb ON na.doc_id < nb.doc_id
        LEFT JOIN dots ON doc_a = na.doc_id AND doc_b = nb.doc_id
        """,
        "pii_redact": f"""
        SELECT doc_id,
               regexp_replace(regexp_replace(regexp_replace(text,
                   '{PII_EMAIL_SQL}', '<EMAIL>', 'g'),
                   '{PII_IPV4_SQL}', '<IP>', 'g'),
                   '{PII_LONGNUM_SQL}', '<NUM>', 'g') AS redacted,
               regexp_replace(regexp_replace(regexp_replace(text,
                   '{PII_EMAIL_SQL}', '<EMAIL>', 'g'),
                   '{PII_IPV4_SQL}', '<IP>', 'g'),
                   '{PII_LONGNUM_SQL}', '<NUM>', 'g') <> text AS changed
        FROM documents
        """,
        "hash_sample": f"""
        SELECT doc_id, n_chars FROM documents
        WHERE substring(md5(text), 1, 2) < '{SAMPLE_PCT_HEX}'
        """,
        "corpus_summary": _TOK_CTE + f"""
        SELECT CAST((SELECT count(*) FROM documents) AS BIGINT) AS n_docs,
               CAST((SELECT count(*) FROM documents
                     WHERE len({tok}) = 0) AS BIGINT) AS n_empty_docs,
               CAST((SELECT count(DISTINCT md5(text)) FROM documents)
                   AS BIGINT) AS n_distinct_texts,
               CAST((SELECT count(DISTINCT term) FROM tf)
                   AS BIGINT) AS n_terms,
               CAST((SELECT sum(tf) FROM tf) AS BIGINT) AS n_tokens
        """,
        "stratified_sample": f"""
        WITH s AS (
            SELECT doc_id,
                   CASE WHEN length(text) < {STRATA[0][1]}
                            THEN '{STRATA[0][0]}'
                        WHEN length(text) < {STRATA[1][1]}
                            THEN '{STRATA[1][0]}'
                        ELSE '{STRATA[2][0]}' END AS stratum,
                   CAST(length(text) AS BIGINT) AS n_chars,
                   substring(md5(text), 1, 2) AS h
            FROM documents
        )
        SELECT doc_id, stratum, n_chars FROM s
        WHERE (stratum = '{STRATA[0][0]}' AND h < '{STRATA[0][2]}')
           OR (stratum = '{STRATA[1][0]}' AND h < '{STRATA[1][2]}')
           OR (stratum = '{STRATA[2][0]}' AND h < '{STRATA[2][2]}')
        """,
        "chunk_documents": f"""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                               t -> t <> '') AS ts
            FROM documents
        ), counted AS (
            SELECT doc_id, ts, len(ts) AS n,
                   CASE WHEN len(ts) <= 0 THEN 0
                        ELSE CAST(floor(greatest(len(ts) - {CHUNK_TOKENS}, 0)
                                        / {CHUNK_TOKENS - CHUNK_OVERLAP}) AS BIGINT)
                             + 1
                             + CASE WHEN len(ts) > {CHUNK_TOKENS}
                                     AND (len(ts) - {CHUNK_TOKENS})
                                         % {CHUNK_TOKENS - CHUNK_OVERLAP} > 0
                                    THEN 1 ELSE 0 END
                   END AS n_chunks
            FROM toks
        ), exploded AS (
            SELECT doc_id, ts,
                   unnest(generate_series(0, CAST(n_chunks AS INTEGER) - 1))
                       AS chunk_id
            FROM counted WHERE n_chunks > 0
        )
        SELECT doc_id, CAST(chunk_id AS INTEGER) AS chunk_id,
               CAST(len(ts[chunk_id * {CHUNK_TOKENS - CHUNK_OVERLAP} + 1
                         : chunk_id * {CHUNK_TOKENS - CHUNK_OVERLAP}
                           + {CHUNK_TOKENS}]) AS BIGINT) AS n_chunk_tokens,
               array_to_string(ts[chunk_id * {CHUNK_TOKENS - CHUNK_OVERLAP} + 1
                         : chunk_id * {CHUNK_TOKENS - CHUNK_OVERLAP}
                           + {CHUNK_TOKENS}], ' ') AS chunk_text
        FROM exploded
        """,
        "media_meta": """
        SELECT doc_id, 'image' AS media_type,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               sha256(text) AS sha
        FROM documents
        """,
        "report_lines": _TOK_CTE + """
        , scored AS (
            SELECT tf.doc_id, tf.term,
                   round(sqrt(tf.tf) * (1.0 + ln(scal.n_docs / (dfreq.df + 1.0))), 6) AS score
            FROM tf JOIN dfreq USING (term) CROSS JOIN scal
        ), ranked AS (
            SELECT doc_id, term, score,
                   row_number() OVER (
                       PARTITION BY doc_id ORDER BY score DESC, term ASC
                   ) AS rank
            FROM scored
        )
        SELECT CAST(doc_id AS VARCHAR) || ': '
               || lpad(CAST(CAST(trunc(score * 10) AS INTEGER) AS VARCHAR), 3, ' ')
               || ' ' || term AS line
        FROM ranked WHERE rank <= 5
        """,
        "report_full": _TOK_CTE + """
        , scored AS (
            SELECT tf.doc_id, tf.term,
                   round(sqrt(tf.tf) * (1.0 + ln(scal.n_docs / (dfreq.df + 1.0))), 6) AS score
            FROM tf JOIN dfreq USING (term) CROSS JOIN scal
        )
        SELECT CAST(doc_id AS VARCHAR) || ': {'
               || string_agg(term || '=' || printf('%.6f', score),
                             ', ' ORDER BY score DESC, term ASC)
               || '}' AS line
        FROM scored GROUP BY doc_id
        """,
        "tpch_q3_topk": """
        SELECT l_orderkey, o_orderdate, o_orderpriority,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                   AS BIGINT) AS revenue_c4
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
          AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue_c4 DESC, l_orderkey ASC LIMIT 10
        """,
        "tpch_promo_share": """
        SELECT string_split(p_type, ' ')[1] AS type_prefix,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                   AS BIGINT) AS revenue_c4,
               count(*) AS n_items
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1995-10-01 00:00:00'
        GROUP BY 1
        """,
    }


def _ws_sql() -> str:
    from mahout_spark.operators.curation import PACK_MOD, pack_multiplier

    mult = pack_multiplier(42)
    return f"""
        WITH keyed AS (
            SELECT doc_id, n_chars::DOUBLE AS weight,
                   round(ln(((doc_id * {mult}) % {PACK_MOD} + 1)
                             / {float(PACK_MOD + 1)!r})
                         / n_chars::DOUBLE, 6) AS key
            FROM documents
            WHERE n_chars IS NOT NULL AND n_chars > 0
        )
        SELECT doc_id, weight, key FROM keyed
        ORDER BY key DESC, doc_id ASC LIMIT 100
        """


_WS_SQL = _ws_sql()


def oracle_sql() -> dict[str, str]:
    out = (_base_oracle_sql() | _textstats_sql() | _pipeline_sql()
           | _curate_sql() | _lines_sql() | _dsir_sql()
           | _domain_cap_sql() | _token_budget_sql())
    # the prefiltered percolator is contract-identical to the compiled
    # one — the same relation checks both (cross-evaluator parity gate)
    out["engine_percolate_prefiltered"] = out["engine_percolate"]
    return out


def _curate_sql() -> dict[str, str]:
    """X131 curation-funnel oracle: replays the SEQUENTIAL funnel —
    quality gate (the X10 formula verbatim) → exact dedup on text
    EQUALITY (standing in for the engine's sha256, so a MATCH on the
    planted duplicates doubles as a collision-freedom check) → 4-gram
    decontamination over the dedup survivors only — on the same
    train+planted fixture corpus ``_curated`` builds."""
    from mahout_spark.operators.textstats import STOP30

    tok = ("list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), "
           "t -> t <> '')")
    stop_in = "('" + "','".join(STOP30) + "')"
    alpha = ("length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'))"
             "::DOUBLE / length(lower(text))")
    stopr = (f"CASE WHEN len({tok}) > 0 THEN len(list_filter({tok}, "
             f"t -> t IN {stop_in}))::DOUBLE / len({tok}) ELSE 0.0 END")
    ctes = f"""
        corpus AS (
            SELECT doc_id, text FROM documents WHERE doc_id % 97 <> 0
            UNION ALL
            SELECT doc_id + 1000000 AS doc_id, text FROM documents
            WHERE doc_id % 97 <> 0 AND doc_id % 89 = 0
        ), q AS (
            SELECT doc_id,
                   round(0.4 * ({alpha})
                       + 0.3 * least(1.0, 5.0 * ({stopr}))
                       + 0.3 * least(1.0, len({tok}) / 50.0), 6) AS quality
            FROM corpus WHERE length(text) > 0
        ), base AS (
            SELECT c.doc_id, c.text, q.quality
            FROM corpus c LEFT JOIN q USING (doc_id)
        ), surv1 AS (
            SELECT doc_id, text FROM base
            WHERE quality IS NOT NULL AND quality >= 0.55
        ), keyed AS (
            SELECT s.doc_id, s.text, m.canonical_id
            FROM surv1 s JOIN (
                SELECT text, min(doc_id) AS canonical_id
                FROM surv1 GROUP BY text
            ) m USING (text)
        ), dup_map AS (
            SELECT doc_id, canonical_id FROM keyed
            WHERE doc_id <> canonical_id
        ), surv2 AS (
            SELECT doc_id, text FROM keyed WHERE doc_id = canonical_id
        ), tg AS (
            SELECT DISTINCT doc_id, g FROM (
                SELECT doc_id, unnest(list_transform(
                    generate_series(1, greatest(0, len(ts) - 3)),
                    i -> array_to_string(ts[i:i+3], ' '))) AS g
                FROM (SELECT doc_id, {tok} AS ts FROM surv2))
        ), eg AS (
            SELECT DISTINCT g FROM (
                SELECT unnest(list_transform(
                    generate_series(1, greatest(0, len(ts) - 3)),
                    i -> array_to_string(ts[i:i+3], ' '))) AS g
                FROM (SELECT {tok} AS ts FROM documents
                      WHERE doc_id % 97 = 0 AND text IS NOT NULL))
        ), cont AS (
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared
            FROM tg JOIN eg USING (g) GROUP BY doc_id
        ), disp AS (
            SELECT b.doc_id, b.quality, d.canonical_id, c.n_shared,
                   CASE WHEN b.quality IS NULL THEN 'empty'
                        WHEN b.quality < 0.55 THEN 'quality'
                        WHEN d.canonical_id IS NOT NULL THEN 'exact_dup'
                        WHEN c.n_shared IS NOT NULL THEN 'contaminated'
                   END AS stage
            FROM base b
            LEFT JOIN dup_map d USING (doc_id)
            LEFT JOIN cont c USING (doc_id)
        )"""
    sig_ctes = f"""
        corpus AS (
            SELECT doc_id, text FROM documents WHERE doc_id % 97 <> 0
            UNION ALL
            SELECT doc_id + 1000000 AS doc_id, text FROM documents
            WHERE doc_id % 97 <> 0 AND doc_id % 89 = 0
        ), toks AS (
            SELECT doc_id, unnest({tok}) AS term FROM corpus
            WHERE text IS NOT NULL
        ), dtf AS (
            SELECT DISTINCT doc_id, term FROM toks
        ), dfreq2 AS (
            SELECT term, count(*) AS df FROM dtf GROUP BY term
        ), matched AS (
            SELECT doc_id FROM dtf WHERE term = 'table'
            INTERSECT
            SELECT doc_id FROM dtf WHERE term = 'data'
        ), canon AS (
            SELECT min(c.doc_id) AS doc_id
            FROM corpus c JOIN matched m USING (doc_id)
            GROUP BY c.text
        ), fg AS (
            SELECT term, count(*) AS fg_df
            FROM dtf JOIN canon USING (doc_id) GROUP BY term
        ), nm AS (SELECT count(*) AS n FROM canon),
        nd AS (SELECT count(*) AS n FROM corpus)"""
    return {
        "engine_significant_text": "WITH " + sig_ctes + """
        SELECT term, CAST(fg_df AS BIGINT) AS fg_df,
               CAST(df AS BIGINT) AS bg_df,
               round((fg_df / nm.n::DOUBLE - df / nd.n::DOUBLE)
                     * ((fg_df / nm.n::DOUBLE)
                        / (df / nd.n::DOUBLE)), 6) AS score
        FROM fg JOIN dfreq2 USING (term), nm, nd
        ORDER BY score DESC, term ASC LIMIT 10
        """,
        "curate_pipeline": "WITH " + ctes + """
        SELECT doc_id, stage IS NULL AS kept, stage, quality,
               canonical_id, n_shared
        FROM disp
        """,
        "curate_stats": "WITH " + ctes + """
        SELECT CAST(count(*) AS BIGINT) AS docs_in,
               CAST(count(*) FILTER (WHERE stage IS NULL) AS BIGINT)
                   AS docs_kept,
               CAST(count(*) FILTER (WHERE stage = 'empty') AS BIGINT)
                   AS docs_empty,
               CAST(count(*) FILTER (WHERE stage = 'quality') AS BIGINT)
                   AS docs_quality,
               CAST(count(*) FILTER (WHERE stage = 'exact_dup') AS BIGINT)
                   AS docs_exact_dup,
               CAST(count(*) FILTER (WHERE stage = 'contaminated')
                   AS BIGINT) AS docs_contaminated
        FROM disp
        """,
    }


def _lines_sql() -> dict[str, str]:
    """X132/X133 oracles: replay the planted-line derivation (8-token
    '.' body lines; header on %3 docs, footer on %5 docs) and both
    policies on line STRINGS — the engine keys on xxhash64, so every
    MATCH doubles as a collision-freedom check."""
    tok = ("list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), "
           "t -> t <> '')")
    ctes = f"""
        tk AS (
            SELECT doc_id, {tok} AS tk
            FROM documents WHERE text IS NOT NULL
        ), lns AS (
            SELECT doc_id,
                   (CASE WHEN doc_id % 3 = 0
                         THEN ['shared header banner.']
                         ELSE []::VARCHAR[] END
                    || list_transform(
                           generate_series(0, (len(tk) - 1) // 8),
                           i -> array_to_string(
                               tk[i*8+1 : i*8+8], ' ') || '.')
                    || CASE WHEN doc_id % 5 = 0
                            THEN ['shared footer notice.']
                            ELSE []::VARCHAR[] END) AS lns
            FROM tk WHERE len(tk) > 0
        ), occ AS (
            SELECT doc_id, unnest(lns) AS line,
                   generate_subscripts(lns, 1) - 1 AS li
            FROM lns
        )"""
    dedup_marked = ctes + """
        , marked AS (
            SELECT doc_id, li, line,
                   row_number() OVER (
                       PARTITION BY line ORDER BY doc_id, li) AS rn
            FROM occ
        )"""
    bp_marked = ctes + """
        , bp AS (
            SELECT line FROM occ
            GROUP BY line HAVING count(DISTINCT doc_id) >= 25
        ), marked AS (
            SELECT o.doc_id, o.li, o.line,
                   CASE WHEN b.line IS NULL THEN 1 ELSE 2 END AS rn
            FROM occ o LEFT JOIN bp b USING (line)
        )"""
    per_doc = """
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_lines,
               CAST(count(*) FILTER (WHERE rn = 1) AS BIGINT)
                   AS n_lines_kept,
               coalesce(string_agg(line, chr(10) ORDER BY li)
                        FILTER (WHERE rn = 1), '') AS clean_text
        FROM marked GROUP BY doc_id
        """
    return {
        "dedup_lines": "WITH " + dedup_marked + per_doc,
        "line_dedup_stats": "WITH " + dedup_marked + """
        SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS docs_in,
               CAST(count(*) AS BIGINT) AS lines_in,
               CAST(count(*) FILTER (WHERE rn = 1) AS BIGINT)
                   AS lines_kept,
               CAST(count(*) FILTER (WHERE rn > 1) AS BIGINT)
                   AS lines_dropped
        FROM marked
        """,
        "boilerplate_lines": "WITH " + ctes + """
        SELECT line, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
        FROM occ GROUP BY line HAVING count(DISTINCT doc_id) >= 25
        """,
        "remove_boilerplate": "WITH " + bp_marked + per_doc,
    }


def _token_budget_sql() -> dict[str, str]:
    """X137 oracle: the X10 quality formula verbatim, ONE ordered
    window running total (quality desc, id asc), prefix cut at the
    budget — certifying the engine's two-phase bucketed prefix sum."""
    tok = ("list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), "
           "t -> t <> '')")
    from mahout_spark.operators.textstats import STOP30

    stop_in = "('" + "','".join(STOP30) + "')"
    alpha = ("length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'))"
             "::DOUBLE / length(lower(text))")
    stopr = (f"CASE WHEN len({tok}) > 0 THEN len(list_filter({tok}, "
             f"t -> t IN {stop_in}))::DOUBLE / len({tok}) ELSE 0.0 END")
    return {
        "token_budget": f"""
        WITH q AS (
            SELECT doc_id,
                   CAST(len({tok}) AS BIGINT) AS n_tokens,
                   round(0.4 * ({alpha})
                       + 0.3 * least(1.0, 5.0 * ({stopr}))
                       + 0.3 * least(1.0, len({tok}) / 50.0), 6)
                       AS quality
            FROM documents WHERE length(text) > 0
        ), c AS (
            SELECT doc_id, quality, n_tokens,
                   CAST(sum(n_tokens) OVER (
                       ORDER BY quality DESC, doc_id ASC
                       ROWS UNBOUNDED PRECEDING) AS BIGINT)
                       AS cum_tokens
            FROM q WHERE n_tokens > 0
        )
        SELECT doc_id, quality, n_tokens, cum_tokens,
               cum_tokens <= 10000 AS selected
        FROM c
        """,
    }


def _domain_cap_sql() -> dict[str, str]:
    """X136 oracle: the same seed-42 multiplicative permutation (exact
    int64 arithmetic) and ONE per-source rank — the engine's two-phase
    salted plan must select the identical cap-smallest set."""
    from mahout_spark.operators.curation import PACK_MOD, pack_multiplier

    mult = pack_multiplier(42)
    ctes = f"""
        r AS (
            SELECT doc_id, source,
                   row_number() OVER (
                       PARTITION BY source
                       ORDER BY (doc_id * {mult}) % {PACK_MOD}) AS rn
            FROM documents
        )"""
    return {
        "domain_cap": "WITH " + ctes + """
        SELECT doc_id, source FROM r WHERE rn <= 10
        """,
        "domain_cap_stats": "WITH " + ctes + """
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(count(*) FILTER (WHERE rn <= 10) AS BIGINT)
                   AS n_kept,
               round(count(*) FILTER (WHERE rn <= 10)
                     / count(*)::DOUBLE, 6) AS kept_frac
        FROM r GROUP BY source
        """,
    }


def _dsir_sql() -> dict[str, str]:
    """X134 oracle: rebuild both add-1 unigram LMs (target = %10 slice,
    raw = whole corpus), replay the per-term log ratio and the SAME
    term-ordered fold the engine uses, round once to 1e-6."""
    ctes = """
        tokq AS (
            SELECT doc_id,
                   unnest(string_split_regex(lower(text), '[^a-z0-9]+'))
                       AS term
            FROM documents WHERE text IS NOT NULL
        ), tfq AS (
            SELECT doc_id, term, count(*) AS tf
            FROM tokq WHERE term <> '' GROUP BY 1, 2
        ), dlq AS (
            SELECT doc_id, sum(tf) AS doclen FROM tfq GROUP BY doc_id
        ), refct AS (
            SELECT term, sum(tf) AS cnt FROM tfq
            WHERE doc_id % 10 = 0 GROUP BY term
        ), tott AS (
            SELECT sum(cnt) AS t, count(*) AS v FROM refct
        ), lmt AS (
            SELECT term, log2((cnt + 1.0) / (t + v + 1.0)) AS lt
            FROM refct, tott
        ), oovt AS (
            SELECT log2(1.0 / (t + v + 1.0)) AS lt FROM tott
        ), refcr AS (
            SELECT term, sum(tf) AS cnt FROM tfq GROUP BY term
        ), totr AS (
            SELECT sum(cnt) AS t, count(*) AS v FROM refcr
        ), lmr AS (
            SELECT term, log2((cnt + 1.0) / (t + v + 1.0)) AS lr
            FROM refcr, totr
        ), oovr AS (
            SELECT log2(1.0 / (t + v + 1.0)) AS lr FROM totr
        ), contrib AS (
            SELECT tfq.doc_id, tfq.term, dlq.doclen,
                   tfq.tf * (coalesce(lmt.lt, oovt.lt)
                             - coalesce(lmr.lr, oovr.lr)) AS c
            FROM tfq JOIN dlq USING (doc_id)
            LEFT JOIN lmt USING (term)
            LEFT JOIN lmr USING (term), oovt, oovr
        ), w AS (
            SELECT doc_id, CAST(doclen AS BIGINT) AS n_tokens,
                   round(cum, 6) AS logratio
            FROM (
                SELECT doc_id, doclen,
                       sum(c) OVER (PARTITION BY doc_id ORDER BY term
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS cum,
                       row_number() OVER (PARTITION BY doc_id
                           ORDER BY term DESC) AS rn
                FROM contrib
            ) WHERE rn = 1
        )"""
    return {
        "dsir_weights": "WITH " + ctes + """
        SELECT doc_id, n_tokens, logratio FROM w
        """,
        "dsir_sample": "WITH " + ctes + """
        SELECT doc_id, n_tokens, logratio FROM w
        ORDER BY logratio DESC, doc_id ASC LIMIT 50
        """,
    }


def _base_oracle_sql() -> dict[str, str]:
    return {
        # NOTE on CASTs: DuckDB's sum(BIGINT)/list_sum returns HUGEINT,
        # which pandas (the driver's canonicalization path) renders as
        # float64 — breaking hash equality with Spark's int64 (and losing
        # integer precision above 2^53). Every aggregate sum is therefore
        # CAST back to BIGINT; all results fit int64 by construction.
        "wordcount": _TOK_CTE
        + "SELECT term, CAST(sum(tf) AS BIGINT) AS cnt FROM tf GROUP BY term",
        "document_frequency": _TOK_CTE
        + "SELECT term, df FROM dfreq",
        "doclen": _TOK_CTE
        + "SELECT doc_id, CAST(doclen AS BIGINT) AS doclen FROM dl",
        "tfidf_top5_per_doc": _TOK_CTE + """
        , scored AS (
            SELECT tf.doc_id, tf.term,
                   round(sqrt(tf.tf) * (1.0 + ln(scal.n_docs / (dfreq.df + 1.0))), 6) AS score
            FROM tf JOIN dfreq USING (term) CROSS JOIN scal
        ), ranked AS (
            SELECT doc_id, term, score,
                   CAST(row_number() OVER (
                       PARTITION BY doc_id ORDER BY score DESC, term ASC
                   ) AS INTEGER) AS rank
            FROM scored
        )
        SELECT doc_id, term, score, rank FROM ranked WHERE rank <= 5
        """,
        "bm25_topk_or": _BM25_BASE + """
        SELECT doc_id, score FROM agg
        ORDER BY score DESC, doc_id ASC LIMIT 10
        """,
        # tombstone deletion: stats stay pre-delete (full-corpus BM25
        # relation), only the candidate set loses the deleted docs —
        # exactly Lucene's delete-before-merge contract
        "engine_delete_search": _BM25_BASE + f"""
        SELECT doc_id, score FROM agg
        WHERE doc_id % {DELETE_MOD} <> 0
        ORDER BY score DESC, doc_id ASC LIMIT 10
        """,
        # dedup-driven mass delete: same pre-delete stats contract, the
        # candidate set restricted to exact-dedup survivors (min doc_id
        # per text group — NULL texts group together in both engines)
        "engine_dedup_delete_search": _BM25_BASE + """
        SELECT doc_id, score FROM agg
        WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY text)
        ORDER BY score DESC, doc_id ASC LIMIT 10
        """,
        # purge-at-compaction: the whole BM25 relation (tf/df/dl/scal)
        # recomputes over the LIVE corpus — the engine's compacted index
        # must score as if the deleted docs never existed
        "engine_delete_purge_search": _BM25_BASE.replace(
            "FROM documents WHERE text IS NOT NULL",
            f"FROM documents WHERE text IS NOT NULL "
            f"AND doc_id % {DELETE_MOD} <> 0",
        ).replace(
            "(SELECT count(*) FROM documents) AS n_docs",
            f"(SELECT count(*) FROM documents "
            f"WHERE doc_id % {DELETE_MOD} <> 0) AS n_docs",
        ) + """
        SELECT doc_id, score FROM agg
        ORDER BY score DESC, doc_id ASC LIMIT 10
        """,
        # identical oracle text: the indexed engine must reproduce the
        # naive scorer's answer exactly (build->encode->prune->WAND)
        # federated boolean oracle: fed ≡ union index, so the relation is
        # the union set-op tree — mer* OR (data AND NOT stream), prefix
        # expanded over the GLOBAL df table — plus the parity owner
        "engine_federated_boolean": _TOK_CTE + f"""
        , px AS (
            SELECT DISTINCT term FROM dfreq WHERE term LIKE 'mer%'
        ), matched AS (
            SELECT DISTINCT doc_id FROM tf
            WHERE term IN (SELECT term FROM px)
            UNION
            (SELECT doc_id FROM tf WHERE term = 'data'
             EXCEPT
             SELECT doc_id FROM tf WHERE term = 'stream')
        ), contrib AS (
            SELECT tf.doc_id, {_BM25_CONTRIB} AS c
            FROM tf
            JOIN dfreq USING (term)
            JOIN dl ON tf.doc_id = dl.doc_id
            CROSS JOIN scal
            WHERE tf.term IN (SELECT term FROM px) OR tf.term = 'data'
        ), agg AS (
            SELECT doc_id, round(sum(c), 6) AS score
            FROM contrib JOIN matched USING (doc_id)
            GROUP BY doc_id
        )
        SELECT CASE WHEN doc_id % 2 = 0 THEN 'even' ELSE 'odd' END AS src,
               doc_id, score FROM agg
        ORDER BY score DESC, doc_id ASC LIMIT 10
        """,
        # filter-context oracle: same BM25 relation, doc set restricted
        # by the metadata predicate via a join to the documents table
        "engine_filtered_search": _BM25_BASE + """
        SELECT a.doc_id, a.score FROM agg a
        JOIN documents d ON a.doc_id = d.doc_id
        WHERE d.lang = 'en'
        ORDER BY a.score DESC, a.doc_id ASC LIMIT 10
        """,
        "engine_range_search": _BM25_BASE + """
        SELECT a.doc_id, a.score FROM agg a
        JOIN documents d ON a.doc_id = d.doc_id
        WHERE d.n_chars BETWEEN 200 AND 450
        ORDER BY a.score DESC, a.doc_id ASC LIMIT 10
        """,
        "engine_sorted_search": _TOK_CTE + f"""
        SELECT d.doc_id, d.n_chars FROM documents d
        WHERE d.doc_id IN (
            SELECT DISTINCT doc_id FROM tf WHERE term IN {_TERMS_IN}
        )
        ORDER BY d.n_chars DESC, d.doc_id ASC LIMIT 15
        """,
        "engine_match_count": _TOK_CTE + """
        SELECT count(*) AS n_matches FROM (
            SELECT DISTINCT doc_id FROM tf
            WHERE term IN ('spark', 'query')
            INTERSECT
            SELECT DISTINCT doc_id FROM tf WHERE term = 'data'
        )
        """,
        "engine_cardinality": _TOK_CTE + f"""
        SELECT count(DISTINCT d.lang) AS lang_cardinality,
               count(DISTINCT d.source) AS source_cardinality
        FROM documents d
        WHERE d.doc_id IN (
            SELECT DISTINCT doc_id FROM tf WHERE term IN {_TERMS_IN}
        )
        """,
        # function_score oracle: the blend must multiply the UNROUNDED
        # BM25 sum (the engine rounds only at the driver projection), so
        # this reuses the raw contrib relation, not _BM25_BASE's rounded
        # agg; ln(1+x) is DuckDB's log1p
        "engine_function_score": _TOK_CTE + f"""
        , contrib AS (
            SELECT tf.doc_id, {_BM25_CONTRIB} AS c
            FROM tf JOIN dfreq USING (term)
            JOIN dl ON tf.doc_id = dl.doc_id
            CROSS JOIN scal
            WHERE tf.term IN {_TERMS_IN}
        ), aggr AS (
            SELECT doc_id, sum(c) AS bm25 FROM contrib GROUP BY doc_id
        ), fs AS (
            SELECT a.doc_id, a.bm25,
                   2.0 * ln(1 + 0.01 * d.n_chars) AS fn
            FROM aggr a JOIN documents d ON a.doc_id = d.doc_id
        )
        SELECT doc_id, round(bm25 * fn, 6) AS score,
               round(bm25, 6) AS bm25, round(fn, 6) AS fn
        FROM fs ORDER BY bm25 * fn DESC, doc_id ASC LIMIT 10
        """,
        "engine_term_vectors": _TOK_CTE + """
        SELECT tf.doc_id, tf.term, tf.tf,
               CAST(dl.doclen AS BIGINT) AS doclen, dfreq.df
        FROM tf
        JOIN dl ON tf.doc_id = dl.doc_id
        JOIN dfreq USING (term)
        WHERE tf.doc_id IN (0, 1, 2, 3, 4)
        ORDER BY tf.doc_id, tf.term
        """,
        "date_histogram": """
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
               count(*) AS n_events,
               round(sum(value), 6) AS sum_value,
               round(avg(value), 6) AS avg_value
        FROM events WHERE ts IS NOT NULL
        GROUP BY 1 ORDER BY 1
        """,
        # ingest pipeline (X151): every processor replayed as plain SQL
        "ingest_pipeline": """
        SELECT doc_id,
               'r5' AS pipeline_tag,
               source AS src,
               n_chars::DOUBLE AS n_chars_d,
               length(trim(regexp_replace(lower(text), '[aeiou]', '',
                                          'g'))) AS novowel_len,
               CAST(len(list_filter(
                   string_split_regex(lower(text), '[^a-z0-9]+'),
                   t -> t <> '')) AS BIGINT) AS n_toks
        FROM documents
        """,
        # weighted sampling (X149): replay u from the permutation,
        # ln(u)/w rounded once at 1e-6, (key desc, id asc) top-100
        "weighted_sample": _WS_SQL,
        # funnel (X146): the greedy-earliest chain as sequential
        # min-aggregate CTEs; converted = full chain within 24 h
        # (exact integer microseconds)
        "funnel": """
        WITH ev AS (
            SELECT user_id, event_type, ts FROM events
            WHERE ts IS NOT NULL AND user_id IS NOT NULL
        ), s0 AS (
            SELECT user_id, min(ts) AS t0 FROM ev
            WHERE event_type = 'view' GROUP BY user_id
        ), s1 AS (
            SELECT e.user_id, min(e.ts) AS t1
            FROM ev e JOIN s0 USING (user_id)
            WHERE e.event_type = 'click' AND e.ts >= s0.t0
            GROUP BY e.user_id
        ), s2 AS (
            SELECT e.user_id, min(e.ts) AS t2
            FROM ev e JOIN s1 USING (user_id)
            WHERE e.event_type = 'purchase' AND e.ts >= s1.t1
            GROUP BY e.user_id
        )
        SELECT s0.user_id,
               CAST(1 + (t1 IS NOT NULL)::INT + (t2 IS NOT NULL)::INT
                    AS BIGINT) AS steps_completed,
               t0 AS t_first,
               coalesce(t2, t1, t0) AS t_last,
               (t2 IS NOT NULL
                AND epoch_us(t2) - epoch_us(t0) <= 86400000000)
                   AS converted
        FROM s0 LEFT JOIN s1 USING (user_id)
        LEFT JOIN s2 USING (user_id)
        """,
        # retention (X147): first-event-day cohorts, distinct per-day
        # activity marks, the (cohort, offset) triangle
        "retention": """
        WITH ev AS (
            SELECT user_id, date_trunc('day', ts) AS p FROM events
            WHERE ts IS NOT NULL AND user_id IS NOT NULL
        ), first AS (
            SELECT user_id, min(p) AS cohort FROM ev GROUP BY user_id
        ), act AS (
            SELECT DISTINCT user_id, p FROM ev
        ), tri AS (
            SELECT f.cohort, datediff('day', f.cohort, a.p) AS offset,
                   a.user_id
            FROM act a JOIN first f USING (user_id)
            WHERE datediff('day', f.cohort, a.p) <= 7
        ), size_ AS (
            SELECT cohort, count(DISTINCT user_id) AS cohort_size
            FROM first GROUP BY cohort
        )
        SELECT CAST(t.cohort AS TIMESTAMP) AS cohort,
               CAST(t.offset AS BIGINT) AS offset,
               CAST(count(DISTINCT t.user_id) AS BIGINT) AS n_active,
               CAST(s.cohort_size AS BIGINT) AS cohort_size,
               round(count(DISTINCT t.user_id)
                     / s.cohort_size::DOUBLE, 6) AS retention
        FROM tri t JOIN size_ s USING (cohort)
        GROUP BY t.cohort, t.offset, s.cohort_size
        """,
        # hypertable rollup (X145): the oracle aggregates RAW events per
        # day — a MATCH certifies the hour→day tier fold is lossless
        "rollup_day": """
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
               count(*) AS n_events,
               round(sum(value), 6) AS sum_value,
               round(min(value), 6) AS min_value,
               round(max(value), 6) AS max_value,
               round(sum(value) / count(*), 6) AS avg_value
        FROM events WHERE ts IS NOT NULL
        GROUP BY 1 ORDER BY 1
        """,
        # as-of join (X143): DuckDB's NATIVE ASOF JOIN is the oracle —
        # an independent implementation of the same semantics
        "asof_join": """
        WITH clicks AS (
            SELECT event_id, user_id, ts, value FROM events
            WHERE event_type = 'click'
        ), views AS (
            SELECT user_id, ts, value FROM events
            WHERE event_type = 'view'
        )
        SELECT l.event_id, l.user_id, l.ts, l.value,
               r.ts AS ts_r, r.value AS value_r
        FROM clicks l ASOF LEFT JOIN views r
          ON l.user_id = r.user_id AND l.ts >= r.ts
        """,
        "asof_join_tolerance": """
        WITH clicks AS (
            SELECT event_id, user_id, ts, value FROM events
            WHERE event_type = 'click'
        ), views AS (
            SELECT user_id, ts, value FROM events
            WHERE event_type = 'view'
        ), m AS (
            SELECT l.event_id, l.user_id, l.ts, l.value,
                   r.ts AS ts_r, r.value AS value_r
            FROM clicks l ASOF LEFT JOIN views r
              ON l.user_id = r.user_id AND l.ts >= r.ts
        )
        SELECT event_id, user_id, ts, value,
               CASE WHEN epoch_us(ts) - epoch_us(ts_r) <= 7200000000
                    THEN ts_r END AS ts_r,
               CASE WHEN epoch_us(ts) - epoch_us(ts_r) <= 7200000000
                    THEN value_r END AS value_r
        FROM m
        """,
        # range join (X144): the oracle is the plain inequality join
        # the binned plan must reproduce exactly (inclusive band)
        "range_join": f"""
        WITH bands AS (
            SELECT * FROM (VALUES
                {', '.join(f"({lo!r}, {hi!r}, '{b}')"
                           for lo, hi, b in RANGE_BANDS)}
            ) AS v(lo, hi, band)
        )
        SELECT e.event_id, e.value, b.band
        FROM events e JOIN bands b
          ON e.value BETWEEN b.lo AND b.hi
        """,
        # auto_date_histogram (X138): replay the ladder walk on ACTUAL
        # distinct truncation counts (hour/day/week/month/quarter/year,
        # finest fitting <= 20 wins), then the chosen histogram
        "auto_date_histogram": """
        WITH c AS (
            SELECT count(DISTINCT date_trunc('hour', ts)) AS c_hour,
                   count(DISTINCT date_trunc('day', ts)) AS c_day,
                   count(DISTINCT date_trunc('week', ts)) AS c_week,
                   count(DISTINCT date_trunc('month', ts)) AS c_month,
                   count(DISTINCT date_trunc('quarter', ts)) AS c_quarter
            FROM events WHERE ts IS NOT NULL
        ), ch AS (
            SELECT CASE WHEN c_hour <= 20 THEN 'hour'
                        WHEN c_day <= 20 THEN 'day'
                        WHEN c_week <= 20 THEN 'week'
                        WHEN c_month <= 20 THEN 'month'
                        WHEN c_quarter <= 20 THEN 'quarter'
                        ELSE 'year' END AS iv
            FROM c
        )
        SELECT CAST(date_trunc(iv, ts) AS TIMESTAMP) AS bucket,
               count(*) AS n_events,
               round(sum(value), 6) AS sum_value,
               round(avg(value), 6) AS avg_value,
               iv AS interval
        FROM events, ch WHERE ts IS NOT NULL
        GROUP BY 1, iv ORDER BY 1
        """,
        # pipeline aggs (X93): the same three windowed derivations over
        # the date_histogram relation, same trailing-3 frame, same
        # sequential (bucket-ordered) IEEE accumulation
        "histogram_pipeline": """
        WITH h AS (
            SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
                   count(*) AS n_events,
                   round(sum(value), 6) AS sum_value,
                   round(avg(value), 6) AS avg_value
            FROM events WHERE ts IS NOT NULL GROUP BY 1
        )
        SELECT bucket, n_events, sum_value, avg_value,
               round(sum_value - lag(sum_value) OVER (ORDER BY bucket), 6)
                   AS derivative,
               round(sum(sum_value) OVER (ORDER BY bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
                   AS cumulative_sum,
               round(avg(sum_value) OVER (ORDER BY bucket
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6)
                   AS moving_avg
        FROM h ORDER BY bucket
        """,
        # bucket_selector + bucket_sort (X94): HAVING over the bucket
        # metrics, then sort/offset/limit with the same bucket-asc tie
        # break
        "histogram_top_buckets": """
        WITH h AS (
            SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
                   count(*) AS n_events,
                   round(sum(value), 6) AS sum_value,
                   round(avg(value), 6) AS avg_value
            FROM events WHERE ts IS NOT NULL GROUP BY 1
        )
        SELECT bucket, n_events, sum_value, avg_value FROM h
        WHERE n_events >= 10
        ORDER BY sum_value DESC, bucket ASC
        LIMIT 7 OFFSET 2
        """,
        # sibling pipeline aggs (X104): cross-bucket stats over the same
        # histogram relation; extreme keys via ordered scalar subqueries
        # (ties pinned bucket-asc, the engine's contract)
        "histogram_stats": """
        WITH h AS (
            SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
                   round(sum(value), 6) AS sum_value
            FROM events WHERE ts IS NOT NULL GROUP BY 1
        )
        SELECT CAST(count(sum_value) AS BIGINT) AS n_buckets,
               round(min(sum_value), 6) AS min_value,
               round(max(sum_value), 6) AS max_value,
               round(avg(sum_value), 6) AS avg_value,
               round(sum(sum_value), 6) AS sum_value,
               (SELECT bucket FROM h
                WHERE sum_value = (SELECT min(sum_value) FROM h)
                ORDER BY bucket LIMIT 1) AS min_bucket,
               (SELECT bucket FROM h
                WHERE sum_value = (SELECT max(sum_value) FROM h)
                ORDER BY bucket LIMIT 1) AS max_bucket
        FROM h
        """,
        # date math (X107): bounds re-derived with interval arithmetic
        # against the same pinned now — independent of the resolver
        "events_date_math": """
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               round(sum(value), 6) AS sum_value
        FROM events
        WHERE ts >= date_trunc('day',
                  TIMESTAMP '2024-01-28 12:30:00' - INTERVAL 20 DAY)
          AND ts <  date_trunc('day',
                  TIMESTAMP '2024-01-28 12:30:00' - INTERVAL 5 DAY)
        GROUP BY event_type ORDER BY event_type
        """,
        # session windows (X110): lag + cumulative break flag, new
        # session only on a STRICTLY larger gap (Spark's closed
        # boundary), end = last event + gap
        "events_sessions": """
        WITH e AS (
            SELECT user_id, ts,
                   CAST(round(value * 1000000) AS BIGINT) AS micros
            FROM events WHERE ts IS NOT NULL
        ), m AS (
            SELECT user_id, ts, micros,
                   CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS brk
            FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ), s AS (
            SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                ROWS UNBOUNDED PRECEDING) AS sid
            FROM m
        )
        SELECT user_id,
               min(ts) AS session_start,
               max(ts) + INTERVAL 30 MINUTE AS session_end,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(micros) AS BIGINT) AS value_micros
        FROM s GROUP BY user_id, sid
        """,
        # normalize pipeline (X113): z-score with population stddev
        # across the sibling buckets
        "histogram_normalize": """
        WITH h AS (
            SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
                   count(*) AS n_events,
                   round(sum(value), 6) AS sum_value,
                   round(avg(value), 6) AS avg_value
            FROM events WHERE ts IS NOT NULL GROUP BY 1
        )
        SELECT bucket, n_events, sum_value, avg_value,
               round(CASE WHEN stddev_pop(sum_value) OVER () <> 0 THEN
                   (sum_value - avg(sum_value) OVER ())
                       / stddev_pop(sum_value) OVER ()
               END, 6) AS normalized
        FROM h ORDER BY bucket
        """,
        # serial_diff (X117): lag-7 window difference over the same
        # histogram relation
        "histogram_serial_diff": """
        WITH h AS (
            SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
                   count(*) AS n_events,
                   round(sum(value), 6) AS sum_value,
                   round(avg(value), 6) AS avg_value
            FROM events WHERE ts IS NOT NULL GROUP BY 1
        )
        SELECT bucket, n_events, sum_value, avg_value,
               round(sum_value - lag(sum_value, 7) OVER (ORDER BY bucket),
                     6) AS serial_diff
        FROM h ORDER BY bucket
        """,
        "engine_did_you_mean": _DYM_SQL,
        # passage oracle: the whole MaxP relation in SQL — chunk windows
        # (same arithmetic as the chunk_documents oracle), BM25 over the
        # CHUNK corpus, best chunk per doc, global cut
        "passage_search": f"""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                               t -> t <> '') AS ts
            FROM documents
        ), counted AS (
            SELECT doc_id, ts,
                   CASE WHEN len(ts) <= 0 THEN 0
                        ELSE CAST(floor(greatest(len(ts) - {CHUNK_TOKENS}, 0)
                                        / {CHUNK_TOKENS - CHUNK_OVERLAP})
                                  AS BIGINT) + 1
                             + CASE WHEN len(ts) > {CHUNK_TOKENS}
                                     AND (len(ts) - {CHUNK_TOKENS})
                                         % {CHUNK_TOKENS - CHUNK_OVERLAP} > 0
                                    THEN 1 ELSE 0 END
                   END AS n_chunks
            FROM toks
        ), chunks AS (
            SELECT doc_id, CAST(chunk_id AS INTEGER) AS chunk_id,
                   ts[chunk_id * {CHUNK_TOKENS - CHUNK_OVERLAP} + 1
                      : chunk_id * {CHUNK_TOKENS - CHUNK_OVERLAP}
                        + {CHUNK_TOKENS}] AS w
            FROM (SELECT doc_id, ts,
                         unnest(generate_series(
                             0, CAST(n_chunks AS INTEGER) - 1)) AS chunk_id
                  FROM counted WHERE n_chunks > 0)
        ), cstat AS (
            SELECT count(*) AS nc, avg(len(w)) AS avgdl FROM chunks
        ), ctok AS (
            SELECT doc_id, chunk_id, len(w) AS dl, unnest(w) AS term
            FROM chunks
        ), ctf AS (
            SELECT doc_id, chunk_id, dl, term, count(*) AS tf
            FROM ctok WHERE term IN {_TERMS_IN}
            GROUP BY doc_id, chunk_id, dl, term
        ), cdf AS (
            SELECT term, count(*) AS df FROM ctf GROUP BY term
        ), cscore AS (
            SELECT c.doc_id, c.chunk_id,
                   sum(ln(1.0 + (s.nc - d.df + 0.5) / (d.df + 0.5))
                       * c.tf * {BM25_K1 + 1.0}
                       / (c.tf + {BM25_K1} * (1.0 - {BM25_B}
                          + {BM25_B} * c.dl / s.avgdl))) AS score
            FROM ctf c JOIN cdf d USING (term) CROSS JOIN cstat s
            GROUP BY c.doc_id, c.chunk_id
        ), best AS (
            SELECT doc_id, chunk_id, score,
                   row_number() OVER (PARTITION BY doc_id
                       ORDER BY score DESC, chunk_id ASC) AS rn
            FROM cscore
        )
        SELECT doc_id, chunk_id, round(score, 6) AS score FROM best
        WHERE rn = 1 ORDER BY score DESC, doc_id ASC LIMIT 10
        """,
        # federated oracle: global stats make the two-index federation
        # score-identical to the union index, so the relation is the same
        # full-corpus BM25 agg; the owning index is the parity split
        "engine_federated_search": _BM25_BASE + """
        SELECT CASE WHEN doc_id % 2 = 0 THEN 'even' ELSE 'odd' END AS src,
               doc_id, score FROM agg
        ORDER BY score DESC, doc_id ASC LIMIT 10
        """,
        "engine_indexed_bm25_simple": _BM25_BASE + """
        SELECT doc_id, score FROM agg
        ORDER BY score DESC, doc_id ASC LIMIT 10
        """,
        # X152 metric aggs: exact percentiles / length stats / the
        # char-ordered entropy fold over the same OR match set
        "engine_mad": _TOK_CTE + f"""
        , matched AS (
            SELECT DISTINCT doc_id FROM tf WHERE term IN {_TERMS_IN}
        ), vals AS (
            SELECT n_chars FROM documents JOIN matched USING (doc_id)
            WHERE n_chars IS NOT NULL
        ), med AS (
            SELECT quantile_cont(n_chars, 0.5) AS m FROM vals
        )
        SELECT round(m, 6) AS median,
               round((SELECT quantile_cont(abs(n_chars - med.m), 0.5)
                      FROM vals), 6) AS mad
        FROM med
        """,
        "engine_boxplot": _TOK_CTE + f"""
        , matched AS (
            SELECT DISTINCT doc_id FROM tf WHERE term IN {_TERMS_IN}
        ), vals AS (
            SELECT n_chars FROM documents JOIN matched USING (doc_id)
            WHERE n_chars IS NOT NULL
        )
        SELECT round(min(n_chars)::DOUBLE, 6) AS min_value,
               round(quantile_cont(n_chars, 0.25), 6) AS q1,
               round(quantile_cont(n_chars, 0.5), 6) AS q2,
               round(quantile_cont(n_chars, 0.75), 6) AS q3,
               round(max(n_chars)::DOUBLE, 6) AS max_value
        FROM vals
        """,
        "engine_string_stats": _TOK_CTE + f"""
        , matched AS (
            SELECT DISTINCT doc_id FROM tf WHERE term IN {_TERMS_IN}
        ), vals AS (
            SELECT source FROM documents JOIN matched USING (doc_id)
            WHERE source IS NOT NULL
        ), lens AS (
            SELECT CAST(count(*) AS BIGINT) AS count,
                   CAST(min(length(source)) AS BIGINT) AS min_length,
                   CAST(max(length(source)) AS BIGINT) AS max_length,
                   round(avg(length(source)), 6) AS avg_length
            FROM vals
        ), chars AS (
            SELECT substring(source, i, 1) AS ch, count(*) AS n
            FROM vals, unnest(generate_series(1, length(source)))
                 AS t(i)
            GROUP BY 1
        ), ent AS (
            SELECT round(c, 6) AS entropy FROM (
                SELECT sum(-(n / (SELECT sum(n) FROM chars)::DOUBLE)
                           * log2(n / (SELECT sum(n)
                                       FROM chars)::DOUBLE))
                       OVER (ORDER BY ch ROWS BETWEEN UNBOUNDED
                             PRECEDING AND CURRENT ROW) AS c,
                       row_number() OVER (ORDER BY ch DESC) AS rn
                FROM chars
            ) WHERE rn = 1
        )
        SELECT * FROM lens, ent
        """,
        # percentile_ranks (X135): exact discrete rank over the OR
        # match set — 100 * count(<= v) / count per requested value
        "engine_percentile_ranks": _TOK_CTE + f"""
        , matched AS (
            SELECT DISTINCT doc_id FROM tf WHERE term IN {_TERMS_IN}
        ), vals AS (
            SELECT n_chars FROM documents JOIN matched USING (doc_id)
            WHERE n_chars IS NOT NULL
        )
        SELECT round(100.0 * sum(CASE WHEN n_chars <= 300 THEN 1
                                      ELSE 0 END) / count(*), 6)
                   AS rank_300,
               round(100.0 * sum(CASE WHEN n_chars <= 500 THEN 1
                                      ELSE 0 END) / count(*), 6)
                   AS rank_500,
               round(100.0 * sum(CASE WHEN n_chars <= 900 THEN 1
                                      ELSE 0 END) / count(*), 6)
                   AS rank_900
        FROM vals
        """,
        # search template (X119): rendering is semantics-preserving =>
        # the LITERAL boolean query's relation
        "engine_search_template": _TOK_CTE + f"""
        , stream_s AS (
            SELECT doc_id,
                   ' ' || array_to_string(list_filter(
                       string_split_regex(lower(text), '[^a-z0-9]+'),
                       t -> t <> ''), ' ') || ' ' AS s
            FROM documents WHERE text IS NOT NULL
        ), or_docs AS (
            SELECT doc_id FROM stream_s WHERE s LIKE '% table scan %'
            UNION
            SELECT doc_id FROM tf WHERE term = 'merge'
        ), matched AS (
            SELECT doc_id FROM or_docs
            INTERSECT
            SELECT doc_id FROM tf WHERE term = 'data'
            EXCEPT
            SELECT doc_id FROM tf WHERE term = 'stream'
        ), contrib AS (
            SELECT tf.doc_id, {_BM25_CONTRIB} AS c
            FROM tf
            JOIN dfreq USING (term)
            JOIN dl ON tf.doc_id = dl.doc_id
            CROSS JOIN scal
            WHERE tf.term IN ('data', 'merge', 'scan', 'table')
        ), agg AS (
            SELECT doc_id, round(sum(c), 6) AS score
            FROM contrib JOIN matched USING (doc_id)
            GROUP BY doc_id
        )
        SELECT doc_id, score FROM agg
        ORDER BY score DESC, doc_id ASC LIMIT 10
        """,
        # delete_by_query (X118): the full-corpus relation minus every
        # doc containing the deleted query's term (stats pre-delete)
        "engine_delete_by_query": _BM25_BASE + """
        SELECT doc_id, score FROM agg
        WHERE doc_id NOT IN (
            SELECT doc_id FROM tf WHERE term = 'stream')
        ORDER BY score DESC, doc_id ASC LIMIT 10
        """,
        # snapshot/restore (X105): lossless restore => the restored
        # index answers exactly like the never-deleted corpus
        "engine_snapshot_restore": _BM25_BASE + """
        SELECT doc_id, score FROM agg
        ORDER BY score DESC, doc_id ASC LIMIT 10
        """,
        # alias cutover (X109): post-swap resolution => the FULL-corpus
        # relation (a stale alias would answer from the half index)
        "engine_alias_search": _BM25_BASE + """
        SELECT doc_id, score FROM agg
        ORDER BY score DESC, doc_id ASC LIMIT 10
        """,
        "bm25_topk_and": _BM25_BASE + f"""
        SELECT doc_id, score FROM agg WHERE matched = {len(BM25_QUERY_TERMS)}
        ORDER BY score DESC, doc_id ASC LIMIT 10
        """,
        # phrase oracle: the normalized token stream re-joined with single
        # spaces makes contiguous-token matching a plain LIKE — computed
        # from the raw text, fully independent of the positional codec /
        # adjacency kernel it checks. Scoring = BM25 sum of the phrase's
        # DISTINCT terms over matching docs (same contrib formula the
        # already-green bm25 oracles use).
        "engine_phrase_search": _TOK_CTE + f"""
        , stream AS (
            SELECT doc_id,
                   ' ' || array_to_string(list_filter(
                       string_split_regex(lower(text), '[^a-z0-9]+'),
                       t -> t <> ''), ' ') || ' ' AS s
            FROM documents WHERE text IS NOT NULL
        ), phrase_docs AS (
            SELECT doc_id FROM stream
            WHERE s LIKE '% {' '.join(PHRASE_QUERY)} %'
        ), contrib AS (
            SELECT tf.doc_id, {_BM25_CONTRIB} AS c
            FROM tf
            JOIN dfreq USING (term)
            JOIN dl ON tf.doc_id = dl.doc_id
            CROSS JOIN scal
            WHERE tf.term IN ('{"', '".join(sorted(set(PHRASE_QUERY)))}')
        ), agg AS (
            SELECT doc_id, round(sum(c), 6) AS score
            FROM contrib JOIN phrase_docs USING (doc_id)
            GROUP BY doc_id
        )
        SELECT doc_id, score FROM agg
        ORDER BY score DESC, doc_id ASC LIMIT 10
        """,
        # match_phrase_prefix (X139): expansions enumerated from the
        # token stream, per-variant phrase match via the stream LIKE,
        # per-variant score = fixed + alt contributions (two doubles —
        # commutative, so the engine's sorted-term fold agrees), doc
        # score = max over matching variants, rounded once
        "engine_phrase_prefix": _TOK_CTE + f"""
        , stream AS (
            SELECT doc_id,
                   ' ' || array_to_string(list_filter(
                       string_split_regex(lower(text), '[^a-z0-9]+'),
                       t -> t <> ''), ' ') || ' ' AS s
            FROM documents WHERE text IS NOT NULL
        ), alts AS (
            SELECT term FROM dfreq WHERE term LIKE 's%'
        ), m AS (
            SELECT st.doc_id, a.term
            FROM stream st JOIN alts a
              ON st.s LIKE '% table ' || a.term || ' %'
        ), fixedc AS (
            SELECT tf.doc_id, {_BM25_CONTRIB} AS c
            FROM tf JOIN dfreq USING (term)
            JOIN dl ON tf.doc_id = dl.doc_id
            CROSS JOIN scal WHERE tf.term = 'table'
        ), altc AS (
            SELECT tf.doc_id, tf.term, {_BM25_CONTRIB} AS c
            FROM tf JOIN dfreq USING (term)
            JOIN dl ON tf.doc_id = dl.doc_id
            CROSS JOIN scal WHERE tf.term LIKE 's%'
        ), best AS (
            SELECT m.doc_id, round(max(f.c + a.c), 6) AS score
            FROM m
            JOIN fixedc f ON m.doc_id = f.doc_id
            JOIN altc a ON m.doc_id = a.doc_id AND m.term = a.term
            GROUP BY m.doc_id
        )
        SELECT doc_id, score FROM best
        ORDER BY score DESC, doc_id ASC LIMIT 10
        """,
        # proximity oracle: per-term 0-based token positions via
        # generate_subscripts; for the two distinct query terms, "some
        # window+1-position span contains both" is exactly |p1-p2| <=
        # window. Independent of the kernel's composite-key probing.
        "engine_proximity_search": _TOK_CTE + f"""
        , tk AS (
            SELECT doc_id, list_filter(
                string_split_regex(lower(text), '[^a-z0-9]+'),
                t -> t <> '') AS tk
            FROM documents WHERE text IS NOT NULL
        ), poss AS (
            SELECT doc_id, unnest(tk) AS term,
                   generate_subscripts(tk, 1) - 1 AS p
            FROM tk
        ), prox_docs AS (
            SELECT DISTINCT a.doc_id
            FROM (SELECT doc_id, p FROM poss WHERE term = '{PROX_TERMS[0]}') a
            JOIN (SELECT doc_id, p FROM poss WHERE term = '{PROX_TERMS[1]}') b
              USING (doc_id)
            WHERE abs(a.p - b.p) <= {PROX_WINDOW}
        ), contrib AS (
            SELECT tf.doc_id, {_BM25_CONTRIB} AS c
            FROM tf
            JOIN dfreq USING (term)
            JOIN dl ON tf.doc_id = dl.doc_id
            CROSS JOIN scal
            WHERE tf.term IN ('{PROX_TERMS[0]}', '{PROX_TERMS[1]}')
        ), agg AS (
            SELECT doc_id, round(sum(c), 6) AS score
            FROM contrib JOIN prox_docs USING (doc_id)
            GROUP BY doc_id
        )
        SELECT doc_id, score FROM agg
        ORDER BY score DESC, doc_id ASC LIMIT 10
        """,
        # boolean oracle: the query tree ("table scan" OR merge) AND data
        # NOT stream evaluated with SQL set ops — INTERSECT binds tighter
        # than EXCEPT, so or_docs INTERSECT data EXCEPT stream is exactly
        # (or ∩ data) \ stream. Scoring = BM25 sum of the positive terms.
        "engine_boolean_search": _TOK_CTE + f"""
        , stream_s AS (
            SELECT doc_id,
                   ' ' || array_to_string(list_filter(
                       string_split_regex(lower(text), '[^a-z0-9]+'),
                       t -> t <> ''), ' ') || ' ' AS s
            FROM documents WHERE text IS NOT NULL
        ), or_docs AS (
            SELECT doc_id FROM stream_s WHERE s LIKE '% table scan %'
            UNION
            SELECT doc_id FROM tf WHERE term = 'merge'
        ), matched AS (
            SELECT doc_id FROM or_docs
            INTERSECT
            SELECT doc_id FROM tf WHERE term = 'data'
            EXCEPT
            SELECT doc_id FROM tf WHERE term = 'stream'
        ), contrib AS (
            SELECT tf.doc_id, {_BM25_CONTRIB} AS c
            FROM tf
            JOIN dfreq USING (term)
            JOIN dl ON tf.doc_id = dl.doc_id
            CROSS JOIN scal
            WHERE tf.term IN ('data', 'merge', 'scan', 'table')
        ), agg AS (
            SELECT doc_id, round(sum(c), 6) AS score
            FROM contrib JOIN matched USING (doc_id)
            GROUP BY doc_id
        )
        SELECT doc_id, score FROM agg
        ORDER BY score DESC, doc_id ASC LIMIT 10
        """,
        # ltr_features oracle: per-query BM25 relation from the token
        # stream, ROW_NUMBER rank on the rounded score, every feature
        # (tf sums, idf mass, length signals) recomputed independently.
        "engine_ltr_features": _TOK_CTE + f"""
        , qt AS (
            SELECT * FROM (VALUES
                ('q0', 'spark'), ('q0', 'query'), ('q0', 'data'),
                ('q1', 'table'), ('q1', 'scan'), ('q1', 'merge')
            ) AS v(query_id, term)
        ), contrib AS (
            SELECT qt.query_id, tf.doc_id,
                   {_BM25_CONTRIB} AS c,
                   tf.tf AS tf, dfreq.df AS df, dl.doclen AS doclen,
                   ln(1.0 + (scal.n_docs - dfreq.df + 0.5)
                      / (dfreq.df + 0.5)) AS idf
            FROM tf
            JOIN qt USING (term)
            JOIN dfreq USING (term)
            JOIN dl ON tf.doc_id = dl.doc_id
            CROSS JOIN scal
        ), agg AS (
            SELECT query_id, doc_id,
                   round(sum(c), 6) AS bm25,
                   count(*) AS matched_terms,
                   CAST(sum(tf) AS BIGINT) AS tf_sum,
                   CAST(max(tf) AS BIGINT) AS tf_max,
                   round(sum(idf), 6) AS idf_sum,
                   CAST(max(doclen) AS BIGINT) AS doclen
            FROM contrib GROUP BY query_id, doc_id
        ), ranked AS (
            SELECT *, ROW_NUMBER() OVER (
                       PARTITION BY query_id
                       ORDER BY bm25 DESC, doc_id ASC) AS rank
            FROM agg QUALIFY rank <= {LTR_K}
        )
        SELECT query_id, doc_id, CAST(rank AS BIGINT) AS rank, bm25,
               matched_terms, tf_sum, tf_max, idf_sum, doclen,
               round(doclen / (SELECT avgdl FROM scal), 6) AS dl_ratio
        FROM ranked
        """,
        # LTR model application (X141): the same feature relation, the
        # model arithmetic replayed in weight-NAME-sorted fold order
        # (bm25, dl_ratio, idf_sum, tf_max — left-to-right), re-ranked
        "engine_ltr_rescore": _TOK_CTE + f"""
        , qt AS (
            SELECT * FROM (VALUES
                ('q0', 'spark'), ('q0', 'query'), ('q0', 'data'),
                ('q1', 'table'), ('q1', 'scan'), ('q1', 'merge')
            ) AS v(query_id, term)
        ), contrib AS (
            SELECT qt.query_id, tf.doc_id,
                   {_BM25_CONTRIB} AS c,
                   tf.tf AS tf, dl.doclen AS doclen,
                   ln(1.0 + (scal.n_docs - dfreq.df + 0.5)
                      / (dfreq.df + 0.5)) AS idf
            FROM tf
            JOIN qt USING (term)
            JOIN dfreq USING (term)
            JOIN dl ON tf.doc_id = dl.doc_id
            CROSS JOIN scal
        ), agg AS (
            SELECT query_id, doc_id,
                   round(sum(c), 6) AS bm25,
                   CAST(max(tf) AS BIGINT) AS tf_max,
                   round(sum(idf), 6) AS idf_sum,
                   CAST(max(doclen) AS BIGINT) AS doclen
            FROM contrib GROUP BY query_id, doc_id
        ), cand AS (
            SELECT *, ROW_NUMBER() OVER (
                       PARTITION BY query_id
                       ORDER BY bm25 DESC, doc_id ASC) AS rank
            FROM agg QUALIFY rank <= {LTR_K}
        ), scored AS (
            SELECT query_id, doc_id,
                   round(0.1
                       + 1.0 * bm25
                       + (-0.5) * round(doclen
                             / (SELECT avgdl FROM scal), 6)
                       + 0.2 * idf_sum
                       + 0.05 * tf_max, 6) AS model_score
            FROM cand
        )
        SELECT query_id, doc_id, model_score,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY query_id
                   ORDER BY model_score DESC, doc_id ASC) AS BIGINT)
                   AS rank
        FROM scored QUALIFY rank <= 10
        """,
        # dedup_spans oracle: exact shingle STRINGS (no hashes) through
        # the same count/rank windows and gaps-and-islands merge — an
        # engine/oracle MATCH also certifies zero xxhash64 collisions.
        "dedup_spans": f"""
        WITH toksl AS (
            SELECT doc_id, list_filter(
                string_split_regex(lower(text), '[^a-z0-9]+'),
                t -> t <> '') AS l
            FROM documents WHERE text IS NOT NULL
        ), occ AS (
            SELECT doc_id, i - 1 AS start,
                   array_to_string(l[i:i+{SPAN_N - 1}], ' ') AS s
            FROM toksl,
                 unnest(generate_series(
                     1, greatest(len(l) - {SPAN_N - 1}, 0))) AS t(i)
        ), ann AS (
            SELECT doc_id, start,
                   count(*) OVER (PARTITION BY s) AS c,
                   ROW_NUMBER() OVER (
                       PARTITION BY s ORDER BY doc_id, start) AS rn
            FROM occ
        ), dup AS (
            SELECT doc_id, start FROM ann WHERE c > 1 AND rn > 1
        ), isl AS (
            SELECT doc_id, start,
                   CASE WHEN coalesce(max(start + {SPAN_N}) OVER (
                            PARTITION BY doc_id ORDER BY start
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING),
                            -1) < start
                        THEN 1 ELSE 0 END AS brk
            FROM dup
        ), grp AS (
            SELECT doc_id, start,
                   sum(brk) OVER (
                       PARTITION BY doc_id ORDER BY start
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS island
            FROM isl
        )
        SELECT doc_id,
               CAST(min(start) AS BIGINT) AS span_start,
               CAST(max(start) + {SPAN_N} AS BIGINT) AS span_end,
               count(*) AS n_shingles
        FROM grp GROUP BY doc_id, island
        """,
        # rank_eval oracle: metrics rebuilt from the independent BM25
        # relation — ROW_NUMBER ranks on the rounded score (same
        # tiebreak), judgments re-derived as count(DISTINCT term),
        # DCG/IDCG/MRR/precision/recall with window + CASE arithmetic.
        "engine_rank_eval": _BM25_BASE + f"""
        , res AS (
            SELECT doc_id,
                   ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC)
                       AS rank
            FROM agg QUALIFY rank <= 10
        ), jud AS (
            SELECT doc_id, count(DISTINCT term) AS grade
            FROM tf WHERE term IN {_TERMS_IN} GROUP BY doc_id
        ), j AS (
            SELECT r.rank, coalesce(g.grade, 0) AS grade
            FROM res r LEFT JOIN jud g USING (doc_id)
        ), m AS (
            SELECT count(*) AS retrieved,
                   sum(CASE WHEN grade > 0 THEN 1 ELSE 0 END) AS hits,
                   min(CASE WHEN grade > 0 THEN rank END) AS fr,
                   sum((pow(2, grade) - 1) / log2(rank + 1)) AS dcg
            FROM j
        ), ideal AS (
            SELECT grade,
                   ROW_NUMBER() OVER (ORDER BY grade DESC, doc_id ASC)
                       AS rn
            FROM jud WHERE grade > 0 QUALIFY rn <= 10
        ), i AS (
            SELECT sum((pow(2, grade) - 1) / log2(rn + 1)) AS idcg,
                   (SELECT count(*) FROM jud WHERE grade > 0)
                       AS total_rel
            FROM ideal
        )
        SELECT 'q0' AS query_id,
               CAST(retrieved AS BIGINT) AS retrieved,
               CAST(hits AS BIGINT) AS relevant_retrieved,
               round(hits * 1.0 / retrieved, 6) AS precision_at_k,
               round(CASE WHEN total_rel > 0
                     THEN hits * 1.0 / total_rel END, 6) AS recall_at_k,
               round(coalesce(1.0 / fr, 0.0), 6) AS mrr,
               round(CASE WHEN idcg > 0 THEN dcg / idcg END, 6)
                   AS ndcg_at_k
        FROM m CROSS JOIN i
        """,
        # highlight oracle: the boolean match relation, then the ±3
        # window around the first positive-term occurrence rebuilt with
        # list_position / INCLUSIVE DuckDB list slicing / list_transform
        # — independent of the engine's array_position/slice exprs.
        "engine_highlight": _TOK_CTE + """
        , stream_s AS (
            SELECT doc_id,
                   ' ' || array_to_string(list_filter(
                       string_split_regex(lower(text), '[^a-z0-9]+'),
                       t -> t <> ''), ' ') || ' ' AS s
            FROM documents WHERE text IS NOT NULL
        ), or_docs AS (
            SELECT doc_id FROM stream_s WHERE s LIKE '% table scan %'
            UNION
            SELECT doc_id FROM tf WHERE term = 'merge'
        ), matched AS (
            SELECT doc_id FROM or_docs
            INTERSECT
            SELECT doc_id FROM tf WHERE term = 'data'
            EXCEPT
            SELECT doc_id FROM tf WHERE term = 'stream'
        ), toksl AS (
            SELECT doc_id, list_filter(
                string_split_regex(lower(text), '[^a-z0-9]+'),
                t -> t <> '') AS l
            FROM documents WHERE text IS NOT NULL
        ), fp AS (
            SELECT m.doc_id, l,
                least(
                    coalesce(nullif(list_position(l, 'table'), 0),
                             2000000000),
                    coalesce(nullif(list_position(l, 'scan'), 0),
                             2000000000),
                    coalesce(nullif(list_position(l, 'merge'), 0),
                             2000000000),
                    coalesce(nullif(list_position(l, 'data'), 0),
                             2000000000)
                ) AS f1
            FROM matched m JOIN toksl USING (doc_id)
        )
        SELECT doc_id,
               CAST(f1 - 1 AS BIGINT) AS first_pos,
               array_to_string(
                   list_transform(
                       l[greatest(f1 - 3, 1):least(f1 + 3, len(l))],
                       t -> CASE WHEN t IN ('table', 'scan', 'merge',
                                            'data')
                            THEN '<em>' || t || '</em>' ELSE t END),
                   ' ') AS snippet
        FROM fp WHERE f1 < 2000000000
        """,
        # prefix oracle: s* AND window. The LIKE relation is exact because
        # the sf-vocabulary's s-prefix terms (6) fit the engine's
        # 64-expansion cap — scoring sums the expanded terms plus the
        # AND-ed term.
        "engine_prefix_search": _TOK_CTE + f"""
        , matched AS (
            SELECT DISTINCT doc_id FROM tf WHERE term LIKE 's%'
            INTERSECT
            SELECT doc_id FROM tf WHERE term = 'window'
        ), contrib AS (
            SELECT tf.doc_id, {_BM25_CONTRIB} AS c
            FROM tf
            JOIN dfreq USING (term)
            JOIN dl ON tf.doc_id = dl.doc_id
            CROSS JOIN scal
            WHERE tf.term LIKE 's%' OR tf.term = 'window'
        ), agg AS (
            SELECT doc_id, round(sum(c), 6) AS score
            FROM contrib JOIN matched USING (doc_id)
            GROUP BY doc_id
        )
        SELECT doc_id, score FROM agg
        ORDER BY score DESC, doc_id ASC LIMIT 10
        """,
        # fuzzy oracle: slot~2 AND group. The expansion relation (terms
        # within Levenshtein distance 2, length-banded exactly like the
        # engine) is exact because the vocabulary's matches (2) fit the
        # 64-expansion cap; DuckDB's levenshtein is an independent
        # implementation of the same ins/del/sub distance.
        # gram-tier fuzzy: same independent-levenshtein relation, engine
        # side served by the bigram count-filter table — output-invisible
        "engine_fuzzy_gramtier": _TOK_CTE + f"""
        , fz AS (
            SELECT DISTINCT term FROM dfreq
            WHERE abs(length(term) - 6) <= 2
              AND levenshtein(term, 'vektor') <= 2
        ), matched AS (
            SELECT DISTINCT doc_id FROM tf WHERE term IN (SELECT term FROM fz)
            INTERSECT
            SELECT DISTINCT doc_id FROM tf WHERE term = 'data'
        ), contrib AS (
            SELECT tf.doc_id, {_BM25_CONTRIB} AS c
            FROM tf
            JOIN dfreq USING (term)
            JOIN dl ON tf.doc_id = dl.doc_id
            CROSS JOIN scal
            WHERE tf.term IN (SELECT term FROM fz) OR tf.term = 'data'
        ), agg AS (
            SELECT doc_id, round(sum(c), 6) AS score
            FROM contrib JOIN matched USING (doc_id)
            GROUP BY doc_id
        )
        SELECT doc_id, score FROM agg
        ORDER BY score DESC, doc_id ASC LIMIT 10
        """,
        "engine_fuzzy_search": _TOK_CTE + f"""
        , fz AS (
            SELECT DISTINCT term FROM dfreq
            WHERE abs(length(term) - 4) <= 2
              AND levenshtein(term, 'slot') <= 2
        ), matched AS (
            SELECT DISTINCT doc_id FROM tf WHERE term IN (SELECT term FROM fz)
            INTERSECT
            SELECT doc_id FROM tf WHERE term = 'group'
        ), contrib AS (
            SELECT tf.doc_id, {_BM25_CONTRIB} AS c
            FROM tf
            JOIN dfreq USING (term)
            JOIN dl ON tf.doc_id = dl.doc_id
            CROSS JOIN scal
            WHERE tf.term IN (SELECT term FROM fz) OR tf.term = 'group'
        ), agg AS (
            SELECT doc_id, round(sum(c), 6) AS score
            FROM contrib JOIN matched USING (doc_id)
            GROUP BY doc_id
        )
        SELECT doc_id, score FROM agg
        ORDER BY score DESC, doc_id ASC LIMIT 10
        """,
        # boost oracle: table^3 OR (scan AND data)^0.5 OR merge — match
        # set via SQL set ops (boosts never change it), each term's BM25
        # contribution scaled by an explicit weight table (engine folds
        # the same weights into its idf table; multiplication grouping
        # differs by at most ulps, absorbed by round 6 like every other
        # float oracle here)
        "engine_boost_search": _TOK_CTE + f"""
        , matched AS (
            SELECT doc_id FROM tf WHERE term = 'table'
            UNION
            (SELECT doc_id FROM tf WHERE term = 'scan'
             INTERSECT
             SELECT doc_id FROM tf WHERE term = 'data')
            UNION
            SELECT doc_id FROM tf WHERE term = 'merge'
        ), contrib AS (
            SELECT tf.doc_id,
                   (CASE tf.term WHEN 'table' THEN 3.0
                                 WHEN 'scan' THEN 0.5
                                 WHEN 'data' THEN 0.5
                                 ELSE 1.0 END) * ({_BM25_CONTRIB}) AS c
            FROM tf
            JOIN dfreq USING (term)
            JOIN dl ON tf.doc_id = dl.doc_id
            CROSS JOIN scal
            WHERE tf.term IN ('data', 'merge', 'scan', 'table')
        ), agg AS (
            SELECT doc_id, round(sum(c), 6) AS score
            FROM contrib JOIN matched USING (doc_id)
            GROUP BY doc_id
        )
        SELECT doc_id, score FROM agg
        ORDER BY score DESC, doc_id ASC LIMIT 10
        """,
        # batch oracle: each query's relation recomputed independently,
        # UNION ALLed, ranked per query with the same raw-score cut
        "engine_boolean_batch": _TOK_CTE + f"""
        , px AS (
            SELECT DISTINCT term FROM dfreq WHERE term LIKE 'mer%'
        ), m1 AS (
            SELECT doc_id FROM tf WHERE term = 'table'
            INTERSECT
            SELECT doc_id FROM tf WHERE term = 'data'
        ), m2 AS (
            -- precedence: scan OR (merge AND NOT stream) — NOT binds to
            -- its AND branch, not to the whole disjunction
            SELECT doc_id FROM tf WHERE term = 'scan'
            UNION
            (SELECT doc_id FROM tf WHERE term = 'merge'
             EXCEPT
             SELECT doc_id FROM tf WHERE term = 'stream')
        ), m3 AS (
            SELECT DISTINCT doc_id FROM tf
            WHERE term IN (SELECT term FROM px) OR term = 'data'
        ), contrib AS (
            SELECT tf.doc_id, tf.term, {_BM25_CONTRIB} AS c
            FROM tf
            JOIN dfreq USING (term)
            JOIN dl ON tf.doc_id = dl.doc_id
            CROSS JOIN scal
        ), u AS (
            SELECT 'q_and' AS query_id, c.doc_id, sum(c.c) AS sr
            FROM contrib c JOIN m1 USING (doc_id)
            WHERE c.term IN ('data', 'table') GROUP BY c.doc_id
            UNION ALL
            SELECT 'q_ornot', c.doc_id, sum(c.c)
            FROM contrib c JOIN m2 USING (doc_id)
            WHERE c.term IN ('merge', 'scan') GROUP BY c.doc_id
            UNION ALL
            SELECT 'q_prefix', c.doc_id, sum(c.c)
            FROM contrib c JOIN m3 USING (doc_id)
            WHERE c.term IN (SELECT term FROM px) OR c.term = 'data'
            GROUP BY c.doc_id
        ), ranked AS (
            SELECT query_id, doc_id, sr, ROW_NUMBER() OVER (
                PARTITION BY query_id ORDER BY sr DESC, doc_id ASC
            ) AS rnk
            FROM u
        )
        SELECT query_id, doc_id, round(sr, 6) AS score,
               CAST(rnk AS BIGINT) AS rank
        FROM ranked WHERE rnk <= 10
        ORDER BY query_id, rank
        """,
        # content-sha oracle: the same top-10 relation, sha256 computed
        # from the SOURCE text by DuckDB itself — hash equality per row
        "engine_content_sha": _BM25_BASE + """
        , top AS (
            SELECT doc_id, score FROM agg
            ORDER BY score DESC, doc_id ASC LIMIT 10
        )
        SELECT t.doc_id, t.score, sha256(d.text) AS content_sha
        FROM top t JOIN documents d USING (doc_id)
        ORDER BY t.score DESC, t.doc_id ASC
        """,
        # index-stats oracle: summary recounted from the raw token stream
        "engine_index_stats": _TOK_CTE + """
        SELECT (SELECT count(*) FROM documents) AS n_docs,
               (SELECT count(*) FROM dfreq) AS n_terms,
               (SELECT count(*) FROM tf) AS n_postings,
               (SELECT round(avg(doclen), 6) FROM dl) AS avgdl
        """,
        # percolate oracle: each stored query's match relation as set
        # ops, labeled and UNION ALLed (prefix is the uncapped predicate
        # — doc has a token LIKE 'mer%')
        "engine_percolate": _TOK_CTE + """
        , px AS (
            SELECT DISTINCT term FROM dfreq WHERE term LIKE 'mer%'
        )
        SELECT doc_id, 'q_and' AS query_id FROM (
            SELECT doc_id FROM tf WHERE term = 'table'
            INTERSECT
            SELECT doc_id FROM tf WHERE term = 'data'
        )
        UNION ALL
        SELECT doc_id, 'q_ornot' FROM (
            SELECT doc_id FROM tf WHERE term = 'scan'
            UNION
            (SELECT doc_id FROM tf WHERE term = 'merge'
             EXCEPT
             SELECT doc_id FROM tf WHERE term = 'stream')
        )
        UNION ALL
        SELECT doc_id, 'q_prefix' FROM (
            SELECT DISTINCT doc_id FROM tf
            WHERE term IN (SELECT term FROM px) OR term = 'data'
        )
        """,
        # suggest oracle: DuckDB's independent levenshtein over the df
        # relation, same (dist, df desc, term) ranking, stem excluded
        "engine_suggest": _TOK_CTE + """
        SELECT term, CAST(levenshtein(term, 'hat') AS BIGINT) AS dist,
               CAST(df AS BIGINT) AS df
        FROM dfreq
        WHERE term <> 'hat' AND levenshtein(term, 'hat') <= 2
        ORDER BY dist ASC, df DESC, term ASC LIMIT 5
        """,
        # collapse oracle: the full (un-cut) ranked match set of
        # table OR scan, top-3 per lang via ROW_NUMBER — the whole
        # grouped relation is hash-checked
        # percentiles (X87): quantile_cont IS Spark's exact percentile
        # (both linear interpolation) over the OR match set
        "engine_percentiles": _TOK_CTE + f"""
        , matched AS (
            SELECT DISTINCT doc_id FROM tf WHERE term IN {_TERMS_IN}
        )
        SELECT round(quantile_cont(n_chars, 0.25), 6) AS p25,
               round(quantile_cont(n_chars, 0.5), 6) AS p50,
               round(quantile_cont(n_chars, 0.75), 6) AS p75,
               round(quantile_cont(n_chars, 0.95), 6) AS p95
        FROM documents JOIN matched USING (doc_id)
        WHERE n_chars IS NOT NULL
        """,
        # index-sorted scan (X92): the early-terminated bucket-prefix
        # scan is provably the full sort — the oracle IS the full sort
        "engine_sorted_scan": """
        SELECT doc_id, n_chars FROM documents
        WHERE n_chars IS NOT NULL
        ORDER BY n_chars ASC, doc_id ASC LIMIT 20
        """,
        # extended_stats (X91): the same sum/sumOfSquares derivation
        # (q/n - (s/n)^2) over the same doubles — bit-identical IEEE
        "engine_extended_stats": _TOK_CTE + f"""
        , matched AS (
            SELECT DISTINCT doc_id FROM tf WHERE term IN {_TERMS_IN}
        ), mo AS (
            SELECT CAST(count(*) AS BIGINT) AS n_values,
                   min(n_chars) AS min_value, max(n_chars) AS max_value,
                   sum(n_chars::DOUBLE) AS s,
                   sum(n_chars::DOUBLE * n_chars::DOUBLE) AS q
            FROM documents JOIN matched USING (doc_id)
            WHERE n_chars IS NOT NULL
        )
        SELECT n_values, min_value, max_value,
               round(s, 6) AS sum_value,
               round(s / n_values, 6) AS avg_value,
               round(q / n_values - (s / n_values) * (s / n_values), 6)
                   AS variance,
               round(sqrt(q / n_values - (s / n_values) * (s / n_values)),
                     6) AS std_deviation
        FROM mo
        """,
        # composite agg (X88): one key-ordered page strictly after the
        # ("en", 100.0) cursor over the lang x histogram(n_chars, 100)
        # bucket space of the match set
        "engine_composite": _TOK_CTE + """
        , matched AS (
            SELECT DISTINCT doc_id FROM tf
            WHERE term IN ('table', 'scan', 'data')
        ), b AS (
            SELECT d.lang, floor(d.n_chars / 100.0) * 100.0 AS n_chars,
                   CAST(count(*) AS BIGINT) AS doc_count
            FROM documents d JOIN matched USING (doc_id)
            WHERE d.lang IS NOT NULL AND d.n_chars IS NOT NULL
            GROUP BY 1, 2
        )
        SELECT lang, n_chars, doc_count FROM b
        WHERE lang > 'en' OR (lang = 'en' AND n_chars > 100.0)
        ORDER BY lang, n_chars LIMIT 10
        """,
        # terms + top_hits (X89): bucket counts and per-bucket BM25
        # ranking over the un-cut agg, both cuts applied in SQL
        "engine_top_hits": _TOK_CTE + f"""
        , matched AS (
            SELECT DISTINCT doc_id FROM tf
            WHERE term IN ('table', 'scan')
        ), contrib AS (
            SELECT tf.doc_id, {_BM25_CONTRIB} AS c
            FROM tf
            JOIN dfreq USING (term)
            JOIN dl ON tf.doc_id = dl.doc_id
            CROSS JOIN scal
            WHERE tf.term IN ('table', 'scan')
        ), agg AS (
            SELECT doc_id, sum(c) AS score_raw
            FROM contrib JOIN matched USING (doc_id)
            GROUP BY doc_id
        ), bc AS (
            SELECT d.lang, CAST(count(*) AS BIGINT) AS doc_count
            FROM agg a JOIN documents d USING (doc_id)
            WHERE d.lang IS NOT NULL
            GROUP BY d.lang
        ), tb AS (
            SELECT lang, doc_count FROM bc
            ORDER BY doc_count DESC, lang ASC LIMIT 3
        ), ranked AS (
            SELECT d.lang, a.doc_id, a.score_raw,
                   ROW_NUMBER() OVER (
                       PARTITION BY d.lang
                       ORDER BY a.score_raw DESC, a.doc_id ASC
                   ) AS rank
            FROM agg a JOIN documents d USING (doc_id)
            WHERE d.lang IS NOT NULL
        )
        SELECT r.lang, tb.doc_count, CAST(r.rank AS BIGINT) AS rank,
               r.doc_id, round(r.score_raw, 6) AS score
        FROM ranked r JOIN tb USING (lang)
        WHERE r.rank <= 3
        ORDER BY tb.doc_count DESC, r.lang ASC, r.rank ASC
        """,
        "engine_collapse_search": _TOK_CTE + f"""
        , matched AS (
            SELECT DISTINCT doc_id FROM tf
            WHERE term IN ('scan', 'table')
        ), contrib AS (
            SELECT tf.doc_id, {_BM25_CONTRIB} AS c
            FROM tf
            JOIN dfreq USING (term)
            JOIN dl ON tf.doc_id = dl.doc_id
            CROSS JOIN scal
            WHERE tf.term IN ('scan', 'table')
        ), agg AS (
            SELECT doc_id, sum(c) AS score_raw
            FROM contrib JOIN matched USING (doc_id)
            GROUP BY doc_id
        ), ranked AS (
            SELECT d.lang, a.doc_id, a.score_raw,
                   ROW_NUMBER() OVER (
                       PARTITION BY d.lang
                       ORDER BY a.score_raw DESC, a.doc_id ASC
                   ) AS rank
            FROM agg a JOIN documents d USING (doc_id)
        )
        SELECT lang, CAST(rank AS BIGINT) AS rank, doc_id,
               round(score_raw, 6) AS score
        FROM ranked WHERE rank <= {COLLAPSE_N}
        ORDER BY lang, rank
        """,
        # synonym oracle: join AND data with join->merge blended — the
        # group-max df is one scalar subquery; group members' idf uses it,
        # data keeps its own df; match set = (join OR merge) AND data
        "engine_synonym_search": _TOK_CTE + f"""
        , grp AS (
            SELECT max(df) AS bdf FROM dfreq
            WHERE term IN ('join', 'merge')
        ), matched AS (
            (SELECT doc_id FROM tf WHERE term = 'join'
             UNION
             SELECT doc_id FROM tf WHERE term = 'merge')
            INTERSECT
            SELECT doc_id FROM tf WHERE term = 'data'
        ), contrib AS (
            SELECT tf.doc_id,
                   ln(1.0 + (scal.n_docs - (CASE WHEN tf.term IN
                       ('join', 'merge') THEN grp.bdf ELSE dfreq.df END)
                       + 0.5)
                      / ((CASE WHEN tf.term IN ('join', 'merge')
                          THEN grp.bdf ELSE dfreq.df END) + 0.5)) *
                   (tf.tf * {BM25_K1 + 1.0}) /
                   (tf.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B}
                    * dl.doclen / scal.avgdl)) AS c
            FROM tf
            JOIN dfreq USING (term)
            JOIN dl ON tf.doc_id = dl.doc_id
            CROSS JOIN scal
            CROSS JOIN grp
            WHERE tf.term IN ('data', 'join', 'merge')
        ), agg AS (
            SELECT doc_id, round(sum(c), 6) AS score
            FROM contrib JOIN matched USING (doc_id)
            GROUP BY doc_id
        )
        SELECT doc_id, score FROM agg
        ORDER BY score DESC, doc_id ASC LIMIT 10
        """,
        # explain oracle: the ENTIRE per-(doc, term) breakdown relation is
        # recomputed — contribs joined to the raw-score top-k cut — so tf,
        # doclen, idf, and each contribution are hash-checked cell-by-cell
        "engine_explain": _TOK_CTE + f"""
        , matched AS (
            SELECT doc_id FROM tf WHERE term = 'table'
            INTERSECT
            SELECT doc_id FROM tf WHERE term = 'data'
        ), contrib AS (
            SELECT tf.doc_id, tf.term, tf.tf, dl.doclen,
                   ln(1.0 + (scal.n_docs - dfreq.df + 0.5)
                      / (dfreq.df + 0.5)) AS idf,
                   {_BM25_CONTRIB} AS c
            FROM tf
            JOIN dfreq USING (term)
            JOIN dl ON tf.doc_id = dl.doc_id
            CROSS JOIN scal
            WHERE tf.term IN ('data', 'table')
        ), agg AS (
            SELECT doc_id, sum(c) AS score_raw
            FROM contrib JOIN matched USING (doc_id)
            GROUP BY doc_id
        ), top AS (
            SELECT doc_id, round(score_raw, 6) AS score FROM agg
            ORDER BY score_raw DESC, doc_id ASC LIMIT 10
        )
        SELECT c.doc_id, t.score, c.term,
               CAST(c.tf AS BIGINT) AS tf,
               CAST(c.doclen AS BIGINT) AS doclen,
               round(c.idf, 6) AS idf,
               1.0 AS weight,
               round(c.c, 6) AS contrib
        FROM contrib c JOIN top t USING (doc_id)
        ORDER BY t.score DESC, c.doc_id ASC, c.term ASC
        """,
        # wildcard oracle: *e AND ?a?? — both expansions recomputed with
        # regexp_matches over the engine's anchored regex translation
        # (exhaustive under the cap: this vocabulary is far below 64
        # matches per pattern), then the standard BM25 AND
        "engine_regexp_search": _TOK_CTE + f"""
        , r1 AS (
            SELECT DISTINCT term FROM dfreq
            WHERE regexp_matches(term, '^(?:m[aeiou]rge|str[aeiou]am)$')
        ), r2 AS (
            SELECT DISTINCT term FROM dfreq
            WHERE regexp_matches(term, '^(?:qu[a-z]+)$')
        ), matched AS (
            SELECT DISTINCT doc_id FROM tf
            WHERE term IN (SELECT term FROM r1)
            INTERSECT
            SELECT DISTINCT doc_id FROM tf
            WHERE term IN (SELECT term FROM r2)
        ), contrib AS (
            SELECT tf.doc_id, {_BM25_CONTRIB} AS c
            FROM tf
            JOIN dfreq USING (term)
            JOIN dl ON tf.doc_id = dl.doc_id
            CROSS JOIN scal
            WHERE tf.term IN (SELECT term FROM r1)
               OR tf.term IN (SELECT term FROM r2)
        ), agg AS (
            SELECT doc_id, round(sum(c), 6) AS score
            FROM contrib JOIN matched USING (doc_id)
            GROUP BY doc_id
        )
        SELECT doc_id, score FROM agg
        ORDER BY score DESC, doc_id ASC LIMIT 10
        """,
        "engine_wildcard_search": _TOK_CTE + f"""
        , w1 AS (
            SELECT DISTINCT term FROM dfreq
            WHERE regexp_matches(term, '^.*e$')
        ), w2 AS (
            SELECT DISTINCT term FROM dfreq
            WHERE regexp_matches(term, '^.a..$')
        ), matched AS (
            SELECT DISTINCT doc_id FROM tf
            WHERE term IN (SELECT term FROM w1)
            INTERSECT
            SELECT DISTINCT doc_id FROM tf
            WHERE term IN (SELECT term FROM w2)
        ), contrib AS (
            SELECT tf.doc_id, {_BM25_CONTRIB} AS c
            FROM tf
            JOIN dfreq USING (term)
            JOIN dl ON tf.doc_id = dl.doc_id
            CROSS JOIN scal
            WHERE tf.term IN (SELECT term FROM w1)
               OR tf.term IN (SELECT term FROM w2)
        ), agg AS (
            SELECT doc_id, round(sum(c), 6) AS score
            FROM contrib JOIN matched USING (doc_id)
            GROUP BY doc_id
        )
        SELECT doc_id, score FROM agg
        ORDER BY score DESC, doc_id ASC LIMIT 10
        """,
        # permuterm tier: same relation — the tier must be
        # output-invisible
        "engine_wildcard_permuterm": _TOK_CTE + f"""
        , w1 AS (
            SELECT DISTINCT term FROM dfreq
            WHERE regexp_matches(term, '^.*e$')
        ), w2 AS (
            SELECT DISTINCT term FROM dfreq
            WHERE regexp_matches(term, '^.a..$')
        ), matched AS (
            SELECT DISTINCT doc_id FROM tf
            WHERE term IN (SELECT term FROM w1)
            INTERSECT
            SELECT DISTINCT doc_id FROM tf
            WHERE term IN (SELECT term FROM w2)
        ), contrib AS (
            SELECT tf.doc_id, {_BM25_CONTRIB} AS c
            FROM tf
            JOIN dfreq USING (term)
            JOIN dl ON tf.doc_id = dl.doc_id
            CROSS JOIN scal
            WHERE tf.term IN (SELECT term FROM w1)
               OR tf.term IN (SELECT term FROM w2)
        ), agg AS (
            SELECT doc_id, round(sum(c), 6) AS score
            FROM contrib JOIN matched USING (doc_id)
            GROUP BY doc_id
        )
        SELECT doc_id, score FROM agg
        ORDER BY score DESC, doc_id ASC LIMIT 10
        """,
        # minimum_should_match oracle: the mm clause count is a relational
        # GROUP BY/HAVING over distinct (doc, clause-term) matches; scores
        # are the standard BM25 sum over the present positive terms
        "engine_msm_search": _TOK_CTE + f"""
        , matched AS (
            SELECT doc_id FROM (
                SELECT DISTINCT doc_id, term FROM tf
                WHERE term IN ('data', 'merge', 'scan', 'table')
            ) GROUP BY doc_id HAVING count(*) >= {MSM_M}
        ), contrib AS (
            SELECT tf.doc_id, {_BM25_CONTRIB} AS c
            FROM tf
            JOIN dfreq USING (term)
            JOIN dl ON tf.doc_id = dl.doc_id
            CROSS JOIN scal
            WHERE tf.term IN ('data', 'merge', 'scan', 'table')
        ), agg AS (
            SELECT doc_id, round(sum(c), 6) AS score
            FROM contrib JOIN matched USING (doc_id)
            GROUP BY doc_id
        )
        SELECT doc_id, score FROM agg
        ORDER BY score DESC, doc_id ASC LIMIT 10
        """,
        # reshard (X142): scoring is sharding-invariant — the oracle is
        # the same BM25 total ordering the pre-reshard index answers
        "engine_reshard_search": _BM25_BASE + """
        SELECT doc_id, score FROM agg
        ORDER BY score DESC, doc_id ASC LIMIT 10
        """,
        # search_after oracle: page 2 must be exactly ranks 11-20 of the
        # deep ranking — LIMIT/OFFSET over the same BM25 OR relation the
        # engine pages with its (score, doc_id) cursor
        "engine_search_after": _TOK_CTE + f"""
        , matched AS (
            SELECT DISTINCT doc_id FROM tf WHERE term IN ('scan', 'table')
        ), contrib AS (
            SELECT tf.doc_id, {_BM25_CONTRIB} AS c
            FROM tf
            JOIN dfreq USING (term)
            JOIN dl ON tf.doc_id = dl.doc_id
            CROSS JOIN scal
            WHERE tf.term IN ('scan', 'table')
        ), agg AS (
            SELECT doc_id, round(sum(c), 6) AS score
            FROM contrib JOIN matched USING (doc_id)
            GROUP BY doc_id
        )
        SELECT doc_id, score FROM agg
        ORDER BY score DESC, doc_id ASC LIMIT 10 OFFSET 10
        """,
        # MLT oracle: both stages relational. Stage 1 — the source doc's
        # terms scored by the engine tf-idf (sqrt(tf)*(1+ln(N/(df+1)))),
        # top MLT_MAX_TERMS by (score desc, term asc). Stage 2 — BM25 OR
        # over the selected terms, source doc excluded.
        "engine_mlt_search": _TOK_CTE + f"""
        , src AS (
            SELECT term, tf FROM tf WHERE doc_id = {MLT_DOC_ID}
        ), cand AS (
            SELECT s.term,
                   sqrt(s.tf) * (1.0 + ln(scal.n_docs / (dfreq.df + 1.0)))
                       AS sc
            FROM src s JOIN dfreq USING (term) CROSS JOIN scal
            WHERE dfreq.df >= 2
        ), sel AS (
            SELECT term FROM cand ORDER BY sc DESC, term ASC
            LIMIT {MLT_MAX_TERMS}
        ), contrib AS (
            SELECT tf.doc_id, {_BM25_CONTRIB} AS c
            FROM tf
            JOIN dfreq USING (term)
            JOIN dl ON tf.doc_id = dl.doc_id
            CROSS JOIN scal
            WHERE tf.term IN (SELECT term FROM sel)
              AND tf.doc_id <> {MLT_DOC_ID}
        ), agg AS (
            SELECT doc_id, round(sum(c), 6) AS score
            FROM contrib GROUP BY doc_id
        )
        SELECT doc_id, score FROM agg
        ORDER BY score DESC, doc_id ASC LIMIT 10
        """,
        # facet oracle: the boolean tree re-evaluated with SQL set ops
        # (same relation as engine_boolean_search's matched CTE), then
        # the matching documents grouped per (lang, source) directly —
        # no top-k cut, facets aggregate the FULL match set
        "engine_facet_search": _TOK_CTE + """
        , stream_s AS (
            SELECT doc_id,
                   ' ' || array_to_string(list_filter(
                       string_split_regex(lower(text), '[^a-z0-9]+'),
                       t -> t <> ''), ' ') || ' ' AS s
            FROM documents WHERE text IS NOT NULL
        ), or_docs AS (
            SELECT doc_id FROM stream_s WHERE s LIKE '% table scan %'
            UNION
            SELECT doc_id FROM tf WHERE term = 'merge'
        ), matched AS (
            SELECT doc_id FROM or_docs
            INTERSECT
            SELECT doc_id FROM tf WHERE term = 'data'
            EXCEPT
            SELECT doc_id FROM tf WHERE term = 'stream'
        )
        SELECT d.lang, d.source, CAST(count(*) AS BIGINT) AS n_docs
        FROM documents d JOIN matched USING (doc_id)
        GROUP BY d.lang, d.source
        ORDER BY d.lang, d.source
        """,
        # field-search oracle: the lang:es tag scored from first
        # principles — df(tag) = indexed docs with that lang, tf = 1,
        # doclen = the doc's TEXT token count (tags are excluded from
        # length norm) — summed with the ordinary text-term contributions
        # over the three-way AND match set
        "engine_field_search": _TOK_CTE + f"""
        , tagdf AS (
            SELECT count(*) AS df FROM documents
            WHERE text IS NOT NULL AND lower(lang) = 'es'
        ), contrib AS (
            SELECT tf.doc_id, {_BM25_CONTRIB} AS c
            FROM tf
            JOIN dfreq USING (term)
            JOIN dl ON tf.doc_id = dl.doc_id
            CROSS JOIN scal
            WHERE tf.term IN ('table', 'scan')
        ), tagc AS (
            SELECT d.doc_id,
                   ln(1.0 + (scal.n_docs - tagdf.df + 0.5)
                      / (tagdf.df + 0.5)) *
                   {BM25_K1 + 1.0} /
                   (1.0 + {BM25_K1} * (1.0 - {BM25_B}
                    + {BM25_B} * dl.doclen / scal.avgdl)) AS c
            FROM documents d
            JOIN dl ON d.doc_id = dl.doc_id
            CROSS JOIN scal CROSS JOIN tagdf
            WHERE lower(d.lang) = 'es'
        ), matched AS (
            SELECT doc_id FROM tf WHERE term = 'table'
            INTERSECT
            SELECT doc_id FROM tf WHERE term = 'scan'
            INTERSECT
            SELECT doc_id FROM tagc
        ), agg AS (
            SELECT doc_id, round(sum(c), 6) AS score
            FROM (SELECT doc_id, c FROM contrib
                  UNION ALL SELECT doc_id, c FROM tagc) u
            JOIN matched USING (doc_id)
            GROUP BY doc_id
        )
        SELECT doc_id, score FROM agg
        ORDER BY score DESC, doc_id ASC LIMIT 10
        """,
        # snippet oracle: stream-strpos locates the phrase, the space
        # count over the stream prefix recovers the 0-based token index,
        # and a 1-based inclusive list slice re-renders the window — the
        # same relation computed by an independent SQL idiom.
        "phrase_snippets": f"""
        WITH tk AS (
            SELECT doc_id, list_filter(
                string_split_regex(lower(text), '[^a-z0-9]+'),
                t -> t <> '') AS tk
            FROM documents WHERE text IS NOT NULL
        ), hit AS (
            SELECT doc_id, tk,
                   ' ' || array_to_string(tk, ' ') || ' ' AS s
            FROM tk
        ), loc AS (
            SELECT doc_id, tk, strpos(s, ' {' '.join(PHRASE_QUERY)} ') AS loc, s
            FROM hit WHERE strpos(s, ' {' '.join(PHRASE_QUERY)} ') > 0
        ), pos AS (
            SELECT doc_id, tk,
                   CAST(length(substr(s, 1, loc))
                        - length(replace(substr(s, 1, loc), ' ', ''))
                        - 1 AS BIGINT) AS first_pos
            FROM loc
        )
        SELECT doc_id, first_pos,
               array_to_string(tk[greatest(first_pos - {SNIPPET_CONTEXT}, 0) + 1
                   : least(first_pos + {len(PHRASE_QUERY) + SNIPPET_CONTEXT},
                           len(tk))], ' ') AS snippet
        FROM pos ORDER BY doc_id
        """,
        "dedup_exact": """
        SELECT min(doc_id) AS keep_doc_id, count(*) AS n_copies
        FROM documents GROUP BY text HAVING count(*) > 1
        """,
        "tpch_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                   AS BIGINT) AS sum_base_cents,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                   AS BIGINT) AS sum_disc_c4,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(round(l_discount * 100) AS BIGINT))
                   * (100 + CAST(round(l_tax * 100) AS BIGINT)))
                   AS BIGINT) AS sum_charge_c6,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1997-06-30 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        """,
        "revenue_by_nation": """
        SELECT n_name,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                   AS BIGINT) AS revenue_cents,
               count(*) AS n_orders
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
        """,
        "events_top3_per_user": """
        SELECT user_id, event_id, value, rank FROM (
            SELECT user_id, event_id, value,
                   CAST(row_number() OVER (
                       PARTITION BY user_id ORDER BY value DESC, event_id ASC
                   ) AS INTEGER) AS rank
            FROM events
        ) WHERE rank <= 3
        """,
        # engine_bm25_search: intentionally omitted (Porter-stemmed analyzer
        # chain is not SQL-expressible) -> rows-only check.
    }
