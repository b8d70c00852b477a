"""Exact phrase retrieval over the positional index.

The reference's engine is bag-of-words only; phrase search is the standard
fulltext-index capability that REQUIRES positions (BASELINE.json's
north-star index stores per-posting payloads for exactly this kind of
extension). Distributed shape is identical to wand.topk — lexicon lookup
(driver-side bucket routing, tiny collect) -> partition-pruned postings
scan of the phrase terms only -> shuffle blocks by shard -> per-shard
kernel -> global top-k merge — so wall-clock scales with the PHRASE
TERMS' postings, never corpus size.

Per-shard kernel:

 1. candidate docs = AND intersection of the phrase terms' doc sets,
    rarest term first with block range-skipping (a doc missing any term
    cannot contain the phrase) — this is what bounds the positional work:
    positions are only materialized for docs that survive the cheapest
    filter.
 2. adjacency: every occurrence becomes a composite key
    ``(doc - shard_base) << POS_BITS | position`` (both components
    shard-local, overflow-guarded); phrase starts are term[0] occurrences
    s.t. ``key + i`` is an occurrence of term[i] for every i — pure
    sorted-array membership (np.searchsorted), no per-doc Python.
    Duplicate terms in the phrase ("do it do") need no special casing:
    each phrase slot independently probes its term's occurrence set.
 3. scoring: BM25 sum of the phrase's distinct terms' contributions over
    matching docs, in the same deterministic sorted-term reduction order
    as wand.topk — so a phrase result ranks exactly like the equivalent
    AND query filtered to adjacency (the oracle relation the DuckDB
    driver checks via regex on the simple-tokenized content).

Top-k merge and tie-breaks (score desc, doc_id asc) shared with wand.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mahout_spark.index.codec import decode_doc_block, decode_positions_block
from mahout_spark.index.wand import (
    _read_query_lexicon,
    _score_arrays,
    _topk_arrays,
)
from mahout_spark.sources.catalog import ParquetCatalog

# occurrence key layout: local_doc << POS_BITS | position.
# docs_per_shard <= 2^20 and doclen < 2^44 keep the uint64 exact.
POS_BITS = 44
_MAX_LOCAL_DOC = 1 << (64 - POS_BITS)


def _sorted_member(values: np.ndarray, table: np.ndarray) -> np.ndarray:
    """Boolean membership of ``values`` in SORTED unique ``table``."""
    if len(table) == 0 or len(values) == 0:
        return np.zeros(len(values), dtype=bool)
    idx = np.searchsorted(table, values).clip(max=len(table) - 1)
    return table[idx] == values


def _empty_result() -> pd.DataFrame:
    return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                         "score": pd.Series([], dtype="float64")})


def _check_shard_budget(docs_per_shard: int) -> None:
    if docs_per_shard > _MAX_LOCAL_DOC:
        raise ValueError(
            f"docs_per_shard={docs_per_shard} exceeds the positional key "
            f"budget ({_MAX_LOCAL_DOC}); rebuild with smaller shards"
        )


def _decode_intersect(pdf: pd.DataFrame, distinct_terms: list[str],
                      docs_per_shard: int):
    """Shared front half of every positional kernel: group one shard's
    block rows by term, decode rarest-first with block range-skipping, and
    AND-intersect the terms' doc sets (a doc missing any term can satisfy
    neither adjacency nor proximity). Returns ``(decoded, cand, base)``
    with ``decoded[t] = (docs, tfs, dls, pos_counts, flat_positions)``,
    or None when a term is absent / the intersection is empty."""
    groups = {t: g for t, g in pdf.groupby("term")}
    if any(t not in groups for t in distinct_terms):
        return None
    shard = int(pdf["shard"].iloc[0])
    base = np.uint64(shard * docs_per_shard)

    def decode_term(t, cand=None):
        g = groups[t]
        if cand is not None and len(cand):
            lo = np.searchsorted(cand, g["first_docid"].to_numpy(np.uint64))
            hi = np.searchsorted(
                cand, g["block_max_docid"].to_numpy(np.uint64), "right"
            )
            g = g[hi > lo]
        d_p, tf_p, dl_p, c_p, p_p = [], [], [], [], []
        for r in g.itertuples(index=False):
            d, tf_, dl_ = decode_doc_block(r.doc_ids, r.tfs, r.doclens)
            cnt, pos = decode_positions_block(r.pos_counts, r.positions)
            d_p.append(d); tf_p.append(tf_); dl_p.append(dl_)
            # int64 counts: np.repeat rejects uint64 repeat args
            c_p.append(cnt.astype(np.int64)); p_p.append(pos)
        if not d_p:
            e = np.empty(0, np.uint64)
            return e, e, e, e, e
        return tuple(np.concatenate(x) for x in (d_p, tf_p, dl_p, c_p, p_p))

    by_size = sorted(
        distinct_terms, key=lambda t: int(groups[t]["count"].sum())
    )
    decoded: dict[str, tuple] = {}
    cand = None
    for t in by_size:
        d, tf_, dl_, cnt, pos = decode_term(t, cand)
        if cand is not None:
            keep = _sorted_member(d, cand)
            d, tf_, dl_ = d[keep], tf_[keep], dl_[keep]
            pos = pos[np.repeat(keep, cnt)]
            cnt = cnt[keep]
        decoded[t] = (d, tf_, dl_, cnt, pos)
        cand = np.sort(d) if cand is None else np.intersect1d(cand, d)
        if len(cand) == 0:
            return None
    return decoded, cand, base


def _occurrence_keys(decoded: dict, cand: np.ndarray, base: np.uint64,
                     distinct_terms: list[str]) -> dict:
    """Per term, the sorted composite ``local_doc << POS_BITS | position``
    keys of its occurrences in candidate docs."""
    keys: dict[str, np.ndarray] = {}
    for t in distinct_terms:
        d, _, _, cnt, pos = decoded[t]
        keep = _sorted_member(d, cand)
        pos_k = pos[np.repeat(keep, cnt)]
        cnt_k = cnt[keep]
        local = (d[keep] - base).astype(np.uint64)
        kk = (np.repeat(local, cnt_k) << np.uint64(POS_BITS)) | pos_k
        keys[t] = np.sort(kk)
    return keys


def _adjacency_start_keys(keys: dict, phrase: list[str]) -> np.ndarray:
    """Composite occurrence keys where ``phrase`` starts: term[0]
    occurrences s.t. ``key + i`` is an occurrence of term[i] for every
    slot i. ``keys[t]`` = sorted composite keys of t's occurrences."""
    starts = keys[phrase[0]]
    for i, t in enumerate(phrase[1:], start=1):
        if len(starts) == 0:
            return starts
        starts = starts[_sorted_member(starts + np.uint64(i), keys[t])]
    return starts


def _window_anchor_keys(keys: dict, distinct_terms: list[str],
                        window: int) -> np.ndarray:
    """Composite keys ``a`` s.t. every distinct term occurs in
    ``[a, a + window]``. Anchoring at every occurrence of every term is
    exhaustive: a minimal valid span starts at some term's occurrence.
    The window never crosses a doc boundary (doc ids live in the key's
    high bits and positions are < 2^POS_BITS)."""
    anchors = np.sort(np.concatenate([keys[t] for t in distinct_terms]))
    if len(anchors) == 0:
        return anchors
    ok = np.ones(len(anchors), dtype=bool)
    w = np.uint64(window)
    for t in distinct_terms:
        kt = keys[t]
        idx = np.searchsorted(kt, anchors)
        ok &= (idx < len(kt)) & (
            kt[np.minimum(idx, len(kt) - 1)] <= anchors + w
        )
    return anchors[ok]


def _score_match_docs(decoded: dict, match_docs: np.ndarray,
                      distinct_terms: list[str], idf_by_term: dict,
                      k1: float, b: float, avgdl: float,
                      k: int,
                      deleted: np.ndarray | None = None,
                      after: tuple | None = None,
                      allowed: np.ndarray | None = None) -> pd.DataFrame:
    """Exact BM25 sum of the distinct terms over ``match_docs``, in the
    engine-wide deterministic (sorted-term, doc-ascending) reduction
    order, then top-k with (score desc, doc_id asc) tie-breaks.
    ``k=None`` skips the cut and returns EVERY matched doc's score (the
    ranked-match-set regime, boolquery.score_matches). ``deleted``
    (sorted tombstone set, index/delete.py) masks matches before
    selection — the single live-docs seam for every positional and
    boolean kernel. ``after`` is a (score, doc_id) cursor: only
    rows strictly after it in the sort order survive — sound per-shard
    because the predicate distributes over the global merge, and exact
    because the kernel recomputes bit-identical scores per run.
    ``allowed`` (sorted doc set) is the FILTER-CONTEXT seam — the
    positive twin of ``deleted``: matches outside it drop before
    selection, scores untouched (BM25 is per-doc, so filtering never
    perturbs surviving scores — the ES filter-context contract)."""
    if deleted is not None and len(match_docs):
        match_docs = match_docs[~np.isin(match_docs, deleted)]
    if allowed is not None and len(match_docs):
        match_docs = match_docs[np.isin(match_docs, allowed)]
    if len(match_docs) == 0:
        return _empty_result()
    doc_parts, contrib_parts = [], []
    for t in distinct_terms:
        d, tf_, dl_, _, _ = decoded[t]
        m = _sorted_member(d, match_docs)
        if not m.any():
            continue
        doc_parts.append(d[m])
        contrib_parts.append(
            _score_arrays(d[m], tf_[m], dl_[m], idf_by_term[t], k1, b, avgdl)
        )
    docs = np.concatenate(doc_parts)
    contribs = np.concatenate(contrib_parts)
    order = np.argsort(docs, kind="stable")
    docs, contribs = docs[order], contribs[order]
    bnd = np.concatenate([[0], np.flatnonzero(docs[1:] != docs[:-1]) + 1])
    uniq = docs[bnd]
    sums = np.add.reduceat(contribs, bnd)
    if after is not None:
        a_score, a_doc = float(after[0]), int(after[1])
        keep = (sums < a_score) | (
            (sums == a_score) & (uniq.astype(np.int64) > a_doc)
        )
        uniq, sums = uniq[keep], sums[keep]
        if len(uniq) == 0:
            return _empty_result()
    if k is None:  # ranked match SET: no cut, emit every matched doc
        return pd.DataFrame({"doc_id": uniq.astype(np.int64),
                             "score": sums})
    d_out, s_out = _topk_arrays(uniq.astype(np.int64), sums, k)
    return pd.DataFrame({"doc_id": d_out, "score": s_out})


def _make_phrase_kernel(
    phrase: list[str], idf_by_term: dict, k1: float, b: float,
    avgdl: float, k: int, docs_per_shard: int,
    deleted: np.ndarray | None = None,
):
    _check_shard_budget(docs_per_shard)
    distinct_terms = sorted(dict.fromkeys(phrase))

    def kernel(pdf, *, deleted=deleted):  # kw-only: applyInPandas sees 1 arg
        front = _decode_intersect(pdf, distinct_terms, docs_per_shard)
        if front is None:
            return _empty_result()
        decoded, cand, base = front

        # adjacency over composite occurrence keys — duplicate phrase
        # terms need no special casing (each slot probes independently).
        keys = _occurrence_keys(decoded, cand, base, distinct_terms)
        starts = _adjacency_start_keys(keys, phrase)
        if len(starts) == 0:
            return _empty_result()
        match_docs = np.unique(starts >> np.uint64(POS_BITS)) + base
        return _score_match_docs(
            decoded, match_docs, distinct_terms, idf_by_term, k1, b, avgdl,
            k, deleted=deleted,
        )

    return kernel


def _make_proximity_kernel(
    terms: list[str], window: int, idf_by_term: dict, k1: float, b: float,
    avgdl: float, k: int, docs_per_shard: int,
    deleted: np.ndarray | None = None,
):
    """Unordered within-window kernel: a doc matches when some span of
    ``window + 1`` consecutive token positions contains ALL distinct
    terms. Exactness of the anchor set: a minimal valid span starts at an
    occurrence of one of the terms, so testing the window anchored at
    EVERY occurrence of every term is exhaustive. Each test is one
    searchsorted probe per term over its sorted composite keys — the
    window [a, a+window] never crosses a doc boundary because doc ids
    live in the key's high bits and positions are < 2^POS_BITS."""
    _check_shard_budget(docs_per_shard)
    distinct_terms = sorted(dict.fromkeys(terms))

    def kernel(pdf, *, deleted=deleted):  # kw-only: applyInPandas sees 1 arg
        front = _decode_intersect(pdf, distinct_terms, docs_per_shard)
        if front is None:
            return _empty_result()
        decoded, cand, base = front
        keys = _occurrence_keys(decoded, cand, base, distinct_terms)
        hits = _window_anchor_keys(keys, distinct_terms, window)
        if len(hits) == 0:
            return _empty_result()
        match_docs = np.unique(hits >> np.uint64(POS_BITS)) + base
        return _score_match_docs(
            decoded, match_docs, distinct_terms, idf_by_term, k1, b, avgdl,
            k, deleted=deleted,
        )

    return kernel


def _positional_query_plan(spark, cat, qterms, lex_rows):
    """Shared public-entry plumbing: meta guard, lexicon lookup (or the
    caller's cached rows), idf table, the bucket-pruned + term-filtered
    postings scan, and the tombstone set. Returns
    ``(meta, idf_by_term, blocks, deleted)`` or None when some query term
    is absent from the corpus (no doc can match)."""
    meta = cat.read_meta("postings")
    if not meta.get("positional"):
        raise ValueError(
            f"index at {cat.root} was built without positions=True; "
            "phrase/proximity queries need a positional index"
        )
    n_buckets = int(meta["n_buckets"])
    from mahout_spark.functions.xxhash import term_bucket

    if lex_rows is None:
        qbuckets = sorted({term_bucket(t, n_buckets) for t in qterms})
        lex = _read_query_lexicon(spark, cat, qbuckets)
        lex_rows = (
            lex.filter(F.col("term").isin(qterms))
            .select("term", "bucket", "df")
            .collect()
            if lex is not None
            else []
        )
    if len({r["term"] for r in lex_rows}) < len(qterms):
        return None
    n_docs = meta["n_docs"]
    idf_by_term = {
        r["term"]: float(np.log(1.0 + (n_docs - r["df"] + 0.5) / (r["df"] + 0.5)))
        for r in lex_rows
    }
    buckets = sorted({r["bucket"] for r in lex_rows})
    blocks = cat.read_partitions(spark, "postings", "bucket", buckets).filter(
        F.col("term").isin(qterms)
    )
    deleted, tomb = None, None
    if int(meta.get("deletes", 0)):
        from mahout_spark.index.delete import deleted_set

        deleted, tomb = deleted_set(spark, cat, meta)
    return meta, idf_by_term, blocks, deleted, tomb


def _run_positional_kernel(spark, blocks, kernel, k, merge,
                           tomb=None, docs_per_shard=None) -> DataFrame:
    from mahout_spark.index.delete import apply_shard_kernel

    per_shard = apply_shard_kernel(
        blocks, kernel, "doc_id long, score double", tomb, docs_per_shard
    )
    if merge == "driver":
        rows = sorted(
            per_shard.collect(), key=lambda r: (-r["score"], r["doc_id"])
        )[:k]
        return spark.createDataFrame(rows, "doc_id long, score double")
    return per_shard.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k)


def phrase_topk(
    spark: SparkSession,
    cat: ParquetCatalog,
    phrase: list[str],
    k: int = 10,
    lex_rows: list | None = None,
    merge: str = "spark",
) -> DataFrame:
    """Top-k docs containing the exact token sequence ``phrase``, scored by
    BM25 over the phrase's terms. Requires an index built with
    ``positions=True``."""
    if not phrase:
        raise ValueError("empty phrase")
    qterms = sorted(dict.fromkeys(phrase))
    plan = _positional_query_plan(spark, cat, qterms, lex_rows)
    if plan is None:
        return spark.createDataFrame([], "doc_id long, score double")
    meta, idf_by_term, blocks, deleted, tomb = plan
    kernel = _make_phrase_kernel(
        list(phrase), idf_by_term, meta["k1"], meta["b"], meta["avgdl"], k,
        int(meta["docs_per_shard"]), deleted=deleted,
    )
    return _run_positional_kernel(spark, blocks, kernel, k, merge,
                                  tomb, int(meta["docs_per_shard"]))


def proximity_topk(
    spark: SparkSession,
    cat: ParquetCatalog,
    terms: list[str],
    window: int,
    k: int = 10,
    lex_rows: list | None = None,
    merge: str = "spark",
) -> DataFrame:
    """Top-k docs where ALL distinct ``terms`` co-occur within a span of
    ``window + 1`` consecutive token positions (unordered — the NEAR/W
    operator), scored by the BM25 sum of the terms. ``window=len(terms)-1``
    with distinct terms is an unordered phrase; large windows degrade
    toward AND. Requires an index built with ``positions=True``."""
    if not terms:
        raise ValueError("empty term list")
    if window < 0:
        raise ValueError("window must be >= 0")
    qterms = sorted(dict.fromkeys(terms))
    plan = _positional_query_plan(spark, cat, qterms, lex_rows)
    if plan is None:
        return spark.createDataFrame([], "doc_id long, score double")
    meta, idf_by_term, blocks, deleted, tomb = plan
    kernel = _make_proximity_kernel(
        qterms, window, idf_by_term, meta["k1"], meta["b"], meta["avgdl"],
        k, int(meta["docs_per_shard"]), deleted=deleted,
    )
    return _run_positional_kernel(spark, blocks, kernel, k, merge,
                                  tomb, int(meta["docs_per_shard"]))


def _make_span_first_kernel(
    phrase: list[str], end: int, idf_by_term: dict, k1: float, b: float,
    avgdl: float, k: int, docs_per_shard: int,
    deleted: np.ndarray | None = None,
):
    """span_first kernel: phrase-start keys (the X30 adjacency probe)
    additionally filtered by the boundary — a span starting at position
    p with L slots has Lucene span end p + L, and matches iff
    ``p + L <= end``. The position component is the key's low POS_BITS,
    so the filter is one vectorized mask over the start keys."""
    _check_shard_budget(docs_per_shard)
    distinct_terms = sorted(dict.fromkeys(phrase))
    span_len = len(phrase)

    def kernel(pdf, *, deleted=deleted):  # kw-only: applyInPandas sees 1 arg
        front = _decode_intersect(pdf, distinct_terms, docs_per_shard)
        if front is None:
            return _empty_result()
        decoded, cand, base = front
        keys = _occurrence_keys(decoded, cand, base, distinct_terms)
        starts = _adjacency_start_keys(keys, phrase)
        if len(starts) == 0:
            return _empty_result()
        pos = starts & np.uint64((1 << POS_BITS) - 1)
        starts = starts[pos + np.uint64(span_len) <= np.uint64(end)]
        if len(starts) == 0:
            return _empty_result()
        match_docs = np.unique(starts >> np.uint64(POS_BITS)) + base
        return _score_match_docs(
            decoded, match_docs, distinct_terms, idf_by_term, k1, b, avgdl,
            k, deleted=deleted,
        )

    return kernel


def span_first_topk(
    spark: SparkSession,
    cat: ParquetCatalog,
    phrase: list[str],
    end: int,
    k: int = 10,
    lex_rows: list | None = None,
    merge: str = "spark",
) -> DataFrame:
    """ES/Lucene ``span_first``: top-k docs where the token sequence
    ``phrase`` occurs ENTIRELY within the first ``end`` token positions
    (span end ``start + len(phrase) <= end`` — the Lucene boundary
    contract; a single term is the 1-slot span, matching iff its
    position ``< end``). Scored by the BM25 sum of the span's distinct
    terms, like phrase_topk — same plan, same kernels seam, one extra
    vectorized position mask. Requires a positional index."""
    if not phrase:
        raise ValueError("empty phrase")
    if end < 1:
        raise ValueError(f"end must be >= 1: {end}")
    if end < len(phrase):  # no span of this length can fit the prefix
        return spark.createDataFrame([], "doc_id long, score double")
    qterms = sorted(dict.fromkeys(phrase))
    plan = _positional_query_plan(spark, cat, qterms, lex_rows)
    if plan is None:
        return spark.createDataFrame([], "doc_id long, score double")
    meta, idf_by_term, blocks, deleted, tomb = plan
    kernel = _make_span_first_kernel(
        list(phrase), int(end), idf_by_term, meta["k1"], meta["b"],
        meta["avgdl"], k, int(meta["docs_per_shard"]), deleted=deleted,
    )
    return _run_positional_kernel(spark, blocks, kernel, k, merge,
                                  tomb, int(meta["docs_per_shard"]))


def _decode_single(g: pd.DataFrame, cand: np.ndarray):
    """Decode ONE term's block rows restricted to a sorted candidate doc
    set (block range-skip, then exact membership) — the per-alternative
    half of the phrase-prefix kernel; the fixed slots reuse the shared
    ``_decode_intersect`` front."""
    lo = np.searchsorted(cand, g["first_docid"].to_numpy(np.uint64))
    hi = np.searchsorted(
        cand, g["block_max_docid"].to_numpy(np.uint64), "right")
    g = g[hi > lo]
    d_p, tf_p, dl_p, c_p, p_p = [], [], [], [], []
    for r in g.itertuples(index=False):
        d, tf_, dl_ = decode_doc_block(r.doc_ids, r.tfs, r.doclens)
        cnt, pos = decode_positions_block(r.pos_counts, r.positions)
        d_p.append(d); tf_p.append(tf_); dl_p.append(dl_)
        c_p.append(cnt.astype(np.int64)); p_p.append(pos)
    if not d_p:
        e = np.empty(0, np.uint64)
        return e, e, e, e, e
    d, tf_, dl_, cnt, pos = (np.concatenate(x)
                             for x in (d_p, tf_p, dl_p, c_p, p_p))
    keep = _sorted_member(d, cand)
    pos = pos[np.repeat(keep, cnt)]
    return d[keep], tf_[keep], dl_[keep], cnt[keep], pos


def _make_phrase_prefix_kernel(
    fixed: list[str], alts: list[str], idf_by_term: dict, k1: float,
    b: float, avgdl: float, k: int, docs_per_shard: int,
    deleted: np.ndarray | None = None,
):
    _check_shard_budget(docs_per_shard)
    fixed_distinct = sorted(dict.fromkeys(fixed))

    def kernel(pdf, *, deleted=deleted):  # kw-only: applyInPandas sees 1 arg
        groups = {t: g for t, g in pdf.groupby("term")}
        front = _decode_intersect(pdf, fixed_distinct, docs_per_shard)
        if front is None:
            return _empty_result()
        decoded, cand, base = front
        keys_fixed = _occurrence_keys(decoded, cand, base, fixed_distinct)
        doc_parts, score_parts = [], []
        for a in alts:  # bounded by max_expansions — query-sized, never
            if a in fixed_distinct:  # corpus-sized
                dec_a, merged = decoded[a], decoded
            elif a in groups:
                dec_a = _decode_single(groups[a], cand)
                if len(dec_a[0]) == 0:
                    continue
                merged = {**decoded, a: dec_a}
            else:
                continue
            d_a = dec_a[0]
            local = (d_a - base).astype(np.uint64)
            ka = np.sort(
                (np.repeat(local, dec_a[3]) << np.uint64(POS_BITS))
                | dec_a[4])
            starts = _adjacency_start_keys(
                {**keys_fixed, a: ka}, fixed + [a])
            if len(starts) == 0:
                continue
            match_docs = np.unique(starts >> np.uint64(POS_BITS)) + base
            sc = _score_match_docs(
                merged, match_docs, sorted(dict.fromkeys(fixed + [a])),
                idf_by_term, k1, b, avgdl, None, deleted=deleted,
            )
            doc_parts.append(sc["doc_id"].to_numpy(np.int64))
            score_parts.append(sc["score"].to_numpy(np.float64))
        if not doc_parts:
            return _empty_result()
        docs = np.concatenate(doc_parts)
        scores = np.concatenate(score_parts)
        # per doc: the BEST matching expansion's score (ES MultiPhrase
        # blends idf across the expansion set, which no exact SQL engine
        # replays; max-of-matching-variants is the pinned convention)
        order = np.lexsort((-scores, docs))
        docs, scores = docs[order], scores[order]
        first = np.concatenate(
            [[True], docs[1:] != docs[:-1]]) if len(docs) else np.empty(
                0, bool)
        d_out, s_out = _topk_arrays(docs[first], scores[first], k)
        return pd.DataFrame({"doc_id": d_out, "score": s_out})

    return kernel


def phrase_prefix_topk(
    spark: SparkSession,
    cat: ParquetCatalog,
    fixed: list[str],
    prefix: str,
    k: int = 10,
    max_expansions: int = 50,
    merge: str = "spark",
) -> DataFrame:
    """ES ``match_phrase_prefix``: the phrase ``fixed + [last]`` where
    ``last`` is any dictionary term starting with ``prefix`` — the
    search-as-you-type primitive. Expansion routes through the permuterm
    tier (X71's rotation probe; df-desc/term-asc capped at
    ``max_expansions`` — the ES cap convention), then ONE positional
    kernel pass evaluates every variant: the fixed slots decode once per
    shard, each alternative adds a candidate-restricted single-term
    decode, and a doc's score is the BEST matching variant's BM25 sum
    (pinned; see kernel note). Cost per shard is adjacency over the
    fixed phrase × the alternatives actually present — bounded by the
    query, never the corpus."""
    if not fixed:
        raise ValueError(
            "phrase_prefix needs at least one fixed term before the "
            "prefix slot (a bare prefix is a prefix query)")
    if not prefix:
        raise ValueError("empty prefix")
    from mahout_spark.index.permuterm import expand_prefix_rows

    meta = cat.read_meta("postings")
    n_buckets = int(meta["n_buckets"])
    # the permuterm tier answers the prefix probe without the lexicon;
    # the full-lexicon frame here only feeds the tier-less fallback
    # (and the fixed-term df lookup below, which prunes to its buckets)
    lex = _read_query_lexicon(spark, cat, list(range(n_buckets)))
    if lex is None:
        return spark.createDataFrame([], "doc_id long, score double")
    alt_rows = expand_prefix_rows(
        spark, cat, lex, prefix, max_expansions, meta=meta)
    if not alt_rows:
        return spark.createDataFrame([], "doc_id long, score double")
    fixed_rows = (
        lex.filter(F.col("term").isin(sorted(set(fixed))))
        .select("term", "bucket", "df").collect()
    )
    alts = [r["term"] for r in alt_rows]
    lex_rows = fixed_rows + [r for r in alt_rows
                             if r["term"] not in set(fixed)]
    qterms = sorted(set(fixed) | set(alts))
    plan = _positional_query_plan(spark, cat, qterms, lex_rows)
    if plan is None:
        return spark.createDataFrame([], "doc_id long, score double")
    meta, idf_by_term, blocks, deleted, tomb = plan
    kernel = _make_phrase_prefix_kernel(
        list(fixed), alts, idf_by_term, meta["k1"], meta["b"],
        meta["avgdl"], k, int(meta["docs_per_shard"]), deleted=deleted,
    )
    return _run_positional_kernel(spark, blocks, kernel, k, merge,
                                  tomb, int(meta["docs_per_shard"]))
