"""Indexed top-k retrieval with block-max pruning (SURVEY.md §7.1 Phase 3).

Distributed shape: query terms -> lexicon lookup (tiny collect) -> partition
-pruned scan of only those terms' bucket directories -> shuffle blocks by
``shard`` so each task holds *all* query terms' blocks for one docid range
-> vectorized per-shard kernel -> per-shard top-k -> global
TakeOrderedAndProject merge. Wall-clock scales with postings of the query
terms only, never corpus size.

Per-shard kernel (OR queries) — exact, safe-up-to-k block-max pruning:

 1. seed: decode the single highest-max block; its docs' single-term
    contributions are *lower bounds* of their totals, so the k-th largest
    seed is a valid threshold θ (there exist ≥k docs with total ≥ θ).
 2. prune: block b of term t survives iff
        block_max(b) + Σ_{t'≠t} shard_max(t') > θ
    A doc appearing only in pruned blocks has total ≤ that bound ≤ θ for
    every block it belongs to, so it cannot enter the top-k.
 3. candidates C = docs of surviving blocks. Pruned blocks whose docid range
    overlaps C are decoded too (a candidate's score must include *all* its
    term contributions), filtered to C.
 4. exact scores: contributions concatenated in sorted-term order, stable-
    sorted by doc, summed left-to-right (add.reduceat) — the same
    deterministic reduction order as the oracle; top-k by (score desc,
    doc_id asc).

AND queries intersect doc sets rarest-term-first with range-skipping, then
score exactly. Both paths return results rank-identical to the naive
full-scan scorer (gated by tests on every fixture query).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mahout_spark.index.codec import decode_doc_block
from mahout_spark.sources.catalog import ParquetCatalog


def _read_query_lexicon(
    spark: SparkSession, cat: ParquetCatalog, qbuckets: list[int]
):
    """Bucket-pruned lexicon read that fails LOUDLY on format mismatch.

    Missing bucket dirs mean "terms absent" ONLY when the lexicon table is
    actually bucket-partitioned; a lexicon in the old unpartitioned layout
    (or a missing table) must raise, not silently answer every query with
    zero hits. Returns None when the requested buckets are genuinely
    absent from a bucketed lexicon."""
    import os

    try:
        return cat.read_partitions(spark, "lexicon", "bucket", qbuckets)
    except FileNotFoundError:
        lex_path = cat.table_path("lexicon")
        if not os.path.isdir(lex_path):
            raise FileNotFoundError(
                f"index at {cat.root} has no lexicon table — not a built "
                "index (or the build did not complete)"
            ) from None
        entries = os.listdir(lex_path)
        if any(d.startswith("bucket=") for d in entries):
            return None  # bucketed lexicon; these terms' buckets are empty
        if not any(f.endswith(".parquet") or f.startswith("part-")
                   for f in entries):
            return None  # empty index (zero-doc corpus): no terms exist
        # legacy unpartitioned lexicon: fall back to the full read (loses
        # bucket pruning but stays correct across index format versions)
        return cat.read(spark, "lexicon")


def _score_arrays(doc, tf, dl, idf, k1, b, avgdl):
    tff = tf.astype(np.float64)
    return idf * (tff * (k1 + 1.0)) / (
        tff + k1 * (1.0 - b + b * dl.astype(np.float64) / avgdl)
    )


def _topk_arrays(docs: np.ndarray, scores: np.ndarray, k: int):
    """Top-k by (score desc, doc_id asc). A plain argpartition cut would
    break score TIES arbitrarily at the k boundary (e.g. duplicate
    documents): the kept member of a tie must be the lowest doc_id, or the
    shard's answer diverges from the oracle's total order. lexsort is the
    tie-aware selection; candidate counts per shard are block-pruned, so
    the full sort is cheap."""
    order = np.lexsort((docs, -scores))[:k]
    return docs[order], scores[order]


def _make_shard_kernel(idf_by_term: dict, k1: float, b: float, avgdl: float,
                       k: int, mode_all: bool, n_terms: int, prune: bool,
                       use_stored_bounds: bool = True,
                       deleted: np.ndarray | None = None,
                       after: tuple | None = None):
    terms_sorted = sorted(idf_by_term)  # deterministic reduction order

    def block_bounds(g: pd.DataFrame, t: str) -> np.ndarray:
        """Per-block score upper bounds. Stored block_max_score is the
        tight (exact) bound but is computed with build-time df/avgdl; after
        appends we recompute a stats-independent bound from (block_max_tf,
        block_min_dl): contribution is monotone increasing in tf and
        decreasing in dl, so idf_now·f_now(max_tf, min_dl) dominates every
        posting in the block under the *current* stats."""
        if use_stored_bounds:
            return g["block_max_score"].to_numpy()
        tfm = g["block_max_tf"].to_numpy(np.float64)
        dlm = g["block_min_dl"].to_numpy(np.float64)
        return idf_by_term[t] * (tfm * (k1 + 1.0)) / (
            tfm + k1 * (1.0 - b + b * dlm / avgdl)
        )

    def kernel(pdf, *, deleted=deleted):  # kw-only: applyInPandas sees 1 arg
        groups = {t: g for t, g in pdf.groupby("term")}
        present = [t for t in terms_sorted if t in groups]
        if mode_all and len(present) < n_terms:
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                 "score": pd.Series([], dtype="float64")})

        def decode_rows(g: pd.DataFrame, mask=None):
            rows = g if mask is None else g[mask]
            out = []
            for r in rows.itertuples(index=False):
                out.append(decode_doc_block(r.doc_ids, r.tfs, r.doclens))
            if not out:
                e = np.empty(0, np.uint64)
                return e, e, e
            return (
                np.concatenate([o[0] for o in out]),
                np.concatenate([o[1] for o in out]),
                np.concatenate([o[2] for o in out]),
            )

        per_term: dict[str, tuple] = {}

        if mode_all:
            # rarest-first intersection with range skipping
            by_size = sorted(present, key=lambda t: int(groups[t]["count"].sum()))
            cand = None
            for t in by_size:
                g = groups[t]
                if cand is None:
                    d, tf_, dl_ = decode_rows(g)
                else:
                    lo = np.searchsorted(cand, g["first_docid"].to_numpy(np.uint64))
                    hi = np.searchsorted(
                        cand, g["block_max_docid"].to_numpy(np.uint64), "right"
                    )
                    d, tf_, dl_ = decode_rows(g, hi > lo)
                    keep = np.isin(d, cand)
                    d, tf_, dl_ = d[keep], tf_[keep], dl_[keep]
                per_term[t] = (d, tf_, dl_)
                cand = np.sort(d) if cand is None else np.intersect1d(cand, d)
                if len(cand) == 0:
                    return pd.DataFrame(
                        {"doc_id": pd.Series([], dtype="int64"),
                         "score": pd.Series([], dtype="float64")})
            keep_set = cand
        else:
            bounds = {t: block_bounds(groups[t], t) for t in present}
            shard_max = {t: float(bounds[t].max()) for t in present}
            total_max = sum(shard_max.values())
            theta = -np.inf
            # search_after: θ may only be seeded from CURSOR-ELIGIBLE
            # docs, but the seed's single-term scores are LOWER bounds on
            # totals — a doc whose lb clears the cursor may still total
            # past it, so any seed could over-prune true page-2 hits.
            # Pagination therefore pays the unpruned in-shard scan (the
            # per-shard k-heap still bounds the output); ES's collector
            # makes the same trade absent exact per-doc bounds.
            if prune and len(present) > 1 and after is None:
                # seed θ from the globally best block's exact contributions
                best_t = max(present, key=lambda t: shard_max[t])
                g = groups[best_t]
                top_row = g.iloc[int(bounds[best_t].argmax())]
                d, tf_, dl_ = decode_doc_block(
                    top_row.doc_ids, top_row.tfs, top_row.doclens
                )
                lb = _score_arrays(d, tf_, dl_, idf_by_term[best_t], k1, b, avgdl)
                if deleted is not None and len(d):
                    # θ must come from LIVE docs only: a threshold seeded
                    # by a tombstoned doc could over-prune (fewer than k
                    # live docs might clear it) — see index/delete.py.
                    live = ~np.isin(d, deleted)
                    lb = lb[live]
                if len(lb) >= k:
                    theta = float(np.partition(lb, len(lb) - k)[len(lb) - k])
            # decode: surviving blocks, then pruned blocks overlapping C
            surviving, pruned = {}, {}
            for t in present:
                g = groups[t]
                ub = bounds[t] + (total_max - shard_max[t])
                # >= not >: for a top-k doc d in block b, ub(b) >= total(d)
                # >= θ with EQUALITY possible when >=k tied copies of the
                # best doc exist — strict pruning would drop them all
                live = ub >= theta
                surviving[t] = g[live]
                pruned[t] = g[~live]
            # decode each term's surviving blocks ONCE; reuse for both the
            # candidate set and the scoring pass (decode is the hot cost)
            surv_decoded = {t: decode_rows(surviving[t]) for t in present}
            cand_parts = [surv_decoded[t][0] for t in present]
            cand = np.unique(np.concatenate(cand_parts)) if cand_parts else (
                np.empty(0, np.uint64))
            for t in present:
                d, tf_, dl_ = surv_decoded[t]
                gp = pruned[t]
                if len(gp) and len(cand):
                    lo = np.searchsorted(cand, gp["first_docid"].to_numpy(np.uint64))
                    hi = np.searchsorted(
                        cand, gp["block_max_docid"].to_numpy(np.uint64), "right"
                    )
                    overlap = (hi > lo)
                    if overlap.any():
                        d2, tf2, dl2 = decode_rows(gp, overlap)
                        keep = np.isin(d2, cand)
                        d = np.concatenate([d, d2[keep]])
                        tf_ = np.concatenate([tf_, tf2[keep]])
                        dl_ = np.concatenate([dl_, dl2[keep]])
                per_term[t] = (d, tf_, dl_)
            keep_set = None

        # exact scoring, deterministic reduction order (sorted-term, then
        # stable sort by doc -> left-to-right add.reduceat)
        doc_parts, contrib_parts = [], []
        for t in present:
            d, tf_, dl_ = per_term[t]
            if keep_set is not None and len(d):
                m = np.isin(d, keep_set)
                d, tf_, dl_ = d[m], tf_[m], dl_[m]
            if len(d) == 0:
                continue
            doc_parts.append(d)
            contrib_parts.append(
                _score_arrays(d, tf_, dl_, idf_by_term[t], k1, b, avgdl)
            )
        if not doc_parts:
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                 "score": pd.Series([], dtype="float64")})
        docs = np.concatenate(doc_parts)
        contribs = np.concatenate(contrib_parts)
        order = np.argsort(docs, kind="stable")
        docs, contribs = docs[order], contribs[order]
        boundaries = np.concatenate(
            [[0], np.flatnonzero(docs[1:] != docs[:-1]) + 1]
        )
        uniq = docs[boundaries]
        sums = np.add.reduceat(contribs, boundaries)
        if deleted is not None:
            live = ~np.isin(uniq, deleted)
            uniq, sums = uniq[live], sums[live]
        uniq = uniq.astype(np.int64)
        if after is not None:
            # keep docs strictly AFTER the cursor in (score desc, id asc)
            # order; scores are this kernel's own deterministic doubles,
            # so equality against a page-1 score is exact by construction
            cs, cd = float(after[0]), int(after[1])
            m = (sums < cs) | ((sums == cs) & (uniq > cd))
            uniq, sums = uniq[m], sums[m]
        d_out, s_out = _topk_arrays(uniq, sums, k)
        return pd.DataFrame({"doc_id": d_out, "score": s_out})

    return kernel


def topk(
    spark: SparkSession,
    cat: ParquetCatalog,
    terms: list[str],
    k: int = 10,
    mode_all: bool = False,
    prune: bool = True,
    lex_rows: list | None = None,
    merge: str = "spark",
    deleted: np.ndarray | None = None,
    after: tuple | None = None,
) -> DataFrame:
    """BM25 top-k over the built index; rank-identical to the naive scorer.

    ``after`` — the ES ``search_after`` cursor ``(score, doc_id)`` of the
    previous page's LAST hit: only docs strictly after it in
    (score desc, doc_id asc) order are returned, so consecutive pages
    tile the total ranking with no overlap and no skips regardless of
    score ties at page boundaries. Unlike from+size pagination, page N
    costs one k-deep pass — no shard materializes N·k rows. The cursor
    disables θ-seeding (see the kernel note: a seed from a pre-cursor
    doc could over-prune true page hits) but keeps the per-shard k-heap.

    ``lex_rows`` (term/bucket/df mappings) can be supplied by a caller
    that caches lexicon lookups across queries (index.searcher.Searcher)
    — then this launches no lexicon job at all.

    ``merge``: how the per-shard top-k rows become the global top-k.
    ``"spark"`` (default) is a TakeOrderedAndProject — fully distributed,
    the right call inside larger plans. ``"driver"`` collects the <=k
    rows per shard and merges them driver-side (k·n_shards tiny rows —
    bounded by the QUERY, not the corpus), cutting the final exchange
    stage out of the interactive-latency path; the result comes back as
    a local DataFrame with identical rows/ordering."""
    meta = cat.read_meta("postings")
    avgdl, n_docs = meta["avgdl"], meta["n_docs"]
    k1, b = meta["k1"], meta["b"]
    # stored block_max_score was computed with build-time stats; after any
    # append df/avgdl may have moved, so switch to the append-safe bounds.
    use_stored_bounds = int(meta.get("appends", 0)) == 0
    tomb = None
    if deleted is None and int(meta.get("deletes", 0)):
        from mahout_spark.index.delete import deleted_set

        deleted, tomb = deleted_set(spark, cat, meta)
    qterms = list(dict.fromkeys(terms))
    # term -> bucket is pure hash math (pmod(xxhash64)), replicated driver-
    # side by the bit-compatible pure-Python XXH64 (functions/xxhash.py,
    # equality locked by tests) — no Spark job at all for the routing step.
    # Lexicon lookup then reads ONLY those bucket dirs (partition pruning
    # over the vocabulary, the same story as the postings scan below).
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
    empty = spark.createDataFrame([], "doc_id long, score double")
    if not lex_rows:
        return empty
    idf_by_term = {
        r["term"]: float(np.log(1.0 + (n_docs - r["df"] + 0.5) / (r["df"] + 0.5)))
        for r in lex_rows
    }
    if mode_all and len(idf_by_term) < len(qterms):
        return empty  # a query term absent from the corpus -> empty AND
    buckets = sorted({r["bucket"] for r in lex_rows})
    blocks = cat.read_partitions(spark, "postings", "bucket", buckets).filter(
        F.col("term").isin(list(idf_by_term))
    )
    kernel = _make_shard_kernel(
        idf_by_term, k1, b, avgdl, k, mode_all, len(qterms), prune,
        use_stored_bounds=use_stored_bounds, deleted=deleted, after=after,
    )
    from mahout_spark.index.delete import apply_shard_kernel

    per_shard = apply_shard_kernel(
        blocks, kernel, "doc_id long, score double",
        tomb, int(meta["docs_per_shard"]),
    )
    if merge == "driver":
        rows = sorted(
            per_shard.collect(), key=lambda r: (-r["score"], r["doc_id"])
        )[:k]
        return spark.createDataFrame(rows, "doc_id long, score double")
    return per_shard.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k)


def topk_batch(
    spark: SparkSession,
    cat: ParquetCatalog,
    queries: dict[str, list[str]],
    k: int = 10,
    mode_all: bool = False,
    lex_rows: list | None = None,
    deleted: np.ndarray | None = None,
) -> DataFrame:
    """Answer MANY queries in ONE job: (query_id, doc_id, score, rank).

    The per-query ``topk`` pays a fixed ~0.5 s of job-launch/scan setup —
    fine interactively, hopeless for offline workloads (hard-negative
    mining, eval sweeps) that run 10^4-10^6 queries. Here the union of
    all query terms prunes one postings scan, every term's blocks are
    decoded ONCE per shard, and each query aggregates its own terms'
    contributions from the shared decode — cost scales with distinct
    terms touched, not with query count. Exactness contract identical to
    ``topk`` (same deterministic reduction order, same tie-break);
    equality with per-query retrieval is test-gated.
    """
    meta = cat.read_meta("postings")
    avgdl, n_docs = meta["avgdl"], meta["n_docs"]
    k1, b = meta["k1"], meta["b"]
    n_buckets = int(meta["n_buckets"])
    from mahout_spark.functions.xxhash import term_bucket

    qmap = {qid: list(dict.fromkeys(ts)) for qid, ts in queries.items()}
    all_terms = sorted({t for ts in qmap.values() for t in ts})
    out_schema = "query_id string, doc_id long, score double"
    empty = spark.createDataFrame([], out_schema + ", rank int")
    if not all_terms:
        return empty
    if lex_rows is None:
        qbuckets = sorted({term_bucket(t, n_buckets) for t in all_terms})
        lex = _read_query_lexicon(spark, cat, qbuckets)
        if lex is None:
            return empty
        lex_rows = (
            lex.filter(F.col("term").isin(all_terms))
            .select("term", "bucket", "df")
            .collect()
        )
    if not lex_rows:
        return empty
    idf_by_term = {
        r["term"]: float(np.log(1.0 + (n_docs - r["df"] + 0.5) / (r["df"] + 0.5)))
        for r in lex_rows
    }
    present_terms = set(idf_by_term)
    live_queries = {
        qid: ts for qid, ts in qmap.items()
        if (all(t in present_terms for t in ts) if mode_all
            else any(t in present_terms for t in ts))
    }
    if not live_queries:
        return empty
    buckets = sorted({r["bucket"] for r in lex_rows})
    blocks = cat.read_partitions(spark, "postings", "bucket", buckets).filter(
        F.col("term").isin(sorted(present_terms))
    )
    tomb = None
    if deleted is None and int(meta.get("deletes", 0)):
        from mahout_spark.index.delete import deleted_set

        deleted, tomb = deleted_set(spark, cat, meta)
    kernel = _make_batch_shard_kernel(
        live_queries, idf_by_term, k1, b, avgdl, k, mode_all,
        deleted=deleted,
    )
    from mahout_spark.index.delete import apply_shard_kernel

    per_shard = apply_shard_kernel(
        blocks, kernel, out_schema, tomb, int(meta["docs_per_shard"]),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        per_shard.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _make_batch_shard_kernel(
    queries: dict[str, list[str]], idf_by_term: dict, k1: float, b: float,
    avgdl: float, k: int, mode_all: bool,
    deleted: np.ndarray | None = None,
):
    """Shared-decode multi-query kernel: decode each term's blocks once per
    shard, then answer every query from the cached per-term arrays with
    the same deterministic reduction as the single-query kernel."""
    qitems = sorted(queries.items())

    def kernel(pdf, *, deleted=deleted):  # kw-only: applyInPandas sees 1 arg
        groups = {t: g for t, g in pdf.groupby("term")}
        decoded: dict[str, tuple] = {}

        def decode_term(t):
            if t not in decoded:
                g = groups[t]
                parts = [
                    decode_doc_block(r.doc_ids, r.tfs, r.doclens)
                    for r in g.itertuples(index=False)
                ]
                d = np.concatenate([p[0] for p in parts])
                tf_ = np.concatenate([p[1] for p in parts])
                dl_ = np.concatenate([p[2] for p in parts])
                decoded[t] = (
                    d,
                    _score_arrays(d, tf_, dl_, idf_by_term[t], k1, b, avgdl),
                )
            return decoded[t]

        out_q, out_d, out_s = [], [], []
        for qid, terms in qitems:
            present = [t for t in sorted(set(terms)) if t in groups]
            if not present or (mode_all and len(present) < len(set(terms))):
                continue
            doc_parts, contrib_parts = [], []
            for t in present:
                d, c = decode_term(t)
                doc_parts.append(d)
                contrib_parts.append(c)
            docs = np.concatenate(doc_parts)
            contribs = np.concatenate(contrib_parts)
            order = np.argsort(docs, kind="stable")
            docs, contribs = docs[order], contribs[order]
            bounds = np.concatenate(
                [[0], np.flatnonzero(docs[1:] != docs[:-1]) + 1]
            )
            uniq = docs[bounds]
            sums = np.add.reduceat(contribs, bounds)
            if mode_all:
                counts = np.diff(np.concatenate([bounds, [len(docs)]]))
                keep = counts == len(present)
                uniq, sums = uniq[keep], sums[keep]
                if len(uniq) == 0:
                    continue
            if deleted is not None:
                live = ~np.isin(uniq, deleted)
                uniq, sums = uniq[live], sums[live]
            d_out, s_out = _topk_arrays(uniq.astype(np.int64), sums, k)
            out_q.extend([qid] * len(d_out))
            out_d.extend(d_out.tolist())
            out_s.extend(s_out.tolist())
        return pd.DataFrame(
            {"query_id": out_q, "doc_id": out_d, "score": out_s}
        )

    return kernel
