"""Benchmark driver: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "trials":
{...}, "sf": ...}

Measurement protocol (round-3 fix — single-shot timings on this host
class could not distinguish a real 4x regression from host weather, see
BENCH/BASELINE.md):

* every query runs >= 2 trials; if the two differ by > 30% a third runs;
* ``queries[name]`` = BEST trial (the number the round-over-round compare
  should use: host noise only ever inflates), ``trials[name]`` = every
  trial in run order, so trials[0] is the session-cold time (for the
  dedup/signature queries that is the python-worker + codegen cold path)
  and later entries are warm;
* one warm-up scan of every input file first, so parquet footer reads and
  JVM startup never pollute query timings;
* ``index_build`` trials build into FRESH directories (resume would
  short-circuit trial 2); the last build is kept for the indexed-query
  phase.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

TRIAL_SPREAD = 0.30  # best-of-2 unless they disagree by more than this
MAX_TRIALS = 3


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import __spark_entry__ as entry
    from mahout_spark.session import get_spark

    spark = get_spark(cpus=cpus, app_name="mahout_spark_bench")

    # warm-up: touch every input file once
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.count()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    n_docs = docs.count()

    # warm the Arrow python-worker pool (one task per core) before any
    # timed work — worker spawn + numpy/pandas imports otherwise land on
    # whichever UDF query runs first and read as a 10-40 s phantom cost
    # (measured: the minhash signature stage alone swings 16.6 -> 0.5 s
    # across executions in one session purely from worker warmup; same
    # protocol as BENCH/scaling_run.py)
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    def _warm_fn(x):
        return x.astype("int32")

    _warm = F.pandas_udf(_warm_fn, T.IntegerType())
    spark.range(10_000, numPartitions=cpus).select(
        F.sum(_warm(F.col("id")))
    ).first()

    # A/A window-quality probe (round-3 VERDICT ask #10): the same fixed
    # query three times, warm, before any timed work. On this host class
    # identical runs swing 2-4x under hypervisor co-tenancy; recording the
    # probe spread in the summary lets every BENCH_r*.json self-document
    # whether its window was clean (spread <~20%) or noisy, so regressions
    # can be judged against the probe instead of re-derived host weather.
    aa_trials: list[float] = []
    docs.groupBy().agg(  # untimed warm-up: exclude codegen cold-start
        F.sum(F.length("text")), F.count("*")
    ).collect()
    for _ in range(3):
        t0 = time.perf_counter()
        docs.groupBy().agg(
            F.sum(F.length("text")), F.count("*")
        ).collect()
        aa_trials.append(round(time.perf_counter() - t0, 4))
    aa_spread = round(
        (max(aa_trials) - min(aa_trials)) / max(min(aa_trials), 1e-9), 4
    )

    best: dict[str, float] = {}
    trials: dict[str, list[float]] = {}
    errors: dict[str, str] = {}

    def timed(name: str, fn) -> None:
        ts: list[float] = []
        for i in range(MAX_TRIALS):
            t0 = time.perf_counter()
            try:
                fn()
            except Exception as exc:  # a broken query must not kill the run
                errors[name] = f"{type(exc).__name__}: {exc}"[:200]
                return
            ts.append(round(time.perf_counter() - t0, 4))
            if i >= 1 and (max(ts[-2:]) - min(ts[-2:])) / max(
                min(ts[-2:]), 1e-9
            ) <= TRIAL_SPREAD:
                break
        trials[name] = ts
        best[name] = min(ts)

    # index build throughput: full stats pipeline + posting-block index
    # build materialized to parquet (the engine's write path).
    import shutil
    import tempfile

    out_dir = tempfile.mkdtemp(prefix="msbench_")
    build_dirs = iter([os.path.join(out_dir, f"index{i}") for i in range(9)])
    last_index = {"path": None}

    def build_index():
        from mahout_spark.index.build import build_index as _build

        path = next(build_dirs)
        _build(
            spark,
            docs,
            content_col="text",
            id_cols=["doc_id"],
            out_dir=path,
            mode="text",
        )
        if last_index["path"]:
            shutil.rmtree(last_index["path"], ignore_errors=True)
        last_index["path"] = path

    timed("index_build", build_index)

    qs = entry.queries()
    for name in [
        "bm25_topk_or",
        "bm25_topk_and",
        "tfidf_top5_per_doc",
        "engine_bm25_search",
        "engine_indexed_bm25_simple",
        "tpch_pricing_summary",
        "revenue_by_nation",
        "events_top3_per_user",
        "quality_scores",
        "lang_id",
        "fingerprint",
        "chunk_documents",
        "phrase_snippets",
        "jaccard_neardup",
        "engine_minhash_neardup",
        "engine_simhash_neardup",
        "engine_dedup_groups",
        "cosine_topk",
        "engine_embedding_neardup_lsh",
        "engine_percolate",
        "engine_pq_ann",
        "engine_bbq_ann",
        "repetition_signals",
        "decontaminate",
        "pack_sequences",
        "lm_quality",
        "c4_filters",
        "gopher_filters",
        "curate_pipeline",
        "dedup_lines",
        "remove_boilerplate",
        "dsir_weights",
        "token_budget",
        "domain_cap",
        "asof_join",
        "range_join",
        "rollup_day",
        "funnel",
        "report_full",
        "engine_highlight",
        "dedup_spans",
    ]:
        # NOTE (round 5): engine_* entries now resolve their index via
        # the contract's memoized _shared_index — the FIRST trial pays
        # the build, warm trials measure the query path alone (trial
        # lists make the split visible; index_build above remains the
        # build-throughput metric). Round-over-round, compare r5 warm
        # trials against r4 best-of-trials MINUS its per-call build.
        if name in qs:
            timed(name, lambda n=name: qs[n](spark, sf_dir).collect()
                  if "topk" in n or "search" in n
                  else qs[n](spark, sf_dir).count())

    # percolator prefilter tier: registry-size scaling (the 10^5 rule).
    # Sublinearity gate: wall(8k) / wall(1k) must sit far below 8x — the
    # prefiltered evaluator's per-doc cost follows candidate counts, not
    # registry size (compare in BENCH/BASELINE.md).
    try:
        from mahout_spark.index.percolate import percolate_prefiltered

        # realistic alert-rule registry: rules trigger on SPECIFIC
        # (rare-ish) corpus terms — the percolator workload shape (entity
        # watchlists, taxonomy rules). One df aggregation derives the
        # trigger vocabulary; each doc then matches few rules' covers.
        tok = F.explode(F.array_distinct(F.split(
            F.lower(F.col("text")), "[^a-z0-9]+"))).alias("term")
        pvocab = [
            r["term"] for r in (
                docs.select(tok).filter(F.col("term") != "")
                .groupBy("term").count()
                .filter(F.col("count").between(3, 500))
                .orderBy("term").limit(8_000).collect()
            )
        ]

        def _registry(size):
            V = len(pvocab)
            out = {}
            for i in range(size):
                a, b = pvocab[(i * 13) % V], pvocab[(i * 29 + 7) % V]
                c = pvocab[(i * 7 + 3) % V]
                out[f"p{i}"] = (
                    f"{a} AND {b}" if i % 3 == 0
                    else f'"{a} {b}" OR {c}' if i % 3 == 1
                    else f"{a} OR {b} AND {c}"
                )
            return out

        r1k, r8k = _registry(1_000), _registry(8_000)
        timed("percolate_prefilter_1k", lambda: percolate_prefiltered(
            spark, r1k, docs, content_col="text").count())
        timed("percolate_prefilter_8k", lambda: percolate_prefiltered(
            spark, r8k, docs, content_col="text").count())
    except Exception as exc:
        errors["percolate_prefilter"] = f"{type(exc).__name__}: {exc}"[:200]

    # indexed query path over the kept build
    try:
        from mahout_spark.index.wand import topk as wand_topk
        from mahout_spark.index.wand import topk_batch
        from mahout_spark.sources.catalog import ParquetCatalog

        cat = ParquetCatalog(last_index["path"])

        timed("indexed_bm25_topk", lambda: wand_topk(
            spark, cat, entry.BM25_QUERY_TERMS, k=10
        ).collect())

        # batch retrieval: 100 queries in ONE job (offline-workload shape)
        vocab = ["spark", "query", "data", "window", "stream", "hash",
                 "join", "merge", "sort", "vector", "table", "scan",
                 "filter", "group", "agg", "batch", "row", "key", "value"]
        batch_queries = {
            f"q{i}": [vocab[(i + j) % len(vocab)] for j in range(1 + i % 4)]
            for i in range(100)
        }
        timed("indexed_bm25_batch100", lambda: topk_batch(
            spark, cat, batch_queries, k=10
        ).collect())

        # boolean / prefix query language over the standard index
        from mahout_spark.index.boolquery import boolean_topk

        timed("indexed_prefix_topk", lambda: boolean_topk(
            spark, cat, entry.PREFIX_QUERY, k=10
        ).collect())

        # the same prefix query through the permuterm tier (round-4
        # VERDICT ask #2): rotation-prefix point probe vs the full
        # lexicon scan above — identical results, plan-gated in tests
        from mahout_spark.index.permuterm import build_permuterm

        timed("permuterm_build", lambda: build_permuterm(spark, cat))
        timed("indexed_prefix_tiered_topk", lambda: boolean_topk(
            spark, cat, entry.PREFIX_QUERY, k=10
        ).collect())

        # warm lexicon-cached query path (Searcher.topk_rows): repeated-
        # query / interactive latency — zero lexicon jobs on a warm
        # cache, and the scoring kernel runs on the driver over the
        # terms' collected blocks (one job, no shuffle) when Σdf is
        # under the query-node cap
        from mahout_spark.index.searcher import Searcher

        searcher = Searcher(spark, cat)
        searcher.topk_rows(entry.BM25_QUERY_TERMS, k=10)  # warm
        timed("indexed_bm25_topk_cached", lambda: searcher.topk_rows(
            entry.BM25_QUERY_TERMS, k=10
        ))
    except Exception as exc:
        errors["indexed_path"] = f"{type(exc).__name__}: {exc}"[:200]

    # positional index + exact-phrase retrieval (X38). Build pays the
    # occurrence-level shuffle positions require (vs term_frequencies'
    # map-side combine) — benched separately so the premium is visible.
    try:
        from mahout_spark.index.phrase import phrase_topk

        pos_dirs = iter(
            [os.path.join(out_dir, f"posindex{i}") for i in range(9)]
        )
        last_pos = {"path": None}

        def build_pos_index():
            from mahout_spark.index.build import build_index as _build

            path = next(pos_dirs)
            _build(
                spark, docs, content_col="text", id_cols=["doc_id"],
                out_dir=path, mode="simple", positions=True,
            )
            if last_pos["path"]:
                shutil.rmtree(last_pos["path"], ignore_errors=True)
            last_pos["path"] = path

        timed("positional_index_build", build_pos_index)
        pcat = ParquetCatalog(last_pos["path"])
        timed("indexed_phrase_topk", lambda: phrase_topk(
            spark, pcat, ["table", "scan"], k=10
        ).collect())

        from mahout_spark.index.phrase import proximity_topk

        timed("indexed_proximity_topk", lambda: proximity_topk(
            spark, pcat, ["data", "merge"], 8, k=10
        ).collect())

        from mahout_spark.index.boolquery import boolean_topk

        timed("indexed_boolean_topk", lambda: boolean_topk(
            spark, pcat, entry.BOOL_QUERY, k=10
        ).collect())

        # warm-cache interactive phrase latency (Searcher query-node path)
        psearcher = Searcher(spark, pcat)
        psearcher.phrase_topk_rows(["table", "scan"], k=10)  # warm
        timed("indexed_phrase_topk_cached", lambda: psearcher.phrase_topk_rows(
            ["table", "scan"], k=10
        ))

        # batched boolean retrieval (X58): 20 full-language queries
        # answered from one shared per-shard decode
        from mahout_spark.index.boolquery import boolean_topk_batch

        bvocab = ["table", "scan", "data", "merge", "stream", "query",
                  "filter", "group", "join", "sort"]
        bqueries = {
            f"b{i}": f"{bvocab[i % 10]} OR {bvocab[(i + 3) % 10]} "
                     f"AND {bvocab[(i + 5) % 10]}"
            for i in range(20)
        }
        timed("indexed_boolean_batch20", lambda: boolean_topk_batch(
            spark, pcat, bqueries, k=10
        ).collect())

        # search-time aggregations (X65) over the full match set
        from mahout_spark.index.aggs import significant_terms

        timed("indexed_significant_terms", lambda: significant_terms(
            spark, pcat, "table AND data", n=10
        ).collect())

        # hybrid lexical+vector retrieval (X63/X64) — embedding table
        # scanned once per query with the window broadcast into it
        from mahout_spark.index.hybrid import hybrid_topk, rescore_topk

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        qvec = [float(x) for x in
                emb.filter(F.col("vec_id") == 0).first()["embedding"]]
        timed("indexed_rescore_topk", lambda: rescore_topk(
            spark, pcat, "table OR data OR merge", emb, qvec,
            k=10, window=50, rescore_weight=0.5,
        ).collect())
        timed("indexed_hybrid_rrf", lambda: hybrid_topk(
            spark, pcat, "table OR data OR merge", emb, qvec,
            k=10, depth=50,
        ).collect())
    except Exception as exc:
        errors["positional_path"] = f"{type(exc).__name__}: {exc}"[:200]

    shutil.rmtree(out_dir, ignore_errors=True)

    total = round(sum(best.values()), 4)
    build_sec = best.get("index_build", 0.0) or 1e-9
    summary = {
        "metric": "index_build_plus_queries_wall",
        "value": total,
        "unit": "sec",
        "queries": best,
        "sf": sf_dir,
        "cpus": cpus,
        "docs_per_sec_build": round(n_docs / build_sec, 2),
        "n_docs": n_docs,
        "aa_probe": {"trials": aa_trials, "spread": aa_spread},
        **({"errors": errors} if errors else {}),
    }
    full = dict(summary)
    full["trials"] = trials
    # Truncation-proofing (round-3 VERDICT ask #6: BENCH_r03.json's tail
    # capture decapitated the one huge JSON line and `parsed` came back
    # null). Emit the FULL payload (with per-query trial lists) first and
    # to a sidecar file, then the compact summary as the FINAL line — a
    # tail capture of any length ends on a complete, parseable line, and
    # a head capture starts on one.
    here = os.path.dirname(os.path.abspath(__file__))
    try:
        with open(os.path.join(here, "BENCH", "latest_full.json"), "w") as f:
            json.dump(full, f)
    except OSError:
        pass
    print(json.dumps(full))
    summary["trials_file"] = "BENCH/latest_full.json"
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
