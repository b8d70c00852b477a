"""Benchmark driver: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headline set = index build (stats pipeline materialization) + the BM25 /
TF-IDF / TPC-H queries from __spark_entry__. Each query timed to full
materialization (count/collect). One warm-up of the corpus scan first so
JVM startup and parquet footer reads don't pollute query timings.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


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
    n_docs = docs.count()

    timings: dict[str, float] = {}

    errors: dict[str, str] = {}

    def timed(name: str, fn) -> None:
        t0 = time.perf_counter()
        try:
            fn()
        except Exception as exc:  # one broken query must not kill the run
            errors[name] = f"{type(exc).__name__}: {exc}"[:200]
            return
        timings[name] = round(time.perf_counter() - t0, 4)

    # index build throughput: full stats pipeline + posting-block index
    # build materialized to parquet (the engine's write path).
    import shutil
    import tempfile

    out_dir = tempfile.mkdtemp(prefix="msbench_")

    def build_index():
        from mahout_spark.index.build import build_index as _build

        _build(
            spark,
            docs,
            content_col="text",
            id_cols=["doc_id"],
            out_dir=os.path.join(out_dir, "index"),
            mode="text",
        )

    try:
        from mahout_spark.index.build import build_index as _probe  # noqa: F401

        timed("index_build", build_index)
    except ImportError:
        # phase-1 fallback: materialize the stats tables
        def build_stats():
            from mahout_spark.query import CorpusScorer

            scorer = CorpusScorer(docs, content_col="text", id_cols=["doc_id"])
            scorer.tfidf().write.mode("overwrite").parquet(
                os.path.join(out_dir, "tfidf")
            )

        timed("index_build", build_stats)

    qs = entry.queries()
    for name in [
        "bm25_topk_or",
        "bm25_topk_and",
        "tfidf_top5_per_doc",
        "engine_bm25_search",
        "tpch_pricing_summary",
        "revenue_by_nation",
        "events_top3_per_user",
        "quality_scores",
        "lang_id",
        "fingerprint",
        "jaccard_neardup",
        "engine_minhash_neardup",
        "engine_simhash_neardup",
        "engine_dedup_groups",
        "cosine_topk",
        "engine_embedding_neardup_lsh",
        "report_full",
    ]:
        if name in qs:
            timed(name, lambda n=name: qs[n](spark, sf_dir).collect()
                  if "topk" in n or "search" in n
                  else qs[n](spark, sf_dir).count())

    # indexed query path, if built
    try:
        from mahout_spark.index.wand import topk as wand_topk
        from mahout_spark.sources.catalog import ParquetCatalog

        cat = ParquetCatalog(os.path.join(out_dir, "index"))

        def run_wand():
            wand_topk(spark, cat, entry.BM25_QUERY_TERMS, k=10).collect()

        timed("indexed_bm25_topk", run_wand)

        # batch retrieval: 100 queries in ONE job (offline-workload shape);
        # timing under the same key budget as single-query -> amortized qps
        from mahout_spark.index.wand import topk_batch

        vocab = ["spark", "query", "data", "window", "stream", "hash",
                 "join", "merge", "sort", "vector", "table", "scan",
                 "filter", "group", "agg", "batch", "row", "key", "value"]
        batch_queries = {
            f"q{i}": [vocab[(i + j) % len(vocab)] for j in range(1 + i % 4)]
            for i in range(100)
        }

        def run_batch():
            topk_batch(spark, cat, batch_queries, k=10).collect()

        timed("indexed_bm25_batch100", run_batch)

        # warm lexicon-cached query path (Searcher): repeated-query /
        # interactive latency — zero lexicon jobs on a warm cache
        from mahout_spark.index.searcher import Searcher

        searcher = Searcher(spark, cat)
        searcher.topk(entry.BM25_QUERY_TERMS, k=10).collect()  # warm

        def run_cached():
            searcher.topk(entry.BM25_QUERY_TERMS, k=10).collect()

        timed("indexed_bm25_topk_cached", run_cached)
    except Exception:
        pass

    shutil.rmtree(out_dir, ignore_errors=True)

    total = round(sum(timings.values()), 4)
    build_sec = timings.get("index_build", 0.0) or 1e-9
    print(
        json.dumps(
            {
                "metric": "index_build_plus_queries_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_dir,
                "cpus": cpus,
                "docs_per_sec_build": round(n_docs / build_sec, 2),
                "n_docs": n_docs,
                **({"errors": errors} if errors else {}),
            }
        )
    )


if __name__ == "__main__":
    main()
