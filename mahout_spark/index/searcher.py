"""Session-scoped query front-end with lexicon caching.

A cold ``wand.topk`` call launches one lexicon-lookup job (bucket-pruned
scan + tiny collect) before the postings scan. Interactive sessions and
repeated-query workloads pay that per query even though the lexicon rows
for a term never change between index mutations. ``Searcher`` removes it:

* per-TERM driver-side cache of (bucket, df) — bounded by the number of
  distinct queried terms, NOT vocabulary size, so a 10^7-term lexicon
  never has to fit on the driver;
* one pruned lookup job per query for cache-miss terms only; a fully
  warm query launches ZERO lexicon jobs;
* automatic invalidation: the index's ``_meta.json`` is rewritten by
  every append/compaction (df and corpus stats move), so its mtime+size
  is the cache epoch — a mutated index drops the cache on the next call.

The analog at cluster scale is a query-router keeping hot lexicon
entries in memory; the postings scan stays fully distributed and
partition-pruned exactly as in ``wand.topk``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mahout_spark.index import wand
from mahout_spark.sources.catalog import ParquetCatalog


class Searcher:
    def __init__(self, spark: SparkSession, index: ParquetCatalog | str):
        self.spark = spark
        self.cat = (
            index if isinstance(index, ParquetCatalog)
            else ParquetCatalog(index)
        )
        self._epoch: tuple | None = None
        # term -> (bucket, df) | None for known-absent terms
        self._terms: dict[str, tuple | None] = {}
        self._meta: dict = {}

    # -- cache epoch --------------------------------------------------------

    def _meta_file(self) -> str:
        return os.path.join(self.cat.table_path("postings"), "_meta.json")

    def _ensure_fresh(self) -> None:
        st = os.stat(self._meta_file())
        epoch = (st.st_mtime_ns, st.st_size)
        if epoch != self._epoch:
            self._epoch = epoch
            self._terms.clear()
            self._meta = self.cat.read_meta("postings")

    # -- lexicon ------------------------------------------------------------

    def _lex_rows(self, terms: list[str]) -> list[dict]:
        from mahout_spark.functions.xxhash import term_bucket

        n_buckets = int(self._meta["n_buckets"])
        missing = sorted({t for t in terms if t not in self._terms})
        if missing:
            buckets = sorted({term_bucket(t, n_buckets) for t in missing})
            lex = wand._read_query_lexicon(self.spark, self.cat, buckets)
            rows = (
                lex.filter(F.col("term").isin(missing))
                .select("term", "bucket", "df")
                .collect()
                if lex is not None
                else []
            )
            for r in rows:
                self._terms[r["term"]] = (int(r["bucket"]), int(r["df"]))
            for t in missing:
                self._terms.setdefault(t, None)  # absent from the corpus
        return [
            {"term": t, "bucket": self._terms[t][0], "df": self._terms[t][1]}
            for t in dict.fromkeys(terms)
            if self._terms.get(t) is not None
        ]

    # -- queries ------------------------------------------------------------

    def topk(
        self, terms: list[str], k: int = 10, mode_all: bool = False,
        prune: bool = True,
    ) -> DataFrame:
        self._ensure_fresh()
        return wand.topk(
            self.spark, self.cat, terms, k=k, mode_all=mode_all,
            prune=prune, lex_rows=self._lex_rows(terms),
        )

    def topk_batch(
        self, queries: dict[str, list[str]], k: int = 10,
        mode_all: bool = False,
    ) -> DataFrame:
        self._ensure_fresh()
        all_terms = sorted({t for ts in queries.values() for t in ts})
        return wand.topk_batch(
            self.spark, self.cat, queries, k=k, mode_all=mode_all,
            lex_rows=self._lex_rows(all_terms),
        )
