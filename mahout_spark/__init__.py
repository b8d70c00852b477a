"""mahout_spark — a from-scratch PySpark-native inverted-index builder and
BM25 top-k query engine with the query/data-processing capabilities of the
reference corpus-analysis project (sarnobat/mahout), generalized per
BASELINE.json: code-aware tokenization, posting-list construction with
delta-gap + varint compression and per-block max-score metadata,
document-sharded partitioning for skew-free scale-out, and rank-identical
BM25 (k1=1.2, b=0.75) / reference-TF-IDF scoring.

Everything is DataFrame-first: Catalyst plans the physical execution; the
only Python on the hot path is Arrow-batched pandas UDFs (tokenizer and
posting-block codec kernels).
"""

__version__ = "0.1.0"

BM25_K1 = 1.2
BM25_B = 0.75


def __getattr__(name):
    """Lazy public API (imports deferred so ``import mahout_spark`` stays
    instant and side-effect-free):

    * ``CorpusScorer`` — full-scan TF-IDF/BM25 scorer (no index);
    * ``build_index`` / ``append_to_index`` — posting-block index
      lifecycle;
    * ``topk`` / ``topk_batch`` — indexed block-max retrieval;
    * ``Searcher`` — lexicon-caching query front-end;
    * ``compact_index`` — post-append defragmentation + tight bounds;
    * ``ingest_files`` — raw files → canonical docs table;
    * ``get_spark`` — tuned SparkSession factory.
    """
    if name == "CorpusScorer":
        from mahout_spark.query import CorpusScorer
        return CorpusScorer
    if name == "build_index":
        from mahout_spark.index.build import build_index
        return build_index
    if name == "append_to_index":
        from mahout_spark.index.append import append_to_index
        return append_to_index
    if name == "topk":
        from mahout_spark.index.wand import topk
        return topk
    if name == "topk_batch":
        from mahout_spark.index.wand import topk_batch
        return topk_batch
    if name == "Searcher":
        from mahout_spark.index.searcher import Searcher
        return Searcher
    if name == "compact_index":
        from mahout_spark.index.compact import compact_index
        return compact_index
    if name == "ingest_files":
        from mahout_spark.sources.files import ingest_files
        return ingest_files
    if name == "get_spark":
        from mahout_spark.session import get_spark
        return get_spark
    raise AttributeError(f"module 'mahout_spark' has no attribute {name!r}")
