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
