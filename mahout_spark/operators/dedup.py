"""Deduplication operators for large-scale training-data pipelines.

Exact, n-gram-Jaccard, MinHash+LSH, SimHash, and embedding-cosine near-dup
over ``documents(doc_id, text)`` / ``embeddings(vec_id, embedding)``.

Scale design (the 100 TB story, exercised at sandbox scale):

* **Exact dedup** — one hash-groupBy on the content (Spark partial+final
  hash agg; the only shuffle carries (hash, doc_id), never the content when
  ``by_hash=True``).
* **Jaccard** — candidate generation by *rare-shingle blocking*: only
  shingles whose doc frequency is ≤ ``rare_df_max`` emit candidate pairs,
  so a stop-shingle shared by millions of docs generates zero pairs (the
  blocking analog of the reference's stop-word removal,
  ``MahoutTermFinderMwk.java:302``). Verification joins shingle sets only
  for candidate pairs. Fully SQL-expressible → DuckDB-oracle-checked.
* **MinHash+LSH** — per-doc signatures in one vectorized Arrow UDF (numpy
  universal hashing, (a·x+b) mod p), banded into buckets; pairs sharing a
  band bucket are verified with exact Jaccard. Shuffle volume = one row
  per (doc, band): independent of document size, the property that makes
  MinHash the standard at web scale.
* **SimHash** — 64-bit tf-weighted signature per doc (Arrow UDF), pairs by
  pigeonhole banding (4×16-bit chunks: hamming ≤ 3 ⇒ ≥1 chunk equal), then
  exact hamming via JVM-side bit_count(xor).
* **Embedding near-dup** — exact double-precision cosine over candidate
  pairs; at scale candidates come from LSH buckets
  (operators.similarity); the exact form here is the oracle-checkable
  baseline.

Determinism: signatures use fixed seeds + blake2b content hashing (no
process-dependent hash()); similarity scores computed in double with a
fixed accumulation order and rounded once to 6.
"""

from __future__ import annotations

import hashlib
import warnings

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MERSENNE61 = (1 << 61) - 1

# Per-python-worker memo for content hashes: corpora are Zipfian, so the
# same shingles/terms recur across documents and batches — hashing each
# DISTINCT string once per worker turns the dominant per-row Python cost
# into a dict hit (same trick the tokenizer uses for stemming). Bounded so
# a pathological vocabulary can't OOM the worker.
_HASH_MEMO_MAX = 4_000_000
_HASH32_MEMO: dict[str, int] = {}
_HASH64_MEMO: dict[str, int] = {}


# max shingle/token OCCURRENCES vectorized at once inside the signature
# UDFs: bounds the (n_unique × n_hashes) hash matrix to ~chunk×128×8 B ≈
# 130 MB worst case, independent of Arrow batch size and document length
_VEC_CHUNK_ITEMS = 131_072


def _doc_chunks(item_lists: list[list[str]]):
    """Yield (start_doc, end_doc, concatenated object array) slices of
    consecutive docs whose total item count stays ≤ _VEC_CHUNK_ITEMS
    (always ≥ 1 doc per chunk, so a single pathological document still
    processes — its matrix is proportional to ITS length only)."""
    i, n = 0, len(item_lists)
    while i < n:
        j, total = i, 0
        while j < n and (j == i or total + len(item_lists[j])
                         <= _VEC_CHUNK_ITEMS):
            total += len(item_lists[j])
            j += 1
        if total:
            arr = np.empty(total, dtype=object)
            pos = 0
            for s in item_lists[i:j]:
                arr[pos:pos + len(s)] = s
                pos += len(s)
            yield i, j, arr
        i = j


def _spread_input(docs: DataFrame) -> DataFrame:
    """Repartition a FEW-SPLIT input up to cluster parallelism.

    The signature/shingle stages below materialize at input parallelism;
    a small corpus arriving as one parquet file would run them as one
    task. A real 100 TB corpus arrives in >=10^5 splits, so this is a
    no-op there (never repartitions downward — that would add a shuffle
    of the corpus for nothing)."""
    sc = docs.sparkSession.sparkContext
    p = sc.defaultParallelism
    if docs.rdd.getNumPartitions() < p:
        return docs.repartition(p)
    return docs


def _hash_uniques(uniq: np.ndarray, digest_size: int,
                  memo: dict[str, int]) -> np.ndarray:
    """blake2b of each string in ``uniq`` (array of distinct strings) as
    unsigned ints, memoized across batches. The only remaining per-string
    Python loop runs over memo MISSES, not over every shingle occurrence."""
    out = np.empty(len(uniq), dtype=np.int64)
    bounded = len(memo) < _HASH_MEMO_MAX
    for i, s in enumerate(uniq):
        v = memo.get(s)
        if v is None:
            v = int.from_bytes(
                hashlib.blake2b(
                    s.encode("utf-8"), digest_size=digest_size
                ).digest(),
                "big",
            )
            if digest_size == 8:
                v -= 1 << 64 if v >= 1 << 63 else 0  # signed-64 bit pattern
            if bounded:
                memo[s] = v
        out[i] = v
    return out


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup_groups(
    docs: DataFrame, content_col: str = "text", id_col: str = "doc_id",
    by_hash: bool = True,
) -> DataFrame:
    """Hash-groupBy exact duplicate groups: (keep_id, n_copies) for every
    content value occurring more than once; keep_id = min doc id.

    ``by_hash`` groups on sha256(content) so the shuffle carries 32-byte
    keys instead of document bodies — the difference between shuffling
    ~100 TB and shuffling ~30 GB at 10^9 docs. sha256 collisions are
    ignored by design (2^-128).
    """
    key = (
        F.sha2(F.col(content_col).cast("string"), 256)
        if by_hash
        else F.col(content_col)
    )
    return (
        docs.groupBy(key.alias("_k"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .filter(F.col("n_copies") > 1)
        .select("keep_id", "n_copies")
    )


# ---------------------------------------------------------------------------
# word shingles + exact Jaccard with rare-shingle blocking
# ---------------------------------------------------------------------------

def shingle_sets(
    docs: DataFrame, k: int = 3, content_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Distinct word k-shingles per doc: (doc_id, shingle). JVM-only:
    split → transform over positions → concat_ws → explode distinct."""
    toks = F.filter(
        F.split(F.lower(F.col(content_col)), "[^a-z0-9]+"), lambda t: t != ""
    )
    n_sh = F.size(toks) - F.lit(k - 1)
    sh = F.when(
        n_sh > 0,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n_sh),
                lambda i: F.concat_ws(
                    " ", F.slice(toks, i, F.lit(k))
                ),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    return docs.select(
        F.col(id_col).alias("doc_id"), F.explode(sh).alias("shingle")
    )


def jaccard_neardup_pairs(
    docs: DataFrame, k: int = 3, threshold: float = 0.5,
    rare_df_max: int = 10, content_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Near-duplicate pairs by exact Jaccard over word k-shingle sets, with
    rare-shingle candidate blocking.

    Candidates = doc pairs sharing ≥1 shingle whose corpus doc-frequency is
    ≤ ``rare_df_max`` (a shingle in d docs emits O(d²) pairs, so capping d
    bounds the blow-up; truly near-duplicate docs share many shingles and
    rare ones with overwhelming probability). Jaccard is then exact over
    the *full* shingle sets of each candidate pair.

    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b, jaccard ≥ threshold,
    jaccard rounded to 6.
    """
    # localCheckpoint (not cache): the shingle expression is a nested
    # higher-order-function tree (split->transform->slice->concat_ws) that
    # every downstream branch (sizes, rare, both self-join sides, the
    # verification joins) would otherwise REPLICATE into its logical plan —
    # measured: Catalyst analysis/optimization of the replicated trees cost
    # ~10x the actual job execution at sandbox scale, and planning cost
    # grows with plan size at any scale. Checkpointing collapses the
    # common subtree to one flat scan of materialized rows.
    sh = shingle_sets(
        _spread_input(docs), k, content_col, id_col
    ).localCheckpoint(eager=True)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    # Candidate generation runs on xxhash64(shingle): the df-count shuffle
    # and the (quadratic-prone) self-join then carry 8-byte keys instead
    # of multi-word shingle strings — the dominant shuffle volume of this
    # operator at corpus scale. A 64-bit collision can only merge two
    # shingles' df counts or create an extra candidate; extra candidates
    # are removed by the exact string-level verification below, and the
    # 2^-64 df-merge risk is the same class the engine already accepts
    # for sha256 exact dedup.
    shh = sh.select("doc_id", F.xxhash64("shingle").alias("sh_h"))
    rare = (
        shh.groupBy("sh_h")
        .agg(F.count(F.lit(1)).alias("sdf"))
        .filter(F.col("sdf") <= rare_df_max)
        .select("sh_h")
    )
    rare_sh = shh.join(rare, "sh_h")
    a = rare_sh.alias("a")
    b = rare_sh.alias("b")
    cand = (
        a.join(b, (F.col("a.sh_h") == F.col("b.sh_h"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    return _pair_jaccard(cand, sh, sizes, threshold)


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def _minhash_params(n_hashes: int, seed: int):
    rng = np.random.RandomState(seed)
    a = rng.randint(1, 1 << 31, size=n_hashes).astype(np.int64)
    b = rng.randint(0, 1 << 31, size=n_hashes).astype(np.int64)
    return a, b


def minhash_signatures(
    docs: DataFrame, n_hashes: int = 128, k: int = 3, seed: int = 42,
    content_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, sig array<long>[n_hashes]) MinHash signatures over word
    k-shingles, computed batch-vectorized in one Arrow UDF:

    1. shingle lists per doc (multiset — duplicates never change a min, so
       no per-doc set building);
    2. ``np.unique`` over the WHOLE batch's shingles → each distinct
       shingle is blake2b-hashed once per batch (and once per worker
       lifetime via the Zipf memo), not once per occurrence;
    3. one (n_unique × n_hashes) universal-hash matrix
       (a·x+b mod 2^61−1), then per-doc column mins via the inverse index.

    Empty shingle set → empty sig array (excluded from LSH). Signatures
    are bit-identical to the per-doc formulation (same hash family, same
    seeds). Peak memory is bounded: docs are processed in sub-batches of
    ≤ ``_VEC_CHUNK_ITEMS`` shingle occurrences, so the universal-hash
    matrix stays ≤ ~chunk×n_hashes×8 B regardless of Arrow batch size or
    document length (an unchunked 10k-doc batch of long documents would
    transiently allocate gigabytes per python worker)."""
    a_p, b_p = _minhash_params(n_hashes, seed)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def sig_udf(texts: pd.Series) -> pd.Series:
        import re

        split = re.compile(r"[^a-z0-9]+")
        sh_lists: list[list[str]] = []
        for t in texts:
            if t is None:
                sh_lists.append([])
                continue
            toks = [w for w in split.split(t.lower()) if w]
            sh_lists.append(
                [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
            )
        out: list[list[int]] = [[] for _ in sh_lists]
        for start, end, all_sh in _doc_chunks(sh_lists):
            uniq, inv = np.unique(all_sh, return_inverse=True)
            x = _hash_uniques(uniq, 4, _HASH32_MEMO)  # < 2^32, in int64
            # (n_uniq, n_hashes): a < 2^31, x < 2^32 -> a*x < 2^63 — no
            # overflow
            hv = (x[:, None] * a_p[None, :] + b_p[None, :]) % MERSENNE61
            pos = 0
            for i in range(start, end):
                n = len(sh_lists[i])
                if n:
                    out[i] = hv[inv[pos:pos + n]].min(axis=0).tolist()
                pos += n
        return pd.Series(out)

    return _spread_input(docs).select(
        F.col(id_col).alias("doc_id"), sig_udf(F.col(content_col)).alias("sig")
    )


def minhash_lsh_pairs(
    docs: DataFrame, n_hashes: int = 128, bands: int = 16, k: int = 3,
    threshold: float = 0.5, seed: int = 42,
    content_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup pairs via MinHash LSH banding + exact-Jaccard verification.

    rows-per-band r = n_hashes // bands; S-curve collision prob
    1-(1-s^r)^bands. Band key = the band's signature slice as a string —
    grouping shuffles one small row per (doc, band). Verification recomputes
    exact Jaccard on the candidates only, so every emitted pair truly meets
    ``threshold`` (LSH affects recall, never precision).

    Returns (doc_a, doc_b, jaccard), doc_a < doc_b, rounded to 6.
    """
    r = n_hashes // bands
    # checkpointed: the banding self-join references the signatures TWICE
    # and verification's candidate materialization once more — without it
    # the signature UDF (the expensive stage) runs 3-4x per call and the
    # UDF plan subtree is replicated into every branch. Checkpoint the
    # one-row-per-doc sigs (not the bands: 16x more rows for pure JVM
    # re-derivable explode work).
    sigs = minhash_signatures(
        docs, n_hashes, k, seed, content_col, id_col
    ).filter(F.size("sig") > 0).localCheckpoint(eager=True)
    banded = sigs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda band: F.struct(
                    band.alias("band"),
                    F.concat_ws(
                        ",",
                        F.transform(
                            F.slice(F.col("sig"), band * r + 1, r),
                            lambda v: v.cast("string"),
                        ),
                    ).alias("key"),
                ),
            )
        ).alias("bk"),
    ).select("doc_id", "bk.band", "bk.key")
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    return _verify_jaccard(cand, docs, k, threshold, content_col, id_col)


def _verify_jaccard(
    cand: DataFrame, docs: DataFrame, k: int, threshold: float,
    content_col: str, id_col: str,
) -> DataFrame:
    """Exact Jaccard over full shingle sets, restricted to candidate pairs.

    The corpus is semi-joined down to the docs that actually appear in a
    candidate pair BEFORE shingling — verification cost is proportional
    to candidates (LSH's output), never to corpus size. ``cand`` and the
    candidate shingles are checkpointed (each feeds multiple joins);
    their blocks are released by Spark's ContextCleaner once the
    returned frame is consumed and the references are collected."""
    # checkpointed, not cached: candidate generation (LSH banding) and
    # the shingle expression are both heavy PLAN subtrees that would be
    # replicated into every downstream branch — see jaccard_neardup_pairs
    cand = cand.localCheckpoint(eager=True)
    ids = (
        cand.select(F.col("doc_a").alias(id_col))
        .union(cand.select(F.col("doc_b").alias(id_col)))
        .distinct()
    )
    # semi-join, strategy left to AQE: candidates are usually a small
    # fraction of the corpus (→ runtime broadcast), but on duplicate-heavy
    # corpora — the dedup use case — the id set can cover a large share of
    # the docs, where a forced broadcast would blow the broadcast limit;
    # AQE degrades that case to a shuffle join instead of failing.
    cand_docs = docs.join(ids, id_col, "left_semi")
    # _pair_jaccard reads the shingle rows four times (both join sides +
    # the two size broadcasts) — materialize them once
    sh = shingle_sets(cand_docs, k, content_col, id_col).localCheckpoint(
        eager=True
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    return _pair_jaccard(cand, sh, sizes, threshold)


def _pair_jaccard(
    cand: DataFrame, sh: DataFrame, sizes: DataFrame, threshold: float
) -> DataFrame:
    """(doc_a, doc_b, jaccard >= threshold) for candidate pairs, exact over
    the full shingle sets. The candidate table and the per-doc size table
    are tiny relative to the shingle rows (pairs << docs << shingles), so
    both broadcast — the only shuffle left is the intersection groupBy."""
    sa, sb = sh.alias("sa"), sh.alias("sb")
    inter = (
        F.broadcast(cand).join(sa, F.col("sa.doc_id") == F.col("doc_a"))
        .join(
            sb,
            (F.col("sb.doc_id") == F.col("doc_b"))
            & (F.col("sb.shingle") == F.col("sa.shingle")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(F.broadcast(na), "doc_a").join(F.broadcast(nb), "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter").cast("double")
                / (F.col("na") + F.col("nb") - F.col("inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_signatures(
    docs: DataFrame, content_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """64-bit tf-weighted SimHash per doc: each term's 64-bit blake2b hash
    votes ±tf on every bit; sign → bit. Returned as signed long (bit
    pattern; JVM bit ops work directly on it).

    Batch-vectorized like ``minhash_signatures``: distinct terms of the
    whole Arrow batch are hashed once (memoized across batches), their
    ±1 bit-sign rows form one (n_unique × 64) int matrix, and each doc's
    vote vector is the sum of its tokens' rows (token repetition IS the
    tf weighting — no per-doc Counter). Integer votes, so the sign
    decision is exact and the signatures are bit-identical to the per-doc
    formulation."""

    @F.pandas_udf(T.LongType())
    def simhash_udf(texts: pd.Series) -> pd.Series:
        import re

        split = re.compile(r"[^a-z0-9]+")
        tok_lists: list[list[str]] = []
        for t in texts:
            tok_lists.append(
                [w for w in split.split(t.lower()) if w] if t else []
            )
        out = np.zeros(len(tok_lists), dtype=np.int64)
        bit_idx = np.arange(64, dtype=np.uint64)
        weights = (np.uint64(1) << bit_idx)
        for start, end, all_tok in _doc_chunks(tok_lists):
            uniq, inv = np.unique(all_tok, return_inverse=True)
            h64 = _hash_uniques(uniq, 8, _HASH64_MEMO).view(np.uint64)
            signs = (
                ((h64[:, None] >> bit_idx[None, :]) & np.uint64(1))
                .astype(np.int64) * 2 - 1
            )  # (n_uniq, 64) in {-1, +1}
            pos = 0
            for row in range(start, end):
                n = len(tok_lists[row])
                if n:
                    votes = signs[inv[pos:pos + n]].sum(axis=0)
                    sig = ((votes > 0).astype(np.uint64) * weights).sum(
                        dtype=np.uint64
                    )
                    out[row] = np.int64(sig.astype(np.int64))
                pos += n
        return pd.Series(out)

    return _spread_input(docs).select(
        F.col(id_col).alias("doc_id"),
        simhash_udf(F.col(content_col)).alias("simhash"),
    )


def simhash_neardup_pairs(
    docs: DataFrame, max_hd: int = 3,
    content_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Pairs with SimHash hamming distance ≤ max_hd (≤3 by default).

    Pigeonhole banding: split the 64-bit signature into 4 16-bit chunks;
    hamming ≤ 3 ⇒ at least one chunk is equal, so joining on (chunk_idx,
    chunk_value) finds every qualifying pair while shuffling only 4 small
    rows per doc. Exact hamming check JVM-side via bit_count(xor).
    Returns (doc_a, doc_b, hamming), doc_a < doc_b.
    """
    sigs = simhash_signatures(docs, content_col, id_col).localCheckpoint(
        eager=True  # self-join below references the UDF subtree twice
    )
    chunks = sigs.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk"),
                        F.shiftrightunsigned(F.col("simhash"), i * 16)
                        .bitwiseAND(F.lit(0xFFFF)).alias("val"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("c"),
    ).select("doc_id", "simhash", "c.chunk", "c.val")
    a, b = chunks.alias("a"), chunks.alias("b")
    out = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hd)
        .distinct()
    )
    return out


# ---------------------------------------------------------------------------
# pair lists -> dedup groups (connected components)
# ---------------------------------------------------------------------------

def dedup_groups_from_pairs(
    pairs: DataFrame, max_iters: int = 20,
    a_col: str = "doc_a", b_col: str = "doc_b",
    on_unconverged: str = "raise",
) -> DataFrame:
    """Near-dup pairs → duplicate groups: connected components by
    iterative min-label propagation, returning (doc_id, keep_id) where
    keep_id = the component's minimum doc id (the canonical survivor —
    the same keep-min rule as exact_dedup_groups).

    Each iteration joins every node's current label against its
    neighbors' and takes the min; converges in O(diameter) iterations —
    near-dup components are near-cliques, so usually 2-3. Scale
    mechanics: every generation is ``localCheckpoint``-ed, so the plan
    stays CONSTANT-depth across iterations (a plain ``cache()`` keeps
    the full join-on-join lineage, which grows planning cost and
    task-retry recomputation per round — fatal at 10^9 edges), and the
    ``changed`` flag is computed inside the same generation frame, so
    convergence costs one lightweight agg over the just-materialized
    blocks rather than a second join job.

    ``max_iters`` bounds pathological chains (a component with diameter >
    max_iters would come back SPLIT with wrong keep_ids); by default that
    raises — pass ``on_unconverged="warn"`` to get the partial labels
    anyway. The loop allows max_iters PROPAGATING iterations plus one
    confirmation pass, so a component of diameter exactly max_iters (whose
    last allowed iteration both moves labels AND completes them) is
    correctly accepted, not misreported as unconverged.

    Superseded label generations are checkpointed RDD blocks; their
    references are dropped each iteration and Spark's ContextCleaner
    releases the storage once the py4j handles are collected (2-4
    generations in-flight worst case — labels are (node, label) pairs,
    small relative to the corpus).
    """
    if on_unconverged not in ("raise", "warn"):
        raise ValueError(f"unknown on_unconverged {on_unconverged!r}")
    edges = (
        pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
        .union(pairs.select(F.col(b_col).alias("u"), F.col(a_col).alias("v")))
        .distinct()
        .localCheckpoint(eager=True)  # edges reused every iteration
    )
    labels = (
        edges.select("u").distinct()
        .withColumn("label", F.col("u"))
        .localCheckpoint(eager=True)
    )
    changed = None
    for _ in range(max_iters + 1):
        neighbor_min = (
            edges.join(labels.withColumnRenamed("u", "v"), "v")
            .groupBy("u")
            .agg(F.min("label").alias("nlabel"))
        )
        new_labels = (
            labels.join(neighbor_min, "u", "left")
            .select(
                "u",
                F.least(
                    F.col("label"), F.coalesce("nlabel", "label")
                ).alias("label"),
                (F.coalesce("nlabel", "label") < F.col("label"))
                .cast("long").alias("changed"),
            )
            .localCheckpoint(eager=True)  # ONE job; lineage truncated
        )
        changed = int(
            new_labels.agg(F.sum("changed")).first()[0] or 0
        )
        labels = new_labels.drop("changed")
        if changed == 0:
            break
    if changed:
        msg = (
            f"dedup_groups_from_pairs: not converged after {max_iters} "
            f"iterations ({changed} labels still moving) — a component "
            f"has diameter > max_iters; groups would be split with wrong "
            f"keep_ids. Raise max_iters."
        )
        if on_unconverged == "raise":
            raise RuntimeError(msg)
        warnings.warn(msg, stacklevel=2)
    return labels.select(
        F.col("u").alias("doc_id"), F.col("label").alias("keep_id")
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dup (exact baseline; LSH path in similarity.py)
# ---------------------------------------------------------------------------

def embedding_neardup_pairs(
    emb: DataFrame, threshold: float = 0.98,
    vec_col: str = "embedding", id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine near-dup pairs (id_a < id_b, cos ≥ threshold, rounded 6).

    Double-precision, fixed left-to-right accumulation (zip_with +
    aggregate) so results are bit-reproducible and oracle-comparable. The
    self-join is quadratic by definition — at scale, candidates come from
    LSH bucketing (similarity.lsh_bucket_candidates) and this exact kernel
    runs only within buckets.
    """
    def norm2(c):
        return F.aggregate(
            F.zip_with(c, c, lambda x, y: x.cast("double") * y.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    e = emb.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("v"),
        F.sqrt(norm2(F.col(vec_col))).alias("nrm"),
    )
    a, b = e.alias("a"), e.alias("b")
    dot = F.aggregate(
        F.zip_with(
            F.col("a.v"), F.col("b.v"),
            lambda x, y: x.cast("double") * y.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        a.join(b, F.col("a.vid") < F.col("b.vid"))
        .select(
            F.col("a.vid").alias("id_a"),
            F.col("b.vid").alias("id_b"),
            F.round(dot / (F.col("a.nrm") * F.col("b.nrm")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
