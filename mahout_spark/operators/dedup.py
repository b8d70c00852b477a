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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MERSENNE61 = (1 << 61) - 1


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
    sh = shingle_sets(docs, k, content_col, id_col).cache()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    rare = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("sdf"))
        .filter(F.col("sdf") <= rare_df_max)
        .select("shingle")
    )
    rare_sh = sh.join(rare, "shingle")
    a = rare_sh.alias("a")
    b = rare_sh.alias("b")
    cand = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
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

def _hash32_batch(strings: list[str]) -> np.ndarray:
    """Deterministic 32-bit hashes (blake2b/4B) of a list of strings."""
    out = np.empty(len(strings), dtype=np.uint64)
    for i, s in enumerate(strings):
        out[i] = int.from_bytes(
            hashlib.blake2b(s.encode("utf-8"), digest_size=4).digest(), "big"
        )
    return out


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
    k-shingles, computed in one vectorized Arrow UDF: shingle → 32-bit
    blake2b → n_hashes universal hashes (a·x+b mod 2^61−1) → column mins.
    Empty shingle set → empty sig array (excluded from LSH)."""
    a_p, b_p = _minhash_params(n_hashes, seed)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def sig_udf(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            if t is None:
                out.append([])
                continue
            import re

            toks = [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]
            sh = list({" ".join(toks[i:i + k])
                       for i in range(len(toks) - k + 1)})
            if not sh:
                out.append([])
                continue
            x = _hash32_batch(sh).astype(np.int64)  # < 2^32
            # (n_sh, n_hashes): a*x < 2^63 — no overflow
            hv = (x[:, None] * a_p[None, :] + b_p[None, :]) % MERSENNE61
            out.append(hv.min(axis=0).tolist())
        return pd.Series(out)

    return docs.select(
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
    sigs = minhash_signatures(
        docs, n_hashes, k, seed, content_col, id_col
    ).filter(F.size("sig") > 0)
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
    return _verify_jaccard(
        cand, docs, k, threshold, content_col, id_col
    )


def _verify_jaccard(
    cand: DataFrame, docs: DataFrame, k: int, threshold: float,
    content_col: str, id_col: str,
) -> DataFrame:
    """Exact Jaccard over full shingle sets, restricted to candidate pairs."""
    sh = shingle_sets(docs, k, content_col, id_col)
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
    """64-bit tf-weighted SimHash per doc (Arrow UDF): each distinct term's
    64-bit blake2b hash votes ±tf on every bit; sign → bit. Returned as
    signed long (bit pattern; JVM bit ops work directly on it)."""

    @F.pandas_udf(T.LongType())
    def simhash_udf(texts: pd.Series) -> pd.Series:
        import re
        from collections import Counter

        bit_idx = np.arange(64, dtype=np.uint64)
        out = np.zeros(len(texts), dtype=np.int64)
        for row, t in enumerate(texts):
            if not t:
                continue
            tf = Counter(w for w in re.split(r"[^a-z0-9]+", t.lower()) if w)
            if not tf:
                continue
            v = np.zeros(64, dtype=np.float64)
            for term, cnt in tf.items():
                h = int.from_bytes(
                    hashlib.blake2b(
                        term.encode("utf-8"), digest_size=8
                    ).digest(),
                    "big",
                )
                bits = (np.uint64(h) >> bit_idx) & np.uint64(1)
                v += cnt * (2.0 * bits.astype(np.float64) - 1.0)
            sig = np.uint64(0)
            for i in range(64):
                if v[i] > 0:
                    sig |= np.uint64(1) << np.uint64(i)
            out[row] = np.int64(sig)
        return pd.Series(out)

    return docs.select(
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
    sigs = simhash_signatures(docs, content_col, id_col).cache()
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
    return (
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


# ---------------------------------------------------------------------------
# pair lists -> dedup groups (connected components)
# ---------------------------------------------------------------------------

def dedup_groups_from_pairs(
    pairs: DataFrame, max_iters: int = 20,
    a_col: str = "doc_a", b_col: str = "doc_b",
) -> DataFrame:
    """Near-dup pairs → duplicate groups: connected components by
    iterative min-label propagation, returning (doc_id, keep_id) where
    keep_id = the component's minimum doc id (the canonical survivor —
    the same keep-min rule as exact_dedup_groups).

    Each iteration joins every node's current label against its
    neighbors' and takes the min; converges in O(diameter) ≤ O(log n)
    iterations for near-dup graphs (components are near-cliques, so
    usually 2-3). All DataFrame ops — the driver only checks the
    convergence counter, never the data. At 10^9 edges this is the
    standard large-small-star-style label propagation; ``max_iters``
    bounds pathological chains.
    """
    edges = (
        pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
        .union(pairs.select(F.col(b_col).alias("u"), F.col(a_col).alias("v")))
        .distinct()
        .cache()
    )
    labels = (
        edges.select("u").distinct()
        .withColumn("label", F.col("u"))
    )
    for _ in range(max_iters):
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
            )
        )
        new_labels = new_labels.cache()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "u")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels.unpersist()  # superseded generation — don't accumulate
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
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
