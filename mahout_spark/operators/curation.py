"""Training-set curation: benchmark decontamination and sequence packing.

Two operations every large-scale pretraining pipeline runs between
dedup and tokenization, neither of which the plain dedup operators
cover:

* **Decontamination** — the GPT-3 appendix-C standard: flag every
  training document that shares at least one word ``n``-gram (13 by
  convention) with a held-out evaluation set, so benchmark text can be
  scrubbed from the corpus before training. This is NOT symmetric dedup:
  the eval side is tiny (MBs) and the train side is the whole corpus
  (100 TB), so the plan broadcasts the eval side's distinct gram set and
  streams the corpus through a broadcast hash join — the corpus is never
  shuffled, and the join keys are 8-byte xxhash64 values, never gram
  strings (collisions ignored by design, like exact_dedup_groups'
  sha256: ~(#grams²)/2⁶⁴).

* **Sequence packing** — the concat-and-chunk model: documents are
  deterministically shuffled, concatenated, and split into fixed
  ``seq_len``-token training sequences; each document's placement is
  its token offset in the concatenation. The offset is a prefix sum
  over the shuffle order — the naive formulation (one global
  ``Window.orderBy``) funnels the corpus through a SINGLE task, so this
  implements the classic two-phase distributed prefix sum instead:
  order-preserving range buckets from the shuffle key's high bits,
  per-bucket token totals (one tiny aggregate — ``n_buckets`` rows —
  collected and prefix-summed driver-side), then a per-bucket PARTITIONED
  window cumsum plus the broadcast bucket base. Identical output to the
  global window at any parallelism; plan-gated to never contain a
  partition-less Window.

Determinism: the packing shuffle key is a seeded multiplicative-hash
permutation in plain int64 arithmetic (``id · (1000003^(seed+1) mod p)
mod p``, multiplier precomputed driver-side) so
an independent SQL engine reproduces the exact order (the DuckDB oracle
does); swap in ``xxhash64`` via ``key_expr`` if cryptographic-quality
mixing matters more than SQL replayability.

Reference behaviors mirrored: the reference's dedup/tombstone pipeline
(see SURVEY §2 X1-X5) stops at duplicate removal; decontamination and
packing are the adjacent curation stages its users run downstream.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mahout_spark.checkpoint import spread_input
from mahout_spark.operators.dedup import _shingles_expr

# order-preserving range buckets for the packing prefix sum: the shuffle
# key's high bits. 256 buckets keeps the driver-side prefix array trivial
# while bounding each window partition to ~corpus/256.
PACK_BUCKETS = 256

# the packing shuffle-key permutation: (id*A + seed) mod P, P prime.
# Plain int64 arithmetic (no overflow below ~9e12 ids) -> bit-identical
# in Spark and any SQL oracle.
PACK_MULT = 1_000_003
PACK_MOD = 999_999_937


def _gram_hashes(
    docs: DataFrame, n: int, content_col: str, id_col: str, out_id: str,
) -> DataFrame:
    """(out_id, g): the doc's DISTINCT word n-gram xxhash64 values,
    exploded. Hashing happens JVM-side inside codegen — Python never
    sees a gram string, and downstream joins carry 8-byte keys."""
    grams = F.array_distinct(
        F.transform(_shingles_expr(content_col, n), lambda s: F.xxhash64(s))
    )
    return docs.select(
        F.col(id_col).alias(out_id), F.explode(grams).alias("g")
    )


def contaminated_docs(
    train: DataFrame,
    test: DataFrame,
    n: int = 13,
    min_shared: int = 1,
    content_col: str = "text",
    id_col: str = "doc_id",
    test_content_col: str | None = None,
    test_id_col: str | None = None,
) -> DataFrame:
    """GPT-3-style decontamination: every train doc sharing at least
    ``min_shared`` distinct word ``n``-grams with ANY eval doc, as
    ``(doc_id, n_shared)`` — ``n_shared`` counts the train doc's
    distinct grams that appear anywhere in the eval set.

    Plan: the eval set collapses to one DISTINCT gram-hash relation and
    is explicitly broadcast; the train side streams through a broadcast
    hash join (no corpus shuffle) into a partial-aggregated count keyed
    by doc — the 100 TB shape. Docs shorter than ``n`` tokens have no
    grams and are never flagged."""
    if n < 1:
        raise ValueError(f"n-gram size must be >= 1: {n}")
    if min_shared < 1:
        raise ValueError(f"min_shared must be >= 1: {min_shared}")
    tg = _gram_hashes(spread_input(train), n, content_col, id_col, "doc_id")
    eg = (
        _gram_hashes(
            test, n, test_content_col or content_col,
            test_id_col or id_col, "_tid",
        )
        .select("g").distinct()
    )
    return (
        tg.join(F.broadcast(eg), "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def contamination_pairs(
    train: DataFrame,
    test: DataFrame,
    n: int = 13,
    content_col: str = "text",
    id_col: str = "doc_id",
    test_content_col: str | None = None,
    test_id_col: str | None = None,
) -> DataFrame:
    """Contamination ATTRIBUTION: (train_id, test_id, n_shared) for every
    train/eval doc pair sharing >= 1 distinct word n-gram — which
    benchmark document leaked, not just that something did. Same
    broadcast shape as contaminated_docs (the eval side keeps its doc
    ids; still tiny); output size is the contaminated pair set."""
    if n < 1:
        raise ValueError(f"n-gram size must be >= 1: {n}")
    tg = _gram_hashes(spread_input(train), n, content_col, id_col,
                      "train_id")
    eg = _gram_hashes(test, n, test_content_col or content_col,
                      test_id_col or id_col, "test_id")
    return (
        tg.join(F.broadcast(eg), "g")
        .groupBy("train_id", "test_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


def pack_multiplier(seed: int) -> int:
    """The seed's multiplier: PACK_MULT^(seed+1) mod PACK_MOD, computed
    driver-side. The seed MUST enter through the multiplier — any affine
    seeding (``id·A + seed``, ``(id+seed)·A``) only shifts every key by
    the same constant, which preserves the order except at the modular
    wraparound (caught by test_pack_seed_changes_order_not_content).
    PACK_MOD is prime, so the result is never 0 and ``id·M mod p`` is a
    permutation of [0, p) over any id range below p."""
    return pow(PACK_MULT, (int(seed) % (PACK_MOD - 1)) + 1, PACK_MOD)


def pack_key_expr(id_col: str, seed: int) -> Column:
    """The deterministic shuffle key: ``(id · pack_multiplier(seed)) mod
    PACK_MOD`` — plain int64 arithmetic any SQL engine replays exactly
    (no overflow while ``id · M < 2^63``, i.e. ids below ~9·10^9; beyond
    that pass an ``xxhash64`` ``key_expr`` instead). Ids outside the
    bound RAISE inside the job (a codegen conditional, no extra driver
    agg) rather than silently wrapping and breaking the documented
    SQL-replayable permutation."""
    mult = pack_multiplier(seed)
    bound = (2**63 - 1) // mult
    idc = F.col(id_col).cast("long")
    guarded = F.when(
        (idc < 0) | (idc > bound),
        F.raise_error(F.format_string(
            "pack_key_expr int64 overflow: id %s outside [0, "
            f"{bound}] for seed {int(seed)}; pass "
            "key_expr=F.xxhash64(id) instead", idc)),
    ).otherwise(idc)
    return F.pmod(guarded * F.lit(mult), F.lit(PACK_MOD))


def pack_documents(
    docs: DataFrame,
    seq_len: int,
    seed: int = 42,
    content_col: str = "text",
    id_col: str = "doc_id",
    key_expr: Column | None = None,
) -> DataFrame:
    """Concat-and-chunk sequence packing: deterministically shuffle the
    corpus, concatenate the token streams, split every ``seq_len``
    tokens. Returns one row per non-empty doc:

    ``(doc_id, n_tokens, offset, seq_first, seq_last)`` — ``offset`` is
    the doc's first-token position in the concatenation,
    ``seq_first/seq_last`` the training sequences it lands in
    (``floor(offset/seq_len)`` / ``floor((offset+n_tokens-1)/seq_len)``;
    a doc crossing a boundary spans both, exactly like GPT-style
    packing). Zero-token docs are dropped (they occupy no positions).

    The prefix sum is the two-phase distributed form (module header):
    global-window-free, so no single-task funnel at any corpus size.
    """
    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1: {seq_len}")
    key = key_expr if key_expr is not None else pack_key_expr(id_col, seed)
    base = (
        spread_input(docs)
        .select(
            F.col(id_col).alias("doc_id"),
            key.alias("_k"),
            F.size(
                F.filter(
                    F.split(F.lower(F.col(content_col)), "[^a-z0-9]+"),
                    lambda t: t != "",
                )
            ).cast("long").alias("n_tokens"),
        )
        .filter(F.col("n_tokens") > 0)
        # order-preserving coarse buckets from the key's high bits: key
        # in [0, PACK_MOD) -> bucket = key * B / PACK_MOD
        .withColumn(
            "_b",
            (F.col("_k") * F.lit(PACK_BUCKETS) / F.lit(PACK_MOD))
            .cast("long"),
        )
    )
    # phase 1: per-bucket token totals -> driver prefix sum (<= 256 rows)
    totals = {
        r["_b"]: r["t"]
        for r in base.groupBy("_b").agg(F.sum("n_tokens").alias("t"))
        .collect()
    }
    bases, acc = [], 0
    for b in range(PACK_BUCKETS):
        bases.append((b, acc))
        acc += int(totals.get(b, 0))
    # phase 2: partitioned cumsum within each bucket + broadcast base
    from pyspark.sql import Window

    w = (
        Window.partitionBy("_b")
        .orderBy(F.col("_k").asc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    base_df = F.broadcast(
        docs.sparkSession.createDataFrame(bases, "_b long, _base long")
    )
    off = F.col("_base") + F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return (
        base.join(base_df, "_b")
        .withColumn("offset", off)
        .select(
            "doc_id", "n_tokens", "offset",
            F.floor(F.col("offset") / F.lit(seq_len)).alias("seq_first"),
            F.floor(
                (F.col("offset") + F.col("n_tokens") - 1) / F.lit(seq_len)
            ).alias("seq_last"),
        )
    )


def packing_stats(packed: DataFrame, seq_len: int) -> DataFrame:
    """One-row packing summary over pack_documents' output: docs packed,
    total tokens, full training sequences produced
    (``ceil(total/seq_len)`` including the padded tail), tail padding
    tokens, and boundary-crossing docs (``seq_last > seq_first`` — the
    fraction cross-document attention masking has to handle). One
    partial aggregation; nothing but the summary row moves."""
    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1: {seq_len}")
    return packed.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.ceil(F.sum("n_tokens") / F.lit(seq_len)).alias("n_sequences"),
        (
            F.ceil(F.sum("n_tokens") / F.lit(seq_len)) * F.lit(seq_len)
            - F.sum("n_tokens")
        ).alias("tail_padding"),
        F.sum(
            (F.col("seq_last") > F.col("seq_first")).cast("long")
        ).alias("boundary_docs"),
    )


# ---------------------------------------------------------------------------
# Gopher repetition signals (X98)
# ---------------------------------------------------------------------------

def repetition_signals(
    docs: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    top_n: int = 2,
    dup_n: int = 5,
) -> DataFrame:
    """The Gopher repetition filters (Rae et al. 2021, table A1 — the
    quality gate MassiveText applies between heuristic quality scoring
    and dedup): per document,

    * ``n_lines`` / ``dup_line_frac`` / ``dup_line_char_frac`` — lines
      = non-empty ``\\n`` splits; a line occurrence beyond the first of
      its exact text is a duplicate (the standard find_duplicates
      convention); char fraction is over the total line characters;
    * ``top{top_n}gram_char_frac`` — fraction of the normalized text
      (tokens joined by single spaces) covered by the single most
      frequent word ``top_n``-gram, count × gram length / text length;
      ties pin to the lexicographically smallest gram;
    * ``dup{dup_n}gram_char_frac`` — fraction covered by ALL word
      ``dup_n``-grams occurring ≥ 2 times, Σ count × gram length /
      text length, capped at 1 (the count-based approximation — spans
      may overlap, hence the cap).

    Docs with no tokens report zero fractions; NULL/empty text is
    excluded (the quality_scores contract). Ratios round once to 1e-6.

    Scale shape: these are PER-DOCUMENT multiset statistics — no
    cross-document state — so the right plan is zero exchanges: one
    Arrow-batched pandas UDF computes all five signals in a single pass
    per input split (each doc's gram counter lives and dies inside the
    batch). The relational alternative (explode every gram, groupBy
    (doc, gram)) would shuffle the entire corpus' n-gram stream just to
    re-collapse it to one row per doc; per-row Python over Arrow
    batches is the cheaper path here and is embarrassingly parallel.
    The identical arithmetic is SQL-expressible (the DuckDB oracle
    replays it via unnest + window), which keeps the UDF hash-checked.
    """
    from pyspark.sql import types as T

    if top_n < 1 or dup_n < 1:
        raise ValueError(
            f"gram sizes must be >= 1: top_n={top_n} dup_n={dup_n}")
    import re as _re

    tok_re = _re.compile(r"[^a-z0-9]+")

    @F.pandas_udf(T.StructType([
        T.StructField("n_lines", T.LongType()),
        T.StructField("dup_line_frac", T.DoubleType()),
        T.StructField("dup_line_char_frac", T.DoubleType()),
        T.StructField("top_gram_char_frac", T.DoubleType()),
        T.StructField("dup_gram_char_frac", T.DoubleType()),
    ]))
    def signals(texts: pd.Series) -> pd.DataFrame:
        import math

        def r6(x: float) -> float:
            # HALF_UP at 1e-6 — the Spark/DuckDB round() convention;
            # python's builtin rounds half-even and could diverge on
            # exactly-representable halves (e.g. k/640000)
            return math.floor(x * 1e6 + 0.5) / 1e6

        out = {k: [] for k in ("n_lines", "dup_line_frac",
                               "dup_line_char_frac", "top_gram_char_frac",
                               "dup_gram_char_frac")}
        for text in texts:
            lines = [ln for ln in text.split("\n") if ln != ""]
            seen: set = set()
            dup_lines = dup_chars = 0
            for ln in lines:
                if ln in seen:
                    dup_lines += 1
                    dup_chars += len(ln)
                else:
                    seen.add(ln)
            total_line_chars = sum(len(ln) for ln in lines)
            toks = [t for t in tok_re.split(text.lower()) if t]
            norm_len = len(" ".join(toks))

            def gram_fracs(n: int):
                if len(toks) < n or norm_len == 0:
                    return 0.0, 0.0
                counts: dict = {}
                for i in range(len(toks) - n + 1):
                    g = " ".join(toks[i:i + n])
                    counts[g] = counts.get(g, 0) + 1
                top_g = min(
                    counts, key=lambda g: (-counts[g], g))
                top = counts[top_g] * len(top_g) / norm_len
                dup = min(1.0, sum(
                    c * len(g) for g, c in counts.items() if c >= 2
                ) / norm_len)
                return top, dup

            top_frac, _ = gram_fracs(top_n)
            _, dup_frac = gram_fracs(dup_n)
            out["n_lines"].append(len(lines))
            out["dup_line_frac"].append(
                r6(dup_lines / len(lines)) if lines else 0.0)
            out["dup_line_char_frac"].append(
                r6(dup_chars / total_line_chars)
                if total_line_chars else 0.0)
            out["top_gram_char_frac"].append(r6(top_frac))
            out["dup_gram_char_frac"].append(r6(dup_frac))
        return pd.DataFrame(out)

    staged = (
        spread_input(docs)
        .filter(F.length(F.col(content_col)) > 0)
        .select(id_col, F.col(content_col).alias("_t"))
        .withColumn("_sig", signals(F.col("_t")))
    )
    return staged.select(
        id_col,
        F.col("_sig.n_lines").alias("n_lines"),
        F.col("_sig.dup_line_frac").alias("dup_line_frac"),
        F.col("_sig.dup_line_char_frac").alias("dup_line_char_frac"),
        F.col("_sig.top_gram_char_frac").alias(
            f"top{top_n}gram_char_frac"),
        F.col("_sig.dup_gram_char_frac").alias(
            f"dup{dup_n}gram_char_frac"),
    )


# ---------------------------------------------------------------------------
# Domain-mixture resampling (X103)
# ---------------------------------------------------------------------------

def mixture_rates(
    docs: DataFrame, target: dict, source_col: str = "source",
) -> dict:
    """Per-source keep rates that hit the ``target`` mixture WITHOUT
    upsampling: with per-source counts ``n_s`` and target proportions
    ``p_s`` (normalized), the largest achievable sampled corpus is
    ``T = min_s(n_s / p_s)`` (the binding source keeps 100%), and every
    source keeps ``rate_s = p_s · T / n_s``. One tiny groupBy-count
    (#sources rows cross the driver — never the corpus). Sources not in
    ``target`` are dropped (rate absent); a target source missing from
    the corpus raises (T would silently be 0)."""
    if not target:
        raise ValueError("target mixture must be non-empty")
    if any(p <= 0 for p in target.values()):
        raise ValueError(f"target proportions must be > 0: {target}")
    tot = float(sum(target.values()))
    norm = {s: p / tot for s, p in target.items()}
    counts = {
        r[source_col]: r["n"]
        for r in docs.filter(F.col(source_col).isin(list(target)))
        .groupBy(source_col).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    missing = sorted(set(target) - set(counts))
    if missing:
        raise ValueError(f"target sources absent from corpus: {missing}")
    t_max = min(counts[s] / norm[s] for s in norm)
    return {s: (counts[s], norm[s] * t_max / counts[s]) for s in norm}


def mixture_sample(
    docs: DataFrame, target: dict, seed: int = 42,
    source_col: str = "source", id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic stratified downsampling to a target domain mixture
    (the fixed-mixture half of DoReMi-style data balancing): doc kept
    iff its seeded multiplicative-hash key (X86's SQL-replayable
    permutation — exact int64 arithmetic, no RNG state) falls below
    ``floor(rate_source · P)``. Per-source thresholds ride a broadcast
    join (#sources rows); the corpus streams through one filter — no
    shuffle, no sampling state, re-runs bit-identical."""
    rates = mixture_rates(docs, target, source_col)
    spark = docs.sparkSession
    thr = spark.createDataFrame(
        [(s, int(rate * PACK_MOD)) for s, (_, rate) in rates.items()],
        f"{source_col} string, _thr long",
    )
    key = pack_key_expr(id_col, seed)
    return (
        docs.join(F.broadcast(thr), source_col)
        .filter(key < F.col("_thr"))
        .drop("_thr")
    )


def mixture_stats(
    docs: DataFrame, target: dict, seed: int = 42,
    source_col: str = "source", id_col: str = "doc_id",
) -> DataFrame:
    """The mixture audit relation: per target source, corpus count,
    keep rate, kept count, and the ACHIEVED proportion of the sampled
    corpus (rounded 1e-6) — the number the pipeline owner checks
    against the target. One aggregation over the sampled relation."""
    from pyspark.sql import Window

    rates = mixture_rates(docs, target, source_col)
    kept = mixture_sample(docs, target, seed, source_col, id_col)
    spark = docs.sparkSession
    base = spark.createDataFrame(
        [(s, n, rate) for s, (n, rate) in sorted(rates.items())],
        f"{source_col} string, n_docs long, _rate double",
    )
    counts = kept.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n_kept"))
    # the audit relation is #sources rows — the global window is fine
    tot = F.sum("n_kept").over(Window.partitionBy())
    return (
        base.join(counts, source_col, "left")
        .withColumn("n_kept", F.coalesce(F.col("n_kept"), F.lit(0)))
        .withColumn("rate", F.round("_rate", 6))
        .withColumn("achieved_p",
                    F.round(F.col("n_kept") / tot, 6))
        .select(source_col, "n_docs", "rate", "n_kept", "achieved_p")
        .orderBy(source_col)
    )


# ---------------------------------------------------------------------------
# X128 — n-gram LM perplexity quality scoring (the CCNet recipe)


def unigram_lm(
    docs: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    ref_mod: int = 10,
    alpha: float = 1.0,
) -> tuple[DataFrame, DataFrame]:
    """Train an add-``alpha`` smoothed unigram LM on a deterministic
    reference slice of the corpus (``doc_id % ref_mod == 0`` — the
    CCNet pattern of scoring the crawl with a model trained on a
    trusted subset, made RNG-free).

    Returns ``(lm, oov)``: ``lm`` is (term, logp) with
    ``logp = log2((cnt + alpha) / (T + alpha * (V + 1)))`` — counts and
    totals are exact integer aggregations, the log is one per-row double
    op; ``oov`` is the single-row unseen-term mass
    ``log2(alpha / (T + alpha * (V + 1)))``. The ``+ 1`` in the
    denominator is the OOV bucket, so the model is a proper
    distribution over V + 1 outcomes.

    Scale: LM training touches only the reference slice (one term
    groupBy); the totals are a 1-row aggregate cross-joined back —
    vocabulary-sized output, corpus never rescanned.
    """
    from mahout_spark.operators.stats import simple_term_frequencies

    ref = docs.filter((F.col(id_col) % F.lit(ref_mod)) == 0)
    counts = (
        simple_term_frequencies(ref, content_col, id_col)
        .groupBy("term")
        .agg(F.sum("tf").alias("cnt"))
    )
    tot = counts.agg(
        F.sum("cnt").alias("_t"), F.count(F.lit(1)).alias("_v")
    )
    denom = F.col("_t") + F.lit(alpha) * (F.col("_v") + F.lit(1))
    lm = counts.crossJoin(F.broadcast(tot)).select(
        "term", F.log2((F.col("cnt") + F.lit(alpha)) / denom).alias("logp")
    )
    oov = tot.select(F.log2(F.lit(alpha) / denom).alias("_oov_logp"))
    return lm, oov


def lm_cross_entropy(
    docs: DataFrame,
    lm: DataFrame,
    oov: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_tokens, cross_entropy): per-document token-level cross
    entropy ``H = -(1/n) * sum(tf_w * logp_w)`` under ``lm``, unseen
    terms charged the ``oov`` mass. Lower H = more like the reference
    slice (CCNet keeps the head of this distribution).

    Hash-stable by construction: the per-doc sum runs as an ORDERED
    running-sum window (partitioned by doc, ordered by term), so both
    Spark and an independent SQL engine fold the identical per-term
    doubles left-to-right in term order — no order-dependent float
    summation (the same concern that pushed t_test/matrix_stats to
    exact moment arithmetic; logs are irrational, so order pinning is
    the available determinism here). Result rounded once to 1e-6.

    Scale: one corpus tf aggregation, one join against the
    vocabulary-sized LM (broadcast when small, hash join otherwise),
    one doc-partitioned window — no global window, no driver state.
    """
    from pyspark.sql import Window

    from mahout_spark.operators.stats import simple_term_frequencies

    tf = simple_term_frequencies(docs, content_col, id_col)
    contrib = (
        tf.join(lm, "term", "left")
        .crossJoin(F.broadcast(oov))
        .select(
            id_col,
            "term",
            "doclen",
            (F.col("tf") * F.coalesce(F.col("logp"), F.col("_oov_logp"))
             ).alias("_c"),
        )
    )
    cum = Window.partitionBy(id_col).orderBy("term").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    last = Window.partitionBy(id_col).orderBy(F.col("term").desc())
    return (
        contrib.withColumn("_cum", F.sum("_c").over(cum))
        .withColumn("_rn", F.row_number().over(last))
        .filter(F.col("_rn") == 1)
        .select(
            id_col,
            F.col("doclen").cast("long").alias("n_tokens"),
            F.round(-F.col("_cum") / F.col("doclen"), 6).alias(
                "cross_entropy"
            ),
        )
    )


def lm_quality(
    docs: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    ref_mod: int = 10,
    alpha: float = 1.0,
    exact_thresholds: bool = True,
) -> DataFrame:
    """(id, n_tokens, cross_entropy, bucket): CCNet-style perplexity
    bucketing — corpus-relative tertiles of per-doc cross entropy under
    a reference-slice unigram LM; ``head`` = most reference-like third,
    then ``middle`` / ``tail``.

    ``exact_thresholds=True`` is the ORACLE KERNEL: tertile cut points
    are the max H among the ``ceil(n/3)`` / ``ceil(2n/3)`` lowest
    (H, id)-ordered docs — discrete, interpolation-free, reproducible
    bit-for-bit by any SQL engine (no quantile_cont interpolation-order
    ambiguity). It takes the k smallest per-doc scores via
    TakeOrderedAndProject, so the driver holds O(n/3) 16-byte rows —
    fine at test scale, declared non-goal at 100 TB. The scale path is
    ``exact_thresholds=False``: ``approx_percentile`` (one aggregate,
    no driver growth), same plan otherwise — the X5/X22 split.

    Bucketing is value-based (``H <= t``), so score ties straddling a
    cut land identically in both regimes and both engines.
    """
    scored = lm_cross_entropy(
        docs, *unigram_lm(docs, content_col, id_col, ref_mod, alpha),
        content_col=content_col, id_col=id_col,
    )
    if exact_thresholds:
        n = scored.count()
        k1, k2 = -(-n // 3), -(-(2 * n) // 3)  # ceil
        ordered = scored.select("cross_entropy", id_col).orderBy(
            "cross_entropy", id_col
        )
        t1 = ordered.limit(k1).agg(
            F.max("cross_entropy").alias("_t1"))
        t2 = ordered.limit(k2).agg(
            F.max("cross_entropy").alias("_t2"))
        thr = t1.crossJoin(t2)
    else:
        thr = scored.agg(
            F.expr(
                "approx_percentile(cross_entropy, array(0.3333333, "
                "0.6666667), 10000)"
            ).alias("_q")
        ).select(
            F.col("_q")[0].alias("_t1"), F.col("_q")[1].alias("_t2")
        )
    return scored.crossJoin(F.broadcast(thr)).select(
        id_col,
        "n_tokens",
        "cross_entropy",
        F.when(F.col("cross_entropy") <= F.col("_t1"), F.lit("head"))
        .when(F.col("cross_entropy") <= F.col("_t2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


# ---------------------------------------------------------------------------
# C4 heuristic cleaning (X129)
# ---------------------------------------------------------------------------

def c4_filters(
    docs: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    min_words_per_line: int = 3,
    min_sentences: int = 5,
    line_drop_words: tuple = ("javascript",),
    banned_words: tuple = (),
    banned_phrases: tuple = ("lorem ipsum",),
    drop_braces: bool = True,
) -> DataFrame:
    """The C4 cleaning heuristics (Raffel et al. 2020 §2.2 — the rule
    set that turned Common Crawl into C4, run by every web-scale
    pretraining pipeline between extraction and dedup): per document,

    * **line rules** (a line = one ``\\n`` split): keep a line only if
      it (a) has at least ``min_words_per_line`` whitespace-separated
      words, (b) ends in a terminal punctuation mark (``. ! ?`` or a
      closing double quote — the paper's convention), and (c) contains
      none of ``line_drop_words`` (the paper's "javascript" rule;
      substring containment on the lowercased line);
    * **document rules**, first match wins (``drop_reason``):
      ``banned_word`` — the lowercased ORIGINAL text contains any of
      ``banned_words`` (the paper's policy word list, caller-supplied;
      substring containment); ``banned_phrase`` — ditto for
      ``banned_phrases`` (the paper's "lorem ipsum" rule); ``brace`` —
      the original text contains ``{`` (the paper's code-page rule);
      ``too_few_sentences`` — fewer than ``min_sentences`` sentence
      terminators (``[.!?]`` occurrences, the pinned convention) remain
      in the CLEANED text. ``drop_reason`` NULL ⇒ ``kept``.

    Returns ``(id, kept, drop_reason, n_lines, n_lines_kept,
    n_sentences, clean_text)`` — ``n_lines`` counts non-blank input
    lines; ``clean_text`` is the kept lines re-joined by ``\\n``.
    NULL/empty input text is excluded (the quality_scores contract).

    Scale shape: every rule is a per-document array/string expression
    (split → lambda filter → join, all JVM higher-order functions) — one
    narrow projection pass, ZERO exchanges and zero Python, exactly like
    quality_scores; the paper's remaining rule (three-sentence-span
    dedup across the corpus) is cross-document state and lives in
    ``duplicated_spans`` (X125), which see. Rule evaluation on the
    original vs cleaned text follows the paper: policy/code rules are
    page-level (pre-clean), the sentence floor is post-clean.

    All outputs are ints/strings/booleans — no float rounding seam, so
    the SQL oracle replays bit-for-bit.
    """
    if min_words_per_line < 1:
        raise ValueError(
            f"min_words_per_line must be >= 1: {min_words_per_line}")
    if min_sentences < 0:
        raise ValueError(f"min_sentences must be >= 0: {min_sentences}")

    def _wc(line):
        return F.size(
            F.filter(F.split(F.trim(line), r"\s+"), lambda w: w != ""))

    def _keep(line):
        cond = (
            (_wc(line) >= min_words_per_line)
            & F.trim(line).rlike('[.!?"]$')
        )
        for w in line_drop_words:
            cond = cond & ~F.lower(line).contains(w.lower())
        return cond

    staged = (
        docs.filter(
            F.col(content_col).isNotNull() & (F.col(content_col) != ""))
        .select(
            F.col(id_col).alias(id_col),
            F.col(content_col).alias("_raw"),
            F.split(F.col(content_col), "\n").alias("_lines"),
        )
        .select(
            id_col,
            "_raw",
            "_lines",
            F.filter(F.col("_lines"), _keep).alias("_kept"),
        )
        .select(
            id_col,
            "_raw",
            F.size(
                F.filter(F.col("_lines"), lambda x: F.trim(x) != "")
            ).cast("long").alias("n_lines"),
            F.size("_kept").cast("long").alias("n_lines_kept"),
            F.array_join(F.col("_kept"), "\n").alias("clean_text"),
        )
        .select(
            id_col,
            "_raw",
            "n_lines",
            "n_lines_kept",
            "clean_text",
            F.regexp_count(F.col("clean_text"), F.lit(r"[.!?]"))
            .cast("long").alias("n_sentences"),
        )
    )

    banned_cond = F.lit(False)
    for w in banned_words:
        banned_cond = banned_cond | F.lower(F.col("_raw")).contains(
            w.lower())
    phrase_cond = F.lit(False)
    for p in banned_phrases:
        phrase_cond = phrase_cond | F.lower(F.col("_raw")).contains(
            p.lower())
    brace_cond = (
        F.col("_raw").contains("{") if drop_braces else F.lit(False))

    reason = (
        F.when(banned_cond, F.lit("banned_word"))
        .when(phrase_cond, F.lit("banned_phrase"))
        .when(brace_cond, F.lit("brace"))
        .when(F.col("n_sentences") < min_sentences,
              F.lit("too_few_sentences"))
    )
    return staged.select(
        id_col,
        reason.isNull().alias("kept"),
        reason.alias("drop_reason"),
        "n_lines",
        "n_lines_kept",
        "n_sentences",
        "clean_text",
    )


def c4_stats(filtered: DataFrame) -> DataFrame:
    """One-row funnel accounting over a ``c4_filters`` result: document
    counts in/kept/per drop reason, line counts in/kept. One partial
    aggregation — the audit every cleaning run logs next to its output."""
    return filtered.agg(
        F.count(F.lit(1)).alias("docs_in"),
        F.sum(F.col("kept").cast("long")).alias("docs_kept"),
        F.sum((F.col("drop_reason") == "banned_word").cast("long"))
        .alias("docs_banned_word"),
        F.sum((F.col("drop_reason") == "banned_phrase").cast("long"))
        .alias("docs_banned_phrase"),
        F.sum((F.col("drop_reason") == "brace").cast("long"))
        .alias("docs_brace"),
        F.sum((F.col("drop_reason") == "too_few_sentences").cast("long"))
        .alias("docs_too_few_sentences"),
        F.sum("n_lines").alias("lines_in"),
        F.sum("n_lines_kept").alias("lines_kept"),
    )


# ---------------------------------------------------------------------------
# Gopher quality gate (X130)
# ---------------------------------------------------------------------------

GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_filters(
    docs: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_frac: float = 0.8,
    stop_words: tuple = GOPHER_STOPS,
    min_stop_hits: int = 2,
    include_repetition: bool = True,
    max_dup_line_frac: float = 0.3,
    max_dup_line_char_frac: float = 0.2,
    max_top_gram_frac: float = 0.2,
    max_dup_gram_frac: float = 0.15,
) -> DataFrame:
    """The Gopher quality gate (Rae et al. 2021, table A1 — the
    MassiveText document filter between extraction and dedup; with
    ``c4_filters`` (X129) these are the two canonical web-pretraining
    rule sets). Per document, first failing rule wins (``drop_reason``,
    evaluated in the table's order):

    ``too_few_words`` / ``too_many_words`` — word count outside
    [min_words, max_words]; ``word_length`` — mean word length outside
    [min, max]; ``symbol_ratio`` — (count('#') + count('...')) / words
    above the cap (the paper's symbol-to-word rule — ellipses count
    HERE first; the line-level ellipsis rule below sees only docs that
    pass it); ``bullet_lines`` / ``ellipsis_lines`` — fraction of lines
    starting with a bullet (trimmed ``- * •``) / ending with ``...``
    above the caps; ``alpha_words`` — fraction of words containing at
    least one ``[A-Za-z]`` below the floor; ``stop_words`` — fewer than
    ``min_stop_hits`` DISTINCT entries of ``stop_words`` present; then
    the repetition rules on the X98 signals (``dup_lines`` /
    ``dup_line_chars`` / ``top_ngram`` / ``dup_ngram`` against the
    ROUNDED fractions ``repetition_signals`` reports, so the decision
    is exactly replayable from that operator's output).

    Pinned conventions (the paper leaves them open): *words* = non-empty
    whitespace splits of the raw text; *lines* = non-empty ``\\n``
    splits; stop-word hits are counted over the lowercased alphanumeric
    token stream (punctuation-glued words still hit); ``...`` counts
    are non-overlapping left-to-right. NULL/empty text is excluded (the
    quality_scores contract). Reported ratios round once to 1e-6;
    ``kept`` is decided on the same rounded values.

    Scale shape: every doc-level rule is one JVM higher-order-function
    projection (zero exchanges, zero Python) — same pass structure as
    ``c4_filters``; ``include_repetition=True`` adds the X98 signals via
    an id-equijoin to ``repetition_signals`` (the one Arrow pass whose
    per-doc-multiset story is argued there). No cross-document state
    anywhere, so the whole gate streams map-side at any corpus size.
    """
    if min_words < 0 or max_words < min_words:
        raise ValueError(
            f"bad word bounds: [{min_words}, {max_words}]")
    if min_stop_hits < 0:
        raise ValueError(f"min_stop_hits must be >= 0: {min_stop_hits}")
    if min_stop_hits > len(stop_words):
        raise ValueError(
            f"min_stop_hits {min_stop_hits} exceeds the stop list "
            f"({len(stop_words)} entries)")

    words = F.col("_words")
    n_words = F.size(words)
    lines = F.col("_lines")
    n_lines = F.size(lines)

    staged = (
        docs.filter(
            F.col(content_col).isNotNull() & (F.col(content_col) != ""))
        .select(
            F.col(id_col).alias(id_col),
            F.col(content_col).alias("_raw"),
            F.filter(
                F.split(F.col(content_col), r"\s+"),
                lambda w: w != "",
            ).alias("_words"),
            F.filter(
                F.split(F.col(content_col), "\n"),
                lambda x: x != "",
            ).alias("_lines"),
        )
        .select(
            id_col,
            n_words.cast("long").alias("n_words"),
            F.when(
                n_words > 0,
                F.aggregate(
                    words, F.lit(0).cast("long"),
                    lambda acc, w: acc + F.length(w),
                ) / n_words,
            ).otherwise(F.lit(0.0)).alias("_mean_wl"),
            F.when(
                n_words > 0,
                (
                    (F.length("_raw")
                     - F.length(F.replace(F.col("_raw"), F.lit("#"),
                                          F.lit(""))))
                    + F.regexp_count(F.col("_raw"), F.lit(r"\.\.\."))
                ) / n_words,
            ).otherwise(F.lit(0.0)).alias("_symbol"),
            F.when(
                n_lines > 0,
                F.size(F.filter(
                    lines, lambda x: F.trim(x).rlike("^[-*•]")
                )) / n_lines,
            ).otherwise(F.lit(0.0)).alias("_bullet"),
            F.when(
                n_lines > 0,
                F.size(F.filter(
                    lines, lambda x: F.trim(x).endswith("...")
                )) / n_lines,
            ).otherwise(F.lit(0.0)).alias("_ellipsis"),
            F.when(
                n_words > 0,
                F.size(F.filter(
                    words, lambda w: w.rlike("[A-Za-z]")
                )) / n_words,
            ).otherwise(F.lit(0.0)).alias("_alpha"),
            F.size(F.array_intersect(
                F.filter(
                    F.split(F.lower(F.col("_raw")), "[^a-z0-9]+"),
                    lambda t: t != "",
                ),
                F.array(*[F.lit(s) for s in stop_words]),
            )).cast("long").alias("stop_hits"),
        )
        .select(
            id_col,
            "n_words",
            F.round("_mean_wl", 6).alias("mean_word_len"),
            F.round("_symbol", 6).alias("symbol_ratio"),
            F.round("_bullet", 6).alias("bullet_frac"),
            F.round("_ellipsis", 6).alias("ellipsis_frac"),
            F.round("_alpha", 6).alias("alpha_frac"),
            "stop_hits",
        )
    )

    reason = (
        F.when(F.col("n_words") < min_words, F.lit("too_few_words"))
        .when(F.col("n_words") > max_words, F.lit("too_many_words"))
        .when(
            (F.col("mean_word_len") < min_mean_word_len)
            | (F.col("mean_word_len") > max_mean_word_len),
            F.lit("word_length"))
        .when(F.col("symbol_ratio") > max_symbol_ratio,
              F.lit("symbol_ratio"))
        .when(F.col("bullet_frac") > max_bullet_frac,
              F.lit("bullet_lines"))
        .when(F.col("ellipsis_frac") > max_ellipsis_frac,
              F.lit("ellipsis_lines"))
        .when(F.col("alpha_frac") < min_alpha_frac,
              F.lit("alpha_words"))
        .when(F.col("stop_hits") < min_stop_hits, F.lit("stop_words"))
    )
    if not include_repetition:
        return staged.select(
            id_col,
            reason.isNull().alias("kept"),
            reason.alias("drop_reason"),
            "n_words", "mean_word_len", "symbol_ratio", "bullet_frac",
            "ellipsis_frac", "alpha_frac", "stop_hits",
        )

    sig = repetition_signals(docs, content_col=content_col,
                             id_col=id_col, top_n=2, dup_n=5)
    reason = (
        reason
        .when(F.col("dup_line_frac") > max_dup_line_frac,
              F.lit("dup_lines"))
        .when(F.col("dup_line_char_frac") > max_dup_line_char_frac,
              F.lit("dup_line_chars"))
        .when(F.col("top2gram_char_frac") > max_top_gram_frac,
              F.lit("top_ngram"))
        .when(F.col("dup5gram_char_frac") > max_dup_gram_frac,
              F.lit("dup_ngram"))
    )
    return staged.join(sig, on=id_col, how="inner").select(
        id_col,
        reason.isNull().alias("kept"),
        reason.alias("drop_reason"),
        "n_words", "mean_word_len", "symbol_ratio", "bullet_frac",
        "ellipsis_frac", "alpha_frac", "stop_hits",
        "dup_line_frac", "dup_line_char_frac",
        "top2gram_char_frac", "dup5gram_char_frac",
    )


def gopher_stats(filtered: DataFrame) -> DataFrame:
    """One-row funnel accounting over a ``gopher_filters`` result:
    docs in/kept plus a count per drop reason (reasons absent from the
    input report 0 — the audit row is schema-stable across corpora)."""
    reasons = (
        "too_few_words", "too_many_words", "word_length", "symbol_ratio",
        "bullet_lines", "ellipsis_lines", "alpha_words", "stop_words",
        "dup_lines", "dup_line_chars", "top_ngram", "dup_ngram",
    )
    return filtered.agg(
        F.count(F.lit(1)).alias("docs_in"),
        F.sum(F.col("kept").cast("long")).alias("docs_kept"),
        *[
            F.sum((F.col("drop_reason") == r).cast("long"))
            .alias(f"docs_{r}")
            for r in reasons
        ],
    )


# ---------------------------------------------------------------------------
# End-to-end curation pipeline (X131)
# ---------------------------------------------------------------------------

def curate_pipeline(
    docs: DataFrame,
    eval_docs: DataFrame | None = None,
    content_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.5,
    decon_n: int = 13,
    decon_min_shared: int = 1,
) -> DataFrame:
    """The training-data curation funnel, composed SEQUENTIALLY from the
    oracled stage operators (the FineWeb/MassiveText shape: quality gate
    → exact dedup → benchmark decontamination), with a per-document
    disposition instead of a silently shrinking corpus — the lineage a
    100 TB curation run has to keep to be auditable.

    Stages, first drop wins (``stage``):

    * ``empty`` — NULL/zero-length content (excluded by every stage
      operator's contract, surfaced here instead of vanishing);
    * ``quality`` — X10 ``quality_scores`` combined score below
      ``min_quality`` (decided on the ROUNDED score, so the decision
      replays from that operator's output);
    * ``exact_dup`` — X1 semantics over the quality SURVIVORS: canonical
      = min id per sha256(content); non-canonical rows drop and report
      ``canonical_id`` (sequential semantics — a duplicate of a
      quality-dropped doc is NOT a duplicate, its twin never entered
      this stage);
    * ``contaminated`` — X85 ``contaminated_docs`` over the dedup
      survivors vs ``eval_docs`` (skipped when ``eval_docs`` is None);
      flagged rows report ``n_shared``.

    Returns one row per input doc: ``(id, kept, stage, quality,
    canonical_id, n_shared)``.

    Scale shape: one exchange per stage boundary, every key narrow —
    the id-equijoin against the quality relation, the 32-byte sha
    shuffle for canonical selection (bodies never shuffle), and the
    broadcast gram semi-join from X85 (the corpus side never shuffles).
    The final assembly is two more id-equijoins against DROP-sized
    relations (dup map, contamination list), which AQE broadcasts when
    small. No stage widens rows with bodies past its own boundary.
    """
    from mahout_spark.operators.textstats import quality_scores

    q = quality_scores(docs, content_col=content_col, id_col=id_col)
    base = (
        docs.select(F.col(id_col), F.col(content_col))
        .join(q.select(id_col, "quality"), on=id_col, how="left")
    )

    surv1 = (
        base.filter(
            F.col("quality").isNotNull()
            & (F.col("quality") >= min_quality))
        .withColumn("_k", F.sha2(F.col(content_col), 256))
    )
    canon = surv1.groupBy("_k").agg(
        F.min(id_col).alias("canonical_id"))
    keyed = surv1.join(canon, "_k")
    dup_map = (
        keyed.filter(F.col(id_col) != F.col("canonical_id"))
        .select(id_col, "canonical_id")
    )
    surv2 = (
        keyed.filter(F.col(id_col) == F.col("canonical_id"))
        .select(id_col, content_col)
    )

    out = base.join(dup_map, on=id_col, how="left")
    if eval_docs is not None:
        cont = contaminated_docs(
            surv2, eval_docs, n=decon_n, min_shared=decon_min_shared,
            content_col=content_col, id_col=id_col)
        out = out.join(cont, on=id_col, how="left")
    else:
        out = out.withColumn("n_shared", F.lit(None).cast("long"))

    stage = (
        F.when(F.col("quality").isNull(), F.lit("empty"))
        .when(F.col("quality") < min_quality, F.lit("quality"))
        .when(F.col("canonical_id").isNotNull(), F.lit("exact_dup"))
        .when(F.col("n_shared").isNotNull(), F.lit("contaminated"))
    )
    return out.select(
        id_col,
        stage.isNull().alias("kept"),
        stage.alias("stage"),
        "quality",
        "canonical_id",
        "n_shared",
    )


def curate_stats(disposition: DataFrame) -> DataFrame:
    """One-row funnel audit over a ``curate_pipeline`` result: docs in,
    docs kept, and a count per pipeline stage (schema-stable — absent
    stages report 0)."""
    return disposition.agg(
        F.count(F.lit(1)).alias("docs_in"),
        F.sum(F.col("kept").cast("long")).alias("docs_kept"),
        *[
            F.sum((F.col("stage") == s).cast("long")).alias(f"docs_{s}")
            for s in ("empty", "quality", "exact_dup", "contaminated")
        ],
    )


# ---------------------------------------------------------------------------
# Cross-document line-level dedup + boilerplate removal (X132/X133)
# ---------------------------------------------------------------------------

def _line_occurrences(
    docs: DataFrame, content_col: str, id_col: str
) -> DataFrame:
    """(id, li, line) for every NON-EMPTY newline-split line; ``li`` is
    the ORIGINAL 0-based split index, so callers can rebuild against the
    same split without re-aligning positions."""
    return (
        docs.filter(F.col(content_col).isNotNull())
        .select(
            id_col,
            F.posexplode(F.split(F.col(content_col), "\n"))
            .alias("li", "line"),
        )
        .filter(F.col("line") != "")
    )


def _rebuild_without(
    docs: DataFrame,
    dropped: DataFrame,
    content_col: str,
    id_col: str,
) -> DataFrame:
    """Reassemble each doc minus the (id, li) positions in ``dropped``:
    one groupBy of the DROPPED positions only (never the full line
    stream), one id-equijoin back to the intact corpus row, and a pure
    array-expression rebuild — document bodies never shuffle."""
    drop_per_doc = dropped.groupBy(id_col).agg(
        F.collect_list("li").alias("_drop"))
    lines = F.split(F.col(content_col), "\n")
    kept = F.filter(
        lines,
        lambda x, i: (x != "") & ~F.coalesce(
            F.array_contains(F.col("_drop"), i), F.lit(False)),
    )
    n_lines = F.size(F.filter(lines, lambda x: x != ""))
    return (
        docs.filter(F.col(content_col).isNotNull())
        .join(drop_per_doc, on=id_col, how="left")
        .select(
            id_col,
            n_lines.cast("long").alias("n_lines"),
            (n_lines - F.when(F.col("_drop").isNull(), F.lit(0))
             .otherwise(F.size("_drop"))).cast("long")
            .alias("n_lines_kept"),
            F.array_join(kept, "\n").alias("clean_text"),
        )
    )


def dedup_lines(
    docs: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-wide line-level exact dedup (the MassiveText / Dolma
    paragraph-dedup stage, Rae et al. 2021 / Soldaini et al. 2024 —
    boilerplate and templated paragraphs repeat ACROSS documents, so a
    per-doc gate can't see them): an occurrence of a line is kept iff
    it is the corpus-wide FIRST occurrence of that exact line, ordered
    by (id, line index) — later copies drop, in the same doc or any
    other. Returns one row per doc: ``(id, n_lines, n_lines_kept,
    clean_text)`` over non-empty lines.

    Scale shape: lines are keyed by JVM ``xxhash64`` (8 bytes), so the
    two exchanges carry only (key, id, li) tuples — the canonical-
    occurrence aggregation (min struct per key) and the dropped-
    positions-per-doc groupBy; document BODIES never shuffle (rebuild
    is an id-equijoin back to the intact corpus row + one array
    projection). The dropped relation is duplicate-sized, not
    corpus-sized. A corpus-scale oracle MATCH on line STRINGS doubles
    as an xxhash64 collision check.
    """
    occ = _line_occurrences(docs, content_col, id_col).select(
        id_col, "li", F.xxhash64("line").alias("_k"))
    pos = F.struct(F.col(id_col), F.col("li"))
    first = occ.groupBy("_k").agg(F.min(pos).alias("_first"))
    dropped = (
        occ.join(first, "_k")
        .filter(pos != F.col("_first"))
        .select(id_col, "li")
    )
    return _rebuild_without(docs, dropped, content_col, id_col)


def line_dedup_stats(result: DataFrame) -> DataFrame:
    """One-row audit over a ``dedup_lines``/``remove_boilerplate``
    result: docs, total non-empty lines, kept, dropped."""
    return result.agg(
        F.count(F.lit(1)).alias("docs_in"),
        F.sum("n_lines").cast("long").alias("lines_in"),
        F.sum("n_lines_kept").cast("long").alias("lines_kept"),
        (F.sum("n_lines") - F.sum("n_lines_kept")).cast("long")
        .alias("lines_dropped"),
    )


def boilerplate_lines(
    docs: DataFrame,
    min_df: int = 2,
    content_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The corpus's boilerplate list: every distinct line appearing in
    at least ``min_df`` DISTINCT documents, as ``(line, df)`` — the
    CCNet/RefinedWeb frequency signal (navigation chrome, cookie
    banners, templated footers repeat across unrelated pages; content
    does not).

    Plan: one groupBy(line) with map-side partial aggregation (repeats
    collapse before the exchange), countDistinct over ids. The output
    is threshold-sized — the audit relation a curation run reviews
    before ``remove_boilerplate`` deletes anything."""
    if min_df < 1:
        raise ValueError(f"min_df must be >= 1: {min_df}")
    return (
        _line_occurrences(docs, content_col, id_col)
        .groupBy("line")
        .agg(F.countDistinct(id_col).alias("df"))
        .filter(F.col("df") >= min_df)
    )


def remove_boilerplate(
    docs: DataFrame,
    min_df: int = 2,
    content_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Drop EVERY occurrence of a boilerplate line (line present in
    ``>= min_df`` distinct docs) — unlike ``dedup_lines``, no copy
    survives: chrome is noise everywhere, not content once. Returns
    the same per-doc shape ``(id, n_lines, n_lines_kept, clean_text)``.

    Plan: the boilerplate keys aggregate to a threshold-sized 8-byte
    relation (AQE broadcasts it into the occurrence semi-join), dropped
    positions group per doc, bodies never shuffle (``_rebuild_without``).
    """
    if min_df < 1:
        raise ValueError(f"min_df must be >= 1: {min_df}")
    occ = _line_occurrences(docs, content_col, id_col).select(
        id_col, "li", F.xxhash64("line").alias("_k"))
    bp = (
        occ.groupBy("_k")
        .agg(F.countDistinct(id_col).alias("df"))
        .filter(F.col("df") >= min_df)
        .select("_k")
    )
    dropped = occ.join(bp, "_k", "leftsemi").select(id_col, "li")
    return _rebuild_without(docs, dropped, content_col, id_col)


# ---------------------------------------------------------------------------
# DSIR data selection (X134)
# ---------------------------------------------------------------------------

def dsir_weights(
    docs: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    target_mod: int = 10,
    alpha: float = 1.0,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): per-doc log importance
    ratio ``log2 p_target(x) - log2 p_raw(x)`` under two add-``alpha``
    unigram LMs — target = the deterministic ``id % target_mod == 0``
    slice (stands in for the paper's target-domain sample; no external
    data), raw = the WHOLE corpus. Positive = more target-like than the
    corpus average. Returns ``(id, n_tokens, logratio)``.

    The ratio is the paper's raw (unnormalized) log weight: one tf pass
    joined against BOTH vocabulary-sized LMs, per-term contribution
    ``tf * (logp_t - logp_r)`` (each side OOV-backed), folded per doc by
    the SAME ordered running-sum window as ``lm_cross_entropy`` — both
    engines sum identical doubles in term order, rounded once to 1e-6.

    Scale: LM training is one term groupBy per side (the target side
    over its slice only); scoring is one corpus tf aggregation + two
    vocabulary joins + one doc-partitioned window — no global window,
    no driver state.
    """
    from pyspark.sql import Window

    from mahout_spark.operators.stats import simple_term_frequencies

    lm_t, oov_t = unigram_lm(docs, content_col, id_col, target_mod, alpha)
    lm_r, oov_r = unigram_lm(docs, content_col, id_col, 1, alpha)
    tf = simple_term_frequencies(docs, content_col, id_col)
    contrib = (
        tf.join(lm_t.withColumnRenamed("logp", "_lt"), "term", "left")
        .join(lm_r.withColumnRenamed("logp", "_lr"), "term", "left")
        .crossJoin(F.broadcast(
            oov_t.select(F.col("_oov_logp").alias("_ot"))))
        .crossJoin(F.broadcast(
            oov_r.select(F.col("_oov_logp").alias("_or"))))
        .select(
            id_col,
            "term",
            "doclen",
            (F.col("tf")
             * (F.coalesce(F.col("_lt"), F.col("_ot"))
                - F.coalesce(F.col("_lr"), F.col("_or")))).alias("_c"),
        )
    )
    cum = Window.partitionBy(id_col).orderBy("term").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    last = Window.partitionBy(id_col).orderBy(F.col("term").desc())
    return (
        contrib.withColumn("_cum", F.sum("_c").over(cum))
        .withColumn("_rn", F.row_number().over(last))
        .filter(F.col("_rn") == 1)
        .select(
            id_col,
            F.col("doclen").cast("long").alias("n_tokens"),
            F.round(F.col("_cum"), 6).alias("logratio"),
        )
    )


def dsir_sample(
    docs: DataFrame,
    k: int,
    content_col: str = "text",
    id_col: str = "doc_id",
    target_mod: int = 10,
    alpha: float = 1.0,
) -> DataFrame:
    """Deterministic DSIR selection: the top ``k`` docs by importance
    ratio (desc, id asc tie-break) — the RNG-free stand-in for the
    paper's Gumbel-top-k resampling (the sandbox contract is replayable
    SQL; swapping in Gumbel noise keyed on a seeded hash would restore
    the sampled variant without changing the plan). One
    TakeOrderedAndProject over the weight relation — no global sort."""
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    w = dsir_weights(docs, content_col, id_col, target_mod, alpha)
    return w.orderBy(F.col("logratio").desc(), F.col(id_col)).limit(k)


# ---------------------------------------------------------------------------
# Per-domain document caps (X136)
# ---------------------------------------------------------------------------

def domain_cap(
    docs: DataFrame,
    max_per_domain: int,
    seed: int = 42,
    source_col: str = "source",
    id_col: str = "doc_id",
    n_salts: int = 32,
) -> DataFrame:
    """RefinedWeb/FineWeb-style per-domain cap: keep at most
    ``max_per_domain`` docs per ``source_col`` value, selected by the
    X86 seeded multiplicative permutation (a deterministic "random"
    subset — the key is bijective mod P, so selection is unbiased,
    tie-free, and replayable by any SQL engine; re-runs are
    bit-identical). A handful of giant domains otherwise dominate a web
    crawl — the cap is the standard fix.

    Exact and skew-safe in TWO bounded phases (a single
    row_number-per-domain window would sort each domain inside one
    task — the biggest domain becomes the straggler):

    1. per (domain, salt = key % n_salts): keep the ``cap`` smallest
       keys — each window partition is ~1/n_salts of a domain, and the
       global cap-smallest set is provably a subset of this union
       (every survivor beats at most cap-1 keys in its own salt);
    2. re-rank the <= n_salts·cap survivors per domain and cut at the
       cap — the second window's partitions are CAP-BOUNDED, never
       corpus-bounded.

    Returns the kept rows (input schema unchanged).
    """
    if max_per_domain < 1:
        raise ValueError(f"max_per_domain must be >= 1: {max_per_domain}")
    if n_salts < 1:
        raise ValueError(f"n_salts must be >= 1: {n_salts}")
    from pyspark.sql import Window

    key = pack_key_expr(id_col, seed)
    staged = docs.withColumn("_key", key)
    w1 = Window.partitionBy(
        source_col, F.pmod(F.col("_key"), F.lit(n_salts))
    ).orderBy("_key")
    w2 = Window.partitionBy(source_col).orderBy("_key")
    return (
        staged.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= max_per_domain)
        .withColumn("_r2", F.row_number().over(w2))
        .filter(F.col("_r2") <= max_per_domain)
        .drop("_key", "_r1", "_r2")
    )


def domain_cap_stats(
    docs: DataFrame,
    max_per_domain: int,
    seed: int = 42,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-domain audit for ``domain_cap``: corpus count, kept count
    (= min(cap, n)), and the fraction kept — one #domains-row relation."""
    kept = domain_cap(docs, max_per_domain, seed, source_col, id_col)
    n = docs.groupBy(source_col).agg(F.count(F.lit(1)).alias("n_docs"))
    k = kept.groupBy(source_col).agg(F.count(F.lit(1)).alias("n_kept"))
    return (
        n.join(k, source_col, "left")
        .withColumn("n_kept", F.coalesce(F.col("n_kept"), F.lit(0)))
        .withColumn(
            "kept_frac", F.round(F.col("n_kept") / F.col("n_docs"), 6))
        .orderBy(source_col)
    )


# ---------------------------------------------------------------------------
# Token-budget selection (X137)
# ---------------------------------------------------------------------------

def token_budget_select(
    docs: DataFrame,
    budget_tokens: int,
    content_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = PACK_BUCKETS,
) -> DataFrame:
    """Quality-first selection up to a token budget (the "take the best
    N tokens" step every fixed-compute pretraining run ends with): rank
    the corpus by the X10 quality score (desc, id asc — the ROUNDED
    score, so the decision replays from that operator's output), keep
    the ranking PREFIX whose running token total stays within
    ``budget_tokens``. Returns one row per non-empty doc:
    ``(id, quality, n_tokens, cum_tokens, selected)`` — ``cum_tokens``
    includes the doc, ``selected = cum_tokens <= budget`` (prefix
    semantics: the budget is never exceeded, and no lower-quality doc
    is taken over a higher-quality one).

    The running total is the pack_documents two-phase prefix sum over
    the QUALITY order instead of the permutation order: quality lives
    in [0, 1], so ``floor((1 - quality) · B)`` is an order-preserving
    coarse bucketing — per-bucket totals prefix-sum on the driver
    (<= n_buckets rows), the within-bucket cumsum is a bucket-partitioned
    window. No global window, no single-task funnel at any corpus size.
    """
    if budget_tokens < 0:
        raise ValueError(f"budget_tokens must be >= 0: {budget_tokens}")
    from pyspark.sql import Window

    from mahout_spark.operators.textstats import quality_scores

    base = (
        quality_scores(docs, content_col=content_col, id_col=id_col)
        .select(id_col, "quality", "n_tokens")
        .filter(F.col("n_tokens") > 0)
        .withColumn(
            "_b",
            F.greatest(
                F.lit(0),
                F.least(
                    F.lit(n_buckets - 1),
                    F.floor((1.0 - F.col("quality")) * n_buckets),
                ),
            ).cast("long"),
        )
    )
    totals = {
        r["_b"]: r["t"]
        for r in base.groupBy("_b").agg(F.sum("n_tokens").alias("t"))
        .collect()
    }
    bases, acc = [], 0
    for b in range(n_buckets):
        bases.append((b, acc))
        acc += int(totals.get(b, 0))
    base_df = F.broadcast(
        docs.sparkSession.createDataFrame(bases, "_b long, _base long")
    )
    w = (
        Window.partitionBy("_b")
        .orderBy(F.col("quality").desc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.col("_base") + F.sum("n_tokens").over(w)
    return (
        base.join(base_df, "_b")
        .withColumn("cum_tokens", cum)
        .select(
            id_col, "quality", "n_tokens", "cum_tokens",
            (F.col("cum_tokens") <= F.lit(int(budget_tokens)))
            .alias("selected"),
        )
    )


# ---------------------------------------------------------------------------
# Weighted sampling without replacement (X149)
# ---------------------------------------------------------------------------

def weighted_sample(
    docs: DataFrame,
    k: int,
    weight_col: str,
    seed: int = 42,
    id_col: str = "doc_id",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, RNG-free (Efraimidis &
    Spirakis 2006 — the standard distributed algorithm, its uniform
    draw replaced by the X86 permutation so runs replay bit-for-bit):
    each row gets ``u = (permkey + 1) / (P + 1)`` ∈ (0, 1) and sort key
    ``ln(u) / w`` (the log-monotone form of the paper's ``u^(1/w)``);
    the ``k`` LARGEST keys are exactly an E-S sample — heavier rows get
    flatter keys and win more often, and inclusion is per-row
    independent of the others' weights given u.

    NULL or non-positive weights are EXCLUDED loudly by contract (the
    paper requires w > 0; silently keeping them would bias the sample).
    One projection + TakeOrderedAndProject — no shuffle beyond the
    top-k merge, no RNG state, re-runs identical; the same seed-vs-
    content caveats as ``mixture_sample`` apply (ids drive the draw).

    Returns the sampled rows: ``(id, weight, key)`` with ``key``
    exposed so downstream audits can re-check the order. The key is
    rounded once at 1e-6 (the contract-wide hash-stability convention —
    ln() may differ by an ulp across engines, which at finer roundings
    flips a digit often enough to break replay) and the ordering runs
    on the ROUNDED key with the id tie-break, so both engines select
    the identical sample.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    u = (pack_key_expr(id_col, seed) + F.lit(1)).cast("double") / F.lit(
        float(PACK_MOD + 1))
    key = F.log(u) / F.col(weight_col)
    return (
        docs.filter(
            F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .select(
            id_col,
            F.col(weight_col).alias("weight"),
            F.round(key, 6).alias("key"),
        )
        .orderBy(F.col("key").desc(), F.col(id_col).asc())
        .limit(k)
    )
