"""Training-set curation (X85/X86, operators/curation.py):
decontamination vs a pure-python n-gram oracle, two-phase packing
prefix sum vs a single global cumsum, plan gates, and rejects."""

import re

import pytest
from pyspark.sql import functions as F

from mahout_spark.operators.curation import (
    PACK_MOD,
    contaminated_docs,
    contamination_pairs,
    pack_documents,
    pack_multiplier,
    packing_stats,
)
from mahout_spark.plans.audit import capture_plan

# crafted corpus: doc 1 and 2 share a 3-gram run with eval doc 100;
# doc 3 shares nothing; doc 4 is shorter than n; doc 5 duplicates the
# leaked run twice (distinct grams still counted once)
TRAIN = [
    (1, "alpha beta gamma delta zz"),
    (2, "xx alpha beta gamma yy"),
    (3, "one two three four five"),
    (4, "alpha beta"),
    (5, "alpha beta gamma qq alpha beta gamma"),
]
EVAL = [
    (100, "pp alpha beta gamma delta"),
    (101, "six seven eight nine"),
]


def _grams(text, n):
    toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


def _py_contam(n, min_shared=1):
    eg = set().union(*(_grams(t, n) for _, t in EVAL))
    out = {}
    for did, t in TRAIN:
        shared = len(_grams(t, n) & eg)
        if shared >= min_shared:
            out[did] = shared
    return out


@pytest.fixture(scope="module")
def corpus(spark):
    train = spark.createDataFrame(TRAIN, "doc_id long, text string")
    test = spark.createDataFrame(EVAL, "doc_id long, text string")
    return train, test


def test_contaminated_docs_matches_python_oracle(corpus):
    train, test = corpus
    for n in (2, 3):
        got = {r["doc_id"]: r["n_shared"]
               for r in contaminated_docs(train, test, n=n).collect()}
        assert got == _py_contam(n), f"n={n}"
    # min_shared trims to the heavily-contaminated subset
    got2 = {r["doc_id"]: r["n_shared"]
            for r in contaminated_docs(train, test, n=2,
                                       min_shared=3).collect()}
    assert got2 == _py_contam(2, min_shared=3)


def test_contamination_pairs_attribution(corpus):
    train, test = corpus
    got = {(r["train_id"], r["test_id"]): r["n_shared"]
           for r in contamination_pairs(train, test, n=3).collect()}
    want = {}
    for tid, tt in TRAIN:
        for eid, et in EVAL:
            s = len(_grams(tt, 3) & _grams(et, 3))
            if s:
                want[(tid, eid)] = s
    assert got == want
    # attribution refines the flag set: same train ids, per-eval split
    flagged = {r["doc_id"] for r in
               contaminated_docs(train, test, n=3).collect()}
    assert {t for t, _ in got} == flagged


def test_decontam_eval_side_broadcast(corpus):
    train, test = corpus
    plan = capture_plan(contaminated_docs(train, test, n=3))
    assert "BroadcastHashJoin" in plan  # the corpus is never shuffled
    assert "SortMergeJoin" not in plan


def test_pack_matches_global_cumsum(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    L, seed = 64, 42
    got = {r["doc_id"]: (r["n_tokens"], r["offset"], r["seq_first"],
                         r["seq_last"])
           for r in pack_documents(docs, seq_len=L, seed=seed).collect()}
    # independent oracle: ONE global python cumsum over the same key
    rows = docs.select(
        "doc_id",
        F.size(F.filter(F.split(F.lower("text"), "[^a-z0-9]+"),
                        lambda t: t != "")).alias("n"),
    ).collect()
    order = sorted(
        ((r["doc_id"] * pack_multiplier(seed)) % PACK_MOD,
         r["doc_id"], r["n"])
        for r in rows if r["n"] > 0
    )
    want, off = {}, 0
    for _, did, n in order:
        want[did] = (n, off, off // L, (off + n - 1) // L)
        off += n
    assert got == want
    # the packing is gap-free: offsets tile [0, total)
    assert off == sum(n for n, *_ in want.values())


def test_pack_key_overflow_raises_not_wraps(spark):
    """ADVICE r4: ids past the int64-safe bound (~9.2e9 for typical
    multipliers) must RAISE inside the job instead of silently wrapping
    and breaking the SQL-replayable permutation; in-bound ids keep the
    exact modular arithmetic."""
    from mahout_spark.operators.curation import pack_key_expr

    seed = 42
    mult = pack_multiplier(seed)
    bound = (2**63 - 1) // mult
    ok = spark.createDataFrame([(7,), (bound,)], "doc_id bigint").select(
        pack_key_expr("doc_id", seed).alias("k"), "doc_id"
    )
    got = {r["doc_id"]: r["k"] for r in ok.collect()}
    assert got == {i: (i * mult) % PACK_MOD for i in (7, bound)}
    bad = spark.createDataFrame([(bound + 1,)], "doc_id bigint").select(
        pack_key_expr("doc_id", seed)
    )
    with pytest.raises(Exception, match="overflow"):
        bad.collect()
    neg = spark.createDataFrame([(-1,)], "doc_id bigint").select(
        pack_key_expr("doc_id", seed)
    )
    with pytest.raises(Exception, match="overflow"):
        neg.collect()


def test_pack_seed_changes_order_not_content(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = pack_documents(docs, seq_len=64, seed=1)
    b = pack_documents(docs, seq_len=64, seed=2)
    pa = {r["doc_id"]: r["offset"] for r in a.collect()}
    pb = {r["doc_id"]: r["offset"] for r in b.collect()}
    assert set(pa) == set(pb)          # same docs packed
    assert pa != pb                    # different permutation
    # deterministic: same seed replays byte-identically
    again = {r["doc_id"]: r["offset"]
             for r in pack_documents(docs, seq_len=64, seed=1).collect()}
    assert again == pa


def test_pack_window_is_partitioned(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = capture_plan(pack_documents(docs, seq_len=64), mode="simple")
    m = re.search(r"windowspecdefinition\(([^,]+),", plan)
    assert m and "_b" in m.group(1), plan  # partitioned, no global funnel
    assert "BroadcastExchange" in plan     # bucket bases broadcast in


def test_packing_stats(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    L = 64
    packed = pack_documents(docs, seq_len=L)
    rows = packed.collect()
    s = packing_stats(packed, L).first()
    total = sum(r["n_tokens"] for r in rows)
    assert s["n_docs"] == len(rows)
    assert s["total_tokens"] == total
    assert s["n_sequences"] == -(-total // L)
    assert s["tail_padding"] == -(-total // L) * L - total
    assert s["boundary_docs"] == sum(
        1 for r in rows if r["seq_last"] > r["seq_first"])


def test_rejects(corpus):
    train, test = corpus
    with pytest.raises(ValueError, match="n-gram"):
        contaminated_docs(train, test, n=0)
    with pytest.raises(ValueError, match="min_shared"):
        contaminated_docs(train, test, min_shared=0)
    with pytest.raises(ValueError, match="n-gram"):
        contamination_pairs(train, test, n=0)
    with pytest.raises(ValueError, match="seq_len"):
        pack_documents(train, seq_len=0)
    with pytest.raises(ValueError, match="seq_len"):
        packing_stats(train, seq_len=0)


# ---------------------------------------------------------------------------
# Gopher repetition signals (X98)
# ---------------------------------------------------------------------------

def test_repetition_signals_hand_computed(spark):
    from mahout_spark.operators.curation import repetition_signals

    docs = spark.createDataFrame(
        [
            # 4 lines, "dup dup" repeated: lines = [a, b, a, a]
            (0, "alpha beta\ngamma\nalpha beta\nalpha beta"),
            # no duplicate anything
            (1, "one two three four five six"),
            # heavy 2-gram repetition: "x y" x4 in 8 tokens
            (2, "x y x y x y x y"),
            (3, "solo"),
            (4, ""),      # excluded
            (5, None),    # excluded
        ],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r for r in
           repetition_signals(docs, top_n=2, dup_n=2).collect()}
    assert set(got) == {0, 1, 2, 3}

    r0 = got[0]
    assert r0["n_lines"] == 4
    # 2 of 4 line occurrences are repeats of "alpha beta" (10 chars each)
    assert r0["dup_line_frac"] == pytest.approx(0.5)
    assert r0["dup_line_char_frac"] == pytest.approx(
        round(20 / (10 + 5 + 10 + 10), 6))
    # norm text "alpha beta gamma alpha beta alpha beta" (38 chars),
    # top 2-gram "alpha beta" (10 chars) x3; it is also the only dup gram
    assert r0["top2gram_char_frac"] == pytest.approx(round(30 / 38, 6))
    assert r0["dup2gram_char_frac"] == pytest.approx(round(30 / 38, 6))

    r1 = got[1]
    assert r1["n_lines"] == 1 and r1["dup_line_frac"] == 0.0
    # all 2-grams distinct: top covers one occurrence (the count tie
    # pins to the lexicographically smallest gram, "five six"), dup none
    assert r1["dup2gram_char_frac"] == 0.0
    assert r1["top2gram_char_frac"] == pytest.approx(
        round(len("five six") / len("one two three four five six"), 6))

    r2 = got[2]
    # "x y" count 4, "y x" count 3, norm_len 15; dup = (4+3)*3/15 > 1 -> cap
    assert r2["top2gram_char_frac"] == pytest.approx(round(12 / 15, 6))
    assert r2["dup2gram_char_frac"] == 1.0

    r3 = got[3]  # fewer tokens than the gram size -> zero fractions
    assert r3["top2gram_char_frac"] == 0.0
    assert r3["dup2gram_char_frac"] == 0.0


def test_repetition_signals_tie_pins_smallest_gram(spark):
    from mahout_spark.operators.curation import repetition_signals

    # "b c" and "a b" both occur twice; tie must pin to "a b"... both
    # are 3 chars so the FRACTION is identical — use unequal lengths:
    # "zz q" x2 (4 chars) vs "a b" x2 (3 chars): same count, the
    # lexicographically smaller "a b" must win even though "zz q" covers
    # more characters
    docs = spark.createDataFrame(
        [(0, "a b zz q a b zz q")], "doc_id bigint, text string")
    r = repetition_signals(docs, top_n=2, dup_n=2).first()
    norm = len("a b zz q a b zz q")
    assert r["top2gram_char_frac"] == pytest.approx(
        round(2 * len("a b") / norm, 6))


def test_repetition_signals_rejects(spark):
    from mahout_spark.operators.curation import repetition_signals

    docs = spark.createDataFrame([(0, "x")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="gram sizes"):
        repetition_signals(docs, top_n=0)


# ---------------------------------------------------------------------------
# mixture resampling (X103)
# ---------------------------------------------------------------------------

def _mix_docs(spark):
    rows = [(i, f"src{i % 4}") for i in range(400)]
    return spark.createDataFrame(rows, "doc_id bigint, source string")


def test_mixture_rates_binding_source(spark):
    from mahout_spark.operators.curation import mixture_rates

    docs = _mix_docs(spark)  # 100 docs per source
    rates = mixture_rates(docs, {"src0": 0.5, "src1": 0.25, "src2": 0.25})
    # src0 binds: T = 100/0.5 = 200 -> src0 keeps all, others half
    assert rates["src0"] == (100, pytest.approx(1.0))
    assert rates["src1"] == (100, pytest.approx(0.5))
    assert rates["src2"] == (100, pytest.approx(0.5))
    with pytest.raises(ValueError, match="absent"):
        mixture_rates(docs, {"src0": 0.5, "nope": 0.5})
    with pytest.raises(ValueError, match="non-empty"):
        mixture_rates(docs, {})
    with pytest.raises(ValueError, match="> 0"):
        mixture_rates(docs, {"src0": 0.0})


def test_mixture_sample_deterministic_and_exact(spark):
    from mahout_spark.operators.curation import (
        PACK_MOD,
        mixture_sample,
        pack_multiplier,
    )

    docs = _mix_docs(spark)
    target = {"src0": 0.5, "src1": 0.25, "src2": 0.25}
    got = mixture_sample(docs, target, seed=7).collect()
    # python replay of the exact keep rule
    mult = pack_multiplier(7)
    thr = {"src0": int(1.0 * PACK_MOD), "src1": int(0.5 * PACK_MOD),
           "src2": int(0.5 * PACK_MOD)}
    exp = {i for i in range(400)
           if f"src{i % 4}" in thr
           and (i * mult) % PACK_MOD < thr[f"src{i % 4}"]}
    assert {r["doc_id"] for r in got} == exp
    # untargeted src3 fully dropped; re-run bit-identical
    assert all(r["source"] != "src3" for r in got)
    again = {r["doc_id"] for r in mixture_sample(docs, target, 7).collect()}
    assert again == exp


def test_mixture_stats_achieves_target(spark):
    from mahout_spark.operators.curation import mixture_stats

    docs = _mix_docs(spark)
    target = {"src0": 0.5, "src1": 0.25, "src2": 0.25}
    got = {r["source"]: r for r in
           mixture_stats(docs, target, seed=7).collect()}
    assert set(got) == {"src0", "src1", "src2"}
    assert got["src0"]["n_kept"] == 100  # rate 1.0 keeps everything
    total = sum(r["n_kept"] for r in got.values())
    for s, p in target.items():
        assert got[s]["achieved_p"] == pytest.approx(
            round(got[s]["n_kept"] / total, 6))
        # the hash split tracks the target within sampling noise
        assert abs(got[s]["n_kept"] / total - p) < 0.08


# ---------------------------------------------------------------------------
# X128 — LM perplexity quality (lm_quality / unigram_lm / lm_cross_entropy)


def _py_lm_quality(docs, ref_mod=10, alpha=1.0):
    """Independent python replay: add-alpha unigram LM on the reference
    slice, per-doc cross entropy folded IN TERM ORDER (the operator's
    documented summation order), discrete tertile buckets."""
    import math

    tf = {}
    for did, text in docs:
        toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
        if toks:
            d = tf.setdefault(did, {})
            for t in toks:
                d[t] = d.get(t, 0) + 1
    counts = {}
    for did, terms in tf.items():
        if did % ref_mod == 0:
            for t, c in terms.items():
                counts[t] = counts.get(t, 0) + c
    tot, v = sum(counts.values()), len(counts)
    denom = tot + alpha * (v + 1)
    oov = math.log2(alpha / denom)
    scored = {}
    for did, terms in tf.items():
        n = sum(terms.values())
        acc = 0.0
        for t in sorted(terms):  # the pinned fold order
            lp = (math.log2((counts[t] + alpha) / denom)
                  if t in counts else oov)
            acc += terms[t] * lp
        scored[did] = (n, round(-acc / n, 6))
    hs = sorted((h, did) for did, (_, h) in scored.items())
    n_docs = len(hs)
    t1 = hs[-(-n_docs // 3) - 1][0]
    t2 = hs[-(-(2 * n_docs) // 3) - 1][0]
    return {
        did: (n, h, "head" if h <= t1 else "middle" if h <= t2 else "tail")
        for did, (n, h) in scored.items()
    }


LM_DOCS = [
    (0, "the cat sat on the mat"),        # reference slice (0 % 10 == 0)
    (10, "the dog sat on the log"),       # reference slice
    (1, "the cat sat"),                   # all in-vocab
    (2, "zebra quokka axolotl"),          # all OOV -> worst entropy
    (3, "the the the the"),               # most reference-like
    (4, "cat dog unknownword"),           # mixed OOV
    (5, "on the mat sat a cat"),          # 'a' is OOV
]


def test_lm_quality_matches_python_oracle(spark):
    from mahout_spark.operators.curation import lm_quality

    docs = spark.createDataFrame(LM_DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["cross_entropy"], r["bucket"])
        for r in lm_quality(docs).collect()
    }
    want = _py_lm_quality(LM_DOCS)
    assert set(got) == set(want)
    for did in want:
        n_g, h_g, b_g = got[did]
        n_w, h_w, b_w = want[did]
        assert n_g == n_w
        assert h_g == pytest.approx(h_w, abs=2e-6)
        assert b_g == b_w, f"doc {did}: {got[did]} != {want[did]}"
    # the all-OOV doc pays the flat unseen mass -> strictly worst score
    assert got[2][1] == max(h for _, h, _ in got.values())
    assert got[2][2] == "tail"


def test_lm_quality_approx_thresholds_same_plan_shape(spark):
    """The scale path (approx_percentile) must produce the same schema
    and a valid 3-way partition without any driver-side TakeOrdered."""
    from mahout_spark.operators.curation import lm_quality

    docs = spark.createDataFrame(LM_DOCS, "doc_id long, text string")
    out = lm_quality(docs, exact_thresholds=False)
    rows = out.collect()
    assert {r["bucket"] for r in rows} <= {"head", "middle", "tail"}
    assert len(rows) == len(LM_DOCS)
    assert out.columns == ["doc_id", "n_tokens", "cross_entropy", "bucket"]


def test_lm_cross_entropy_window_is_doc_partitioned(spark):
    """The ordered fold must never be a global (partition-less) window."""
    from mahout_spark.operators.curation import lm_cross_entropy, unigram_lm

    docs = spark.createDataFrame(LM_DOCS, "doc_id long, text string")
    lm, oov = unigram_lm(docs)
    plan = capture_plan(lm_cross_entropy(docs, lm, oov))
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line:
            assert "doc_id" in line, f"global window in plan: {line}"


def test_unigram_lm_is_a_distribution(spark):
    """Sum of in-vocab probabilities + the OOV bucket must be 1."""
    from mahout_spark.operators.curation import unigram_lm

    docs = spark.createDataFrame(LM_DOCS, "doc_id long, text string")
    lm, oov = unigram_lm(docs)
    p_in = sum(2 ** r["logp"] for r in lm.collect())
    p_oov = 2 ** oov.collect()[0]["_oov_logp"]
    assert p_in + p_oov == pytest.approx(1.0, abs=1e-12)


# ---------------------------------------------------------------------------
# X129 — C4 heuristic cleaning (c4_filters / c4_stats)
# ---------------------------------------------------------------------------

C4_DOCS = [
    # kept: 5 good sentences (>=3 words, terminal punct)
    (1, "the first line is fine.\nhere is another good one!\n"
        "is this a question?\nthe narrator said \"quoted line.\"\n"
        "one more sentence here."),
    # line rules bite: short line, no-punct line, javascript line;
    # the two surviving sentences < min_sentences -> too_few_sentences
    (2, "too short.\nthis line has no terminal punctuation\n"
        "enable JavaScript to view this page.\n"
        "this one is perfectly fine.\nand so is this final one."),
    # lorem ipsum -> banned_phrase even though lines are fine
    (3, "lorem ipsum dolor sit amet.\nthe rest is a fine sentence.\n"
        "and another fine sentence here.\nplus a fourth good one.\n"
        "and the fifth closes it."),
    # brace -> brace
    (4, "function body { return 1; }\nthe rest is a fine sentence.\n"
        "and another fine sentence here.\nplus a fourth good one.\n"
        "and a fifth one closes it."),
    # precedence: banned word wins over brace and phrase
    (5, "badword lorem ipsum { all three.\nthe rest is a fine one.\n"
        "and another fine sentence here.\nplus a fourth good one.\n"
        "and a fifth one closes it."),
    # empty text excluded entirely
    (6, ""),
    # blank lines don't count as input lines
    (7, "a fine first sentence.\n\n  \nanother fine sentence here.\n"
        "a third good sentence.\nthe fourth one lands.\n"
        "the fifth one closes."),
]


def _py_c4(docs, min_words=3, min_sent=5, line_drop=("javascript",),
           banned=("badword",), phrases=("lorem ipsum",)):
    out = {}
    for doc_id, text in docs:
        if text is None or text == "":
            continue
        lines = text.split("\n")
        kept = []
        for ln in lines:
            words = [w for w in re.split(r"\s+", ln.strip()) if w]
            ok = (len(words) >= min_words
                  and bool(re.search(r'[.!?"]$', ln.strip()))
                  and not any(w in ln.lower() for w in line_drop))
            if ok:
                kept.append(ln)
        clean = "\n".join(kept)
        n_sent = len(re.findall(r"[.!?]", clean))
        low = text.lower()
        if any(w in low for w in banned):
            reason = "banned_word"
        elif any(p in low for p in phrases):
            reason = "banned_phrase"
        elif "{" in text:
            reason = "brace"
        elif n_sent < min_sent:
            reason = "too_few_sentences"
        else:
            reason = None
        out[doc_id] = (reason is None, reason,
                       sum(1 for ln in lines if ln.strip() != ""),
                       len(kept), n_sent, clean)
    return out


def test_c4_filters_matches_python_oracle(spark):
    from mahout_spark.operators.curation import c4_filters

    docs = spark.createDataFrame(C4_DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["kept"], r["drop_reason"], r["n_lines"],
                      r["n_lines_kept"], r["n_sentences"],
                      r["clean_text"])
        for r in c4_filters(docs, banned_words=("badword",)).collect()
    }
    want = _py_c4(C4_DOCS)
    assert got == want
    # the crafted corpus exercises every reason + keep
    reasons = {v[1] for v in want.values()}
    assert reasons == {None, "banned_phrase", "brace", "banned_word",
                       "too_few_sentences"}
    assert want[1][0] and want[7][0]          # kept docs
    assert want[7][2] == 5                    # blank lines not counted
    assert 6 not in want                      # empty text excluded


def test_c4_filters_plan_is_zero_exchange(spark):
    from mahout_spark.operators.curation import c4_filters

    docs = spark.createDataFrame(C4_DOCS, "doc_id long, text string")
    plan = capture_plan(c4_filters(docs, banned_words=("badword",)))
    assert "Exchange" not in plan


def test_c4_stats_equals_recount(spark):
    from mahout_spark.operators.curation import c4_filters, c4_stats

    docs = spark.createDataFrame(C4_DOCS, "doc_id long, text string")
    res = c4_filters(docs, banned_words=("badword",))
    row = c4_stats(res).collect()[0]
    rows = res.collect()
    assert row["docs_in"] == len(rows)
    assert row["docs_kept"] == sum(1 for r in rows if r["kept"])
    for reason in ("banned_word", "banned_phrase", "brace",
                   "too_few_sentences"):
        assert row[f"docs_{reason}"] == sum(
            1 for r in rows if r["drop_reason"] == reason)
    assert row["lines_in"] == sum(r["n_lines"] for r in rows)
    assert row["lines_kept"] == sum(r["n_lines_kept"] for r in rows)


def test_c4_filters_rejects(spark):
    from mahout_spark.operators.curation import c4_filters

    docs = spark.createDataFrame(C4_DOCS, "doc_id long, text string")
    with pytest.raises(ValueError):
        c4_filters(docs, min_words_per_line=0)
    with pytest.raises(ValueError):
        c4_filters(docs, min_sentences=-1)


# ---------------------------------------------------------------------------
# X130 — Gopher quality gate (gopher_filters / gopher_stats)
# ---------------------------------------------------------------------------

KEPT_TEXT = (
    "the quick brown fox jumped over that lazy sleeping dog while "
    "seven other animals watched from behind tall green hedges and "
    "wondered whether anyone would ever bother counting them with "
    "care because every single word here appears once except some "
    "function words that glue ordinary sentences together nicely"
)

GOPHER_DOCS = [
    (1, KEPT_TEXT),                                        # kept
    (2, "short text here."),                               # too_few_words
    (3, "#" * 30 + " " + "the of and when words here are with fine "
        "tokens appearing over and over again in this line " * 2),  # symbol
    (4, "\n".join(["- the bullet line of text number %d with words" % i
                   for i in range(6)])),                   # bullet_lines
    (5, "the first line has plenty of ordinary words in it today...\n"
        "the second line also has plenty of ordinary words here\n"
        "a third line with plenty of ordinary words trails off...\n"
        "the fourth line has plenty of ordinary words in it too"),   # ellipsis
    (6, "1234 5678 9012 3456 7890 1234 5678 9012 3456 7890 "
        "1234 5678 9012 3456 7890 the of and with words"),  # alpha_words
    (7, "zebra yonder xylem wombat velvet umbral tundra sonar "
        "quartz pillar nimbus meadow lumber kernel jigsaw indigo "
        "hollow garnet fathom ember dusky cobalt barley almond"),    # stop_words
    (8, "\n".join(["the same line of text and that with have been"] * 12)),
]


def test_gopher_each_rule_fires(spark):
    from mahout_spark.operators.curation import gopher_filters

    docs = spark.createDataFrame(GOPHER_DOCS, "doc_id long, text string")
    out = {r["doc_id"]: r for r in gopher_filters(
        docs, min_words=20, min_stop_hits=2).collect()}
    assert out[1]["kept"] and out[1]["drop_reason"] is None
    expected = {2: "too_few_words", 3: "symbol_ratio", 4: "bullet_lines",
                5: "ellipsis_lines", 6: "alpha_words", 7: "stop_words",
                8: "dup_lines"}
    for doc_id, reason in expected.items():
        assert out[doc_id]["drop_reason"] == reason, (doc_id, out[doc_id])
        assert not out[doc_id]["kept"]


def test_gopher_metrics_hand_computed(spark):
    from mahout_spark.operators.curation import gopher_filters

    text = ("- the cat... sat\n"      # bullet AND ellipsis-free end? no:
            "plain line of words\n"   # words: see mirror below
            "* next item ends here...")
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = gopher_filters(docs, include_repetition=False,
                       min_words=1, min_stop_hits=1).first()
    words = [w for w in __import__("re").split(r"\s+", text) if w]
    assert r["n_words"] == len(words) == 13
    assert r["mean_word_len"] == round(
        sum(len(w) for w in words) / len(words), 6)
    # '#'-free text, two non-overlapping '...' occurrences
    assert r["symbol_ratio"] == round(2 / 13, 6)
    assert r["bullet_frac"] == round(2 / 3, 6)    # '-' and '*' lines
    assert r["ellipsis_frac"] == round(1 / 3, 6)  # only the last line ENDS ...
    n_alpha = sum(1 for w in words
                  if __import__("re").search("[A-Za-z]", w))
    assert r["alpha_frac"] == round(n_alpha / 13, 6) == round(11 / 13, 6)
    assert r["stop_hits"] == 2                    # 'the', 'of'


def test_gopher_precedence_and_norepetition_schema(spark):
    from mahout_spark.operators.curation import gopher_filters

    # violates BOTH word floor and symbol cap -> the earlier rule wins
    docs = spark.createDataFrame(
        [(1, "# # tiny.")], "doc_id long, text string")
    r = gopher_filters(docs, min_words=20).first()
    assert r["drop_reason"] == "too_few_words"

    # repetition-skipping variant: heavy dup lines, but kept
    rep = spark.createDataFrame(
        [(2, "\n".join(["the same line of text and that with have been"] * 12))],
        "doc_id long, text string")
    out = gopher_filters(rep, min_words=20, include_repetition=False)
    assert "dup_line_frac" not in out.columns
    row = out.first()
    assert row["kept"] and row["drop_reason"] is None


def test_gopher_stats_funnel(spark):
    from mahout_spark.operators.curation import gopher_filters, gopher_stats

    docs = spark.createDataFrame(GOPHER_DOCS, "doc_id long, text string")
    filtered = gopher_filters(docs, min_words=20, min_stop_hits=2)
    s = gopher_stats(filtered).first()
    assert s["docs_in"] == 8 and s["docs_kept"] == 1
    by_reason = {r["drop_reason"]: r["n"] for r in
                 filtered.groupBy("drop_reason")
                 .agg(F.count(F.lit(1)).alias("n")).collect()}
    for reason in ("too_few_words", "symbol_ratio", "bullet_lines",
                   "ellipsis_lines", "alpha_words", "stop_words",
                   "dup_lines"):
        assert s[f"docs_{reason}"] == by_reason.get(reason, 0) == 1
    assert s["docs_too_many_words"] == 0


def test_gopher_rejects(spark):
    from mahout_spark.operators.curation import gopher_filters

    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="word bounds"):
        gopher_filters(docs, min_words=50, max_words=10)
    with pytest.raises(ValueError, match="min_stop_hits"):
        gopher_filters(docs, min_stop_hits=-1)
    with pytest.raises(ValueError, match="exceeds the stop list"):
        gopher_filters(docs, stop_words=("the",), min_stop_hits=2)


# ---------------------------------------------------------------------------
# End-to-end curation funnel (X131)
# ---------------------------------------------------------------------------

GOOD = "the cat sat on the mat and it was happy there for a while"
JUNK = "@@@@ !!!! ####"
LEAKY = "the dog ran to the park and it was very happy today indeed"
CUR_DOCS = [
    (1, GOOD),      # kept
    (2, GOOD),      # exact duplicate of 1
    (3, JUNK),      # quality drop (alpha ~0.14, no tokens)
    (4, JUNK),      # duplicate of a quality-dropped doc -> ALSO quality
    (5, ""),        # empty
    (6, None),      # empty
    (7, LEAKY),     # contaminated (shares "the dog ran" with eval)
    (8, LEAKY),     # duplicate of 7 -> exact_dup, NOT contaminated
]
CUR_EVAL = [(100, "the dog ran fast and far")]


def _cur(spark, eval_docs=True):
    from mahout_spark.operators.curation import curate_pipeline

    docs = spark.createDataFrame(CUR_DOCS, "doc_id long, text string")
    ev = (spark.createDataFrame(CUR_EVAL, "doc_id long, text string")
          if eval_docs else None)
    return curate_pipeline(docs, ev, min_quality=0.5, decon_n=3)


def test_curate_pipeline_stages_hand_computed(spark):
    rows = {r["doc_id"]: r for r in _cur(spark).collect()}
    assert len(rows) == 8
    assert rows[1]["kept"] and rows[1]["stage"] is None
    assert rows[1]["canonical_id"] is None and rows[1]["n_shared"] is None
    # exact duplicate: canonical = min id, reported
    assert rows[2]["stage"] == "exact_dup" and rows[2]["canonical_id"] == 1
    # quality drops carry the rounded score that decided them
    for i in (3, 4):
        assert rows[i]["stage"] == "quality"
        assert rows[i]["quality"] < 0.5
        # SEQUENTIAL semantics: 4 duplicates 3, but 3 never entered the
        # dedup stage -> 4 is a quality drop, not an exact_dup
        assert rows[i]["canonical_id"] is None
    for i in (5, 6):
        assert rows[i]["stage"] == "empty" and rows[i]["quality"] is None
    # contamination decided AFTER dedup: the canonical is flagged with
    # the shared-gram count, its duplicate is an exact_dup
    assert rows[7]["stage"] == "contaminated" and rows[7]["n_shared"] == 1
    assert rows[8]["stage"] == "exact_dup" and rows[8]["canonical_id"] == 7
    assert rows[8]["n_shared"] is None
    assert all(not rows[i]["kept"] for i in (2, 3, 4, 5, 6, 7, 8))


def test_curate_pipeline_without_eval_keeps_leaky_doc(spark):
    rows = {r["doc_id"]: r for r in _cur(spark, eval_docs=False).collect()}
    assert rows[7]["kept"] and rows[7]["stage"] is None
    assert rows[2]["stage"] == "exact_dup"  # other stages unchanged


def test_curate_stats_funnel(spark):
    from mahout_spark.operators.curation import curate_stats

    s = curate_stats(_cur(spark)).collect()[0].asDict()
    assert s == {
        "docs_in": 8, "docs_kept": 1, "docs_empty": 2,
        "docs_quality": 2, "docs_exact_dup": 2, "docs_contaminated": 1,
    }


# ---------------------------------------------------------------------------
# Per-domain caps (X136)
# ---------------------------------------------------------------------------

def _cap_docs(spark):
    rows = [(i, f"s{i % 4}", f"text {i}") for i in range(80)]
    return spark.createDataFrame(
        rows, "doc_id long, source string, text string")


def test_domain_cap_respects_cap_and_is_deterministic(spark):
    from mahout_spark.operators.curation import domain_cap

    docs = _cap_docs(spark)
    kept = domain_cap(docs, max_per_domain=5)
    per = {r["source"]: r["cnt"] for r in
           kept.groupBy("source").agg(F.count("*").alias("cnt")).collect()}
    assert per == {f"s{i}": 5 for i in range(4)}
    # bit-identical re-run (no RNG state)
    ids1 = sorted(r["doc_id"] for r in kept.collect())
    ids2 = sorted(r["doc_id"] for r in
                  domain_cap(docs, max_per_domain=5).collect())
    assert ids1 == ids2
    # a different seed selects a different (still capped) subset
    ids3 = sorted(r["doc_id"] for r in
                  domain_cap(docs, max_per_domain=5, seed=7).collect())
    assert len(ids3) == 20 and ids3 != ids1


def test_domain_cap_two_phase_equals_single_window(spark):
    """The salted two-phase selection must equal the naive one-window
    rank for EVERY n_salts (the subset-inclusion argument, exercised)."""
    from mahout_spark.operators.curation import domain_cap, pack_key_expr
    from pyspark.sql import Window

    docs = _cap_docs(spark)
    w = Window.partitionBy("source").orderBy(pack_key_expr("doc_id", 42))
    naive = sorted(
        r["doc_id"] for r in docs.withColumn(
            "_r", F.row_number().over(w))
        .filter(F.col("_r") <= 7).collect()
    )
    for n_salts in (1, 3, 32):
        got = sorted(r["doc_id"] for r in domain_cap(
            docs, max_per_domain=7, n_salts=n_salts).collect())
        assert got == naive, n_salts


def test_domain_cap_small_domains_untouched(spark):
    from mahout_spark.operators.curation import domain_cap

    docs = _cap_docs(spark)
    kept = domain_cap(docs, max_per_domain=100)
    assert kept.count() == 80  # cap above domain size keeps everything


def test_domain_cap_stats_and_rejects(spark):
    from mahout_spark.operators.curation import (
        domain_cap, domain_cap_stats)

    docs = _cap_docs(spark)
    s = {r["source"]: r for r in
         domain_cap_stats(docs, max_per_domain=5).collect()}
    for src, r in s.items():
        assert (r["n_docs"], r["n_kept"], r["kept_frac"]) == (20, 5, 0.25)
    with pytest.raises(ValueError, match="max_per_domain"):
        domain_cap(docs, max_per_domain=0)
    with pytest.raises(ValueError, match="n_salts"):
        domain_cap(docs, max_per_domain=1, n_salts=0)


# ---------------------------------------------------------------------------
# Token-budget selection (X137)
# ---------------------------------------------------------------------------

def test_token_budget_prefix_semantics(spark):
    from mahout_spark.operators.curation import token_budget_select
    from mahout_spark.operators.textstats import quality_scores

    rows = [(i, " ".join(f"w{i}x{j}" for j in range(10 + i))
             + (" the and of is" * i)) for i in range(1, 9)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # python oracle: rank by the operator's own (rounded) quality
    q = {r["doc_id"]: (r["quality"], r["n_tokens"])
         for r in quality_scores(docs).collect()}
    order = sorted(q, key=lambda d: (-q[d][0], d))
    budget = sum(q[d][1] for d in order) // 2
    cum, want = 0, {}
    for d in order:
        cum += q[d][1]
        want[d] = (cum, cum <= budget)
    got = {r["doc_id"]: (r["cum_tokens"], r["selected"])
           for r in token_budget_select(docs, budget).collect()}
    assert got == want
    # selection is a prefix: no selected doc ranks below an unselected
    sel = [want[d][1] for d in order]
    assert sel == sorted(sel, reverse=True)


def test_token_budget_edges(spark):
    from mahout_spark.operators.curation import token_budget_select

    docs = spark.createDataFrame(
        [(1, "the cat and the dog"), (2, ""), (3, None)],
        "doc_id long, text string")
    out = token_budget_select(docs, 0).collect()
    assert [r["doc_id"] for r in out] == [1]  # empty/NULL docs excluded
    assert not out[0]["selected"]  # zero budget selects nothing
    full = token_budget_select(docs, 10**9).collect()
    assert full[0]["selected"]
    with pytest.raises(ValueError, match="budget_tokens"):
        token_budget_select(docs, -1)


def test_token_budget_bucketing_matches_single_window(spark):
    """The two-phase bucketed prefix sum must equal one global ordered
    window for any bucket count."""
    from mahout_spark.operators.curation import token_budget_select

    rows = [(i, "alpha beta " * (i % 7 + 1) + "the of and is to " * (i % 3))
            for i in range(1, 60)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    want = {r["doc_id"]: r["cum_tokens"] for r in
            token_budget_select(docs, 100, n_buckets=1).collect()}
    for nb in (4, 256):
        got = {r["doc_id"]: r["cum_tokens"] for r in
               token_budget_select(docs, 100, n_buckets=nb).collect()}
        assert got == want, nb


# ---------------------------------------------------------------------------
# Weighted sampling without replacement (X149)
# ---------------------------------------------------------------------------

def test_weighted_sample_matches_python_es(spark):
    import math

    from mahout_spark.operators.curation import (
        PACK_MOD, pack_multiplier, weighted_sample)

    rows = [(i, float((i % 7) + 1)) for i in range(1, 201)]
    docs = spark.createDataFrame(rows, "doc_id long, w double")
    got = [(r["doc_id"], r["weight"], r["key"]) for r in
           weighted_sample(docs, k=20, weight_col="w").collect()]
    mult = pack_multiplier(42)
    keyed = []
    for i, w in rows:
        u = ((i * mult) % PACK_MOD + 1) / (PACK_MOD + 1)
        keyed.append((round(math.log(u) / w, 6), i, w))
    keyed.sort(key=lambda e: (-e[0], e[1]))
    want = [(i, w, k) for k, i, w in keyed[:20]]
    assert got == want
    # heavier rows are overrepresented: the E-S property, coarse check
    heavy = sum(1 for _, w, _ in got if w >= 6.0)
    light = sum(1 for _, w, _ in got if w <= 2.0)
    assert heavy > light


def test_weighted_sample_excludes_bad_weights_and_rejects(spark):
    from mahout_spark.operators.curation import weighted_sample

    docs = spark.createDataFrame(
        [(1, 2.0), (2, 0.0), (3, -1.0), (4, None)],
        "doc_id long, w double")
    out = weighted_sample(docs, k=10, weight_col="w").collect()
    assert [r["doc_id"] for r in out] == [1]
    with pytest.raises(ValueError, match="k must"):
        weighted_sample(docs, k=0, weight_col="w")
