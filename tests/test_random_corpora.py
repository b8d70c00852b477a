"""Property-style randomized equivalence (SURVEY.md §5.2): on seeded
random corpora with planted skew (Zipf vocab, duplicated docs, empty docs),
the indexed block-max path must answer every random query rank- and
score-identically to the pure-Python oracle and the full-scan scorer."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from tests.oracle import OracleIndex

VOCAB = (
    [f"w{i}" for i in range(40)]
    + ["spark"] * 0  # names only; skew comes from Zipf sampling below
)


def _random_corpus(seed: int, n_docs: int):
    rng = random.Random(seed)
    docs = {}
    for d in range(n_docs):
        if rng.random() < 0.05:
            docs[d] = ""  # empty docs must not break stats
            continue
        length = rng.randint(3, 60)
        # Zipf-ish: low word ids much likelier -> hot terms exist
        words = [
            VOCAB[min(int(rng.expovariate(0.12)), len(VOCAB) - 1)]
            for _ in range(length)
        ]
        docs[d] = " ".join(words)
    # planted exact duplicates
    docs[n_docs] = docs[0]
    docs[n_docs + 1] = docs[0]
    return docs


@pytest.mark.parametrize("seed", [11, 29, 83])
def test_indexed_equals_oracle_on_random_corpus(
    spark, tmp_path_factory, seed
):
    from mahout_spark.index.build import build_index
    from mahout_spark.index.wand import topk

    docs = _random_corpus(seed, 120)
    oracle = OracleIndex(docs, mode="text")
    sdf = spark.createDataFrame(
        [(k, v) for k, v in docs.items()], ["doc_id", "content"]
    )
    out = str(tmp_path_factory.mktemp(f"rand{seed}"))
    cat = build_index(
        spark, sdf, out, content_col="content", mode="text",
        n_buckets=4, docs_per_shard=32, block_size=8, resume=False,
    )

    rng = random.Random(seed * 7)
    for _ in range(8):
        n_terms = rng.randint(1, 4)
        terms = [
            oracle.df and rng.choice(list(oracle.df)) or "w0"
            for _ in range(n_terms)
        ]
        mode_all = rng.random() < 0.4
        k = rng.choice([3, 10, 25])
        exp = oracle.search(terms, k=k, mode_all=mode_all)
        got = [
            (r["doc_id"], r["score"])
            for r in topk(spark, cat, terms, k=k, mode_all=mode_all).collect()
        ]
        assert [d for d, _ in got] == [d for d, _ in exp], (terms, mode_all)
        for (_, s1), (_, s2) in zip(got, exp):
            assert s1 == pytest.approx(s2, rel=1e-9)


def _py_jaccard_pairs(docs: dict, k: int, threshold: float,
                      rare_df_max: int):
    """Pure-python oracle for jaccard_neardup_pairs, including the
    rare-shingle BLOCKING semantics (not just the similarity math)."""
    import re

    sh = {}
    for d, text in docs.items():
        toks = [w for w in re.split(r"[^a-z0-9]+", text.lower()) if w]
        sh[d] = {" ".join(toks[i:i + k])
                 for i in range(len(toks) - k + 1)}
    df = {}
    for s in sh.values():
        for g in s:
            df[g] = df.get(g, 0) + 1
    rare = {g for g, c in df.items() if c <= rare_df_max}
    out = {}
    ids = sorted(sh)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if not (sh[a] & sh[b] & rare):
                continue  # blocked: no shared rare shingle
            inter = len(sh[a] & sh[b])
            union = len(sh[a] | sh[b])
            if union == 0:
                continue
            j = round(inter / union, 6)
            if j >= threshold:
                out[(a, b)] = j
    return out


@pytest.mark.parametrize("seed", [5, 47])
def test_jaccard_neardup_matches_python_oracle(spark, seed):
    """Randomized corpora with planted near-duplicates: the engine's
    hashed-shingle candidate generation + exact verification must emit
    exactly the python oracle's pair set (same blocking rule, same
    rounded scores)."""
    from mahout_spark.operators.dedup import jaccard_neardup_pairs

    rng = random.Random(seed)
    docs = _random_corpus(seed, 60)
    # plant near-duplicates: copies with a few word edits
    base_ids = [d for d, t in docs.items() if len(t.split()) > 10]
    nxt = max(docs) + 1
    for src in base_ids[:6]:
        words = docs[src].split()
        for _ in range(rng.randint(1, 3)):
            words[rng.randrange(len(words))] = f"edit{rng.randint(0, 9)}"
        docs[nxt] = " ".join(words)
        nxt += 1
    exp = _py_jaccard_pairs(docs, k=3, threshold=0.4, rare_df_max=8)
    sdf = spark.createDataFrame(list(docs.items()), ["doc_id", "text"])
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in jaccard_neardup_pairs(
            sdf, k=3, threshold=0.4, rare_df_max=8
        ).collect()
    }
    assert got == pytest.approx(exp)


def test_skewed_hot_term_shards(spark, tmp_path_factory):
    """A term present in EVERY doc (the pathological hot term) must still
    produce docid-sorted, shard-split blocks and exact results."""
    from mahout_spark.index.build import build_index
    from mahout_spark.index.wand import topk

    docs = {i: f"hot filler{i % 7} hot hot" for i in range(300)}
    oracle = OracleIndex(docs, mode="text")
    sdf = spark.createDataFrame(list(docs.items()), ["doc_id", "content"])
    out = str(tmp_path_factory.mktemp("hot"))
    cat = build_index(
        spark, sdf, out, content_col="content", mode="text",
        n_buckets=4, docs_per_shard=64, block_size=16, resume=False,
    )
    post = cat.read(spark, "postings").filter(F.col("term") == "hot")
    # skew defused structurally: the hot term spans every shard
    assert post.select("shard").distinct().count() == 300 // 64 + 1
    exp = oracle.search(["hot", "filler3"], k=20)
    got = [
        (r["doc_id"], r["score"])
        for r in topk(spark, cat, ["hot", "filler3"], k=20).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in exp]


@pytest.mark.parametrize("seed", [13, 61])
def test_positional_ops_equal_oracle_on_random_corpus(
    spark, tmp_path_factory, seed
):
    """Random phrases (half sampled from real doc windows so matches
    exist, half random so misses exist) and random proximity windows must
    match the brute-force oracle rank- and score-identically on skewed
    random corpora with planted duplicates and empty docs."""
    from mahout_spark.index.build import build_index
    from mahout_spark.index.phrase import phrase_topk, proximity_topk

    docs = _random_corpus(seed, 100)
    oracle = OracleIndex(docs, mode="simple")
    sdf = spark.createDataFrame(
        [(k, v) for k, v in docs.items()], ["doc_id", "content"]
    )
    out = str(tmp_path_factory.mktemp(f"pos_rand{seed}"))
    cat = build_index(
        spark, sdf, out, content_col="content", mode="simple",
        n_buckets=4, docs_per_shard=32, block_size=8, resume=False,
        positions=True,
    )

    rng = random.Random(seed * 13)
    nonempty = [d for d in docs.values() if d]
    for i in range(6):
        if i % 2 == 0:  # sample a real contiguous window -> guaranteed hit
            toks = []
            while len(toks) < 2:
                toks = nonempty[rng.randrange(len(nonempty))].split()
            st = rng.randrange(len(toks) - 1)
            phrase = toks[st:st + rng.randint(2, 3)]
        else:
            phrase = [rng.choice(list(oracle.df)) for _ in range(rng.randint(1, 3))]
        exp = oracle.phrase_search(phrase, k=10)
        got = [(r["doc_id"], r["score"])
               for r in phrase_topk(spark, cat, phrase, k=10).collect()]
        assert [d for d, _ in got] == [d for d, _ in exp], phrase
        for (_, s1), (_, s2) in zip(got, exp):
            assert s1 == pytest.approx(s2, rel=1e-9)

        terms = sorted(set(phrase))
        w = rng.choice([1, 3, 9])
        exp = oracle.proximity_search(terms, w, k=10)
        got = [(r["doc_id"], r["score"])
               for r in proximity_topk(spark, cat, terms, w, k=10).collect()]
        assert [d for d, _ in got] == [d for d, _ in exp], (terms, w)
        for (_, s1), (_, s2) in zip(got, exp):
            assert s1 == pytest.approx(s2, rel=1e-9)


def _random_tree(rng, vocab, depth=0):
    """Random query trees over the FULL boolean surface: term/prefix/
    fuzzy/wildcard leaves, AND/OR/NOT/msm combinators, boost wrappers.
    Invalid shapes (boost-on-NOT, pure-negative) are filtered by the
    caller's validate() retry loop."""
    r = rng.random()
    if depth >= 2 or r < 0.45:
        leaf, t = rng.random(), rng.choice(vocab)
        if leaf < 0.10:
            pl = min(len(t), rng.randint(1, 2))
            node = ("prefix", t[:pl])
        elif leaf < 0.18:
            node = ("fuzzy", t, rng.randint(1, 2))
        elif leaf < 0.28 and len(t) >= 2:
            i = rng.randrange(len(t))
            wc = "?" if rng.random() < 0.5 else "*"
            node = ("wildcard", t[:i] + wc + t[i + 1:])
        else:
            node = ("term", t)
        if rng.random() < 0.15:
            node = ("boost", node, rng.choice([0.5, 2.0, 3.0]))
        return node
    kids = [_random_tree(rng, vocab, depth + 1)
            for _ in range(rng.randint(2, 3))]
    if r < 0.62:
        node = ("or", kids)
    elif r < 0.74:  # minimum_should_match over the disjunction
        node = ("msm", kids, rng.randint(1, len(kids)))
    else:
        if rng.random() < 0.5:  # AND with one negated branch
            kids = kids + [("not", _random_tree(rng, vocab, depth + 1))]
        node = ("and", kids)
    if rng.random() < 0.10:
        node = ("boost", node, rng.choice([0.5, 2.0]))
    return node


@pytest.mark.parametrize("seed", [7, 31])
def test_boolean_trees_equal_oracle_on_random_corpus(
    spark, tmp_path_factory, seed
):
    """Random boolean trees over the FULL query surface (nested
    AND/OR/NOT/msm, prefix/fuzzy/wildcard leaves, boost wrappers) must
    match the brute-force oracle — match set AND scores — on skewed
    random corpora."""
    from mahout_spark.index.boolquery import boolean_topk
    from mahout_spark.index.build import build_index
    from mahout_spark.index.queryparse import validate

    docs = _random_corpus(seed, 110)
    oracle = OracleIndex(docs, mode="simple")
    sdf = spark.createDataFrame(
        [(k, v) for k, v in docs.items()], ["doc_id", "content"]
    )
    out = str(tmp_path_factory.mktemp(f"bool_rand{seed}"))
    cat = build_index(
        spark, sdf, out, content_col="content", mode="simple",
        n_buckets=4, docs_per_shard=32, block_size=8, resume=False,
    )
    rng = random.Random(seed * 17)
    vocab = sorted(oracle.df)
    done = 0
    while done < 10:
        tree = _random_tree(rng, vocab)
        try:
            validate(tree)
        except Exception:
            continue
        done += 1
        exp = oracle.boolean_search(tree, k=15)
        got = [(r["doc_id"], r["score"])
               for r in boolean_topk(spark, cat, tree, k=15).collect()]
        assert [d for d, _ in got] == [d for d, _ in exp], tree
        for (_, s1), (_, s2) in zip(got, exp):
            assert s1 == pytest.approx(s2, rel=1e-9)
