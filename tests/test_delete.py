"""Document deletion (index/delete.py): Lucene-model tombstones.

Semantics under test, in order of subtlety:
* deleted docs vanish from every retrieval path immediately; surviving
  docs' scores DO NOT move (stats stay pre-delete until purge);
* WAND's θ seed must ignore tombstoned docs — a duplicate-heavy corpus
  where the entire seed block is deleted would otherwise over-prune;
* compact(purge_deleted=True) produces the index a fresh build over the
  surviving corpus would — block-for-block — and reopens the doc_id for
  append;
* Searcher caches invalidate on delete (meta_version epoch).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mahout_spark.index.build import build_index
from mahout_spark.index.delete import delete_docs, deleted_array
from mahout_spark.index.wand import topk, topk_batch


def _rows(df):
    return [
        (r["doc_id"], round(r["score"], 9))
        for r in df.collect()
    ]


@pytest.fixture(scope="module")
def corpus(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return docs.select("doc_id", F.col("text").alias("content"))


def _build(spark, corpus, tmp_path, **kw):
    kw.setdefault("mode", "simple")
    kw.setdefault("n_buckets", 4)
    kw.setdefault("docs_per_shard", 64)
    kw.setdefault("block_size", 16)
    return build_index(
        spark, corpus, str(tmp_path), content_col="content",
        id_cols=["doc_id"], resume=False, **kw,
    )


def test_delete_excludes_docs_scores_unchanged(spark, corpus, tmp_path):
    cat = _build(spark, corpus, tmp_path / "idx")
    terms = ["data", "merge"]
    base = _rows(topk(spark, cat, terms, k=30))
    base_and = _rows(topk(spark, cat, terms, k=30, mode_all=True))
    assert len(base) == 30
    dead = [base[0][0], base[2][0]]

    meta = delete_docs(spark, cat, dead)
    assert meta["deletes"] == 2
    got = _rows(topk(spark, cat, terms, k=28))
    # exactly the baseline minus the tombstoned docs, scores untouched
    assert got == [r for r in base if r[0] not in set(dead)][:28]

    # pruning stays exact under deletion, and AND agrees too
    nop = _rows(topk(spark, cat, terms, k=28, prune=False))
    assert got == nop
    got_and = _rows(topk(spark, cat, terms, k=28, mode_all=True))
    assert got_and == [r for r in base_and if r[0] not in set(dead)][:28]

    # idempotent: re-deleting changes nothing
    meta = delete_docs(spark, cat, dead)
    assert meta["deletes"] == 2
    arr = deleted_array(spark, cat)
    assert arr is not None and sorted(arr.tolist()) == sorted(dead)


def test_theta_seed_ignores_tombstones(spark, tmp_path):
    """Duplicate-heavy corpus: the seed block's docs all get deleted.
    A θ seeded from those (dead) lower bounds would over-prune the
    lower-scoring live docs; the kernel must still return them, and
    pruned ≡ unpruned exactly."""
    heavy = "signal " * 8  # high-tf docs that dominate every seed
    light = "signal noise filler words here"
    docs = [(i, heavy) for i in range(40)] + [
        (100 + i, light + " extra" * i) for i in range(6)
    ]
    sdf = spark.createDataFrame(docs, ["doc_id", "content"])
    cat = _build(spark, sdf, tmp_path / "dup", docs_per_shard=32,
                 block_size=8)
    delete_docs(spark, cat, [i for i in range(40)])

    got = _rows(topk(spark, cat, ["signal", "noise"], k=6))
    ref = _rows(topk(spark, cat, ["signal", "noise"], k=6, prune=False))
    assert got == ref
    assert {d for d, _ in got} == {100 + i for i in range(6)}


def test_positional_and_boolean_respect_deletes(spark, tmp_path):
    from mahout_spark.index.boolquery import boolean_topk, matching_docs
    from mahout_spark.index.phrase import phrase_topk, proximity_topk

    docs = [
        (1, "the table scan runs fast"),
        (2, "the table scan is slow today"),
        (3, "a scan of the table works"),
        (4, "data table scan data merge"),
    ]
    sdf = spark.createDataFrame(docs, ["doc_id", "content"])
    cat = _build(spark, sdf, tmp_path / "pos", positions=True)

    assert {r[0] for r in _rows(phrase_topk(spark, cat, ["table", "scan"]))} \
        == {1, 2, 4}
    assert {r["doc_id"] for r in
            matching_docs(spark, cat, "table AND scan").collect()} \
        == {1, 2, 3, 4}

    delete_docs(spark, cat, [2, 4])
    assert {r[0] for r in _rows(phrase_topk(spark, cat, ["table", "scan"]))} \
        == {1}
    assert {r[0] for r in
            _rows(proximity_topk(spark, cat, ["table", "scan"], 4))} \
        == {1, 3}
    assert {r[0] for r in _rows(boolean_topk(spark, cat, "table AND scan"))} \
        == {1, 3}
    assert {r["doc_id"] for r in
            matching_docs(spark, cat, "table AND scan").collect()} \
        == {1, 3}


def test_searcher_and_batch_respect_deletes(spark, corpus, tmp_path):
    from mahout_spark.index.searcher import Searcher

    cat = _build(spark, corpus, tmp_path / "srch")
    s = Searcher(spark, cat)
    terms = ["data", "merge"]
    warm = s.topk_rows(terms, k=10)  # warms term + postings caches
    dead = warm[0]["doc_id"]
    delete_docs(spark, cat, [dead])

    after = s.topk_rows(terms, k=9)
    assert [r["doc_id"] for r in after] == \
        [r["doc_id"] for r in warm[1:10]]
    assert [round(r["score"], 9) for r in after] == \
        [round(r["score"], 9) for r in warm[1:10]]

    batch = topk_batch(spark, cat, {"q0": terms}, k=9)
    assert [(r["doc_id"], round(r["score"], 9)) for r in batch.collect()] \
        == [(r["doc_id"], round(r["score"], 9)) for r in after]


def test_purge_compact_equals_fresh_rebuild(spark, corpus, tmp_path):
    from mahout_spark.index.append import append_to_index
    from mahout_spark.index.compact import compact_index

    cat = _build(spark, corpus, tmp_path / "full")
    dead_ids = [r["doc_id"] for r in
                corpus.filter(F.col("doc_id") % 5 == 0).collect()]
    delete_docs(spark, cat, dead_ids)
    meta = compact_index(spark, cat)
    assert meta["deletes"] == 0 and meta["appends"] == 0
    assert not cat.exists("tombstones")

    live = corpus.filter(F.col("doc_id") % 5 != 0)
    fresh = _build(spark, live, tmp_path / "fresh")
    fmeta = fresh.read_meta("postings")
    assert meta["n_docs"] == fmeta["n_docs"]
    assert meta["avgdl"] == pytest.approx(fmeta["avgdl"], rel=1e-12)

    cols = ["term", "shard", "block_id", "count", "first_docid",
            "block_max_docid", "doc_ids", "tfs", "doclens"]
    a = {tuple(r) for r in cat.read(spark, "postings")
         .select(*cols).collect()}
    b = {tuple(r) for r in fresh.read(spark, "postings")
         .select(*cols).collect()}
    assert a == b

    terms = ["data", "merge"]
    assert _rows(topk(spark, cat, terms, k=15)) == \
        _rows(topk(spark, fresh, terms, k=15))

    # the purged doc_id is re-addable; pre-purge it was rejected
    one = corpus.filter(F.col("doc_id") == dead_ids[0])
    append_to_index(spark, cat, one, content_col="content",
                    batch_id="readd")
    assert cat.read_meta("postings")["n_docs"] == fmeta["n_docs"] + 1


def test_purge_positional_index_preserves_phrase_results(spark, corpus,
                                                         tmp_path):
    """Purge must re-encode POSITIONS too: after delete+compact on a
    positional index, phrase and proximity retrieval equal a fresh
    positional build over the survivors."""
    from mahout_spark.index.compact import compact_index
    from mahout_spark.index.phrase import phrase_topk, proximity_topk

    cat = _build(spark, corpus, tmp_path / "pfull", positions=True)
    delete_docs(spark, cat,
                [r["doc_id"] for r in
                 corpus.filter(F.col("doc_id") % 4 == 0).collect()])
    meta = compact_index(spark, cat)
    assert bool(meta.get("positional"))

    live = corpus.filter(F.col("doc_id") % 4 != 0)
    fresh = _build(spark, live, tmp_path / "pfresh", positions=True)

    for phrase in (["table", "scan"], ["data", "merge"]):
        assert _rows(phrase_topk(spark, cat, phrase, k=15)) == \
            _rows(phrase_topk(spark, fresh, phrase, k=15))
    assert _rows(proximity_topk(spark, cat, ["table", "scan"], 4, k=15)) \
        == _rows(proximity_topk(spark, fresh, ["table", "scan"], 4, k=15))


def test_append_of_tombstoned_id_still_rejected(spark, tmp_path):
    from mahout_spark.index.append import append_to_index

    docs = [(1, "alpha beta"), (2, "beta gamma")]
    sdf = spark.createDataFrame(docs, ["doc_id", "content"])
    cat = _build(spark, sdf, tmp_path / "guard")
    delete_docs(spark, cat, [2])
    dup = spark.createDataFrame([(2, "new text")], ["doc_id", "content"])
    with pytest.raises(ValueError, match="already present"):
        append_to_index(spark, cat, dup, content_col="content",
                        batch_id="dup")


def test_live_mask_helper():
    from mahout_spark.index.delete import live_mask

    docs = np.array([1, 5, 9, 12], dtype=np.uint64)
    deleted = np.array([5, 12], dtype=np.uint64)
    assert live_mask(docs, deleted).tolist() == [True, False, True, False]
    assert live_mask(docs, None).all()
    assert live_mask(np.array([], dtype=np.uint64), deleted).tolist() == []


def test_relational_tombstone_regime_bit_identical(spark, corpus, tmp_path,
                                                   monkeypatch):
    """Round-3 VERDICT ask #2: above DELETED_MAX_COLLECT the tombstone
    set must stay distributed (cogrouped per-shard slices), and every
    retrieval path must return BIT-IDENTICAL rows to the array regime.
    Forcing the cap to 0 routes everything through the relational path;
    deleted_array is patched to explode so any residual corpus-shaped
    driver collect fails loudly."""
    from mahout_spark.index import delete as del_mod
    from mahout_spark.index.boolquery import (
        boolean_topk, explain_topk, matching_docs, score_matches,
    )
    from mahout_spark.index.phrase import phrase_topk, proximity_topk
    from mahout_spark.index.searcher import Searcher

    cat = _build(spark, corpus, tmp_path / "adapt", positions=True)
    terms = ["data", "merge"]
    dead = [r[0] for r in _rows(topk(spark, cat, terms, k=8))][:4]
    delete_docs(spark, cat, dead)

    def run_all():
        out = {
            "or": _rows(topk(spark, cat, terms, k=12)),
            "or_noprune": _rows(topk(spark, cat, terms, k=12, prune=False)),
            "and": _rows(topk(spark, cat, terms, k=12, mode_all=True)),
            "batch": sorted(
                (r["query_id"], r["doc_id"], round(r["score"], 9))
                for r in topk_batch(
                    spark, cat, {"a": terms, "b": ["table"]}, k=8
                ).collect()
            ),
            "bool": _rows(boolean_topk(spark, cat, "data AND merge")),
            "scores": sorted(_rows(score_matches(spark, cat, "data OR merge"))),
            "match": sorted(
                r["doc_id"]
                for r in matching_docs(spark, cat, "data OR merge").collect()
            ),
            "explain": [
                (r["doc_id"], r["term"], round(r["contrib"], 9))
                for r in explain_topk(spark, cat, "data OR merge", k=5)
                .collect()
            ],
            "phrase": _rows(phrase_topk(spark, cat, ["table", "scan"], k=8)),
            "prox": _rows(
                proximity_topk(spark, cat, ["data", "merge"], 8, k=8)
            ),
        }
        s = Searcher(spark, cat)
        out["searcher"] = [
            (r["doc_id"], round(r["score"], 9))
            for r in s.topk_rows(terms, k=12)
        ]
        return out

    array_regime = run_all()
    # every dead doc is really gone
    assert not (set(dead) & {d for d, _ in array_regime["or"]})

    monkeypatch.setattr(del_mod, "DELETED_MAX_COLLECT", 0)

    def _no_collect(*a, **kw):
        raise AssertionError(
            "relational regime must not collect tombstones to the driver"
        )

    monkeypatch.setattr(del_mod, "deleted_array", _no_collect)
    relational = run_all()
    assert relational == array_regime


def test_theta_seed_live_filter_in_relational_regime(spark, tmp_path,
                                                     monkeypatch):
    """The θ-seed live filter must hold when the mask arrives as a
    cogrouped shard slice: the dup-heavy corpus whose whole seed block is
    deleted still returns all live docs, pruned ≡ unpruned."""
    from mahout_spark.index import delete as del_mod

    heavy = "signal " * 8
    light = "signal noise filler words here"
    docs = [(i, heavy) for i in range(40)] + [
        (100 + i, light + " extra" * i) for i in range(6)
    ]
    sdf = spark.createDataFrame(docs, ["doc_id", "content"])
    cat = _build(spark, sdf, tmp_path / "dup_rel", docs_per_shard=32,
                 block_size=8)
    delete_docs(spark, cat, list(range(40)))

    monkeypatch.setattr(del_mod, "DELETED_MAX_COLLECT", 0)
    got = _rows(topk(spark, cat, ["signal", "noise"], k=6))
    ref = _rows(topk(spark, cat, ["signal", "noise"], k=6, prune=False))
    assert got == ref
    assert {d for d, _ in got} == {100 + i for i in range(6)}


def test_federated_respects_relational_regime(spark, corpus, tmp_path,
                                              monkeypatch):
    """Per-index tombstones honored in both regimes across a federated
    search (each index picks its own regime from its own meta)."""
    from mahout_spark.index import delete as del_mod
    from mahout_spark.index.federated import federated_topk

    rows = corpus.collect()
    half = len(rows) // 2
    a = spark.createDataFrame(rows[:half], corpus.schema)
    b = spark.createDataFrame(rows[half:], corpus.schema)
    cat_a = _build(spark, a, tmp_path / "fa")
    cat_b = _build(spark, b, tmp_path / "fb")
    terms = ["data", "merge"]
    base = federated_topk(spark, {"a": cat_a, "b": cat_b}, terms, k=10)
    dead = [r["doc_id"] for r in base.collect()][:3]
    delete_docs(spark, cat_a, dead)
    delete_docs(spark, cat_b, dead)

    def run():
        return [
            (r["index"], r["doc_id"], round(r["score"], 9))
            for r in federated_topk(
                spark, {"a": cat_a, "b": cat_b}, terms, k=10
            ).collect()
        ]

    arr = run()
    assert not ({d for _, d, _ in arr} & set(dead))
    monkeypatch.setattr(del_mod, "DELETED_MAX_COLLECT", 0)
    assert run() == arr


def test_delete_by_query_matches_manual_id_delete(spark, corpus, tmp_path):
    """X118: _delete_by_query ≡ delete_docs of the query's match set;
    results exclude every matcher, scores keep pre-delete stats."""
    import re

    from mahout_spark.index.delete import delete_by_query

    cat = _build(spark, corpus, tmp_path / "dbq")
    rows = corpus.collect()
    stream_ids = {
        r["doc_id"] for r in rows
        if "stream" in re.split(r"[^a-z0-9]+", (r["content"] or "").lower())
    }
    assert stream_ids  # the fixture must actually delete something
    before = _rows(topk(spark, cat, ["spark", "data"], k=10**6))
    meta = delete_by_query(spark, cat, "stream")
    assert int(meta["deletes"]) == len(stream_ids)
    after = _rows(topk(spark, cat, ["spark", "data"], k=10**6))
    assert after == [(d, s) for d, s in before if d not in stream_ids]
    # idempotent: re-running deletes nothing new
    meta2 = delete_by_query(spark, cat, "stream")
    assert int(meta2["deletes"]) == len(stream_ids)


def test_delete_by_query_boolean_shape(spark, corpus, tmp_path):
    import re

    from mahout_spark.index.delete import delete_by_query

    cat = _build(spark, corpus, tmp_path / "dbq2")
    rows = corpus.collect()
    toks = {r["doc_id"]: set(
        t for t in re.split(r"[^a-z0-9]+", (r["content"] or "").lower())
        if t) for r in rows}
    victims = {d for d, s in toks.items()
               if "table" in s and "scan" in s}
    meta = delete_by_query(spark, cat, "table AND scan")
    assert int(meta["deletes"]) == len(victims)
    live = {r["doc_id"]
            for r in topk(spark, cat, ["table"], k=10**6).collect()}
    assert live == {d for d, s in toks.items()
                    if "table" in s} - victims
