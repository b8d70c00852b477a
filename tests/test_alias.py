"""Aliases + rollover (X109, index/alias.py): atomic repoint cutover,
resolution, rollover condition, torn-file immunity, rejects."""

import json
import os

import pytest
from pyspark.sql import functions as F

from mahout_spark.index.alias import AliasRegistry, should_rollover
from mahout_spark.index.build import build_index
from mahout_spark.index.wand import topk


@pytest.fixture(scope="module")
def corpus(spark):
    return (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
    )


@pytest.fixture(scope="module")
def two_indexes(spark, corpus, tmp_path_factory):
    base = tmp_path_factory.mktemp("aliasidx")
    half = build_index(
        spark, corpus.filter(F.col("doc_id") % 2 == 0),
        str(base / "half"), content_col="text", id_cols=["doc_id"],
        mode="simple", n_buckets=2, docs_per_shard=64, block_size=16,
    )
    full = build_index(
        spark, corpus, str(base / "full"), content_col="text",
        id_cols=["doc_id"], mode="simple", n_buckets=2,
        docs_per_shard=64, block_size=16,
    )
    return half, full


def _ids(spark, cat):
    return [r["doc_id"]
            for r in topk(spark, cat, ["spark", "data"], k=10).collect()]


def test_swap_cuts_over_atomically(spark, two_indexes, tmp_path):
    half, full = two_indexes
    reg = AliasRegistry(str(tmp_path / "reg"))
    reg.set_alias("docs", half.root)
    before = _ids(spark, reg.resolve("docs"))
    assert all(d % 2 == 0 for d in before)      # the half index answers
    reg.set_alias("docs", full.root)            # the cutover
    after = _ids(spark, reg.resolve("docs"))
    assert after == _ids(spark, full)
    assert reg.list_aliases() == {"docs": os.path.abspath(full.root)}
    # no torn temp files survive the swap
    leftovers = [f for f in os.listdir(reg.root) if ".tmp-" in f]
    assert leftovers == []


def test_rollover_condition(spark, two_indexes):
    half, full = two_indexes
    n_half = int(half.read_meta("postings")["n_docs"])
    assert should_rollover(half, n_half)        # at the threshold
    assert not should_rollover(half, n_half + 1)
    assert should_rollover(full, n_half)
    with pytest.raises(ValueError, match="max_docs"):
        should_rollover(half, 0)


def test_registry_rejects_and_missing(spark, two_indexes, tmp_path):
    half, _ = two_indexes
    reg = AliasRegistry(str(tmp_path / "reg2"))
    with pytest.raises(ValueError, match="invalid"):
        reg.set_alias("a/b", half.root)
    with pytest.raises(ValueError, match="not a directory"):
        reg.set_alias("docs", str(tmp_path / "ghost"))
    with pytest.raises(KeyError, match="unknown"):
        reg.resolve("docs")
    reg.set_alias("docs", half.root)
    reg.delete_alias("docs")
    with pytest.raises(KeyError, match="unknown"):
        reg.delete_alias("docs")
    # a foreign torn file does not break loading (rename-aside never
    # leaves one, but an external crash might leave garbage NEXT to it)
    (tmp_path / "reg2" / "aliases.json.tmp-dead").write_text("{corrupt")
    assert reg.list_aliases() == {}
