"""Physical-plan assertions (PLANS.md): the optimizations the 100 TB
design depends on must actually appear in the compiled plans — predicate
pushdown to the scans, broadcast joins for dims, column pruning, and
partition-pruned index scans. Plan regressions (a lost filter, a join
degrading to sort-merge-with-shuffle) fail here before they cost anything."""

from __future__ import annotations

import pytest

from mahout_spark.plans.audit import capture_plan as _plan


SF = "/root/testdata/sf0.001"


class TestRelationalPlans:
    def test_q3_filters_pushed_and_broadcast(self, spark):
        import __spark_entry__ as e

        p = _plan(e.q_tpch_q3_topk(spark, SF))
        assert "GreaterThan(l_shipdate" in p
        assert "LessThan(o_orderdate" in p
        assert "EqualTo(c_mktsegment,BUILDING)" in p
        assert "BroadcastHashJoin" in p
        assert "SortMergeJoin" not in p
        assert "TakeOrderedAndProject" in p

    def test_revenue_join_broadcasts_dims(self, spark):
        import __spark_entry__ as e

        p = _plan(e.q_revenue_by_nation(spark, SF))
        assert p.count("BroadcastHashJoin") >= 2
        assert "SortMergeJoin" not in p

    def test_textstats_single_narrow_scan(self, spark):
        import __spark_entry__ as e

        p = _plan(e.q_quality_scores(spark, SF))
        import re

        # no KEYED shuffle; the only allowed exchange is the round-robin
        # few-split-input spread (a no-op on real multi-split corpora)
        assert not re.search(r"(?i)(hash|range)partitioning\(", p)
        # formatted explain prints each scan in the tree AND the details
        assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1
        # staged-projection barrier held: the tokenizer expression was
        # NOT inlined into per-element lambdas (split appears once)
        assert p.count("split(lower(") == 1

    def test_column_pruning_on_tf_scan(self, spark):
        import __spark_entry__ as e

        p = _plan(e.q_wordcount(spark, SF))
        # documents has (doc_id, text, lang, source, n_chars); the token
        # pipeline needs only doc_id+text
        assert "ReadSchema" in p
        import re

        schemas = re.findall(r"ReadSchema: struct<([^>]*)>", p)
        assert schemas and all(
            "lang" not in s and "source" not in s for s in schemas
        )


class TestPipelinePlans:
    def test_stratified_sample_prunes_columns(self, spark):
        import __spark_entry__ as e

        from mahout_spark.plans.audit import assert_plan

        assert_plan(
            e.q_stratified_sample(spark, SF),
            no_exchange=True,  # narrow scan+filter+project, zero shuffles
            absent_columns=["lang", "source", "n_chars"],
        )

    def test_jaccard_verification_broadcasts_small_sides(self, spark):
        """The verification join tree must broadcast the candidate pairs
        and both per-doc size tables — only the shingle intersection
        groupBy may shuffle. (Shingle/candidate tables are checkpointed
        LogicalRDDs, so the plan here IS the executed shape.)"""
        from mahout_spark.operators.dedup import jaccard_neardup_pairs

        # the OPERATOR's plan (the driver wrapper now returns a localized
        # result frame whose plan is just a LocalTableScan)
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        p = _plan(jaccard_neardup_pairs(docs, k=3, threshold=0.5,
                                        rare_df_max=10))
        assert p.count("BroadcastHashJoin") >= 3
        assert "SortMergeJoin" not in p


class TestIndexPlans:
    @pytest.fixture(scope="class")
    def built(self, spark, tmp_path_factory):
        from mahout_spark.index.build import build_index

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        return build_index(
            spark, docs, str(tmp_path_factory.mktemp("planidx")),
            content_col="text", mode="text", n_buckets=8, resume=False,
        )

    def test_postings_scan_partition_pruned(self, spark, built):
        from pyspark.sql import functions as F

        from mahout_spark.index.wand import topk

        p = _plan(topk(spark, built, ["spark", "data"], k=10))
        # driver-side pruning: the scan's file index lists only the query
        # terms' bucket dirs, and the residual term filter is pushed down
        assert "In(term, [data,spark])" in p
        n_buckets_seen = p.count("bucket=")
        qbuckets = (
            spark.createDataFrame([("spark",), ("data",)], "term string")
            .select(F.pmod(F.xxhash64("term"), F.lit(8)).alias("b"))
            .distinct()
            .count()
        )
        assert 1 <= n_buckets_seen <= qbuckets + 1  # "... N entries" elision
        assert "TakeOrderedAndProject" in p

    def test_prefix_expansion_scan_is_pushed_and_pruned(self, spark, built):
        """X42's lexicon expansion: the startswith predicate must reach
        the parquet scan (StringStartsWith prunes row groups via min/max
        term stats — dense_ids range-partitions the lexicon by term, so
        each bucket dir's files carry tight term ranges), and the scan
        must project only the three expansion columns, compiling to
        TakeOrderedAndProject (no shuffle)."""
        from pyspark.sql import functions as F

        lex = built.read(spark, "lexicon")
        q = (
            lex.filter(F.col("term").startswith("sp"))
            .select("term", "bucket", "df")
            .orderBy(F.col("df").desc(), F.col("term").asc())
            .limit(64)
        )
        p = _plan(q)
        assert "StringStartsWith(term,sp)" in p
        assert "TakeOrderedAndProject" in p
        # column pruning: the lexicon's other columns stay out of the scan
        read = p.split("ReadSchema")[1][:200]
        assert "term" in read and "cf" not in read and "term_id" not in read

    def test_postings_scan_skips_payload_until_needed(self, spark, built):
        from mahout_spark.index.wand import topk

        p = _plan(topk(spark, built, ["spark"], k=10))
        # the binary payload columns ride to the kernel, but the doc text
        # never appears anywhere in the indexed plan
        assert "text" not in p.split("ReadSchema")[1][:400]

    def test_wildcard_expansion_scan_is_pruned_topk(self, spark, built):
        """X53's lexicon expansion: an infix wildcard can't push a
        leading-anchored predicate, but the scan must still project only
        the three expansion columns and compile to TakeOrderedAndProject
        (one job, no shuffle) — cost bounded by vocabulary size."""
        from mahout_spark.index.boolquery import _wildcard_expansion_rows

        lex = built.read(spark, "lexicon")
        from pyspark.sql import functions as F

        from mahout_spark.index.queryparse import wildcard_regex

        q = (
            lex.filter(F.col("term").rlike(wildcard_regex("*par*")))
            .select("term", "bucket", "df")
            .orderBy(F.col("df").desc(), F.col("term").asc())
            .limit(64)
        )
        p = _plan(q)
        assert "TakeOrderedAndProject" in p
        assert "Exchange" not in p  # no shuffle: per-split top-k merge
        read = p.split("ReadSchema")[1][:200]
        assert "term" in read and "cf" not in read and "term_id" not in read
        # and the operator itself returns the capped deterministic rows
        rows = _wildcard_expansion_rows(lex, "*par*", 64)
        assert all("par" in r["term"] for r in rows)

    def test_explain_global_rank_input_is_bounded(self, spark, built):
        """X54: explain_topk's single-partition window ranks ONLY the
        per-shard local top-k breakdown rows (<= k docs x terms per
        shard), never corpus-sized data; the plan shows the window over
        the kernel output with the same pruned postings scan as
        boolean_topk."""
        from mahout_spark.index.boolquery import explain_topk

        df = explain_topk(spark, built, "spark AND data", k=5)
        p = _plan(df)
        assert "Window" in p and "FlatMapGroupsInPandas" in p
        assert "In(term, [data,spark])" in p  # pushed residual term filter
        # the window consumes the kernel's bounded output, not a scan:
        # exactly one postings scan feeds the whole plan
        from mahout_spark.plans.audit import scan_count

        assert scan_count(p) == 1

    def test_collapse_window_is_partitioned(self, spark, built):
        """X56: collapse_topk's window must hash-partition on the group
        column (parallel by group) — never a SinglePartition funnel."""
        from mahout_spark.index.boolquery import collapse_topk

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        df = collapse_topk(spark, built, docs, "spark OR data", "lang", n=3)
        p = _plan(df)
        assert "Window" in p
        assert "hashpartitioning(lang" in p
        assert "SinglePartition" not in p


class TestFederatedHybridPlans:
    """Plan gates for the round-3 federation/hybrid/aggregation family:
    per-index branches stay bucket-pruned and union into one cut, the
    corpus-sized embedding scan joins via BROADCAST (never a shuffle of
    the embedding table), and significant_terms reads only the columns
    its aggregation needs."""

    @pytest.fixture(scope="class")
    def two_cats(self, spark, tmp_path_factory):
        from pyspark.sql import functions as F

        from mahout_spark.index.build import build_index

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        return {
            "a": build_index(
                spark, docs.filter(F.col("doc_id") < 250),
                str(tmp_path_factory.mktemp("fedplan_a")),
                content_col="text", mode="simple", n_buckets=4,
                resume=False,
            ),
            "b": build_index(
                spark, docs.filter(F.col("doc_id") >= 250),
                str(tmp_path_factory.mktemp("fedplan_b")),
                content_col="text", mode="simple", n_buckets=4,
                resume=False,
            ),
        }

    def test_federated_branches_pruned_and_unioned(self, spark, two_cats):
        from mahout_spark.index.federated import federated_topk

        from mahout_spark.plans.audit import scan_count

        p = _plan(federated_topk(spark, two_cats, ["table", "data"], k=10))
        # one postings scan per index, term filter pushed into each,
        # branches unioned, one global TakeOrderedAndProject cut
        assert scan_count(p) == 2
        assert p.count("In(term, [data,table])") == 2
        assert "Union" in p
        assert "TakeOrderedAndProject" in p
        assert "SortMergeJoin" not in p

    def test_rescore_broadcasts_window_into_embedding_scan(self, spark,
                                                           two_cats):
        from mahout_spark.index.hybrid import rescore_topk

        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        qvec = [0.1] * 64
        p = _plan(rescore_topk(
            spark, two_cats["a"], "table OR data", emb, qvec,
            k=10, window=20,
        ))
        # the window (<= 20 rows) broadcasts into the embedding scan and
        # again into the final left join — the embedding table itself is
        # never shuffled
        assert p.count("BroadcastHashJoin") >= 2
        assert "SortMergeJoin" not in p
        assert "TakeOrderedAndProject" in p

    def test_significant_terms_prunes_tf_columns(self, spark, two_cats):
        from mahout_spark.index.aggs import significant_terms

        p = _plan(significant_terms(spark, two_cats["a"],
                                    "table AND data", n=10))
        from mahout_spark.plans.audit import read_schemas

        # the foreground count needs (doc_id, term) only: tf_raw's tf and
        # doclen columns must stay out of its scan (the postings scan —
        # identified by block_id — legitimately reads its binary payloads
        # for the match kernel)
        for rs in read_schemas(p):
            if "block_id" in rs:
                continue
            assert "doclen" not in rs, rs
            assert "tf:" not in rs, rs
        assert "TakeOrderedAndProject" in p


class TestLineOpsPlans:
    """X132/X133/X136/X137 scale claims, pinned on the physical plans."""

    def _hash_keys(self, p):
        import re

        return re.findall(r"hashpartitioning\(([^)]*)\)", p)

    def test_dedup_lines_bodies_never_shuffle(self, spark):
        from mahout_spark.operators.curation import dedup_lines

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        p = _plan(dedup_lines(docs))
        keys = self._hash_keys(p)
        assert keys, "expected keyed exchanges (canonical agg + drops)"
        for k in keys:  # only the 8-byte key / id / position ever shuffle
            assert "line#" not in k and "text#" not in k, k
        assert "SinglePartition" not in p

    def test_remove_boilerplate_bodies_never_shuffle(self, spark):
        from mahout_spark.operators.curation import remove_boilerplate

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        p = _plan(remove_boilerplate(docs, min_df=3))
        for k in self._hash_keys(p):
            assert "line#" not in k and "text#" not in k, k
        assert "SinglePartition" not in p

    def test_domain_cap_windows_are_partitioned(self, spark):
        from mahout_spark.operators.curation import domain_cap

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        p = _plan(domain_cap(docs, max_per_domain=5))
        # both phases shuffle on (source[, salt]) — never one partition
        assert "SinglePartition" not in p
        assert any("source#" in k for k in self._hash_keys(p))

    def test_token_budget_has_no_global_window(self, spark):
        from mahout_spark.operators.curation import token_budget_select

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        p = _plan(token_budget_select(docs, 1000))
        # the cumsum window partitions by the quality bucket; a global
        # window would plan a SinglePartition exchange
        assert "SinglePartition" not in p
        assert any("_b#" in k for k in self._hash_keys(p))
