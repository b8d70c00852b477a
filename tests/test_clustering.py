"""Clustering golden test: reproduce the reference's ClusteringDemo
end-to-end — same 3-document corpus, same TF-IDF values, same final
grouping (report_clusters.txt: Document 1 alone; Documents 6 and 7
together)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

DEMO_DOCS = [
    (1, "Atletico Madrid win"),
    (6, "Both apple and orange are fruit"),
    (7, "Both orange and apple are fruit"),
]


class TestClusteringDemo:
    @pytest.fixture(scope="class")
    def demo(self, spark):
        return spark.createDataFrame(DEMO_DOCS, ["doc_id", "text"])

    def test_tfidf_values_match_golden(self, spark, demo):
        """report_clusters.txt:1-3 — doc 1 entries all 1.405 (=1+ln(3/2)),
        docs 6/7 entries all 1.000 (=1+ln(3/3)); dims 7 / 3+4+4 entries."""
        from mahout_spark.operators.clustering import tfidf_doc_terms

        scores, dim = tfidf_doc_terms(demo)
        assert dim == 7  # atletico madrid win both apple orange fruit
        rows = scores.collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r["doc_id"], []).append(round(r["score"], 3))
        assert sorted(by_doc[1]) == [1.405, 1.405, 1.405]
        assert sorted(by_doc[6]) == [1.0, 1.0, 1.0, 1.0]
        assert sorted(by_doc[7]) == [1.0, 1.0, 1.0, 1.0]

    def test_canopy_estimates_two_clusters(self, spark, demo):
        from mahout_spark.operators.clustering import (
            doc_vectors,
            estimate_k_canopy,
            tfidf_doc_terms,
        )

        scores, dim = tfidf_doc_terms(demo)
        k = estimate_k_canopy(doc_vectors(scores, dim), t=0.2)
        assert k == 2

    def test_demo_grouping_matches_golden(self, spark, demo):
        """Docs 6 & 7 share a cluster; doc 1 is alone — the observable
        output of report_clusters.txt:2-8."""
        from mahout_spark.operators.clustering import (
            cluster_report,
            kmeans_doc_clusters,
        )

        assign = kmeans_doc_clusters(demo)  # k from canopy
        got = {r["doc_id"]: r["cluster"] for r in assign.collect()}
        assert got[6] == got[7]
        assert got[1] != got[6]
        rep = cluster_report(assign).collect()
        assert len(rep) == 1
        assert rep[0]["members"] == [6, 7]

    def test_clusters_on_corpus_table(self, spark):
        """Smoke at corpus scale: sf0.001 documents, fixed k."""
        from mahout_spark.operators.clustering import kmeans_doc_clusters

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).limit(100)
        assign = kmeans_doc_clusters(docs, k=5)
        assert assign.count() == 100
        n_clusters = assign.select("cluster").distinct().count()
        assert 1 <= n_clusters <= 5
        assert assign.groupBy("doc_id").count().filter(
            F.col("count") > 1
        ).count() == 0
