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

    def test_soft_weights_sum_to_one_and_agree_with_hard(self, spark, demo):
        """Fuzzy-membership weights (the FKM m=2 analog the reference
        computes but never prints): per-doc weights sum to 1 and their
        argmax equals the hard cosine-k-means assignment."""
        from mahout_spark.operators.clustering import kmeans_doc_clusters

        assign = kmeans_doc_clusters(demo, soft_weights=True)
        rows = assign.collect()
        assert rows
        for r in rows:
            w = r["weights"]
            assert abs(sum(w) - 1.0) < 1e-9
            assert all(x >= 0 for x in w)
            assert max(range(len(w)), key=lambda i: w[i]) == r["cluster"]
        # docs 6 & 7 are identical vectors -> identical weight rows
        by_doc = {r["doc_id"]: r["weights"] for r in rows}
        assert by_doc[6] == pytest.approx(by_doc[7])

    def test_iterative_fkm_matches_golden_grouping(self, spark, demo):
        """soft_weights='iterative' runs the TRUE fuzzy-k-means loop
        (membership-weighted centroid updates, m=2) instead of the
        one-shot analog. On the golden demo the refined solution must
        reproduce the reference grouping (docs 6&7 together, doc 1
        alone), keep weights a valid distribution, and separate the
        clusters at least as sharply as the one-shot weights."""
        from mahout_spark.operators.clustering import (
            cluster_report,
            kmeans_doc_clusters,
        )

        it = kmeans_doc_clusters(demo, soft_weights="iterative", fkm_iters=2)
        rows = it.collect()
        for r in rows:
            w = r["weights"]
            assert abs(sum(w) - 1.0) < 1e-9
            assert all(x >= 0 for x in w)
            assert max(range(len(w)), key=lambda i: w[i]) == r["cluster"]
        got = {r["doc_id"]: r["cluster"] for r in rows}
        assert got[6] == got[7] and got[1] != got[6]
        rep = cluster_report(it).collect()
        assert len(rep) == 1 and rep[0]["members"] == [6, 7]
        # sharper-or-equal separation than the one-shot analog
        one = {r["doc_id"]: max(r["weights"])
               for r in kmeans_doc_clusters(demo, soft_weights=True).collect()}
        for r in rows:
            assert max(r["weights"]) >= one[r["doc_id"]] - 1e-9

    def test_distance_probe_matches_reference(self, spark, demo):
        """The reference's pre-clustering distance sanity probe: disjoint
        docs at Tanimoto distance 1.0 (report_snpts.txt:12,
        report_clusters_snippets.txt:25-27); identical-vector docs 6/7 at
        distance 0."""
        from mahout_spark.operators.clustering import (
            pairwise_doc_distances,
            tfidf_doc_terms,
        )

        scores, _ = tfidf_doc_terms(demo)
        got = {
            (r["doc_a"], r["doc_b"]): r["distance"]
            for r in pairwise_doc_distances(scores, "tanimoto").collect()
        }
        assert got[(1, 6)] == 1.0 and got[(1, 7)] == 1.0  # disjoint
        assert got[(6, 7)] == 0.0                         # identical

    def test_distances_match_numpy(self, spark):
        import numpy as np

        from mahout_spark.operators.clustering import pairwise_doc_distances

        rng = np.random.RandomState(3)
        dense = rng.rand(4, 6)
        dense[dense < 0.3] = 0.0  # sparsity incl. a fully-disjoint chance
        rows = [
            (d, t, float(dense[d, t]))
            for d in range(4) for t in range(6) if dense[d, t] > 0
        ]
        w = spark.createDataFrame(rows, ["doc_id", "term_id", "score"])
        for measure in ["cosine", "tanimoto", "euclidean"]:
            got = {
                (r["doc_a"], r["doc_b"]): r["distance"]
                for r in pairwise_doc_distances(w, measure).collect()
            }
            for i in range(4):
                for j in range(i + 1, 4):
                    va, vb = dense[i], dense[j]
                    dot = float(va @ vb)
                    na2, nb2 = float(va @ va), float(vb @ vb)
                    if measure == "cosine":
                        exp = 1 - dot / (na2 ** 0.5 * nb2 ** 0.5)
                    elif measure == "tanimoto":
                        exp = 1 - dot / (na2 + nb2 - dot)
                    else:
                        exp = max(na2 + nb2 - 2 * dot, 0.0) ** 0.5
                    assert got[(i, j)] == pytest.approx(exp, abs=2e-6)

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
