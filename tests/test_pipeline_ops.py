"""Tests for the training-data pipeline operators: textstats, dedup,
similarity, multimodal. Style mirrors SURVEY.md §5: dual-implementation
oracles (numpy / pure Python) + invariant assertions on tiny deterministic
fixtures, so each Spark operator is checked against independently computed
expected values.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# textstats
# ---------------------------------------------------------------------------

class TestTextstats:
    def test_token_counts_exact(self, spark):
        from mahout_spark.operators.textstats import token_counts

        df = spark.createDataFrame(
            [(1, "Hello, world! hello HELLO"), (2, ""), (3, "a b3c dd-ee")],
            ["doc_id", "text"],
        )
        rows = {r["doc_id"]: r for r in token_counts(df).collect()}
        assert rows[1]["n_tokens"] == 4
        assert rows[1]["n_distinct"] == 2  # hello, world
        # ceil(5/4)*3 + ceil(5/4) = 2*4 = 8
        assert rows[1]["bpe_est"] == 8
        assert rows[2]["n_tokens"] == 0 and rows[2]["bpe_est"] == 0
        assert rows[3]["n_tokens"] == 4  # a, b3c, dd, ee

    def test_quality_monotone(self, spark):
        from mahout_spark.operators.textstats import quality_scores

        prose = "the cat sat on the mat and it was a fine day for all of us"
        junk = "@@@@ #### $$$$ %%%% ^^^^ &&&&"
        df = spark.createDataFrame(
            [(1, prose), (2, junk)], ["doc_id", "text"]
        )
        rows = {r["doc_id"]: r for r in quality_scores(df).collect()}
        assert rows[1]["quality"] > rows[2]["quality"]
        assert rows[2]["alpha_ratio"] < 0.3
        assert 0.0 <= rows[2]["quality"] <= 1.0

    def test_lang_id_real_samples(self, spark):
        from mahout_spark.operators.textstats import lang_id

        df = spark.createDataFrame(
            [
                (1, "the quick brown fox is one of the animals in the wood"),
                (2, "der hund und die katze das ist nicht ein problem"),
                (3, "le chat est dans la maison pour les enfants pas que"),
                (4, "el perro es una mascota por las calles del pueblo"),
                (5, "zzz qqq xxx"),  # zero evidence -> 'und'
            ],
            ["doc_id", "text"],
        )
        got = {r["doc_id"]: r["pred_lang"] for r in lang_id(df).collect()}
        assert got == {1: "en", 2: "de", 3: "fr", 4: "es", 5: "und"}

    def test_chunking_covers_and_overlaps(self, spark):
        from mahout_spark.operators.textstats import chunk_documents

        text = " ".join(f"w{i}" for i in range(25))
        df = spark.createDataFrame(
            [(1, text), (2, "short doc"), (3, "")], ["doc_id", "text"]
        )
        rows = chunk_documents(df, chunk_tokens=10, overlap=4).collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r["doc_id"], []).append(r)
        # 25 tokens, window 10, stride 6 -> starts 0,6,12,18 (18+10 > 25,
        # last window partial) => ceil((25-10)/6)+1 = 4 chunks
        c1 = sorted(by_doc[1], key=lambda r: r["chunk_id"])
        assert [r["chunk_id"] for r in c1] == [0, 1, 2, 3]
        assert c1[0]["chunk_text"].split()[:2] == ["w0", "w1"]
        assert c1[1]["chunk_text"].split()[0] == "w6"  # stride 6
        # overlap: chunk 1 repeats the last 4 tokens of chunk 0
        assert c1[0]["chunk_text"].split()[-4:] == c1[1]["chunk_text"].split()[:4]
        # full coverage, last token present exactly once per final window
        assert c1[3]["chunk_text"].split()[-1] == "w24"
        assert len(by_doc[2]) == 1 and by_doc[2][0]["n_chunk_tokens"] == 2
        assert 3 not in by_doc  # empty doc -> no chunks

    def test_pii_redaction_patterns(self, spark, tmp_path):
        """The entry's PII scrub must actually hit emails/IPs/long digit
        runs (the sf corpora contain none, so parity alone can't prove
        the substitutions fire)."""
        import __spark_entry__ as e

        docs = spark.createDataFrame(
            [
                (1, "contact alice@example.com or 10.0.0.1 now"),
                (2, "card 4111111111111111 leaked"),
                (3, "clean text with no pii at all"),
            ],
            ["doc_id", "text"],
        ).withColumn("n_chars", F.length("text"))
        import tempfile

        d = tempfile.mkdtemp(dir=str(tmp_path))
        docs.write.mode("overwrite").parquet(f"{d}/documents.parquet")
        rows = {r["doc_id"]: r for r in e.q_pii_redact(spark, d).collect()}
        assert rows[1]["redacted"] == "contact <EMAIL> or <IP> now"
        assert rows[2]["redacted"] == "card <NUM> leaked"
        assert rows[1]["changed"] and rows[2]["changed"]
        assert not rows[3]["changed"]

    def test_fingerprint_order_sensitive(self, spark):
        from mahout_spark.operators.textstats import fingerprints

        df = spark.createDataFrame(
            [(1, "abc"), (2, "cba"), (3, "abc"), (4, "")],
            ["doc_id", "text"],
        )
        got = {r["doc_id"]: r["fp"] for r in fingerprints(df).collect()}
        # manual: a*1 + b*2 + c*3
        assert got[1] == ord("a") + 2 * ord("b") + 3 * ord("c")
        assert got[1] != got[2]  # order matters
        assert got[1] == got[3]  # deterministic
        assert got[4] == 0


# ---------------------------------------------------------------------------
# dedup
# ---------------------------------------------------------------------------

def _py_jaccard(a: str, b: str, k: int = 3) -> float:
    import re

    def sh(t):
        toks = [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]
        return {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)}

    sa, sb = sh(a), sh(b)
    return len(sa & sb) / len(sa | sb) if sa | sb else 0.0


NEAR_DUP_DOCS = [
    (0, "the quick brown fox jumps over the lazy dog in the misty morning"),
    (1, "the quick brown fox jumps over the lazy dog in the misty evening"),
    (2, "a completely different sentence about spark query engines at scale"),
    (3, "another unrelated text mentioning posting lists and inverted index"),
    (4, "the quick brown fox jumps over the lazy dog in the misty morning"),
]


class TestDedup:
    @pytest.fixture(scope="class")
    def near_docs(self, spark):
        return spark.createDataFrame(NEAR_DUP_DOCS, ["doc_id", "text"])

    def test_exact_dedup(self, spark, near_docs):
        from mahout_spark.operators.dedup import exact_dedup_groups

        rows = exact_dedup_groups(near_docs).collect()
        assert len(rows) == 1
        assert rows[0]["keep_id"] == 0 and rows[0]["n_copies"] == 2

    def test_jaccard_pairs_match_python_oracle(self, spark, near_docs):
        from mahout_spark.operators.dedup import jaccard_neardup_pairs

        got = {
            (r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in jaccard_neardup_pairs(
                near_docs, k=3, threshold=0.5, rare_df_max=10
            ).collect()
        }
        texts = dict(NEAR_DUP_DOCS)
        expected = {}
        for a in texts:
            for b in texts:
                if a < b:
                    j = _py_jaccard(texts[a], texts[b])
                    if j >= 0.5:
                        expected[(a, b)] = round(j, 6)
        assert got == expected
        assert (0, 4) in got and got[(0, 4)] == 1.0

    def test_minhash_identical_docs_full_jaccard(self, spark, near_docs):
        from mahout_spark.operators.dedup import minhash_lsh_pairs

        got = {
            (r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in minhash_lsh_pairs(near_docs, threshold=0.5).collect()
        }
        # identical docs always collide in every band; verified jaccard
        # values are exact (recomputed), so they match the python oracle
        assert got[(0, 4)] == 1.0
        texts = dict(NEAR_DUP_DOCS)
        for (a, b), j in got.items():
            assert j == round(_py_jaccard(texts[a], texts[b]), 6)

    def test_minhash_sig_properties(self, spark, near_docs):
        from mahout_spark.operators.dedup import minhash_signatures

        sigs = {r["doc_id"]: r["sig"]
                for r in minhash_signatures(near_docs).collect()}
        assert len(sigs[0]) == 128
        assert sigs[0] == sigs[4]  # identical content -> identical sig
        # near-dup docs agree on most components
        agree = sum(a == b for a, b in zip(sigs[0], sigs[1])) / 128
        assert agree > 0.5
        agree_far = sum(a == b for a, b in zip(sigs[0], sigs[2])) / 128
        assert agree_far < 0.2

    def test_simhash_pairs(self, spark, near_docs):
        from mahout_spark.operators.dedup import (
            simhash_neardup_pairs,
            simhash_signatures,
        )

        sigs = {r["doc_id"]: r["simhash"]
                for r in simhash_signatures(near_docs).collect()}
        assert sigs[0] == sigs[4]
        pairs = {
            (r["doc_a"], r["doc_b"]): r["hamming"]
            for r in simhash_neardup_pairs(near_docs, max_hd=3).collect()
        }
        assert pairs[(0, 4)] == 0
        # exact hamming cross-check in python
        for (a, b), hd in pairs.items():
            assert bin((sigs[a] ^ sigs[b]) & ((1 << 64) - 1)).count("1") == hd
            assert hd <= 3

    def test_dedup_groups_unconverged_raises_or_warns(self, spark):
        """A component with diameter > max_iters must NOT come back as
        silently split groups: default raises, on_unconverged='warn'
        returns the partial labels with a warning."""
        import warnings

        import pytest

        from mahout_spark.operators.dedup import dedup_groups_from_pairs

        chain = [(i, i + 1) for i in range(8)]  # diameter 8
        pairs = spark.createDataFrame(chain, ["doc_a", "doc_b"])
        with pytest.raises(RuntimeError, match="not converged"):
            dedup_groups_from_pairs(pairs, max_iters=2)
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            rows = dedup_groups_from_pairs(
                pairs, max_iters=2, on_unconverged="warn"
            ).collect()
        assert any("not converged" in str(x.message) for x in w)
        assert len(rows) == 9
        # and with enough iterations the same chain fully converges
        got = {
            r["doc_id"]: r["keep_id"]
            for r in dedup_groups_from_pairs(pairs, max_iters=10).collect()
        }
        assert got == {i: 0 for i in range(9)}

    def test_dedup_groups_connected_components(self, spark):
        """Label propagation must match a python union-find on a graph
        with a chain (worst case for propagation), a triangle, and an
        isolated pair."""
        from mahout_spark.operators.dedup import dedup_groups_from_pairs

        edges = [
            (1, 2), (2, 3), (3, 4), (4, 5),       # chain -> keep 1
            (10, 11), (11, 12), (10, 12),         # triangle -> keep 10
            (20, 21),                             # pair -> keep 20
        ]
        pairs = spark.createDataFrame(edges, ["doc_a", "doc_b"])
        got = {
            r["doc_id"]: r["keep_id"]
            for r in dedup_groups_from_pairs(pairs).collect()
        }
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        expected = {x: find(x) for x in parent}
        assert got == expected
        assert got[5] == 1 and got[12] == 10 and got[21] == 20

    def test_minhash_sig_bit_identical_to_python_oracle(self, spark, near_docs):
        """The JVM shingle-hash path (xxhash64 & 0xFFFFFFFF inside a
        codegen'd transform) must be bit-replicable driver-side: a pure-
        Python recomputation with functions.xxhash + the same universal
        hash family reproduces every signature component exactly."""
        import re

        from mahout_spark.functions.xxhash import xxhash64_spark
        from mahout_spark.operators.dedup import (
            MERSENNE61,
            _minhash_params,
            minhash_signatures,
        )

        k, n_hashes, seed = 3, 128, 42
        a_p, b_p = _minhash_params(n_hashes, seed)
        sigs = {r["doc_id"]: r["sig"]
                for r in minhash_signatures(near_docs, n_hashes, k, seed)
                .collect()}
        for doc_id, text in NEAR_DUP_DOCS:
            toks = [w for w in re.split(r"[^a-z0-9]+", text.lower()) if w]
            keys = [
                xxhash64_spark(" ".join(toks[i:i + k])) & 0xFFFFFFFF
                for i in range(len(toks) - k + 1)
            ]
            expected = [
                min((a_p[h] * x + b_p[h]) % MERSENNE61 for x in keys)
                for h in range(n_hashes)
            ]
            assert sigs[doc_id] == expected, f"doc {doc_id}"

    def test_simhash_sig_bit_identical_to_python_oracle(self, spark, near_docs):
        import re

        from mahout_spark.functions.xxhash import xxhash64_spark
        from mahout_spark.operators.dedup import simhash_signatures

        sigs = {r["doc_id"]: r["simhash"]
                for r in simhash_signatures(near_docs).collect()}
        for doc_id, text in NEAR_DUP_DOCS:
            toks = [w for w in re.split(r"[^a-z0-9]+", text.lower()) if w]
            votes = [0] * 64
            for t in toks:
                h = xxhash64_spark(t) & ((1 << 64) - 1)
                for bit in range(64):
                    votes[bit] += 1 if (h >> bit) & 1 else -1
            u = sum(1 << bit for bit in range(64) if votes[bit] > 0)
            expected = u - (1 << 64) if u >= (1 << 63) else u
            assert sigs[doc_id] == expected, f"doc {doc_id}"

    def test_dedup_cleanup_releases_checkpoint_blocks(self, spark, near_docs):
        """Threading a cleanup list through the dedup operators and
        calling release() must return the block manager to its baseline —
        a bench/notebook session running dedup in a loop must not
        accumulate superseded checkpoint RDDs (VERDICT r2 §wrong#3)."""
        from mahout_spark.checkpoint import release
        from mahout_spark.operators.dedup import (
            dedup_groups_from_pairs,
            minhash_lsh_pairs,
        )

        sc = spark.sparkContext

        def persistent_ids():
            it = sc._jsc.sc().getPersistentRDDs().keysIterator()
            ids = set()
            while it.hasNext():
                ids.add(it.next())
            return ids

        base = persistent_ids()
        cleanup = []
        pairs = minhash_lsh_pairs(near_docs, threshold=0.5, cleanup=cleanup)
        groups = dedup_groups_from_pairs(pairs, cleanup=cleanup)
        rows = groups.collect()
        assert len(rows) >= 2  # sanity: the operator did real work
        created = persistent_ids() - base
        assert created  # checkpoints existed while live
        release(cleanup)
        assert cleanup == []
        # id-based (not count-based): ContextCleaner may concurrently drop
        # OTHER tests' stale blocks; only OUR ids must be gone
        assert not (persistent_ids() & created)

    def test_dedup_groups_one_action_per_iteration(self, spark):
        """The convergence check rides an Observation metric ON the
        checkpoint materialization — each CC iteration issues exactly one
        ACTION. Under AQE one action fans into several stage-jobs (~7-8
        for the join+groupBy+join chain here), so the gate is a calibrated
        job-count ceiling: the pre-fold loop (separate convergence agg per
        iteration) measured 28 jobs on this graph, the folded loop 25.
        A regression re-adding per-iteration driver actions trips this."""
        from mahout_spark.operators.dedup import dedup_groups_from_pairs

        # path 0-1-2: iter1 moves 2 labels, iter2 moves 1, iter3 confirms
        pairs = spark.createDataFrame([(0, 1), (1, 2)], ["doc_a", "doc_b"])
        sc = spark.sparkContext
        group = "cc_job_count_test"
        sc.setJobGroup(group, "cc serial-chain gate")
        try:
            df = dedup_groups_from_pairs(pairs)
        finally:
            sc.setJobGroup("", "")
        jobs = sc.statusTracker().getJobIdsForGroup(group)
        assert len(jobs) <= 25, f"CC serial chain regressed: {len(jobs)} jobs"
        assert {r["doc_id"]: r["keep_id"] for r in df.collect()} == {
            0: 0, 1: 0, 2: 0
        }

    def test_embedding_neardup_vs_numpy(self, spark):
        from mahout_spark.operators.dedup import embedding_neardup_pairs

        rng = np.random.RandomState(0)
        base = rng.normal(size=(6, 8)).astype(np.float32)
        base[3] = base[0] + 0.01 * rng.normal(size=8).astype(np.float32)
        emb = spark.createDataFrame(
            [(i, [float(x) for x in base[i]]) for i in range(6)],
            ["vec_id", "embedding"],
        )
        got = {
            (r["id_a"], r["id_b"]): r["cosine"]
            for r in embedding_neardup_pairs(emb, threshold=0.9).collect()
        }
        m = base.astype(np.float64)
        norm = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = norm @ norm.T
        expected = {
            (i, j): round(float(sims[i, j]), 6)
            for i in range(6) for j in range(i + 1, 6)
            if round(float(sims[i, j]), 6) >= 0.9
        }
        assert set(got) == set(expected)
        for p in got:
            assert got[p] == pytest.approx(expected[p], abs=2e-6)


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------

class TestSimilarity:
    @pytest.fixture(scope="class")
    def clustered_emb(self, spark):
        """200 vectors: 20 planted near-neighbors of the query + 180
        background — structure LSH can exploit (unlike uniform noise)."""
        rng = np.random.RandomState(7)
        q = rng.normal(size=16)
        q /= np.linalg.norm(q)
        rows = []
        for i in range(20):  # planted: small perturbations of q
            v = q + 0.15 * rng.normal(size=16)
            rows.append((i, [float(x) for x in v]))
        for i in range(20, 200):
            v = rng.normal(size=16)
            rows.append((i, [float(x) for x in v]))
        return (
            spark.createDataFrame(rows, ["vec_id", "embedding"]),
            [float(x) for x in q],
        )

    def test_brute_force_matches_numpy(self, spark, clustered_emb):
        from mahout_spark.operators.similarity import brute_force_cosine_topk

        emb, q = clustered_emb
        got = brute_force_cosine_topk(emb, q, k=5).collect()
        data = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
                for r in emb.collect()}
        qv = np.asarray(q)
        sims = sorted(
            (
                (round(float(v @ qv / (np.linalg.norm(v) * np.linalg.norm(qv))), 6), -i)
                for i, v in data.items()
            ),
            reverse=True,
        )[:5]
        expected = [(-i, s) for s, i in sims]
        assert [(r["vec_id"], r["cosine"]) for r in got] == expected

    def test_ann_recall_on_planted_neighbors(self, spark, clustered_emb):
        from mahout_spark.operators.similarity import (
            brute_force_cosine_topk,
            lsh_ann_topk,
        )

        emb, q = clustered_emb
        bf = {r["vec_id"] for r in brute_force_cosine_topk(emb, q, 10).collect()}
        ann = {r["vec_id"]
               for r in lsh_ann_topk(emb, q, 10, nbits=8, n_probes=9).collect()}
        assert len(bf & ann) / 10 >= 0.9

    def test_ivf_full_probe_equals_brute_force(self, spark, clustered_emb):
        """With n_probes = n_cells every vector passes the cell filter,
        so IVF must be EXACTLY brute force (same rounded cosines, same
        tie order) — the lossless-plumbing regime the driver oracle
        checks."""
        from mahout_spark.operators.similarity import (
            brute_force_cosine_topk,
            ivf_ann_topk,
            ivf_train_centroids,
        )

        emb, q = clustered_emb
        C = ivf_train_centroids(emb, n_cells=8, sample_n=256)
        got = [(r["vec_id"], r["cosine"])
               for r in ivf_ann_topk(emb, q, C, k=10, n_probes=8).collect()]
        want = [(r["vec_id"], r["cosine"])
                for r in brute_force_cosine_topk(emb, q, k=10).collect()]
        assert got == want

    def test_ivf_recall_on_planted_neighbors(self, spark, clustered_emb):
        """Approximate regime: probing half the cells must still recall
        the planted near-neighbor cluster (spherical k-means puts the
        query's neighborhood in few cells)."""
        from mahout_spark.operators.similarity import (
            brute_force_cosine_topk,
            ivf_ann_topk,
            ivf_train_centroids,
        )

        emb, q = clustered_emb
        C = ivf_train_centroids(emb, n_cells=8, sample_n=256)
        bf = {r["vec_id"]
              for r in brute_force_cosine_topk(emb, q, 10).collect()}
        ann = {r["vec_id"]
               for r in ivf_ann_topk(emb, q, C, k=10, n_probes=4).collect()}
        assert len(bf & ann) / 10 >= 0.9

    def test_ivf_table_partition_pruned_probe(self, spark, clustered_emb,
                                              tmp_path):
        """Round-3 VERDICT ask #7: write_ivf_table materializes the
        cell-partitioned layout and the probe's scan PRUNES PARTITIONS
        (the cell predicate lands in PartitionFilters — directories
        outside the probe set are never opened); results are identical
        to the in-memory ivf_ann_topk, and exactly brute force at full
        probe."""
        from mahout_spark.operators.similarity import (
            brute_force_cosine_topk,
            ivf_ann_topk,
            ivf_ann_topk_from_table,
            ivf_train_centroids,
            write_ivf_table,
        )
        from mahout_spark.plans.audit import capture_plan

        emb, q = clustered_emb
        C = ivf_train_centroids(emb, n_cells=8, sample_n=256)
        path = str(tmp_path / "ivf_cells")
        write_ivf_table(emb, C, path)
        import os

        cells_on_disk = sorted(
            d for d in os.listdir(path) if d.startswith("cell=")
        )
        assert len(cells_on_disk) >= 2  # genuinely partitioned layout

        probe = ivf_ann_topk_from_table(spark, path, q, C, k=10, n_probes=4)
        plan = capture_plan(probe)
        pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
        assert pf and "cell" in pf[0] and "IN" in pf[0].upper(), plan
        got = [(r["vec_id"], r["cosine"]) for r in probe.collect()]
        mem = [(r["vec_id"], r["cosine"])
               for r in ivf_ann_topk(emb, q, C, k=10, n_probes=4).collect()]
        assert got == mem

        full = [(r["vec_id"], r["cosine"]) for r in ivf_ann_topk_from_table(
            spark, path, q, C, k=10, n_probes=8).collect()]
        bf = [(r["vec_id"], r["cosine"])
              for r in brute_force_cosine_topk(emb, q, k=10).collect()]
        assert full == bf

    def test_ivf_training_is_deterministic_and_cells_partition(self, spark,
                                                               clustered_emb):
        from mahout_spark.operators.similarity import (
            add_ivf_cells,
            ivf_train_centroids,
        )

        emb, _ = clustered_emb
        C1 = ivf_train_centroids(emb, n_cells=8, sample_n=256)
        C2 = ivf_train_centroids(emb, n_cells=8, sample_n=256)
        assert np.array_equal(C1, C2)  # same sample, same init, same path
        assert np.allclose(np.linalg.norm(C1, axis=1), 1.0)
        cells = add_ivf_cells(emb, C1).groupBy("cell").count().collect()
        seen = {r["cell"] for r in cells}
        assert seen <= set(range(8))
        assert sum(r["count"] for r in cells) == emb.count()  # total cover

    def test_lsh_neardup_precision_exact(self, spark, clustered_emb):
        """Every pair the LSH-blocked near-dup emits must be a true pair
        (exact cosines identical to the quadratic baseline); recall on the
        planted near-neighbor cluster must be high."""
        from mahout_spark.operators.dedup import embedding_neardup_pairs
        from mahout_spark.operators.similarity import lsh_neardup_pairs

        emb, _ = clustered_emb
        exact = {
            (r["id_a"], r["id_b"]): r["cosine"]
            for r in embedding_neardup_pairs(emb, threshold=0.9).collect()
        }
        lsh = {
            (r["id_a"], r["id_b"]): r["cosine"]
            for r in lsh_neardup_pairs(emb, threshold=0.9, nbits=6).collect()
        }
        for pair, c in lsh.items():  # precision: exact subset, same values
            assert pair in exact and exact[pair] == c
        assert len(lsh) / max(1, len(exact)) >= 0.5  # recall at 6 bits

    def test_knn_join_self_nearest(self, spark, clustered_emb):
        from mahout_spark.operators.similarity import pairwise_topk_join

        emb, _ = clustered_emb
        knn = pairwise_topk_join(emb.limit(5), emb, k=1).collect()
        for r in knn:  # rank-1 neighbor of v within the full set is v itself
            assert r["rid"] == r["lid"]
            assert r["cosine"] == 1.0


# ---------------------------------------------------------------------------
# multimodal plumbing
# ---------------------------------------------------------------------------

class TestMultimodal:
    @pytest.fixture(scope="class")
    def media(self, spark):
        from mahout_spark.operators.multimodal import pack_media

        df = spark.createDataFrame(
            [(1, "some image-ish bytes"), (2, "x"), (3, "")],
            ["doc_id", "text"],
        )
        return pack_media(df, "text")

    def test_schema_contract(self, media):
        from mahout_spark.operators.multimodal import decode_media

        dec = decode_media(media)
        assert [f.name for f in dec.schema.fields] == [
            "doc_id", "media_type", "n_bytes", "width", "height", "features",
        ]

    def test_fake_decode_deterministic(self, spark, media):
        from mahout_spark.operators.multimodal import FEATURE_DIM, decode_media

        a = {r["doc_id"]: r for r in decode_media(media).collect()}
        b = {r["doc_id"]: r for r in decode_media(media).collect()}
        for d in a:
            assert a[d]["features"] == b[d]["features"]
            assert len(a[d]["features"]) == FEATURE_DIM
        assert a[1]["n_bytes"] == len("some image-ish bytes")
        assert a[3]["n_bytes"] == 0

    def test_meta_matches_payload(self, spark, media):
        import hashlib

        from mahout_spark.operators.multimodal import binary_meta

        rows = {r["doc_id"]: r for r in binary_meta(media).collect()}
        assert rows[1]["sha"] == hashlib.sha256(
            b"some image-ish bytes"
        ).hexdigest()

    def test_frame_sampling(self, spark, media):
        from mahout_spark.operators.multimodal import sample_frames

        frames = sample_frames(media, n_frames=4).collect()
        by_doc = {}
        for r in frames:
            by_doc.setdefault(r["doc_id"], []).append(r)
        assert len(by_doc[1]) == 4
        # frames cover the payload in order
        joined = b"".join(
            bytes(r["frame_bytes"])
            for r in sorted(by_doc[1], key=lambda r: r["frame_idx"])
        )
        assert b"some image-ish bytes".startswith(joined[:5])
        assert 3 not in by_doc  # empty payload -> no frames

    def test_real_decoder_is_explicit_stub(self, spark, media):
        from mahout_spark.operators.multimodal import decode_media

        with pytest.raises(Exception, match="NotImplementedError|not available"):
            decode_media(media, decoder="real").collect()
