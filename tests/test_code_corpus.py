"""End-to-end over the north-star input shape: an index built from a
source-code corpus table (repo, path, commit, lang, content) with the
code-aware tokenizer and language-tagged terms (BASELINE input_hint +
north_star T4)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

CODE_DOCS = [
    ("repo_a", "src/UserService.java", "c1", "java",
     "public class UserService { String getUserName() { return userName; } }"),
    ("repo_a", "src/user_store.py", "c1", "python",
     "def get_user_name(user_id):\n    return user_store[user_id]"),
    ("repo_a", "src/OrderService.java", "c1", "java",
     "class OrderService { void submitOrder(Order order) { queue.push(order); } }"),
    ("repo_b", "lib/parser.py", "c2", "python",
     "class TokenParser:\n    def parse_tokens(self, raw_input):\n        return raw_input.split()"),
    ("repo_b", "lib/HttpServer2.java", "c2", "java",
     "class HttpServer2 extends BaseServer { int portNumber = 8080; }"),
]


@pytest.fixture(scope="module")
def code_index(spark, tmp_path_factory):
    from mahout_spark.index.build import build_index

    docs = spark.createDataFrame(
        CODE_DOCS, ["repo", "path", "commit", "lang", "content"]
    )
    out = str(tmp_path_factory.mktemp("code_idx"))
    cat = build_index(
        spark, docs, out, content_col="content",
        id_cols=["repo", "path", "commit"], mode="code", lang_col="lang",
        n_buckets=4, docs_per_shard=64, block_size=16, resume=False,
    )
    return cat, docs


def _doc_keys(spark, cat, result):
    stats = cat.read(spark, "docstats").select("doc_id", "repo", "path")
    return {
        (r["repo"], r["path"])
        for r in result.join(stats, "doc_id").collect()
    }


class TestCodeCorpus:
    def test_subtoken_search_finds_camelcase(self, spark, code_index):
        """'username' (sub-token of getUserName / userName / get_user_name)
        must retrieve both the java and python user files."""
        from mahout_spark.index.wand import topk

        cat, _ = code_index
        got = _doc_keys(
            spark, cat, topk(spark, cat, ["user", "name"], k=10, mode_all=True)
        )
        assert ("repo_a", "src/UserService.java") in got
        assert ("repo_a", "src/user_store.py") in got
        assert ("repo_a", "src/OrderService.java") not in got

    def test_compound_token_also_indexed(self, spark, code_index):
        from mahout_spark.index.wand import topk

        cat, _ = code_index
        got = _doc_keys(
            spark, cat, topk(spark, cat, ["getusername"], k=10)
        )
        assert got == {("repo_a", "src/UserService.java")}

    def test_lang_tag_scoping(self, spark, code_index):
        """AND with the synthetic lang: term = language-scoped search via
        pure posting-list intersection."""
        from mahout_spark.index.wand import topk

        cat, _ = code_index
        all_user = _doc_keys(
            spark, cat, topk(spark, cat, ["user"], k=10)
        )
        java_user = _doc_keys(
            spark, cat,
            topk(spark, cat, ["user", "lang:java"], k=10, mode_all=True),
        )
        assert ("repo_a", "src/user_store.py") in all_user
        assert java_user == {("repo_a", "src/UserService.java")}

    def test_field_query_syntax_scopes_language(self, spark, code_index):
        """`lang:java user` through the query language ≡ the hand-built
        tag-term AND: the field leaf compiles to the same posting term
        the indexer emits, so the parser path and the raw topk path must
        return identical docs and scores."""
        from mahout_spark.index.boolquery import boolean_topk
        from mahout_spark.index.wand import topk

        cat, _ = code_index
        via_parser = [
            (r["doc_id"], round(r["score"], 9))
            for r in boolean_topk(spark, cat, "lang:java user").collect()
        ]
        via_topk = [
            (r["doc_id"], round(r["score"], 9))
            for r in topk(
                spark, cat, ["user", "lang:java"], k=10, mode_all=True
            ).collect()
        ]
        assert via_parser == via_topk and len(via_parser) == 1

        # field prefix expands inside the tag namespace: lang:p* -> python
        via_prefix = [
            r["doc_id"]
            for r in boolean_topk(spark, cat, "lang:p* store").collect()
        ]
        py_store = [
            r["doc_id"]
            for r in topk(
                spark, cat, ["store", "lang:python"], k=10, mode_all=True
            ).collect()
        ]
        assert via_prefix == py_store and len(via_prefix) == 1

    def test_lang_tag_excluded_from_doclen(self, spark, code_index):
        """The synthetic term must not perturb BM25 length normalization:
        doclen == content token count, not +1."""
        from mahout_spark.index.wand import topk
        from mahout_spark.tokenize import tokenize_code

        cat, docs = code_index
        stats = {
            (r["repo"], r["path"]): r["doclen"]
            for r in cat.read(spark, "docstats").collect()
        }
        for repo, path, _, _, content in CODE_DOCS:
            assert stats[(repo, path)] == len(tokenize_code(content))

    def test_sha_invariant_on_natural_keys(self, spark, code_index):
        from mahout_spark.index.build import verify_sha

        cat, docs = code_index
        from mahout_spark.functions import dense_ids

        keyed = dense_ids(docs, ["repo", "path", "commit"], "doc_id")
        assert verify_sha(spark, keyed, cat, "content") == 0

    def test_lang_tags_in_lexicon(self, spark, code_index):
        cat, _ = code_index
        lex = cat.read(spark, "lexicon")
        tags = {
            r["term"]: r["df"]
            for r in lex.filter(F.col("term").startswith("lang:")).collect()
        }
        assert tags == {"lang:java": 3, "lang:python": 2}
