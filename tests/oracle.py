"""Pure-Python reference scorer (SURVEY.md §5.2 dual-implementation oracle).

Independent of Spark: dict/loops only, shares nothing with the engine except
the tokenizer module (which is itself pinned by the reference's golden token
dump). Every Spark result must match this rank-identically.
"""

from __future__ import annotations

import math
from collections import Counter

from mahout_spark import BM25_B, BM25_K1
from mahout_spark.tokenize import tokenize_code, tokenize_text


def simple_tokenize(content: str) -> list:
    """The SQL-expressible tokenizer (operators/stats.py
    simple_term_frequencies): lowercase, split on [^a-z0-9]+."""
    import re

    return [t for t in re.split(r"[^a-z0-9]+", (content or "").lower()) if t]


def _edit_distance(a: str, b: str) -> int:
    """Plain Levenshtein (ins/del/sub) via the textbook DP — independent
    of both the engine's JVM levenshtein and DuckDB's."""
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


class OracleIndex:
    def __init__(self, docs: dict, mode: str = "text", **tok_kw):
        """docs: {doc_id: content}"""
        if mode == "simple":
            tok = lambda c, **kw: simple_tokenize(c)
        else:
            tok = tokenize_text if mode == "text" else tokenize_code
        self._tok = lambda c: tok(c, **tok_kw)
        self.tf: dict = {}
        self.doclen: dict = {}
        self.tokens: dict = {}
        for doc_id, content in docs.items():
            toks = tok(content, **tok_kw)
            self.tokens[doc_id] = toks
            self.tf[doc_id] = Counter(toks)
            self.doclen[doc_id] = len(toks)
        self.n_docs = len(docs)
        self.df = Counter()
        for c in self.tf.values():
            for term in c:
                self.df[term] += 1
        nonempty = [l for l in self.doclen.values() if l > 0]
        self.avgdl = sum(nonempty) / len(nonempty) if nonempty else 0.0

    def tfidf(self, doc_id, term) -> float:
        tf = self.tf[doc_id][term]
        return math.sqrt(tf) * (1.0 + math.log(self.n_docs / (self.df[term] + 1.0)))

    def bm25(self, doc_id, term, k1=BM25_K1, b=BM25_B, df=None) -> float:
        tf = self.tf[doc_id][term]
        if tf == 0:
            return 0.0
        d = self.df[term] if df is None else df
        idf = math.log(1.0 + (self.n_docs - d + 0.5) / (d + 0.5))
        dl = self.doclen[doc_id]
        return idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / self.avgdl))

    def search(self, terms, k=10, mode_all=False):
        """BM25 top-k: [(doc_id, score)] ranked by (score desc, doc_id asc).
        Per-doc score sums term contributions in sorted-term order (the
        engine-wide deterministic reduction order)."""
        qt = list(dict.fromkeys(terms))
        results = []
        for doc_id, c in self.tf.items():
            matched = [t for t in qt if c[t] > 0]
            if not matched or (mode_all and len(matched) != len(qt)):
                continue
            score = sum(self.bm25(doc_id, t) for t in sorted(matched))
            results.append((doc_id, score))
        results.sort(key=lambda r: (-r[1], r[0]))
        return results[:k]

    def phrase_search(self, phrase: list, k=10):
        """Exact-adjacency phrase top-k: docs whose token stream contains
        ``phrase`` as a contiguous subsequence, scored by the BM25 sum of
        the phrase's distinct terms (sorted-term reduction order), ranked
        (score desc, doc_id asc). Token-scan — fully independent of the
        positional index implementation."""
        results = []
        L = len(phrase)
        for doc_id, toks in self.tokens.items():
            if not any(
                toks[i:i + L] == list(phrase)
                for i in range(len(toks) - L + 1)
            ):
                continue
            score = sum(self.bm25(doc_id, t) for t in sorted(set(phrase)))
            results.append((doc_id, score))
        results.sort(key=lambda r: (-r[1], r[0]))
        return results[:k]

    def proximity_search(self, terms: list, window: int, k=10):
        """Unordered within-window top-k: docs where some span of
        ``window + 1`` consecutive token positions contains ALL distinct
        terms, scored like phrase_search. Brute-force over every anchor
        position — independent of the kernel's composite-key probing."""
        qt = sorted(set(terms))
        results = []
        for doc_id, toks in self.tokens.items():
            pos = {t: [i for i, x in enumerate(toks) if x == t] for t in qt}
            if any(not p for p in pos.values()):
                continue
            if not any(
                all(any(a <= p <= a + window for p in pos[t]) for t in qt)
                for t0 in qt
                for a in pos[t0]
            ):
                continue
            score = sum(self.bm25(doc_id, t) for t in qt)
            results.append((doc_id, score))
        results.sort(key=lambda r: (-r[1], r[0]))
        return results[:k]

    def snippets(self, phrase: list, context: int = 3) -> dict:
        """{doc_id: (first_pos, snippet)} for docs containing ``phrase``
        contiguously — list-slice scan, independent of the engine's
        stream-LIKE relation."""
        out = {}
        L = len(phrase)
        for doc_id, toks in self.tokens.items():
            for i in range(len(toks) - L + 1):
                if toks[i:i + L] == list(phrase):
                    lo = max(i - context, 0)
                    hi = min(i + L + context, len(toks))
                    out[doc_id] = (i, " ".join(toks[lo:hi]))
                    break
        return out

    def boolean_search(self, node, k=10, max_expansions=64,
                       minimum_should_match=0, synonyms=None,
                       synonym_blend=False):
        """Ranked-boolean oracle: brute-force tree evaluation per doc,
        scored by the BM25 sum of the tree's positive terms the doc
        contains. Prefix leaves expand to the corpus's matching terms
        (df desc, term asc, capped) and fuzzy leaves to terms within
        edit distance (distance asc, df desc, term asc, capped) —
        mirroring the engine's lexicon expansion so results are
        comparable (the distance function here is an independent
        pure-python DP, not the JVM levenshtein)."""
        from mahout_spark.index import queryparse as qp

        if isinstance(node, str):
            node = qp.parse(node)
        if synonyms:
            node = qp.expand_synonyms(node, synonyms)
        if minimum_should_match:
            node = qp.with_minimum_should_match(node, minimum_should_match)
        df_over = {}
        if synonyms and synonym_blend:
            for g in qp.synonym_groups(synonyms):
                present = [t for t in g if t in self.df]
                if len(present) > 1:
                    bdf = max(self.df[t] for t in present)
                    for t in present:
                        df_over[t] = bdf
        exp = {}
        for p in qp.prefixes(node):
            cands = sorted(
                (t for t in self.df if t.startswith(p)),
                key=lambda t: (-self.df[t], t),
            )[:max_expansions]
            exp[p] = cands
        node = qp.expand_prefixes(node, exp)
        fexp = {}
        for stem, n in qp.fuzzies(node):
            within = [
                (t, _edit_distance(t, stem))
                for t in self.df
                if abs(len(t) - len(stem)) <= n
            ]
            cands = sorted(
                ((t, d) for t, d in within if d <= n),
                key=lambda e: (e[1], -self.df[e[0]], e[0]),
            )[:max_expansions]
            fexp[stem, n] = [t for t, _ in cands]
        node = qp.expand_fuzzies(node, fexp)
        wexp = {}
        for pat in qp.wildcards(node):
            # independent matcher: fnmatch's * / ? glob semantics, not
            # the engine's regex translation
            from fnmatch import fnmatchcase

            cands = sorted(
                (t for t in self.df if fnmatchcase(t, pat)),
                key=lambda t: (-self.df[t], t),
            )[:max_expansions]
            wexp[pat] = cands
        node = qp.expand_wildcards(node, wexp)
        rexp = {}
        for pat in qp.regexps(node):
            # independent matcher: python re.fullmatch, not the engine's
            # JVM rlike anchoring
            import re as _re

            rx = _re.compile(pat)
            cands = sorted(
                (t for t in self.df if rx.fullmatch(t)),
                key=lambda t: (-self.df[t], t),
            )[:max_expansions]
            rexp[pat] = cands
        node = qp.expand_regexps(node, rexp)
        score_terms = qp.positive_terms(node)
        weights = qp.term_weights(node)

        def matches(doc_id, n):
            kind = n[0]
            if kind == "term":
                return self.tf[doc_id][n[1]] > 0
            if kind == "phrase":
                seq, window = list(n[1]), n[2]
                toks = self.tokens[doc_id]
                if window is None:
                    L = len(seq)
                    return any(
                        toks[i:i + L] == seq
                        for i in range(len(toks) - L + 1)
                    )
                qt = sorted(set(seq))
                pos = {
                    t: [i for i, x in enumerate(toks) if x == t] for t in qt
                }
                if any(not v for v in pos.values()):
                    return False
                return any(
                    all(any(a <= p <= a + window for p in pos[t]) for t in qt)
                    for t0 in qt
                    for a in pos[t0]
                )
            if kind == "boost":
                return matches(doc_id, n[1])
            if kind == "msm":
                return sum(matches(doc_id, c) for c in n[1]) >= n[2]
            if kind == "or":
                return any(matches(doc_id, c) for c in n[1])
            if kind == "and":
                return all(
                    not matches(doc_id, c[1]) if c[0] == "not"
                    else matches(doc_id, c)
                    for c in n[1]
                )
            raise ValueError(kind)

        results = []
        for doc_id in self.tokens:
            if not matches(doc_id, node):
                continue
            present = [t for t in score_terms if self.tf[doc_id][t] > 0]
            if not present:
                continue
            score = sum(
                weights.get(t, 1.0)
                * self.bm25(doc_id, t, df=df_over.get(t))
                for t in sorted(present)
            )
            results.append((doc_id, score))
        results.sort(key=lambda r: (-r[1], r[0]))
        return results[:k]

    def more_like(self, text, k=10, max_query_terms=25, min_term_freq=1,
                  min_doc_freq=2, exclude_doc_id=None):
        """More-like-this oracle: select the text's terms by the engine
        tf-idf (sqrt(tf) * (1 + ln(N/(df+1))), score desc / term asc,
        capped), then BM25 OR-search, excluding the source doc — an
        independent dict/loop replica of index/mlt.py."""
        from collections import Counter

        tfc = Counter(self._tok(text))
        scored = [
            (math.sqrt(c) * (1.0 + math.log(self.n_docs / (self.df[t] + 1.0))), t)
            for t, c in tfc.items()
            if c >= min_term_freq and self.df[t] >= min_doc_freq
        ]
        scored.sort(key=lambda e: (-e[0], e[1]))
        sel = [t for _, t in scored[:max_query_terms]]
        if not sel:
            return []
        fetch = k + 1 if exclude_doc_id is not None else k
        res = self.search(sel, k=fetch)
        if exclude_doc_id is not None:
            res = [(d, s) for d, s in res if d != exclude_doc_id][:k]
        return res

    def positions(self, doc_id, term) -> list:
        """0-based token indices of term in the doc's surviving stream."""
        return [i for i, t in enumerate(self.tokens[doc_id]) if t == term]

    def topk_terms(self, doc_id, k, min_score=None, scorer="tfidf"):
        """[(term, score)] per-doc top-k, rank by (score desc, term asc)."""
        fn = self.tfidf if scorer == "tfidf" else self.bm25
        entries = [
            (t, fn(doc_id, t))
            for t in self.tf[doc_id]
        ]
        if min_score is not None:
            entries = [(t, s) for t, s in entries if s > min_score]
        entries.sort(key=lambda e: (-e[1], e[0]))
        return entries[:k]
