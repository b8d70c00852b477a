"""Tokenizer — the engine's core "UDF" (SURVEY.md §2.3, T1-T4).

Reproduces the reference's Lucene analyzer chain
(mahout-tfidf/src/main/java/com/technobium/MahoutTermFinderMwk.java:286-307):

    StandardTokenizer -> StandardFilter -> EnglishPossessiveFilter
    -> LowerCaseFilter -> StopFilter(665 words) -> PorterStemFilter
    [-> numeric-token filter, cluster variant only:
     MahoutTermFinderMwkSnptRefactoredCluster.java:688-704]

and extends it with the code-aware behavior the north star requires
(camelCase / snake_case splitting, language tagging — BASELINE.json).

Tokenization rule (UAX#29-flavored, matching the golden token dump at
report_clusters_snippets.txt:9-12): a token is a run of ``[A-Za-z0-9_]``
optionally joined by single ``.`` or ``'`` characters that have an
alphanumeric on both sides. This keeps ``www.yelp.com``, ``find_desc``,
``3.0``, ``web.xml``, ``doesn't`` whole while splitting on ``-``, ``/``,
``?``, ``=``, ``&`` etc.

All hot-path entry points are vectorized pandas UDFs (Arrow batches); the
per-token work is memoized over the batch vocabulary (Zipf makes the
distinct-token set tiny relative to the stream).
"""

from __future__ import annotations

import re

import pandas as pd

from mahout_spark.porter import MemoStemmer
from mahout_spark.stopwords import STOPWORDS

_TOKEN_RE = re.compile(r"[A-Za-z0-9_]+(?:['.][A-Za-z0-9_]+)*")
_NUMERIC_RE = re.compile(r"^[0-9.,]+$")
# camelCase hump / letter<->digit boundaries, for code-aware sub-token split
_CAMEL_RE = re.compile(
    r"(?<=[a-z0-9])(?=[A-Z])|(?<=[A-Z])(?=[A-Z][a-z])|(?<=[A-Za-z])(?=[0-9])|(?<=[0-9])(?=[A-Za-z])"
)
_SUBSPLIT_RE = re.compile(r"[._']")


def _strip_possessive(tok: str) -> str:
    """EnglishPossessiveFilter: drop a trailing ``'s`` (case handled later
    because the reference applies it before lowercasing; ASCII corpus makes
    the order immaterial except for ``'S``, which we accept too)."""
    if len(tok) > 2 and tok[-2] == "'" and tok[-1] in "sS":
        return tok[:-2]
    return tok


def tokenize_text(
    content: str,
    *,
    stem: bool = True,
    stop: bool = True,
    filter_numeric: bool = False,
    stemmer: MemoStemmer | None = None,
) -> list[str]:
    """Reference-faithful analyzer chain over one document.

    Returns the token stream in document order (duplicates preserved) —
    the Spark analog of the ``tokenized-documents`` StringTuple stage.
    """
    st = stemmer or MemoStemmer()
    out: list[str] = []
    for m in _TOKEN_RE.finditer(content):
        tok = _strip_possessive(m.group()).lower()
        if not tok:
            continue
        if filter_numeric and _NUMERIC_RE.match(tok):
            continue
        if stop and tok in STOPWORDS:
            continue
        if stem:
            tok = st(tok)
        if tok:
            out.append(tok)
    return out


def tokenize_code(
    content: str,
    *,
    stem: bool = False,
    stop: bool = False,
    filter_numeric: bool = True,
    emit_compound: bool = True,
    stemmer: MemoStemmer | None = None,
) -> list[str]:
    """Code-aware tokenizer (north-star T4): every base token is emitted
    (optionally) as the whole compound plus its camelCase / snake_case /
    dotted sub-tokens, lowercased. ``getUserName`` -> ``getusername, get,
    user, name``; ``find_desc`` -> ``find_desc, find, desc``.

    Stemming defaults OFF for code (identifiers are not English), stopword
    filtering applies to sub-tokens only when they are pure words.
    """
    st = stemmer or MemoStemmer()
    out: list[str] = []
    for m in _TOKEN_RE.finditer(content):
        raw = _strip_possessive(m.group())
        lower = raw.lower()
        parts: list[str] = []
        for piece in _SUBSPLIT_RE.split(raw):
            if not piece:
                continue
            parts.extend(p for p in _CAMEL_RE.split(piece) if p)
        compound_is_simple = len(parts) <= 1
        if emit_compound and not compound_is_simple:
            if not (filter_numeric and _NUMERIC_RE.match(lower)):
                out.append(lower)
        for p in parts:
            tok = p.lower()
            if filter_numeric and _NUMERIC_RE.match(tok):
                continue
            if stop and tok in STOPWORDS:
                continue
            if stem:
                tok = st(tok)
            if tok:
                out.append(tok)
    return out


def count_terms(tokens: list[str]) -> dict[str, int]:
    """Doc-local TF map. Doing this inside the UDF (before explode) is a
    deliberate scale choice: the shuffle then carries one row per distinct
    (doc, term) instead of one per token occurrence."""
    tf: dict[str, int] = {}
    for t in tokens:
        tf[t] = tf.get(t, 0) + 1
    return tf


# --------------------------------------------------------------------------
# pandas (Arrow) UDF batch kernels — shared by the Spark wrappers in
# mahout_spark/functions/__init__.py. Each takes/returns pd.Series.
# --------------------------------------------------------------------------

def tokens_batch(
    content: pd.Series,
    *,
    mode: str = "text",
    stem: bool | None = None,
    stop: bool | None = None,
    filter_numeric: bool | None = None,
) -> pd.Series:
    """content -> list[str] tokens, one shared memo-stemmer per batch."""
    st = MemoStemmer()
    if mode == "text":
        do_stem = True if stem is None else stem
        do_stop = True if stop is None else stop
        do_num = False if filter_numeric is None else filter_numeric
        fn = lambda c: tokenize_text(
            c or "", stem=do_stem, stop=do_stop, filter_numeric=do_num, stemmer=st
        )
    elif mode == "code":
        do_stem = False if stem is None else stem
        do_stop = False if stop is None else stop
        do_num = True if filter_numeric is None else filter_numeric
        fn = lambda c: tokenize_code(
            c or "", stem=do_stem, stop=do_stop, filter_numeric=do_num, stemmer=st
        )
    else:
        raise ValueError(f"unknown tokenizer mode: {mode}")
    return content.map(fn)


def tf_map_batch(content: pd.Series, **kw) -> pd.Series:
    """content -> {term: tf} map (doc-local combine; see count_terms)."""
    return tokens_batch(content, **kw).map(count_terms)
