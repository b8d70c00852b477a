"""Boolean query language for the fulltext index.

The reference engine exposes hardcoded call sequences only; a user of a
fulltext index expects a query STRING. This is the standard surface
(Lucene's classic parser is the public model — behavior re-derived, no
code shared):

    table AND (scan OR merge) NOT stream
    "table scan" OR prefix*
    "data merge"~8 AND window

Grammar (recursive descent, precedence NOT > AND > OR):

    query   := or_expr
    or_expr := and_expr (OR and_expr)*
    and_expr:= unary (AND? unary)*        # adjacency = implicit AND
    unary   := NOT unary | atom
    atom    := '(' or_expr ')' | '"' words '"' ('~' int)? | word'*' | word

* Operator keywords are UPPERCASE-only (``AND``/``OR``/``NOT``); the
  lowercase words stay queryable terms, as in Lucene.
* ``"a b"`` is exact adjacency (the phrase kernel); ``"a b"~w`` relaxes
  to the engine's proximity semantics — all DISTINCT quoted terms
  co-occur within a span of ``w+1`` consecutive token positions,
  unordered (so ``~1`` means adjacent in either order). ``w`` must be
  >= 1; exact phrase is the no-tilde form.
* ``word*`` expands (at execution time) to the index's matching lexicon
  terms, capped and OR-scored.
* general wildcards (Lucene's ``*`` = any sequence, ``?`` = exactly one
  character, anywhere in the word: ``*scan*``, ``te?le``, ``me*ge``)
  expand against the lexicon the same way, capped (df desc, term asc)
  and OR-scored. A trailing-``*``-only pattern stays the cheaper prefix
  leaf. Patterns with no literal character (``*``, ``?*``) are rejected
  (match-all). Unlike Lucene's default, leading wildcards are allowed —
  the lexicon scan they force is bounded by VOCABULARY size, not corpus
  size (the 100 TB answer is a permuterm/n-gram dictionary tier behind
  this same leaf).
* ``atom^F`` is a boost (Lucene's caret syntax; F > 0, fractional
  allowed): the BM25 contribution of every positive term under the
  boost is multiplied by F. Boosts attach to words (``table^3``,
  composing with fuzzy/prefix: ``mer*^2``, ``slot~1^2``), to quoted
  phrases (``"table scan"^2``), and to parenthesized groups
  (``(a OR b)^2``); nested boosts multiply. A term reached through
  several positive occurrences with different weights takes the MAX
  (the engine scores each distinct term once — see boolquery.py).
  ``^1`` is the identity and produces no node.
* ``word~`` / ``word~N`` is fuzzy matching (Lucene's tilde syntax):
  expands to the lexicon terms within Levenshtein edit distance ``N``
  (default 2, the Lucene default; max 2 — the bound every production
  engine enforces because the expansion set explodes past it). ``~0``
  is the plain term. Expansions are capped like prefixes, ordered
  (distance asc, df desc, term asc) so closer terms win the cap, and
  OR-scored by plain BM25 — this engine does NOT similarity-downweight
  fuzzy matches (Lucene does), keeping scores identical to the
  equivalent explicit OR and the relation SQL-expressible.
* Bare words are normalized by the caller-supplied ``normalize`` (default:
  the SQL-expressible simple tokenizer); a word that normalizes to
  several tokens becomes their AND (inside quotes: spliced into the
  phrase sequence).
* ``NOT`` is set-subtraction and is only meaningful against positive
  siblings: it must appear inside an AND with at least one positive
  branch. Pure-negative queries (``NOT x``, ``NOT x OR y``) are rejected
  at parse time, mirroring every production engine.
* ``field:value`` (Lucene field syntax) compiles to the index's synthetic
  tag term ``field:<lowercased raw value>`` — e.g. ``lang:Java`` becomes
  the term ``lang:java`` that code-mode builds post per document
  (operators/stats.py tag emission; the value is raw-lowercased, NOT
  tokenized, mirroring the indexer — so ``lang:C++`` reaches
  ``lang:c++``). Only WHITELISTED field names (default: ``lang``, the one
  tag family the indexer emits) get this treatment; any other ``x:y``
  word falls back to plain normalization (split on the colon), so
  URL-ish inputs keep their pre-field behavior. ``field:pre*`` composes
  with prefix expansion (lexicon startswith on the tag namespace). Like
  Lucene's classic parser, a field term SCORES (BM25 over the tf=1 tag
  posting) — it is a query leaf, not a filter API.

Node forms (plain tuples — cheap to ship into the shard kernel):

    ("term", t)
    ("phrase", (t0, t1, ...), window_or_None)
    ("prefix", p)
    ("wildcard", pattern)       # lowercased, contains * and/or ?
    ("fuzzy", stem, max_edits)
    ("boost", node, factor)
    ("and", [children...])      # children may include ("not", node)
    ("or", [children...])
    ("msm", [children...], m)   # >= m of the children must match
    ("not", node)

``msm`` is Lucene/ES minimum_should_match over a disjunction's clauses:
a doc matches when at least ``m`` of the children match. There is no
query-string syntax (ES exposes it as a request parameter, not grammar);
build it with ``with_minimum_should_match(parse(q), m)`` or pass
``minimum_should_match=m`` to the boolquery entry points. A multi-term
child (expanded prefix/fuzzy OR group, phrase) counts as ONE clause,
exactly like a Lucene BooleanClause.
"""

from __future__ import annotations

import re


def _simple_normalize(word: str) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9]+", word.lower()) if t]


#: Field names the parser maps to synthetic tag terms. ``lang`` is the
#: one tag family build_index emits (stats.term_frequencies lang_col).
DEFAULT_FIELDS = frozenset({"lang"})

#: Numeric range fields are OPT-IN per query surface: the parser cannot
#: know the corpus table's schema, so rangequery.ranged_topk derives the
#: whitelist from the docs DataFrame (numeric columns) and passes it in.
DEFAULT_RANGE_FIELDS = frozenset()

_FIELD_RE = re.compile(r"^([A-Za-z_][A-Za-z0-9_]*):(.+)$")

#: Lucene caps fuzzy edit distance at 2 (LevenshteinAutomata bound); we
#: enforce the same limit — expansion sets explode combinatorially past it.
MAX_FUZZY_EDITS = 2

_FUZZY_RE = re.compile(r"^(.+?)~(\d*)$")

_BOOST_RE = re.compile(r"^(.+)\^(\d+(?:\.\d+)?)$")
_BARE_BOOST_RE = re.compile(r"^\^(\d+(?:\.\d+)?)$")


_TOKEN_RE = re.compile(
    r'\s*(?:(?P<lpar>\()|(?P<rpar>\))|"(?P<quoted>[^"]*)"(?:~(?P<slop>\d+))?'
    r"(?:\^(?P<qboost>\d+(?:\.\d+)?))?"
    r"|/(?P<regex>(?:\\.|[^/\\\s])+)/(?:\^(?P<rboost>\d+(?:\.\d+)?))?"
    r"|(?P<rfield>[A-Za-z_][A-Za-z0-9_]*):(?P<lb>[\[{])(?P<rlo>[^\s\]}]+)"
    r"\s+TO\s+(?P<rhi>[^\s\]}]+)(?P<rb>[\]}])"
    r"|(?P<word>[^\s()\"]+))"
)


class QueryParseError(ValueError):
    pass


def _lex(q: str) -> list[tuple]:
    out, i = [], 0
    while i < len(q):
        m = _TOKEN_RE.match(q, i)
        if not m or m.end() == i:
            if q[i:].strip():
                raise QueryParseError(f"cannot tokenize query at: {q[i:]!r}")
            break
        i = m.end()
        if m.group("lpar"):
            out.append(("(",))
        elif m.group("rpar"):
            out.append((")",))
        elif m.group("quoted") is not None:
            slop = m.group("slop")
            qboost = m.group("qboost")
            out.append((
                "quote", m.group("quoted"), int(slop) if slop else None,
                float(qboost) if qboost else None,
            ))
        elif m.group("regex") is not None:
            rboost = m.group("rboost")
            out.append((
                "regex", m.group("regex"),
                float(rboost) if rboost else None,
            ))
        elif m.group("rfield") is not None:
            out.append((
                "range", m.group("rfield"), m.group("lb"),
                m.group("rlo"), m.group("rhi"), m.group("rb"),
            ))
        else:
            out.append(("word", m.group("word")))
    return out


_WILDCARD_LITERAL_RE = re.compile(r"^[a-z0-9:+.#_-]*$")


def _wildcard_atom(pattern: str, raw: str):
    """Build a ("wildcard", pattern) leaf, rejecting patterns no lexicon
    term can match usefully: every literal segment must be index-term
    characters, and at least one literal character must exist (a pure
    ``*``/``?`` pattern is match-all — rejected like Lucene's standalone
    wildcard)."""
    segments = re.split(r"[*?]", pattern)
    if not any(segments):
        raise QueryParseError(f"wildcard pattern needs a literal: {raw!r}")
    for seg in segments:
        if not _WILDCARD_LITERAL_RE.match(seg):
            raise QueryParseError(f"bad wildcard pattern: {raw!r}")
    return ("wildcard", pattern)


def wildcard_regex(pattern: str) -> str:
    """Anchored regex for a wildcard pattern (``*`` -> ``.*``, ``?`` ->
    ``.``, literals escaped) — the same translation Spark ``rlike`` and
    DuckDB ``regexp_matches`` evaluate, so engine and oracle expansions
    agree by construction."""
    parts = []
    for ch in pattern:
        if ch == "*":
            parts.append(".*")
        elif ch == "?":
            parts.append(".")
        else:
            parts.append(re.escape(ch))
    return "^" + "".join(parts) + "$"


def _regexp_atom(body: str):
    r"""Build a ("regexp", pattern) leaf (Lucene RegexpQuery analog:
    ``/pattern/`` matches WHOLE index terms — the engine anchors it).
    Unescaped whitespace cannot appear inside the slashes (the lexer
    stops the token there, so path-like words such as ``/etc NOT /usr``
    lex as ordinary words and NOT keeps its meaning; escape a literal
    space as ``\ ``). Validation: the pattern must compile under
    Python re AND avoid known Python-only constructs (``(?P`` named
    groups, ``(?(`` conditionals) — Python acceptance is NOT a subset
    of the JVM engine, so anything that still slips through surfaces
    as a clean QueryParseError when the lexicon expansion first
    evaluates it (boolquery._regexp_expansion_rows). Keep to the
    Java-and-RE2 common subset — classes, alternation, repetition —
    for oracle-parity with DuckDB regexp_matches. Index terms are
    lowercase, so patterns should be too (kept verbatim — lowercasing
    a regex would corrupt classes like [A-Z])."""
    for bad in ("(?P", "(?("):
        if bad in body:
            raise QueryParseError(
                f"bad regexp /{body}/: {bad!r} is Python-only syntax "
                "the JVM rlike engine rejects"
            )
    try:
        re.compile(body)
    except re.error as exc:
        raise QueryParseError(f"bad regexp /{body}/: {exc}") from None
    return ("regexp", body)


def _range_bound(raw: str, which: str, tok: str) -> float | None:
    """Parse one range endpoint: ``*`` is the open bound, anything else
    must be a number (numeric doc-values semantics — lexical/date ranges
    are out of scope; dates compare fine once projected to epoch
    numbers by the caller)."""
    if raw == "*":
        return None
    try:
        return float(raw)
    except ValueError:
        raise QueryParseError(
            f"range {which} bound must be a number or '*': {tok!r}"
        ) from None


class _Parser:
    def __init__(self, tokens: list, normalize, fields=DEFAULT_FIELDS,
                 range_fields=DEFAULT_RANGE_FIELDS):
        self.toks = tokens
        self.pos = 0
        self.norm = normalize
        self.fields = fields
        self.range_fields = range_fields

    def peek(self):
        return self.toks[self.pos] if self.pos < len(self.toks) else None

    def next(self):
        t = self.peek()
        self.pos += 1
        return t

    def parse(self):
        node = self.or_expr()
        if self.peek() is not None:
            raise QueryParseError(f"unexpected token: {self.peek()}")
        return node

    def or_expr(self):
        parts = [self.and_expr()]
        while self.peek() == ("word", "OR"):
            self.next()
            parts.append(self.and_expr())
        return parts[0] if len(parts) == 1 else ("or", parts)

    def and_expr(self):
        parts = [self.unary()]
        while True:
            t = self.peek()
            if t == ("word", "AND"):
                self.next()
                parts.append(self.unary())
            elif t is not None and t != ("word", "OR") and t[0] != ")":
                parts.append(self.unary())  # implicit AND
            else:
                break
        return parts[0] if len(parts) == 1 else ("and", parts)

    def unary(self):
        if self.peek() == ("word", "NOT"):
            self.next()
            return ("not", self.unary())
        return self.atom()

    def _wrap_boost(self, node, factor):
        if factor is None:
            return node
        if factor <= 0:
            raise QueryParseError(f"boost must be > 0: ^{factor:g}")
        if factor == 1.0:
            return node  # identity boost produces no node
        return ("boost", node, factor)

    def atom(self):
        t = self.next()
        if t is None:
            raise QueryParseError("unexpected end of query")
        if t[0] == "(":
            node = self.or_expr()
            if self.next() != (")",):
                raise QueryParseError("missing closing parenthesis")
            nxt = self.peek()
            if nxt is not None and nxt[0] == "word":
                bb = _BARE_BOOST_RE.match(nxt[1])
                if bb:
                    self.next()
                    return self._wrap_boost(node, float(bb.group(1)))
            return node
        if t[0] == ")":
            raise QueryParseError("unexpected ')'")
        if t[0] == "regex":
            return self._wrap_boost(_regexp_atom(t[1]), t[2])
        if t[0] == "range":
            return self._range_atom(t)
        if t[0] == "quote":
            seq = []
            for w in t[1].split():
                seq.extend(self.norm(w))
            if not seq:
                raise QueryParseError(f"empty phrase: {t[1]!r}")
            window = t[2]
            if window is not None and window < 1:
                raise QueryParseError("phrase slop must be >= 1")
            if len(seq) == 1 and window is None:
                return self._wrap_boost(("term", seq[0]), t[3])
            return self._wrap_boost(("phrase", tuple(seq), window), t[3])
        word = t[1]
        if word in ("AND", "OR", "NOT"):
            raise QueryParseError(f"operator {word} needs an operand")
        bm = _BOOST_RE.match(word)
        if bm:
            return self._wrap_boost(
                self._word_atom(bm.group(1)), float(bm.group(2))
            )
        return self._word_atom(word)

    def _range_atom(self, t):
        """Build a ("range", field, lo, hi, lo_inc, hi_inc) filter leaf
        from a lexed ``field:[lo TO hi]`` token (Lucene range syntax:
        ``[..]`` inclusive, ``{..}`` exclusive, ``*`` open). The field
        must be whitelisted via ``range_fields`` — range leaves compare
        CORPUS-TABLE column values, not index terms, so the caller that
        owns the docs DataFrame declares which columns are rangeable
        (rangequery.ranged_topk derives the set from the schema)."""
        _, field, lb, lo_raw, hi_raw, rb = t
        tok = f"{field}:{lb}{lo_raw} TO {hi_raw}{rb}"
        if field.lower() not in self.range_fields:
            raise QueryParseError(
                f"unknown range field {field!r} in {tok!r}: range syntax "
                "needs the field whitelisted via range_fields (ranged_topk "
                "derives it from the docs table's numeric columns)"
            )
        lo = _range_bound(lo_raw, "lower", tok)
        hi = _range_bound(hi_raw, "upper", tok)
        if lo is None and hi is None:
            raise QueryParseError(f"range needs at least one bound: {tok!r}")
        if lo is not None and hi is not None and lo > hi:
            raise QueryParseError(f"range lower bound exceeds upper: {tok!r}")
        nxt = self.peek()
        if nxt is not None and nxt[0] == "word" and _BARE_BOOST_RE.match(nxt[1]):
            raise QueryParseError(
                f"boost cannot apply to a range filter (filter context "
                f"never scores): {tok!r}"
            )
        return ("range", field.lower(), lo, hi, lb == "[", rb == "]")

    def _word_atom(self, word):
        fm = _FIELD_RE.match(word)
        if fm and fm.group(1).lower() in self.fields:
            # tag values are RAW-lowercased to mirror the indexer exactly
            # (stats.py: concat('lang:', lower(lang_col)) — no tokenizer
            # pass), so e.g. lang:C++ reaches the tag 'lang:c++'
            fname, rest = fm.group(1).lower(), fm.group(2)
            if _FUZZY_RE.match(rest):
                raise QueryParseError(
                    f"fuzzy (~) is not supported on field values: {word!r} "
                    "(tag terms carry the field prefix, so raw edit "
                    "distance would cross field namespaces)"
                )
            if (rest.endswith("*") and len(rest) > 1
                    and "*" not in rest[:-1]):
                return ("prefix", f"{fname}:{rest[:-1].lower()}")
            if "*" in rest or "?" in rest:
                return _wildcard_atom(f"{fname}:{rest.lower()}", word)
            return ("term", f"{fname}:{rest.lower()}")
        fz = _FUZZY_RE.match(word)
        if fz:
            stem_raw, digits = fz.group(1), fz.group(2)
            n = int(digits) if digits else MAX_FUZZY_EDITS
            if n > MAX_FUZZY_EDITS:
                raise QueryParseError(
                    f"fuzzy edit distance is capped at {MAX_FUZZY_EDITS}: "
                    f"{word!r}"
                )
            if "*" in stem_raw:
                raise QueryParseError(
                    f"fuzzy and wildcard cannot combine: {word!r}"
                )
            stem = self.norm(stem_raw)
            if len(stem) != 1:
                raise QueryParseError(f"bad fuzzy pattern: {word!r}")
            if n == 0:
                return ("term", stem[0])
            return ("fuzzy", stem[0], n)
        if (word.endswith("*") and len(word) > 1
                and "*" not in word[:-1] and "?" not in word):
            stem = self.norm(word[:-1])
            if len(stem) != 1:
                raise QueryParseError(f"bad prefix pattern: {word!r}")
            return ("prefix", stem[0])
        if "*" in word or "?" in word:
            return _wildcard_atom(word.lower(), word)
        toks = self.norm(word)
        if not toks:
            raise QueryParseError(f"word normalizes to nothing: {word!r}")
        if len(toks) == 1:
            return ("term", toks[0])
        return ("and", [("term", x) for x in toks])


def parse(query: str, normalize=_simple_normalize, fields=DEFAULT_FIELDS,
          range_fields=DEFAULT_RANGE_FIELDS):
    """Parse a query string into a validated node tree. ``fields`` is the
    whitelist of ``field:value`` names mapped to synthetic tag terms;
    pass ``frozenset()`` to disable field syntax entirely. ``range_fields``
    whitelists numeric corpus columns for ``field:[lo TO hi]`` range
    filters (empty by default — rangequery.ranged_topk passes the docs
    table's numeric columns)."""
    tokens = _lex(query)
    if not tokens:
        raise QueryParseError("empty query")
    node = _Parser(tokens, normalize, fields, range_fields).parse()
    validate(node)
    return node


def validate(node) -> None:
    """Reject trees no engine can answer without the doc universe: NOT at
    the top level, under OR, or in an AND with no positive sibling.
    Range leaves are FILTER CONTEXT and must sit in top-conjunct
    position (the root, a conjunct of the root AND — nested ANDs are
    associative so they keep the property — or directly under such a
    conjunct's NOT); under OR/msm/boost the filter semantics are
    undefined (an un-scored disjunct would surface score-0 rows), so
    those positions are rejected loudly."""

    def rec(n, ctx, top):
        kind = n[0]
        if kind == "range":
            if not top:
                raise QueryParseError(
                    "range filters are filter context: they may only "
                    "appear as top-level conjuncts (optionally under "
                    "NOT), never inside OR / minimum_should_match / "
                    "boost / phrases"
                )
        elif kind == "not":
            if ctx != "and":
                raise QueryParseError(
                    "NOT is only supported inside an AND with at least "
                    "one positive branch"
                )
            rec(n[1], "not", top)
        elif kind == "boost":
            if n[1][0] == "not":
                raise QueryParseError(
                    "boost cannot apply to a NOT expression (negative "
                    "branches never score)"
                )
            if not (isinstance(n[2], float) and n[2] > 0):
                raise QueryParseError(f"boost must be a positive float: {n[2]!r}")
            rec(n[1], ctx, False)
        elif kind == "and":
            children = n[1]
            if all(c[0] == "not" for c in children):
                raise QueryParseError(
                    "AND of only NOT branches is a pure-negative query"
                )
            for c in children:
                rec(c, "and", top)
        elif kind == "or":
            for c in n[1]:
                rec(c, "or", False)
        elif kind == "msm":
            children, m = n[1], n[2]
            if not children:
                raise QueryParseError("minimum_should_match over no clauses")
            if not (isinstance(m, int) and 1 <= m <= len(children)):
                raise QueryParseError(
                    f"minimum_should_match must be an int in "
                    f"[1, {len(children)}]: {m!r}"
                )
            for c in children:
                if c[0] == "not":
                    raise QueryParseError(
                        "NOT cannot be a minimum_should_match clause "
                        "(negative branches never count toward m)"
                    )
                rec(c, "or", False)
        elif kind not in ("term", "phrase", "prefix", "wildcard",
                          "fuzzy", "regexp"):
            raise QueryParseError(f"unknown node kind: {kind!r}")

    rec(node, "top", True)


def has_ranges(node) -> bool:
    """True when the tree carries any range filter leaf — the guard the
    index-only entry points use to route callers to rangequery (range
    leaves compare corpus-table columns the index does not store)."""

    def rec(n):
        if n[0] == "range":
            return True
        if n[0] in ("not", "boost"):
            return rec(n[1])
        if n[0] in ("and", "or", "msm"):
            return any(rec(c) for c in n[1])
        return False

    return rec(node)


def split_range_filters(node):
    """Split a validated tree into ``(residual, specs)``: the boolean
    tree with every range conjunct removed (None when nothing remains),
    and the list of ``(field, lo, hi, lo_inc, hi_inc, negated)`` range
    specs. Validation already pinned ranges to top-conjunct position,
    so stripping them is exact — the residual matches iff the original
    would, restricted to docs passing every range filter."""
    specs: list = []

    def strip(n, neg):
        if n[0] == "range":
            specs.append((n[1], n[2], n[3], n[4], n[5], neg))
            return None
        if n[0] == "not":
            child = strip(n[1], not neg)
            return None if child is None else ("not", child)
        if n[0] == "and":
            kept = [c2 for c in n[1] if (c2 := strip(c, neg)) is not None]
            if not kept:
                return None
            return kept[0] if len(kept) == 1 else ("and", kept)
        return n

    residual = strip(node, False)
    return residual, specs


def with_minimum_should_match(node, m: int):
    """Wrap a top-level disjunction with Lucene/ES minimum_should_match
    semantics: at least ``m`` of its clauses must match (each clause is
    one child — an expanded prefix/fuzzy group or phrase counts once).
    ``m <= 1`` is the identity (plain OR already requires one clause);
    ``m`` above the clause count is rejected rather than silently
    matching nothing. The node must be an OR (possibly under a boost) —
    the parameter is meaningless for a conjunction."""
    if m is None or m <= 1:
        return node
    if node[0] == "boost":
        return ("boost", with_minimum_should_match(node[1], m), node[2])
    if node[0] != "or":
        raise QueryParseError(
            "minimum_should_match needs a top-level OR query, got "
            f"{node[0]!r}"
        )
    if m > len(node[1]):
        raise QueryParseError(
            f"minimum_should_match={m} exceeds the {len(node[1])} clauses"
        )
    return ("msm", node[1], int(m))


def all_terms(node) -> list[str]:
    """Every concrete term in the tree (negated included; prefixes are
    not terms until expanded) — sorted, distinct."""
    out: set = set()

    def rec(n):
        if n[0] == "term":
            out.add(n[1])
        elif n[0] == "phrase":
            out.update(n[1])
        elif n[0] in ("not", "boost"):
            rec(n[1])
        elif n[0] in ("and", "or", "msm"):
            for c in n[1]:
                rec(c)

    rec(node)
    return sorted(out)


def positive_terms(node) -> list[str]:
    """Terms NOT under any NOT — the BM25 scoring set — sorted, distinct."""
    out: set = set()

    def rec(n, neg):
        if n[0] == "term":
            if not neg:
                out.add(n[1])
        elif n[0] == "phrase":
            if not neg:
                out.update(n[1])
        elif n[0] == "not":
            rec(n[1], True)
        elif n[0] == "boost":
            rec(n[1], neg)
        elif n[0] in ("and", "or", "msm"):
            for c in n[1]:
                rec(c, neg)

    rec(node, False)
    return sorted(out)


def term_weights(node) -> dict:
    """Boost weights for the POSITIVE terms: the product of enclosing
    boost factors along each occurrence path; a term reached through
    several positive occurrences takes the MAX (the kernel scores each
    distinct term once — boolquery folds these into the idf table).
    Unboosted terms are absent (weight 1.0 implied)."""
    out: dict = {}

    def rec(n, w, neg):
        k = n[0]
        if k == "term":
            if not neg:
                out[n[1]] = max(out.get(n[1], 0.0), w)
        elif k == "phrase":
            if not neg:
                for t in set(n[1]):
                    out[t] = max(out.get(t, 0.0), w)
        elif k == "boost":
            rec(n[1], w * n[2], neg)
        elif k == "not":
            rec(n[1], w, True)
        elif k in ("and", "or", "msm"):
            for c in n[1]:
                rec(c, w, neg)

    rec(node, 1.0, False)
    return {t: w for t, w in out.items() if w != 1.0}


def wildcards(node) -> list[str]:
    """Distinct wildcard patterns in the tree (sorted)."""
    out: set = set()

    def rec(n):
        if n[0] == "wildcard":
            out.add(n[1])
        elif n[0] in ("not", "boost"):
            rec(n[1])
        elif n[0] in ("and", "or", "msm"):
            for c in n[1]:
                rec(c)

    rec(node)
    return sorted(out)


def expand_wildcards(node, expansions: dict):
    """Replace wildcard leaves with the OR of their lexicon expansion
    terms (one clause, like prefix/fuzzy groups). Unmatched patterns
    become empty ORs (match nothing)."""
    kind = node[0]
    if kind == "wildcard":
        terms = expansions.get(node[1], [])
        if len(terms) == 1:
            return ("term", terms[0])
        return ("or", [("term", t) for t in terms])
    if kind == "not":
        return ("not", expand_wildcards(node[1], expansions))
    if kind == "boost":
        return ("boost", expand_wildcards(node[1], expansions), node[2])
    if kind == "msm":
        return ("msm", [expand_wildcards(c, expansions) for c in node[1]],
                node[2])
    if kind in ("and", "or"):
        return (kind, [expand_wildcards(c, expansions) for c in node[1]])
    return node


def regexps(node) -> list[str]:
    """Distinct regexp patterns in the tree (sorted)."""
    out: set = set()

    def rec(n):
        if n[0] == "regexp":
            out.add(n[1])
        elif n[0] in ("not", "boost"):
            rec(n[1])
        elif n[0] in ("and", "or", "msm"):
            for c in n[1]:
                rec(c)

    rec(node)
    return sorted(out)


def expand_regexps(node, expansions: dict):
    """Replace regexp leaves with the OR of their lexicon expansion
    terms (one clause, like prefix/fuzzy/wildcard groups). Unmatched
    patterns become empty ORs (match nothing)."""
    kind = node[0]
    if kind == "regexp":
        terms = expansions.get(node[1], [])
        if len(terms) == 1:
            return ("term", terms[0])
        return ("or", [("term", t) for t in terms])
    if kind == "not":
        return ("not", expand_regexps(node[1], expansions))
    if kind == "boost":
        return ("boost", expand_regexps(node[1], expansions), node[2])
    if kind == "msm":
        return ("msm", [expand_regexps(c, expansions) for c in node[1]],
                node[2])
    if kind in ("and", "or"):
        return (kind, [expand_regexps(c, expansions) for c in node[1]])
    return node


def expand_synonyms(node, synonyms: dict, normalize=_simple_normalize):
    """Query-time synonym expansion (Lucene SynonymQuery analog): every
    TERM leaf whose token appears as a key becomes the OR of the group
    (key first, then its synonyms, order preserved) — one clause for
    minimum_should_match accounting, and under NOT the whole group is
    excluded (``NOT fast`` with fast->quick excludes quick matches too,
    the standard filter semantics). Phrase tokens are NOT rewritten
    (positional synonyms need a graph analyzer — out of scope,
    documented). Keys and values are normalized with the SAME tokenizer
    as query words; each must normalize to exactly one token.

    Scoring: by default each group member scores with its own idf (the
    QueryParser expand=true model). boolquery's ``synonym_blend=True``
    switches to Lucene SynonymQuery df-blending — every member scores
    with the group's MAX df — so a rare synonym cannot dominate its
    common head (see boolquery._blended_idf)."""
    norm: dict[str, list[str]] = {}
    for key, vals in synonyms.items():
        kt = normalize(key)
        if len(kt) != 1:
            raise QueryParseError(f"synonym key must be one token: {key!r}")
        out = []
        for v in ([vals] if isinstance(vals, str) else list(vals)):
            vt = normalize(v)
            if len(vt) != 1:
                raise QueryParseError(
                    f"synonym value must be one token: {v!r}"
                )
            if vt[0] != kt[0] and vt[0] not in out:
                out.append(vt[0])
        if out:
            norm[kt[0]] = out

    def rec(n):
        kind = n[0]
        if kind == "term":
            syns = norm.get(n[1])
            if syns:
                return ("or", [("term", n[1])]
                        + [("term", t) for t in syns])
            return n
        if kind == "not":
            return ("not", rec(n[1]))
        if kind == "boost":
            return ("boost", rec(n[1]), n[2])
        if kind == "msm":
            return ("msm", [rec(c) for c in n[1]], n[2])
        if kind in ("and", "or"):
            return (kind, [rec(c) for c in n[1]])
        return n

    return rec(node) if norm else node


def synonym_groups(synonyms: dict, normalize=_simple_normalize) -> list:
    """Normalized synonym groups as term lists (key first) — the unit
    boolquery's df-blending operates over."""
    groups = []
    for key, vals in synonyms.items():
        kt = normalize(key)
        if len(kt) != 1:
            raise QueryParseError(f"synonym key must be one token: {key!r}")
        g = [kt[0]]
        for v in ([vals] if isinstance(vals, str) else list(vals)):
            vt = normalize(v)
            if len(vt) == 1 and vt[0] not in g:
                g.append(vt[0])
        if len(g) > 1:
            groups.append(g)
    return groups


def prefixes(node) -> list[str]:
    out: set = set()

    def rec(n):
        if n[0] == "prefix":
            out.add(n[1])
        elif n[0] in ("not", "boost"):
            rec(n[1])
        elif n[0] in ("and", "or", "msm"):
            for c in n[1]:
                rec(c)

    rec(node)
    return sorted(out)


def fuzzies(node) -> list[tuple]:
    """Every ("fuzzy", stem, n) leaf as (stem, n) — sorted, distinct."""
    out: set = set()

    def rec(n):
        if n[0] == "fuzzy":
            out.add((n[1], n[2]))
        elif n[0] in ("not", "boost"):
            rec(n[1])
        elif n[0] in ("and", "or", "msm"):
            for c in n[1]:
                rec(c)

    rec(node)
    return sorted(out)


def expand_fuzzies(node, expansions: dict):
    """Replace every ("fuzzy", stem, n) with the OR of its expansion
    terms, keyed by (stem, n) — the fuzzy analog of expand_prefixes
    (("or", []) when nothing is within distance)."""
    kind = node[0]
    if kind == "fuzzy":
        terms = expansions.get((node[1], node[2]), [])
        if len(terms) == 1:
            return ("term", terms[0])
        return ("or", [("term", t) for t in terms])
    if kind == "not":
        return ("not", expand_fuzzies(node[1], expansions))
    if kind == "boost":
        return ("boost", expand_fuzzies(node[1], expansions), node[2])
    if kind == "msm":
        return ("msm", [expand_fuzzies(c, expansions) for c in node[1]],
                node[2])
    if kind in ("and", "or"):
        return (kind, [expand_fuzzies(c, expansions) for c in node[1]])
    return node


def has_phrase(node) -> bool:
    if node[0] == "phrase":
        return True
    if node[0] in ("not", "boost"):
        return has_phrase(node[1])
    if node[0] in ("and", "or", "msm"):
        return any(has_phrase(c) for c in node[1])
    return False


def expand_prefixes(node, expansions: dict):
    """Replace every ("prefix", p) with the OR of its expansion terms
    (("or", []) when nothing matched — evaluates to the empty set)."""
    kind = node[0]
    if kind == "prefix":
        terms = expansions.get(node[1], [])
        if len(terms) == 1:
            return ("term", terms[0])
        return ("or", [("term", t) for t in terms])
    if kind == "not":
        return ("not", expand_prefixes(node[1], expansions))
    if kind == "boost":
        return ("boost", expand_prefixes(node[1], expansions), node[2])
    if kind == "msm":
        return ("msm", [expand_prefixes(c, expansions) for c in node[1]],
                node[2])
    if kind in ("and", "or"):
        return (kind, [expand_prefixes(c, expansions) for c in node[1]])
    return node


# --------------------------------------------------------------------------
# search templates (X119)
# --------------------------------------------------------------------------

_TPL_VAR = __import__("re").compile(r"\{\{\s*([A-Za-z_][A-Za-z0-9_]*)\s*\}\}")
#: characters a substituted value may contain: terms, phrases (spaces),
#: wildcards and fuzzy suffixes — NOT quotes or grouping.
_TPL_SAFE = __import__("re").compile(r"^[A-Za-z0-9 *?.~\-]+$")


def render_template(template: str, params: dict) -> str:
    """The ES search-template model (mustache ``{{param}}`` holes in a
    query string), with the injection guard ES leaves to the caller:
    substituted values may be terms/phrases/wildcard patterns but NEVER
    syntax — quotes, parentheses, and the operator words AND/OR/NOT are
    rejected, so a hostile parameter cannot restructure the query (the
    SQL-placeholder discipline applied to the query language). Strict
    by design where ES is lenient: a missing parameter raises (ES
    renders an empty string — a silently broader query), and unused
    parameters raise (they are almost always a caller typo)."""
    used = set()

    def _sub(m):
        name = m.group(1)
        if name not in params:
            raise KeyError(f"missing template parameter: {name!r}")
        v = str(params[name])
        if not _TPL_SAFE.fullmatch(v):
            raise ValueError(
                f"unsafe template value for {name!r}: {v!r}")
        if any(t in ("AND", "OR", "NOT") for t in v.split()):
            raise ValueError(
                f"operator word in template value for {name!r}: {v!r}")
        used.add(name)
        return v

    out = _TPL_VAR.sub(_sub, template)
    unused = sorted(set(params) - used)
    if unused:
        raise ValueError(f"unused template parameters: {unused}")
    if "{{" in out or "}}" in out:
        raise ValueError(f"unresolved template holes in: {out!r}")
    return out
