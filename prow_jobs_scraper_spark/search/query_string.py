"""ES ``query_string`` / ``simple_query_string`` -> bool-query desugaring.

After ``match``/``bool``, the query-string syntaxes are the most common
ES entry points for human-typed queries (the reference's users hit them
from Kibana search bars and API callers alike; the reference itself
builds its DSL programmatically — src/jobsautoreport/query.py — so this
is query-surface parity, not a reference port). Everything the grammar
needs already exists in the engine: the parser here ONLY desugars the
string into the engine's bool/match/match_phrase JSON grammar
(search/dsl.py), so every executor (naive, indexed, pruned, _msearch,
aggs) and every bool context supports it with zero new execution code.

Supported grammar (the practical subset; Lucene classic QueryParser /
ES simple_query_string docs):

``query_string``::

    group := item (op? item)*            -- one parenthesis scope
    op    := AND | '&&' | OR | '||'      -- absent = default_operator
    item  := (NOT | '-' | '!')* atom
    atom  := '(' group ')' | [field ':'] ( word
                                          | '"' phrase '"' ['~' N]
                                          | '(' group ')' )

``simple_query_string`` is the same machine with different lexemes:
``|`` = OR, ``+`` = AND, prefix ``-`` = negation, no NOT/&&/! keywords,
no ``field:`` override (ES: fields come only from the ``fields``
option).

Semantics (Lucene-FLAT negation, precedence-folded positives):

- negated items are extracted to their GROUP's ``must_not`` — the
  Lucene classic / SimpleQueryParser behaviour: ``a AND b -c`` excludes
  c; ``foo bar -baz`` with default OR means (foo OR bar) AND NOT baz,
  NOT "foo OR bar OR (not baz)".
- positive items fold with precedence: AND binds tighter than OR;
  implicit adjacency (``a b``) joins at the ``default_operator`` level
  (ES default ``or``).
- a word desugars to ``{"match": {field: {"query": w, "operator":
  default_operator}}}``; a quoted phrase to ``match_phrase`` with
  optional ``"~N"`` slop (the round-5 sloppy-phrase rule).
- ``field:word``, ``field:"phrase"`` and ``field:(...)`` override the
  default field for that atom/group (``query_string`` only). The
  compressed-index executors accept only the indexed text field and
  fail loud otherwise (search/dsl.py ``_require_indexed_field``).

Fail-loud (DslError), never silently divergent: fuzzy/slop-on-word
``~``, wildcards ``* ?``, ranges ``[ ] { }``, boosts ``^``, regex
``/``, escapes ``\\``, empty/unbalanced input. ES's
``simple_query_string`` would swallow invalid syntax as literal text —
the engine deviates to fail-loud on those characters (documented), the
same policy as every other out-of-grammar option.
"""

from __future__ import annotations

import re as _re


class _Tok:
    __slots__ = ("kind", "val", "slop")

    def __init__(self, kind: str, val: str = "", slop: int = 0):
        self.kind, self.val, self.slop = kind, val, slop

    def __repr__(self):  # pragma: no cover - debug aid
        return f"_Tok({self.kind}, {self.val!r})"


_FORBIDDEN = set("*?[]{}^/\\~")  # ~ = fuzzy on a word; phrase slop
# ("..."~N) is consumed by the phrase branch before this set applies
_WORD_END = set(' \t\n()"')


def _err(msg: str):
    from prow_jobs_scraper_spark.search.dsl import DslError  # noqa: PLC0415
    raise DslError(msg)


def _lex(s: str, simple: bool) -> list[_Tok]:
    toks: list[_Tok] = []
    i, n = 0, len(s)
    while i < n:
        ch = s[i]
        if ch.isspace():
            i += 1
            continue
        if ch == "(":
            toks.append(_Tok("lparen")); i += 1; continue
        if ch == ")":
            toks.append(_Tok("rparen")); i += 1; continue
        if ch == '"':
            j = s.find('"', i + 1)
            if j < 0:
                _err("unbalanced quote in query string")
            phrase = s[i + 1:j]
            i = j + 1
            slop = 0
            if i < n and s[i] == "~":  # "..."~N sloppy phrase
                m = _re.match(r"~(\d+)", s[i:])
                if not m:
                    _err("phrase slop must be ~<int>")
                slop = int(m.group(1))
                i += m.end()
            toks.append(_Tok("phrase", phrase, slop))
            continue
        if not simple and ch == "!":
            toks.append(_Tok("not")); i += 1; continue
        if ch == "-":
            toks.append(_Tok("not")); i += 1; continue
        if ch == "+":
            if simple:
                toks.append(_Tok("and")); i += 1; continue
            # Lucene '+term' makes one term REQUIRED inside an otherwise
            # optional disjunction — not expressible by this desugar
            # without per-term occur flags; fail loud (write `a AND b`)
            _err("'+' (required term) is not supported in query_string; "
                 "use AND")
        if simple and ch == "|":
            toks.append(_Tok("or")); i += 1; continue
        if not simple and s.startswith("&&", i):
            toks.append(_Tok("and")); i += 2; continue
        if not simple and s.startswith("||", i):
            toks.append(_Tok("or")); i += 2; continue
        if ch in _FORBIDDEN:
            _err(f"query-string operator {ch!r} not supported "
                 "(fuzzy/wildcard/range/boost/regex/escape are "
                 "out-of-grammar)")
        # bare word (may carry a field: prefix in query_string mode)
        j = i
        while j < n and s[j] not in _WORD_END:
            if s[j] in _FORBIDDEN or (simple and s[j] in "+|"):
                break
            j += 1
        word = s[i:j]
        i = j
        if i < n and s[i] in _FORBIDDEN:
            _err(f"query-string operator {s[i]!r} not supported "
                 "(fuzzy/wildcard/range/boost/regex/escape are "
                 "out-of-grammar)")
        if not simple:
            if word == "AND":
                toks.append(_Tok("and")); continue
            if word == "OR":
                toks.append(_Tok("or")); continue
            if word == "NOT":
                toks.append(_Tok("not")); continue
            if ":" in word:
                fld, rest = word.split(":", 1)
                if not fld:
                    _err("empty field name before ':'")
                toks.append(_Tok("field", fld))
                if rest:
                    toks.append(_Tok("word", rest))
                continue
        elif ":" in word:
            # ES simple_query_string has no field syntax — ':' would be
            # analyzed away silently; deviate to fail-loud
            _err("simple_query_string takes no field: syntax "
                 "(use the fields option)")
        if word:
            toks.append(_Tok("word", word))
    return toks


# AST: ("or"|"and", [children]) | ("leaf", clause_dict) | a built dict
# (groups build their bool dict inline so negations attach flat).


class _Parser:
    """Group-based parser with Lucene-FLAT negation semantics: within
    one parenthesis scope, ``-x``/``NOT x`` clauses are extracted to the
    GROUP's must_not (``a AND b -c`` excludes c; ``foo bar -baz`` with
    default OR = (foo OR bar) AND NOT baz — the Lucene classic /
    SimpleQueryParser behaviour), and the positive clauses fold with
    precedence: AND binds tighter than OR, implicit adjacency joins at
    the default_operator level."""

    def __init__(self, toks: list[_Tok], field: str, default_op: str):
        self.toks, self.i = toks, 0
        self.field, self.default_op = field, default_op

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def take(self):
        t = self.peek()
        self.i += 1
        return t

    def parse(self) -> dict:
        out = self.group(top=True)
        if self.peek() is not None:
            _err(f"unexpected {self.peek().kind} in query string")
        return out

    def group(self, top: bool = False) -> dict:
        items: list[tuple[str, bool, dict]] = []  # (op_before, neg, node)
        pending: str | None = None
        while True:
            t = self.peek()
            if t is None or t.kind == "rparen":
                break
            if t.kind in ("and", "or"):
                if pending is not None or not items:
                    _err("query string has a dangling operator")
                pending = t.kind
                self.take()
                continue
            neg = False
            while self.peek() and self.peek().kind == "not":
                neg = not neg
                self.take()
            node = self.atom()
            items.append((pending or "implicit", neg, node))
            pending = None
        if pending is not None:
            _err("query string ends with an operator")
        if not items:
            _err("empty query-string group")
        return self.build(items)

    def atom(self) -> dict:
        t = self.take()
        if t is None:
            _err("query string ends with an operator")
        if t.kind == "lparen":
            node = self.group()
            nxt = self.take()
            if nxt is None or nxt.kind != "rparen":
                _err("unbalanced parenthesis in query string")
            return node
        if t.kind == "field":
            saved = self.field
            self.field = t.val
            try:
                nxt = self.peek()
                if nxt is None:
                    _err(f"field '{t.val}:' needs a value")
                if nxt.kind == "lparen":
                    return self.atom()
                if nxt.kind in ("word", "phrase"):
                    return self.leaf(self.take())
                _err(f"field '{t.val}:' needs a value")
            finally:
                self.field = saved
        if t.kind in ("word", "phrase"):
            return self.leaf(t)
        _err(f"unexpected {t.kind} in query string")

    def leaf(self, t: _Tok) -> dict:
        if t.kind == "phrase":
            body = {"query": t.val}
            if t.slop:
                body["slop"] = t.slop
            return {"match_phrase": {self.field: body}}
        return {"match": {self.field: {
            "query": t.val, "operator": self.default_op}}}

    def build(self, items) -> dict:
        negs = [n for _, neg, n in items if neg]
        pos = [(op, n) for op, neg, n in items if not neg]
        body: dict = {}
        if pos:
            # implicit adjacency -> the default operator's level
            runs: list[list[dict]] = [[pos[0][1]]]
            for op, n in pos[1:]:
                if op == "implicit":
                    op = self.default_op
                if op == "or":
                    runs.append([n])
                else:
                    runs[-1].append(n)
            folded = [r[0] if len(r) == 1 else {"bool": {"must": r}}
                      for r in runs]
            if len(folded) == 1:
                one = folded[0]
                if "bool" in one and not negs:
                    return one
                if "bool" in one:
                    body.update(one["bool"])
                else:
                    body["must"] = [one]
            else:
                body["should"] = folded
                body["minimum_should_match"] = 1
        if negs:
            body.setdefault("must_not", [])
            body["must_not"].extend(negs)
        return {"bool": body}


def parse_query_string(body: dict, simple: bool = False) -> dict:
    """``{"query": str, "default_field"/"fields", "default_operator"}``
    -> the equivalent bool-query dict (the engine's existing grammar).
    Raises DslError on out-of-grammar syntax or options."""
    if not isinstance(body, dict):
        _err("query_string body must be a dict")
    name = "simple_query_string" if simple else "query_string"
    allowed = {"query", "default_operator", "fields"}
    if not simple:
        allowed.add("default_field")
    unknown = set(body) - allowed
    if unknown:
        _err(f"unsupported {name} options {sorted(unknown)}")
    q = body.get("query")
    if not isinstance(q, str) or not q.strip():
        _err(f"{name} needs non-empty query text")
    op = body.get("default_operator", "or")
    if not isinstance(op, str) or op.lower() not in ("and", "or"):
        _err(f"default_operator must be and/or, got {op!r}")
    op = op.lower()
    fields = body.get("fields")
    field = body.get("default_field", "text") if not simple else "text"
    if fields is not None:
        if (not isinstance(fields, list) or len(fields) != 1
                or not isinstance(fields[0], str)):
            _err(f"{name} supports exactly one entry in fields")
        if "^" in fields[0]:
            _err("per-field boosts (field^n) are not supported")
        field = fields[0]
    toks = _lex(q, simple)
    if not toks:
        _err(f"{name} has no query terms")
    out = _Parser(toks, field, op).parse()
    if "bool" not in out:  # single leaf
        out = {"bool": {"must": [out]}}
    return out
