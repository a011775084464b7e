"""Lucene-syntax query-string parser (SURVEY.md Q6).

Scope is pinned to the forms the reference actually emits/translates
(`packages/.../SpacesReaderClient.ts:134-262` and
`packages/.../elasticsearch-reader-api/utils.ts:44-110`):

    term                      bare term (default field)
    field:term                field-qualified term
    field:pre*  /  fi?ld      wildcard (* and ?)
    field:/regex/             regexp
    field:[A TO B}            range, [ ] inclusive, { } exclusive
    field:>=X  >X  <=X  <X    open ranges
    "a b"                     phrase
    term~  /  term~1          fuzzy (Lucene default 2 edits)
    term^2  /  "a b"^1.5      boost
    _exists_:field            field-has-value
    +clause  /  -clause       required / prohibited modifiers
    a AND b, a OR b, NOT a    boolean (also &&, ||, !)
    (...)                     grouping

Default operator is OR (ES query_string default). Produces a small AST
consumed by query.planner.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field as dfield


# ---- AST -------------------------------------------------------------
@dataclass(frozen=True)
class Term:
    field: str | None
    value: str


@dataclass(frozen=True)
class Phrase:
    field: str | None
    text: str
    # Lucene phrase slop (`"a b"~N`): 0 = exact adjacency
    slop: int = 0


@dataclass(frozen=True)
class Wildcard:
    field: str | None
    pattern: str


@dataclass(frozen=True)
class Regexp:
    field: str | None
    pattern: str


@dataclass(frozen=True)
class Range:
    field: str | None
    lo: str | None
    hi: str | None
    incl_lo: bool = True
    incl_hi: bool = True


@dataclass(frozen=True)
class Fuzzy:
    field: str | None
    value: str
    max_edits: int = 2


@dataclass(frozen=True)
class Boost:
    child: object = None
    factor: float = 1.0


@dataclass(frozen=True)
class Exists:
    field: str = ""


@dataclass(frozen=True)
class Must:
    """Lucene `+clause` (required): the clause gates matching; in an OR
    context the other (should) clauses become optional score-adders."""

    child: object = None


@dataclass(frozen=True)
class And:
    children: tuple = dfield(default_factory=tuple)


@dataclass(frozen=True)
class Or:
    children: tuple = dfield(default_factory=tuple)


@dataclass(frozen=True)
class Not:
    child: object = None


Node = object

# ---- Lexer -----------------------------------------------------------
_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<lparen>\()
  | (?P<rparen>\))
  | (?P<and>AND\b|&&)
  | (?P<or>OR\b|\|\|)
  | (?P<not>NOT\b|!)
  | (?P<quoted>"(?:[^"\\]|\\.)*")
  | (?P<regex>/(?:[^/\\]|\\.)+/)
  | (?P<lbrack>[\[\{])
  | (?P<rbrack>[\]\}])
  | (?P<to>TO\b)
  | (?P<cmp>>=|<=|>|<)
  | (?P<colon>:)
  | (?P<atom>[^\s()\[\]{}":]+)
    """,
    re.VERBOSE,
)


def _lex(q: str):
    out = []
    i = 0
    while i < len(q):
        m = _TOKEN_RE.match(q, i)
        if not m:
            raise ValueError(f"cannot lex query at {i}: {q[i:i+20]!r}")
        i = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        out.append((kind, m.group()))
    return out


_VAR_RE = re.compile(r"\$([A-Za-z_][\w.]*)")

# sentinel distinguishing "token is not a variable reference" from a
# resolved variable value (which may legitimately be falsy, e.g. 0/"")
_NOT_A_VAR = object()


class _Parser:
    def __init__(self, tokens, default_field: str | None, variables=None):
        self.toks = tokens
        self.i = 0
        self.default_field = default_field
        self.variables = variables

    def _resolve_var(self, v: str):
        """xLucene variables (S3: the spaces config carries
        `variables?: xLuceneVariables`, reference interfaces.ts:364, and
        SpacesReaderClient.ts:57 POSTs them with every query; resolution
        semantics follow terascope's public xlucene-parser): a value
        token `$name` substitutes variables[name]. Returns the resolved
        value, or None when `v` is not a variable reference. Substitution
        is active only when a variables dict was passed to parse() —
        plain queries keep treating `$` as a literal character (code
        identifiers like `$scope` stay searchable). A `\\$name` escape
        is always literal. Missing variables raise (the reference
        server rejects unresolved variables rather than matching the
        literal `$name`); a variable PRESENT with value None also
        raises — returning None here would be indistinguishable from
        'not a variable' and `$name` would silently parse as a literal
        term (the _NOT_A_VAR sentinel keeps the two cases apart)."""
        if self.variables is None:
            return _NOT_A_VAR
        m = _VAR_RE.fullmatch(v)
        if not m:
            return _NOT_A_VAR
        name = m.group(1)
        if name not in self.variables:
            raise ValueError(
                f"unresolved xLucene variable ${name} "
                f"(provided: {sorted(self.variables)})"
            )
        val = self.variables[name]
        if val is None:
            raise ValueError(
                f"xLucene variable ${name} is null — provide a value "
                "or remove the clause"
            )
        return val

    @staticmethod
    def _var_str(x) -> str:
        if isinstance(x, bool):
            return "true" if x else "false"
        return str(x)

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def expect(self, kind):
        k, v = self.next()
        if k != kind:
            raise ValueError(f"expected {kind}, got {k}={v!r}")
        return v

    # or_expr := and_expr ((OR|implicit) and_expr)*    [default op OR]
    def parse_or(self):
        parts = [self.parse_and()]
        while True:
            k, _ = self.peek()
            if k == "or":
                self.next()
                parts.append(self.parse_and())
            elif k in ("atom", "quoted", "not", "lparen", "regex", "cmp", "lbrack"):
                # implicit default operator = OR
                parts.append(self.parse_and())
            else:
                break
        return parts[0] if len(parts) == 1 else Or(tuple(parts))

    def parse_and(self):
        parts = [self.parse_unary()]
        while self.peek()[0] == "and":
            self.next()
            parts.append(self.parse_unary())
        return parts[0] if len(parts) == 1 else And(tuple(parts))

    def parse_unary(self):
        k, v = self.peek()
        if k == "not":
            self.next()
            return Not(self.parse_unary())
        # Lucene +required / -prohibited clause modifiers. Only a
        # LEADING +/- at clause position is a modifier ("foo-bar" stays
        # one term; a field value like bytes:-5 never reaches here).
        if k == "atom" and v and v[0] in "+-":
            cls = Must if v[0] == "+" else Not
            if len(v) == 1:
                # "+(" / "-(" lex as a bare +/- atom before the paren
                self.next()
                return cls(self.parse_primary())
            self.toks[self.i] = ("atom", v[1:])
            return cls(self.parse_primary())
        return self.parse_primary()

    def parse_primary(self):
        k, v = self.peek()
        if k == "lparen":
            self.next()
            node = self.parse_or()
            self.expect("rparen")
            return node
        if k == "quoted":
            self.next()
            return self._maybe_boost(Phrase(self.default_field, _unquote(v)))
        if k == "regex":
            self.next()
            return Regexp(self.default_field, v[1:-1])
        if k in ("cmp", "lbrack"):
            return self._parse_range(self.default_field)
        if k == "atom":
            self.next()
            if self.peek()[0] == "colon":
                self.next()
                if v == "_exists_":
                    # Lucene `_exists_:field` — matches docs where the
                    # field has any non-null value
                    return Exists(self.expect("atom"))
                return self._parse_value(field=v)
            return self._leaf(self.default_field, v)
        raise ValueError(f"unexpected token {k}={v!r}")

    def _maybe_boost(self, node):
        """`"a phrase"^2` lexes as quoted + atom '^2' — fold the boost
        suffix token into the preceding node. Phrase slop (`"a b"~2`)
        folds into Phrase.slop; `~N^B` carries both (Lucene suffix
        order). A bare `~` is slop 0 (the query-parser default phrase
        slop), unlike term fuzziness where bare `~` means 2 edits."""
        k, v = self.peek()
        if k == "atom" and re.fullmatch(r"\^\d+(?:\.\d+)?", v):
            self.next()
            return Boost(node, float(v[1:]))
        m = re.fullmatch(r"~(\d*)(?:\^(\d+(?:\.\d+)?))?", v) if k == "atom" else None
        if m:
            self.next()
            node = Phrase(node.field, node.text, int(m.group(1) or 0))
            if m.group(2) is not None:
                node = Boost(node, float(m.group(2)))
            return node
        return node

    def _parse_value(self, field):
        k, v = self.peek()
        if k == "quoted":
            self.next()
            return self._maybe_boost(Phrase(field, _unquote(v)))
        if k == "regex":
            self.next()
            return Regexp(field, v[1:-1])
        if k == "lparen":
            self.next()
            # field:(a OR b) — distribute the field over the group
            saved = self.default_field
            self.default_field = field
            node = self.parse_or()
            self.default_field = saved
            self.expect("rparen")
            return node
        if k in ("cmp", "lbrack"):
            return self._parse_range(field)
        if k == "atom":
            self.next()
            return self._leaf(field, v)
        raise ValueError(f"bad value for field {field}: {k}={v!r}")

    def _parse_range(self, field):
        k, v = self.next()
        if k == "cmp":
            val = self._range_value()
            if val is None:
                raise ValueError(f"missing value after {v}")
            if v == ">=":
                return Range(field, val, None, True, True)
            if v == ">":
                return Range(field, val, None, False, True)
            if v == "<=":
                return Range(field, None, val, True, True)
            return Range(field, None, val, True, False)
        # bracket range [A TO B} — reference emits start-inclusive,
        # end-exclusive (utils.ts:58-61)
        incl_lo = v == "["
        lo = self._range_value()
        self.expect("to")
        hi = self._range_value()
        kk, vv = self.next()
        if kk not in ("rbrack",):
            raise ValueError(f"expected closing bracket, got {kk}={vv!r}")
        incl_hi = vv == "]"
        lo = None if lo == "*" else lo
        hi = None if hi == "*" else hi
        return Range(field, lo, hi, incl_lo, incl_hi)

    def _range_value(self) -> str | None:
        """A range bound: run of atom/colon tokens re-joined (ISO
        timestamps like 2019-04-26T15:00:23.201Z lex as atom:atom:atom).
        Returns None if no value tokens present."""
        parts = []
        while self.peek()[0] in ("atom", "colon"):
            parts.append(self.next()[1])
        if not parts:
            return None
        joined = "".join(parts)
        resolved = self._resolve_var(joined)
        if resolved is not _NOT_A_VAR:
            if isinstance(resolved, (list, tuple)):
                raise ValueError(
                    f"list-valued variable {joined} in a range bound"
                )
            return self._var_str(resolved)
        return joined

    def _leaf(self, field, v):
        # escaped variable sigil: `\$name` is the literal term "$name"
        if v.startswith("\\$"):
            return Term(field, v[1:])
        resolved = self._resolve_var(v)
        if resolved is not _NOT_A_VAR:
            # substituted values are LITERALS — never re-parsed as
            # wildcard/fuzzy/regex (the xlucene injection guard); a
            # list value is the term-list form: match ANY element
            if isinstance(resolved, (list, tuple)):
                if not resolved:
                    # an empty Or would compile to match-all — refuse
                    # rather than silently inverting the filter
                    raise ValueError(f"empty list for variable {v}")
                return Or(tuple(Term(field, self._var_str(x)) for x in resolved))
            return Term(field, self._var_str(resolved))
        # suffix operators, outermost first: boost (`term^2`), then
        # fuzzy (`term~` / `term~1`); `term~1^2` carries both
        boost = None
        m = re.fullmatch(r"(.+?)\^(\d+(?:\.\d+)?)", v)
        if m:
            v, boost = m.group(1), float(m.group(2))
        node = None
        m = re.fullmatch(r"(.+?)~(\d*)", v)
        if m:
            # Lucene fuzzy default is 2 edits when the distance is omitted
            node = Fuzzy(field, m.group(1), int(m.group(2)) if m.group(2) else 2)
        elif "*" in v or "?" in v:
            node = Wildcard(field, v)
        else:
            node = Term(field, v)
        return Boost(node, boost) if boost is not None else node


def _unquote(s: str) -> str:
    return re.sub(r"\\(.)", r"\1", s[1:-1])


def parse(query: str, default_field: str | None = None, variables=None) -> Node:
    """Parse a Lucene-syntax query string into an AST.

    `variables` enables xLucene variable substitution (`field:$name`):
    scalars substitute as literal terms, lists as an OR term-list,
    missing names raise. Quoted phrases and escaped `\\$` stay literal;
    with variables=None (the default) `$` has no special meaning.
    """
    toks = _lex(query)
    if not toks:
        return Or(())
    p = _Parser(toks, default_field, variables)
    node = p.parse_or()
    if p.i != len(p.toks):
        raise ValueError(f"trailing tokens: {p.toks[p.i:]}")
    return node
