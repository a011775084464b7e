"""Spaces reader (SURVEY.md S3/F4): xLucene query strings over a table.

The reference's spaces_reader runs the same date-slicing algorithm but
ships queries as xLucene strings to an HTTP search endpoint
(SpacesReaderClient.ts:134-262 reverse-compiles the ES DSL into strings
like `uuid:ba2*`, `created:[A TO B}`, `(a* OR b*) AND foo:bar`).

Our engine already parses that grammar (query/parser.py), so the spaces
frontend is the attrs-only planner: filter any DataFrame by a Lucene
string. The one extra piece is the DSL→string printer (F4), used for
test-oracle round-trips.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from elasticsearch_assets_spark.query import parser as P
from elasticsearch_assets_spark.query.planner import PlannerConfig, QueryPlanner


def spaces_filter(
    df: DataFrame,
    query: str,
    default_field: str | None = None,
    variables: dict | None = None,
) -> DataFrame:
    """Filter `df` by an xLucene query string (filter context only —
    spaces queries select rows; scoring stays in the index engine).

    Works on any table, as ONE boolean predicate in the WHERE clause
    (QueryPlanner.compile_filter): no synthesized row id, no semi-join,
    no shuffle — simple clauses reach the parquet scan as pushed
    filters. Bare (field-less) terms match against `default_field`;
    without one they are a clear error rather than a TypeError deep in
    the planner.

    `variables` mirrors the spaces config's `variables?:
    xLuceneVariables` (reference interfaces.ts:364; the client POSTs
    them with every query, SpacesReaderClient.ts:57): `field:$name`
    resolves from the dict — scalar → literal term, list → OR
    term-list, missing name → error.
    """
    ast = P.parse(query, default_field=default_field, variables=variables)
    if default_field is None:
        _reject_fieldless(ast, query)
    qp = QueryPlanner(
        None, attrs=df, config=PlannerConfig(default_field=default_field)
    )
    return df.where(qp.compile_filter(ast))


def _reject_fieldless(node, query: str) -> None:
    """attrs-only mode has no default text field: a bare term like
    `foo` has nothing to match against — fail loudly with context."""
    leaf = (P.Term, P.Phrase, P.Wildcard, P.Regexp, P.Range)
    if isinstance(node, leaf):
        if node.field is None:
            raise ValueError(
                f"field-less clause {node!r} in spaces query {query!r}: "
                "pass default_field= to spaces_filter or qualify the term"
            )
        return
    if isinstance(node, P.Not):
        _reject_fieldless(node.child, query)
        return
    for c in node.children:
        _reject_fieldless(c, query)


def to_xlucene(node) -> str:
    """F4: print an AST back to an xLucene string (the reference's
    DSL→string translation, SpacesReaderClient.ts:134-262). parse ∘
    to_xlucene is identity-tested."""
    if isinstance(node, P.Term):
        return f"{node.field}:{node.value}" if node.field else node.value
    if isinstance(node, P.Phrase):
        q = f'"{node.text}"'
        if node.slop:
            q += f"~{node.slop}"
        return f"{node.field}:{q}" if node.field else q
    if isinstance(node, P.Wildcard):
        return f"{node.field}:{node.pattern}" if node.field else node.pattern
    if isinstance(node, P.Regexp):
        r = f"/{node.pattern}/"
        return f"{node.field}:{r}" if node.field else r
    if isinstance(node, P.Range):
        lo = node.lo if node.lo is not None else "*"
        hi = node.hi if node.hi is not None else "*"
        lb = "[" if node.incl_lo else "{"
        rb = "]" if node.incl_hi else "}"
        body = f"{lb}{lo} TO {hi}{rb}"
        return f"{node.field}:{body}" if node.field else body
    if isinstance(node, P.And):
        return "(" + " AND ".join(to_xlucene(c) for c in node.children) + ")"
    if isinstance(node, P.Or):
        return "(" + " OR ".join(to_xlucene(c) for c in node.children) + ")"
    if isinstance(node, P.Not):
        return f"NOT {to_xlucene(node.child)}"
    raise TypeError(f"unknown node {node!r}")
