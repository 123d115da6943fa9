"""Property-based tests for the tsquery AST layer (parse / serialize /
rewrite / containment) — pure driver-side logic, no Spark jobs, so
hypothesis can run thousands of examples cheaply."""

from __future__ import annotations

from hypothesis import given
from hypothesis import strategies as st

from opengauss_vectordb_spark.operators.text import (
    _tsquery_ast,
    _tsquery_lexemes,
    _tsquery_size,
    _tsquery_text,
    ts_rewrite,
    tsquery_contains,
)

terms = st.sampled_from(["alpha", "bravo", "charlie", "delta", "echo", "x1"])


def asts(depth: int = 3):
    base = st.one_of(
        st.tuples(st.just("term"), terms),
        st.tuples(st.just("phrase"), terms, terms),
    )
    return st.recursive(
        base,
        lambda children: st.one_of(
            st.tuples(st.just("and"), children, children),
            st.tuples(st.just("or"), children, children),
            st.tuples(st.just("not"), children),
        ),
        max_leaves=8,
    )


@given(asts())
def test_serialize_parse_roundtrip(ast):
    assert _tsquery_ast(_tsquery_text(ast)) == ast


@given(asts())
def test_identity_rewrite_preserves_query(ast):
    q = _tsquery_text(ast)
    t = "alpha"
    assert _tsquery_ast(ts_rewrite(q, t, t)) == ast


@given(asts(), terms, terms)
def test_rewrite_replaces_every_target_term(ast, target, sub):
    if target == sub:
        return
    q = _tsquery_text(ast)
    rewritten = _tsquery_ast(ts_rewrite(q, target, sub))

    def has_term(node, t):
        k = node[0]
        if k == "term":
            return node[1] == t
        if k == "phrase":
            # phrase operands are not whole subtrees — ts_rewrite (like
            # the reference's QTNode substitution on value nodes inside
            # operators it matches whole) leaves them in place here
            return False
        if k == "not":
            return has_term(node[1], t)
        return has_term(node[1], t) or has_term(node[2], t)

    assert not has_term(rewritten, target)


@given(asts())
def test_query_contains_itself_and_its_terms(ast):
    q = _tsquery_text(ast)
    assert tsquery_contains(q, q)
    for lex in _tsquery_lexemes(ast):
        assert tsquery_contains(q, lex)


@given(asts())
def test_size_counts_items(ast):
    # size = lexeme occurrences + operator nodes >= distinct lexemes
    assert _tsquery_size(ast) >= len(_tsquery_lexemes(ast))
