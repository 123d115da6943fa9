"""Text-analysis operators over the `documents` table — the LLM-training-
pipeline surface (token counting, quality scoring, language ID heuristic,
document fingerprinting) plus the reference's full-text primitives
(to_tsvector-style tokenization, adt/tsvector.cpp → array<string> token
model per SURVEY.md §2.7).

All operators are pure Column expressions (split/regexp/aggregate) — no
Python in the row path, so they scale linearly across executors on a
100 TB corpus. Tokenization = whitespace split; the BPE-ish token
estimator uses a chars/4 heuristic alongside the word count.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..catalog import table
from ._util import scoped_persist
from ..registry import query

STOPWORDS = ("the", "a", "of", "and", "to")
_SQL_STOPS = "('the', 'a', 'of', 'and', 'to')"


def tokens(text: Column) -> Column:
    """Whitespace tokenizer (to_tsvector's parser reduced to the token
    model per SURVEY.md §2.7 full-text row)."""
    return F.split(F.trim(text), r"\s+")


def shingles(toks: Column, n: int = 3) -> Column:
    """Word n-gram shingles as an array Column (0-based subscripts).

    NOTE: fine for per-row use, but array subscripting inside
    higher-order functions is interpreted and re-evaluates `toks` per
    access — for corpus-scale shingling use shingle_stream() instead.
    """
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    return F.when(
        F.size(toks) >= n,
        F.transform(
            idx,
            lambda i: F.concat_ws(" ", *[toks[i + j] for j in range(n)]),
        ),
    ).otherwise(F.expr("CAST(array() AS ARRAY<STRING>)"))


def shingle_stream(docs, text_col: str = "text", id_col: str = "doc_id",
                   n: int = 3):
    """(id, shingle) rows: tokenize ONCE per doc (posexplode evaluates the
    split a single time), then assemble n-grams with window lead() — all
    whole-stage-codegen'd relational ops. One shuffle on the doc id,
    linear in corpus size; the array-subscript formulation is quadratic
    in interpreter overhead and falls off a cliff past toy scale."""
    from pyspark.sql import Window as W

    ex = docs.select(
        F.col(id_col),
        F.posexplode(tokens(F.lower(F.col(text_col)))).alias("_pos", "_tok"),
    )
    w = W.partitionBy(id_col).orderBy("_pos")
    nexts = [F.lead("_tok", j).over(w) for j in range(1, n)]
    return (
        ex.select(
            F.col(id_col),
            F.concat_ws(" ", F.col("_tok"), *nexts).alias("shingle"),
            nexts[-1].isNotNull().alias("_complete"),
        )
        .filter(F.col("_complete"))
        .drop("_complete")
    )


@query(
    "text_token_stats",
    r"""
    SELECT doc_id,
           len(string_split_regex(trim(text), '\s+')) AS n_tokens,
           CAST(ceil(length(text) / 4.0) AS BIGINT) AS est_bpe_tokens,
           length(text) AS n_chars_actual,
           len(list_distinct(string_split_regex(trim(text), '\s+')))
             AS n_unique_tokens
    FROM documents WHERE doc_id < 100 ORDER BY doc_id
    """,
)
def text_token_stats(spark, sf_dir):
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    toks = tokens(F.col("text"))
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.ceil(F.length("text") / 4.0).cast("long").alias("est_bpe_tokens"),
        F.length("text").alias("n_chars_actual"),
        F.size(F.array_distinct(toks)).alias("n_unique_tokens"),
    ).orderBy("doc_id")


@query(
    "text_quality_score",
    rf"""
    WITH t AS (
      SELECT doc_id, text,
             string_split_regex(trim(text), '\s+') AS w,
             length(text) AS nc
      FROM documents
    )
    SELECT doc_id,
           len(w) AS n_tokens,
           ROUND(nc * 1.0 / len(w), 6) AS avg_token_len,
           ROUND(len(list_filter(w, x -> x IN {_SQL_STOPS})) * 1.0 / len(w), 6)
             AS stopword_ratio,
           ROUND(len(list_distinct(w)) * 1.0 / len(w), 6) AS unique_ratio,
           CASE WHEN len(w) >= 20
                 AND len(list_distinct(w)) * 1.0 / len(w) > 0.3
                THEN 1 ELSE 0 END AS quality_pass
    FROM t WHERE doc_id < 100 ORDER BY doc_id
    """,
)
def text_quality_score(spark, sf_dir):
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    w = tokens(F.col("text"))
    nw = F.size(w)
    stop_ct = F.size(F.filter(w, lambda x: x.isin(*STOPWORDS)))
    uniq = F.size(F.array_distinct(w))
    return d.select(
        "doc_id",
        nw.alias("n_tokens"),
        F.round(F.length("text") * F.lit(1.0) / nw, 6).alias("avg_token_len"),
        F.round(stop_ct * F.lit(1.0) / nw, 6).alias("stopword_ratio"),
        F.round(uniq * F.lit(1.0) / nw, 6).alias("unique_ratio"),
        F.when((nw >= 20) & (uniq * F.lit(1.0) / nw > 0.3), 1)
        .otherwise(0)
        .alias("quality_pass"),
    ).orderBy("doc_id")


@query(
    "text_langid_heuristic",
    rf"""
    WITH t AS (
      SELECT doc_id, lang AS labeled_lang,
             string_split_regex(trim(text), '\s+') AS w
      FROM documents
    )
    SELECT doc_id, labeled_lang,
           CASE WHEN len(list_filter(w, x -> x IN {_SQL_STOPS})) * 1.0
                     / len(w) > 0.05
                THEN 'en' ELSE 'unknown' END AS predicted_lang
    FROM t WHERE doc_id < 200 ORDER BY doc_id
    """,
)
def text_langid_heuristic(spark, sf_dir):
    # n-gram/stopword language ID. The synthetic corpus shares one
    # vocabulary across lang labels, so this demonstrates the operator
    # (deterministic classifier, same result in both engines), not
    # accuracy against the synthetic labels.
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    w = tokens(F.col("text"))
    ratio = F.size(F.filter(w, lambda x: x.isin(*STOPWORDS))) * F.lit(1.0) / F.size(w)
    return d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        F.when(ratio > 0.05, "en").otherwise("unknown").alias("predicted_lang"),
    ).orderBy("doc_id")


@query(
    "doc_fingerprint",
    r"""
    WITH t AS (
      SELECT doc_id,
             string_split_regex(trim(lower(text)), '\s+') AS w
      FROM documents
    ), sh AS (
      SELECT doc_id,
             CASE WHEN len(w) >= 3
                  THEN list_transform(range(1, len(w) - 1),
                                      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
                  ELSE [] END AS shingles,
             w
      FROM t
    )
    SELECT doc_id,
           md5(array_to_string(w, ' ')) AS full_md5,
           CASE WHEN len(shingles) > 0
                THEN list_min(list_transform(shingles, s -> md5(s)))
                ELSE NULL END AS min_shingle_md5
    FROM sh ORDER BY doc_id
    """,
)
def doc_fingerprint(spark, sf_dir):
    # Rolling-hash document fingerprint: md5 of the normalized token
    # stream plus the minimum shingle hash (winnowing-style selection —
    # min over the rolling window of shingle hashes). md5 hex strings
    # compare identically across engines, so MIN() is portable.
    # full_md5 normalizes whitespace runs directly (one regex per doc —
    # equivalent to md5(join(split(text)))); the min-shingle comes from
    # the relational shingle stream, so no interpreted array folds.
    d = table(spark, sf_dir, "documents")
    normalized = F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
    mins = (
        shingle_stream(d)
        .groupBy("doc_id")
        .agg(F.min(F.md5(F.col("shingle").cast("binary"))).alias("min_shingle_md5"))
    )
    return (
        d.select("doc_id", F.md5(normalized.cast("binary")).alias("full_md5"))
        .join(mins, "doc_id", "left_outer")
        .select("doc_id", "full_md5", "min_shingle_md5")
        .orderBy("doc_id")
    )


@query(
    "text_simhash",
    r"""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
      FROM documents
    ), nib AS (
      SELECT doc_id, len(w) AS n_tokens,
             list_transform(range(1, 17),
               p -> list_sum(list_transform(w,
                      tok -> strpos('0123456789abcdef', md5(tok)[p:p]) - 1)))
               AS nibble_sums
      FROM t
    )
    SELECT doc_id,
           CAST(list_sum(list_transform(range(1, 17),
                  p -> CASE WHEN nibble_sums[p] * 2 >= 15 * n_tokens
                            THEN CAST(2 AS BIGINT) ** (p - 1) ELSE 0 END))
                AS BIGINT) AS simhash16
    FROM nib ORDER BY doc_id
    """,
)
def text_simhash(spark, sf_dir):
    # SimHash over 16 hex-nibble dimensions of each token's md5: dimension
    # p's weight is the nibble value (0-15); the fingerprint bit is set
    # when the mean nibble exceeds 7.5. Near-duplicate docs (sharing most
    # tokens) land within small Hamming distance of each other.
    return simhash_table(spark, sf_dir).orderBy("doc_id")


def simhash_table(spark, sf_dir):
    """(doc_id, simhash16) for every document — the fingerprint feed for
    both the gated simhash query and the banded near-dup join."""
    d = table(spark, sf_dir, "documents")
    w = tokens(F.lower(F.col("text")))
    # relational formulation: explode tokens, hash each token ONCE, read
    # the 16 nibbles as plain projected columns, then groupBy-sum. Every
    # operator is whole-stage codegen'd (higher-order-function folds are
    # interpreted in Spark — an order of magnitude slower per element) and
    # the aggregation combines map-side, so the one shuffle carries only
    # 16 ints per document.
    # wide per-nibble column lists are built as SQL strings (selectExpr /
    # one expr for the bit fold): pushing ~100 Column-API calls through
    # the Python/JVM bridge costs more than executing the query at
    # moderate SF, and the parsed plan is identical
    ex = d.select(
        "doc_id",
        F.explode(w).alias("_tok"),
    ).select("doc_id", F.md5(F.col("_tok").cast("binary")).alias("_h"))
    # nibble = ascii arithmetic, not conv(): md5's hex is lowercase, so
    # ascii(c) - (97-10 if c in a..f else 48) is the same value with a
    # substring+ascii+CASE per nibble instead of conv's radix string
    # parse — measured 1.30 → 0.90 s on the sf0.1 fingerprint pass
    nib = ex.selectExpr(
        "doc_id",
        *[
            f"(ascii(substring(_h, {p}, 1))"
            f" - CASE WHEN ascii(substring(_h, {p}, 1)) >= 97"
            f" THEN 87 ELSE 48 END) AS _n{p}"
            for p in range(1, 17)
        ],
    )
    agg = nib.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("_n_tok"),
        *[F.expr(f"SUM(_n{p}) AS _s{p}") for p in range(1, 17)],
    )
    fold = " + ".join(
        f"(CASE WHEN _s{p} * 2 >= 15 * _n_tok THEN {2 ** (p - 1)}L ELSE 0L END)"
        for p in range(1, 17)
    )
    return agg.selectExpr("doc_id", f"CAST({fold} AS BIGINT) AS simhash16")


# --- full-text match + rank (tsvector/tsquery/ts_rank reduced to the
# token model; adt/tsvector.cpp, tsquery.cpp, tsrank.cpp) -------------------


@query(
    "fts_match_rank",
    """
    WITH toks AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')),
                          ' ') AS ts
      FROM documents
    )
    SELECT doc_id,
           len(ts) AS n_lexemes,
           len(list_filter(ts, x -> x = 'table')) AS tf_table,
           len(list_filter(ts, x -> x = 'scan')) AS tf_scan,
           ROUND((len(list_filter(ts, x -> x = 'table'))
                  + len(list_filter(ts, x -> x = 'scan'))) / (1.0 + len(ts)), 6)
             AS rank
    FROM toks
    WHERE list_contains(ts, 'table') AND list_contains(ts, 'scan')
    ORDER BY rank DESC, doc_id
    LIMIT 100
    """,
)
def fts_match_rank(spark, sf_dir):
    """Full-text search: ``to_tsvector(text) @@ to_tsquery('table & scan')``
    with a ts_rank-style frequency score.

    The reference's tsvector is a sorted lexeme array with positions
    (adt/tsvector.cpp); tsquery AND-match (tsquery.cpp `@@`) reduces to
    array_contains over the lexeme set, and ts_rank (tsrank.cpp) to a
    term-frequency score normalized by document length. Pure Column
    expressions — the scan prunes to (doc_id, text) and every predicate
    is whole-stage codegen'd, so the operator scales linearly over a
    100 TB corpus with zero shuffles before the final top-k.
    """
    d = table(spark, sf_dir, "documents")
    ts = F.split(
        F.trim(F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]+", " ")), " "
    )
    tf = lambda term: F.size(F.filter(ts, lambda x: x == F.lit(term)))  # noqa: E731
    rank = F.round(
        (tf("table") + tf("scan")) / (F.lit(1.0) + F.size(ts)), 6
    )
    return (
        d.select(
            "doc_id",
            F.size(ts).alias("n_lexemes"),
            tf("table").alias("tf_table"),
            tf("scan").alias("tf_scan"),
            rank.alias("rank"),
        )
        .filter(F.array_contains(ts, "table") & F.array_contains(ts, "scan"))
        .orderBy(F.desc("rank"), "doc_id")
        .limit(100)
    )


def ts_lexemes(text: Column) -> Column:
    """to_tsvector's lexeme array: lowercase, punctuation-split tokens
    (adt/tsvector.cpp reduced to the token model)."""
    return F.split(
        F.trim(F.regexp_replace(F.lower(text), "[^a-z0-9]+", " ")), " "
    )


def ts_phrase_match(ts: Column, first: str, second: str) -> Column:
    """tsquery followed-by `first <-> second` (tsquery.cpp phrase
    operator, distance 1): some position p holds `first` with `second`
    at p+1. zip_with against the 1-shifted array keeps the scan linear
    and JVM-side."""
    shifted = F.slice(ts, 2, F.greatest(F.size(ts) - 1, F.lit(0)))
    # zip_with pads the shorter side with NULL; coalesce keeps exists()
    # two-valued (NULL-padded tail pairs are non-matches, not unknowns)
    return F.exists(
        F.zip_with(
            ts,
            shifted,
            lambda x, y: F.coalesce(
                (x == F.lit(first)) & (y == F.lit(second)), F.lit(False)
            ),
        ),
        lambda b: b,
    )


def _tsquery_ast(querytext: str):
    """Parse a tsquery string (tsquery.cpp grammar: terms, `&`, `|`,
    `!`, parentheses, `<->` between plain terms) into a tuple AST:
    ('term', t) / ('and', l, r) / ('or', l, r) / ('not', x) /
    ('phrase', a, b). Precedence matches PG: ! binds tightest, then
    <->, then &, then |."""
    import re

    toks = re.findall(r"<->|<\d+>|[&|!()]|[a-z0-9]+(?::\*)?",
                      querytext.lower())
    pos = 0

    def peek():
        return toks[pos] if pos < len(toks) else None

    def take(expected=None):
        nonlocal pos
        if pos >= len(toks):
            raise ValueError(f"tsquery {querytext!r}: unexpected end")
        t = toks[pos]
        if expected is not None and t != expected:
            raise ValueError(f"tsquery {querytext!r}: expected {expected!r}, got {t!r}")
        pos += 1
        return t

    def parse_or():
        left = parse_and()
        while peek() == "|":
            take()
            left = ("or", left, parse_and())
        return left

    def parse_and():
        left = parse_phrase()
        while peek() == "&":
            take()
            left = ("and", left, parse_phrase())
        return left

    def parse_phrase():
        # phrase operands must be plain terms — position algebra over
        # arbitrary subexpressions needs full position-set evaluation,
        # which the token model deliberately does not carry.  Chains
        # (`a <-> b <-> c`) parse into ONE variadic phrase node:
        # ('phrase', w0, w1, ..., wn-1), consecutive-position
        # semantics (PG's <-> is distance-1, left-associative).
        # Explicit distances (`a <2> b`, tsquery_phrase's EXACT gap)
        # parse into ('phrasen', (w0, 0), (w1, off1), ...) with
        # cumulative offsets; an all-<1> chain normalizes to the
        # plain phrase node so <-> and <1> are the same query.
        def _is_gap(t):
            return t == "<->" or (
                t is not None and re.fullmatch(r"<\d+>", t)
            )

        if peek() not in ("!", "(") and peek() is not None and peek() not in ("&", "|", ")"):
            first = toks[pos]
            if pos + 1 < len(toks) and _is_gap(toks[pos + 1]):
                take()  # first term
                pairs = [(first, 0)]
                while _is_gap(peek()):
                    gap_tok = take()
                    gap = 1 if gap_tok == "<->" else int(gap_tok[1:-1])
                    nxt = take()
                    if nxt in ("&", "|", "!", "(", ")") or _is_gap(nxt):
                        raise ValueError(
                            f"tsquery {querytext!r}: <-> needs plain terms"
                        )
                    pairs.append((nxt, pairs[-1][1] + gap))
                if all(
                    b[1] - a[1] == 1 for a, b in zip(pairs, pairs[1:])
                ):
                    return ("phrase", *[w for w, _ in pairs])
                return ("phrasen", *pairs)
        return parse_not()

    def parse_not():
        if peek() == "!":
            take()
            return ("not", parse_not())
        if peek() == "(":
            take()
            inner = parse_or()
            take(")")
            return inner
        term = take()
        if term in ("&", "|", ")", "<->"):
            raise ValueError(f"tsquery {querytext!r}: unexpected {term!r}")
        return ("term", term)

    result = parse_or()
    if pos != len(toks):
        raise ValueError(f"tsquery {querytext!r}: trailing tokens {toks[pos:]}")
    return result


def _tsquery_compile(ts: Column, node) -> Column:
    kind = node[0]
    if kind == "term":
        if node[1].endswith(":*"):
            # prefix match (tsquery_gin.cpp's partial-match entries):
            # any lexeme starting with the stem
            stem = node[1][:-2]
            return F.exists(ts, lambda x: x.startswith(F.lit(stem)))
        return F.array_contains(ts, node[1])
    if kind == "and":
        return _tsquery_compile(ts, node[1]) & _tsquery_compile(ts, node[2])
    if kind == "or":
        return _tsquery_compile(ts, node[1]) | _tsquery_compile(ts, node[2])
    if kind == "not":
        return ~_tsquery_compile(ts, node[1])
    if kind == "phrasen":
        return ts_phrase_offsets(ts, list(node[1:]))
    return ts_phrase_chain(ts, list(node[1:]))


def _tsquery_text(node) -> str:
    """Serialize an AST back to tsquery text (parenthesized so a
    re-parse round-trips exactly)."""
    kind = node[0]
    if kind == "term":
        return node[1]
    if kind == "phrase":
        return " <-> ".join(node[1:])
    if kind == "phrasen":
        pairs = node[1:]
        out = [pairs[0][0]]
        for a, b in zip(pairs, pairs[1:]):
            out.append(f"<{b[1] - a[1]}>")
            out.append(b[0])
        return " ".join(out)
    if kind == "not":
        inner = _tsquery_text(node[1])
        return f"!{inner}" if node[1][0] == "term" else f"!({inner})"
    op = " & " if kind == "and" else " | "

    def wrap(child):
        t = _tsquery_text(child)
        return t if child[0] in ("term", "phrase") else f"({t})"

    return wrap(node[1]) + op + wrap(node[2])


def to_tsquery(ts: Column, querytext: str) -> Column:
    """Compile a tsquery string (tsquery.cpp grammar: terms, `&`, `|`,
    `!`, parentheses, and the `<->` followed-by operator between plain
    terms) into a boolean Column over a lexeme array. Precedence matches
    PG: ! binds tightest, then <->, then &, then |.

    The result is a pure Catalyst predicate — `to_tsvector(text) @@
    to_tsquery('a & !b | c <-> d')` stays whole-stage codegen'd."""
    return _tsquery_compile(ts, _tsquery_ast(querytext))


def ts_rewrite(querytext: str, target: str, substitute: str) -> str:
    """``ts_rewrite(query, target, substitute)`` —
    tsquery_rewrite.cpp:346 (and the table-driven form :222): replace
    every subtree of ``query`` structurally equal to ``target`` with
    ``substitute``, returning rewritten tsquery TEXT that to_tsquery
    then compiles. The reference's full matcher also finds targets
    spread across commutative AND/OR arms (findsubquery); this
    implementation matches whole subtrees — the synonym-/
    expansion-table use its regression tests exercise — and is applied
    query-compile-time on the driver, so the executed plan is exactly a
    to_tsquery plan: zero per-row cost for the rewrite."""
    tgt = _tsquery_ast(target)
    sub = _tsquery_ast(substitute)

    def walk(node):
        if node == tgt:
            return sub
        if node[0] in ("and", "or"):
            return (node[0], walk(node[1]), walk(node[2]))
        if node[0] == "not":
            return ("not", walk(node[1]))
        return node

    return _tsquery_text(walk(_tsquery_ast(querytext)))


@query(
    "fts_rank_cd",
    """
    WITH toks AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')),
                          ' ') AS ts
      FROM documents
    ), pos AS (
      SELECT doc_id, i AS pos, ts[i] AS term
      FROM toks CROSS JOIN unnest(range(1, len(ts) + 1)) AS r(i)
      WHERE ts[i] IN ('table', 'scan')
    ), cov AS (
      SELECT doc_id, pos, term,
             lead(term) OVER (PARTITION BY doc_id ORDER BY pos) AS nterm,
             lead(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS npos
      FROM pos
    )
    SELECT doc_id,
           COUNT(*) AS n_covers,
           ROUND(CAST(SUM(CAST(1.0 / (npos - pos + 1) AS DECIMAL(18,6)))
                      AS DOUBLE), 6) AS rank_cd
    FROM cov
    WHERE nterm IS NOT NULL AND nterm <> term
    GROUP BY doc_id
    ORDER BY rank_cd DESC, doc_id
    LIMIT 100
    """,
)
def fts_rank_cd(spark, sf_dir):
    """ts_rank_cd — cover-density ranking (tsrank.cpp calc_rank_cd,
    Clarke et al. reduced to the token model): a minimal cover of the
    two-term query is a pair of ADJACENT occurrences of different terms
    in the merged position list (any occurrence in between would shrink
    the window), and each cover contributes 1/width. Relational shape:
    posexplode → filter to query terms → one window lead() per doc →
    decimal-sum of cover scores; the shuffle carries only query-term
    positions, so density ranking scales to a 100 TB corpus."""
    d = table(spark, sf_dir, "documents")
    from pyspark.sql import Window as W

    ts = ts_lexemes(F.col("text"))
    pos = (
        d.select("doc_id", F.posexplode(ts).alias("_p0", "term"))
        .filter(F.col("term").isin("table", "scan"))
        .select("doc_id", (F.col("_p0") + 1).alias("pos"), "term")
    )
    w = W.partitionBy("doc_id").orderBy("pos")
    cov = pos.select(
        "doc_id",
        "pos",
        "term",
        F.lead("term").over(w).alias("nterm"),
        F.lead("pos").over(w).alias("npos"),
    )
    score = (F.lit(1.0) / (F.col("npos") - F.col("pos") + 1)).cast(
        "decimal(18,6)"
    )
    return (
        cov.filter(F.col("nterm").isNotNull() & (F.col("nterm") != F.col("term")))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_covers"),
            F.round(F.sum(score).cast("double"), 6).alias("rank_cd"),
        )
        .orderBy(F.desc("rank_cd"), "doc_id")
        .limit(100)
    )


@query(
    "fts_bool_phrase",
    """
    WITH toks AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')),
                          ' ') AS ts
      FROM documents
    )
    SELECT doc_id,
           (list_contains(ts, 'table') OR list_contains(ts, 'join'))
             AS m_or,
           ((list_contains(ts, 'table') OR list_contains(ts, 'join'))
            AND NOT list_contains(ts, 'slow')) AS m_or_not,
           (len(list_filter(range(1, len(ts)),
                            i -> ts[i] = 'hash' AND ts[i+1] = 'join')) > 0)
             AS m_phrase
    FROM toks
    WHERE (list_contains(ts, 'table') OR list_contains(ts, 'join'))
       OR (len(list_filter(range(1, len(ts)),
                           i -> ts[i] = 'hash' AND ts[i+1] = 'join')) > 0)
    ORDER BY doc_id
    """,
)
def fts_bool_phrase(spark, sf_dir):
    """tsquery beyond AND (tsquery.cpp operators): OR (`table | join`),
    NOT (`& !slow`), and the followed-by phrase operator
    (`hash <-> join`, distance 1). OR/NOT reduce to array_contains
    compositions; phrase matches the 1-shifted lexeme array — all
    codegen-able predicates over one corpus scan."""
    d = table(spark, sf_dir, "documents")
    ts_col = ts_lexemes(F.col("text"))
    t = d.select("doc_id", ts_col.alias("ts"))
    ts = F.col("ts")
    m_or = F.array_contains(ts, "table") | F.array_contains(ts, "join")
    m_or_not = m_or & ~F.array_contains(ts, "slow")
    m_phrase = ts_phrase_match(ts, "hash", "join")
    return (
        t.select(
            "doc_id",
            m_or.alias("m_or"),
            m_or_not.alias("m_or_not"),
            m_phrase.alias("m_phrase"),
        )
        .filter(F.col("m_or") | F.col("m_phrase"))
        .orderBy("doc_id")
    )


# --- BM25 ranking (the IR-standard successor of ts_rank; tsrank.cpp's
# frequency/length normalization generalized with corpus statistics) --------

_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TERMS = ("vector", "hash", "scan")


def tsquery_terms(querytext: str) -> list[str]:
    """Positive ranking terms of a tsquery string: every plain term not
    under a `!` (negated terms filter but must not contribute rank), in
    first-appearance order, deduplicated. The BM25 front half of the
    to_tsquery compiler above — same token grammar."""
    import re

    toks = re.findall(r"<->|<\d+>|[&|!()]|[a-z0-9]+(?::\*)?",
                      querytext.lower())
    out: list[str] = []
    negate_next = False
    for t in toks:
        if t == "!":
            negate_next = True
        elif t in ("&", "|", "(", ")", "<->") or t.startswith("<"):
            pass  # `!(...)` scope is handled by the caller's match filter;
            # for ranking, any term inside a NOT-group is conservative to
            # keep, but plain `!term` must be dropped
        else:
            if not negate_next and t not in out:
                out.append(t)
            negate_next = False
    if not out:
        raise ValueError(f"tsquery {querytext!r} has no positive terms")
    return out


def bm25_rank(
    d,
    terms: Sequence[str],
    k1: float = _BM25_K1,
    b: float = _BM25_B,
    limit: int = 100,
    match: Column | None = None,
):
    """BM25 over an arbitrary term list — the generalized core both
    fts_bm25 queries share. ONE corpus scan computes (dl, tf_term…) as
    pure Column expressions (no explode); a single global aggregate
    reduces them to (N, avgdl, df_term…) which re-enter via a one-row
    broadcast; scoring is scalar IEEE double arithmetic and the top-k a
    TakeOrdered heap. The tf frame is persisted DISK_ONLY, not MEMORY:
    it is used twice (stats pass + scoring pass) and is narrow (~5 ints
    per doc, ≲0.1% of corpus bytes), so spilling it to local disk
    costs little and never pressures executor memory the way an
    in-memory corpus-sized cache would (VERDICT r3 nit 4).

    ``match`` (optional boolean Column over the lexeme array alias
    ``ts``) restricts ranked docs — pass `to_tsquery(ts, '...')` to rank
    only documents matching a boolean tsquery while scoring its positive
    terms (`tsquery_terms`)."""
    ts = ts_lexemes(F.col("text"))
    tf_term = lambda t: F.size(F.filter(ts, lambda x: x == F.lit(t)))  # noqa: E731
    from pyspark import StorageLevel

    cols = [
        "doc_id",
        F.size(ts).alias("dl"),
        *[tf_term(t).alias(f"tf_{t}") for t in terms],
    ]
    if match is not None:
        cols.append(match.alias("_m"))
    tf = d.select(*cols)
    if match is not None:
        tf = tf.filter(F.col("_m")).drop("_m")
    tf = scoped_persist(tf, StorageLevel.DISK_ONLY)
    stats = tf.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("bigint") * F.lit(1.0) / F.count(F.lit(1))).alias(
            "avgdl"
        ),
        *[
            F.sum(F.when(F.col(f"tf_{t}") > 0, 1).otherwise(0))
            .cast("bigint")
            .alias(f"df_{t}")
            for t in terms
        ],
    )
    k1c, bc = F.lit(k1), F.lit(b)

    def term_score(t: str) -> Column:
        tf_c, df_c = F.col(f"tf_{t}"), F.col(f"df_{t}")
        idf = F.log(1 + (F.col("n_docs") - df_c + 0.5) / (df_c + 0.5))
        norm = tf_c + k1c * (1 - bc + bc * F.col("dl") / F.col("avgdl"))
        return idf * (tf_c * (k1c + 1)) / norm

    score = F.round(sum(term_score(t) for t in terms), 6)
    return (
        tf.crossJoin(F.broadcast(stats))
        .filter(sum(F.col(f"tf_{t}") for t in terms) > 0)
        .select("doc_id", score.alias("bm25"))
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(limit)
    )


def _bm25_oracle_sql(
    terms: Sequence[str],
    k1: float = _BM25_K1,
    b: float = _BM25_B,
    limit: int = 100,
    match_sql: str | None = None,
) -> str:
    """DuckDB oracle for bm25_rank, generated from the SAME term list so
    Spark and the oracle can never drift on the term set."""
    tf_cols = ",\n             ".join(
        f"len(list_filter(ts, x -> x = '{t}')) AS tf_{t}" for t in terms
    )
    df_cols = ",\n             ".join(
        f"CAST(SUM(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_{t}"
        for t in terms
    )
    score = "\n             + ".join(
        f"ln(1 + (n_docs - df_{t} + 0.5) / (df_{t} + 0.5))"
        f" * (tf_{t} * ({k1} + 1))"
        f" / (tf_{t} + {k1} * (1 - {b} + {b} * dl / avgdl))"
        for t in terms
    )
    any_tf = " + ".join(f"tf_{t}" for t in terms)
    match_filter = f"WHERE {match_sql}" if match_sql else ""
    return f"""
    WITH toks AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ',
                                              'g')), ' ') AS ts
      FROM documents
    ), tf AS (
      SELECT doc_id, len(ts) AS dl,
             {tf_cols}
      FROM toks
      {match_filter}
    ), stats AS (
      SELECT COUNT(*) AS n_docs,
             CAST(SUM(dl) AS BIGINT) * 1.0 / COUNT(*) AS avgdl,
             {df_cols}
      FROM tf
    )
    SELECT doc_id,
           ROUND({score}, 6) AS bm25
    FROM tf CROSS JOIN stats
    WHERE {any_tf} > 0
    ORDER BY bm25 DESC, doc_id
    LIMIT {limit}
    """


@query("fts_bm25", _bm25_oracle_sql(_BM25_TERMS))
def fts_bm25(spark, sf_dir):
    """BM25 ranking for the query `vector hash scan` (k1=1.2, b=0.75)
    through the generalized bm25_rank core — see its docstring for the
    two-scan / one-row-broadcast / TakeOrdered shape. The oracle SQL is
    generated from the same term list, so engine and oracle cannot
    drift."""
    return bm25_rank(table(spark, sf_dir, "documents"), _BM25_TERMS)


_BM25_TSQUERY = "merge & !slow | btree"
_BM25_Q_TERMS = tsquery_terms(_BM25_TSQUERY)  # ['merge', 'btree']
_BM25_Q_MATCH_SQL = (
    "(len(list_filter(ts, x -> x = 'merge')) > 0"
    " AND len(list_filter(ts, x -> x = 'slow')) = 0)"
    " OR len(list_filter(ts, x -> x = 'btree')) > 0"
)


@query(
    "fts_bm25_query",
    _bm25_oracle_sql(_BM25_Q_TERMS, match_sql=_BM25_Q_MATCH_SQL),
)
def fts_bm25_query(spark, sf_dir):
    """BM25 compiled from a boolean tsquery (`merge & !slow | btree`):
    to_tsquery supplies the match predicate (docs satisfying the
    boolean, including the NOT), tsquery_terms supplies the positive
    ranking terms (merge, btree — negated terms filter but never
    score), and bm25_rank ranks the matching docs. This is the
    ts_rank-over-@@-match consumer pattern (tsrank.cpp + tsquery.cpp)
    upgraded to corpus-statistics ranking, still two column-pruned
    scans and one broadcast row."""
    d = table(spark, sf_dir, "documents")
    match = to_tsquery(ts_lexemes(F.col("text")), _BM25_TSQUERY)
    return bm25_rank(d, _BM25_Q_TERMS, match=match)


# --- corpus heavy hitters (token document-frequency top-k) -----------------


@query(
    "text_heavy_hitters",
    """
    WITH toks AS (
      SELECT doc_id,
             unnest(list_distinct(
               string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+',
                                                ' ', 'g')), ' '))) AS tok
      FROM documents
    )
    SELECT tok, COUNT(*) AS df
    FROM toks
    WHERE tok NOT IN ('the', 'a', 'of', 'and', 'to') AND tok <> ''
    GROUP BY tok
    ORDER BY df DESC, tok
    LIMIT 20
    """,
)
def text_heavy_hitters(spark, sf_dir):
    """Corpus heavy hitters: top-k tokens by document frequency.

    The vocabulary-discovery pass of a training pipeline (stopword
    candidates, boilerplate detection, df-cap inputs for the dedup
    shingle join). list_distinct BEFORE the explode keeps one row per
    (doc, token); the groupBy count is map-side partially aggregated on
    the token key — the shuffle carries at most |vocab| rows per
    partition, not the corpus — and the top-k is a TakeOrdered heap,
    never a global sort. Hot-key skew (the most common token) is only a
    count, so AQE's skew handling is not even needed.
    """
    d = table(spark, sf_dir, "documents")
    ts = ts_lexemes(F.col("text"))
    return (
        d.select(F.explode(F.array_distinct(ts)).alias("tok"))
        .filter(~F.col("tok").isin(*STOPWORDS) & (F.col("tok") != ""))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
        .orderBy(F.desc("df"), "tok")
        .limit(20)
    )


# --- plainto_tsquery / websearch_to_tsquery / ts_headline ------------------
# (to_tsany.cpp plainto/websearch variants, wparser.cpp ts_headline —
# reduced to the token model like the rest of the FTS surface)


def ts_phrase_chain(ts: Column, words: list[str]) -> Column:
    """Followed-by chain for an n-word phrase: some start position i has
    words[0..n-1] at consecutive lexeme slots. The 2-word case reuses the
    shifted zip_with; longer phrases scan candidate starts with one
    element_at conjunction per offset — still a pure codegen'd predicate
    (no explode, no join).  Prefix operands (``foo:*``) match by
    startswith, like the term branch."""
    def _one(x: Column, w: str) -> Column:
        if w.endswith(":*"):
            return x.startswith(F.lit(w[:-2]))
        return x == F.lit(w)

    if len(words) == 1:
        return _tsquery_compile(ts, ("term", words[0]))
    if len(words) == 2 and not any(w.endswith(":*") for w in words):
        return ts_phrase_match(ts, words[0], words[1])
    n = len(words)
    at = lambda i, j: _one(F.element_at(ts, i + j), words[j])  # noqa: E731

    def all_match(i):
        cond = at(i, 0)
        for j in range(1, n):
            cond = cond & at(i, j)
        return cond

    return F.when(
        F.size(ts) >= n,
        F.exists(F.sequence(F.lit(1), F.size(ts) - (n - 1)), all_match),
    ).otherwise(F.lit(False))


def ts_phrase_offsets(ts: Column, pairs: list[tuple[str, int]]) -> Column:
    """Distance phrases (tsquery_phrase's ``a <N> b`` — the gap is
    EXACT, not within-N): some start position i carries each word at
    its cumulative offset.  Same codegen'd scan as ts_phrase_chain,
    with the offsets decoupled from the word index."""
    span = pairs[-1][1]

    def _one(x: Column, w: str) -> Column:
        if w.endswith(":*"):
            return x.startswith(F.lit(w[:-2]))
        return x == F.lit(w)

    def all_match(i):
        cond = _one(F.element_at(ts, i + pairs[0][1]), pairs[0][0])
        for w, off in pairs[1:]:
            cond = cond & _one(F.element_at(ts, i + off), w)
        return cond

    return F.when(
        F.size(ts) >= span + 1,
        F.exists(F.sequence(F.lit(1), F.size(ts) - span), all_match),
    ).otherwise(F.lit(False))


def plainto_tsquery(ts: Column, querytext: str) -> Column:
    """plainto_tsquery (to_tsany.cpp): strip punctuation, AND every
    token — 'Table, Scan!' matches docs containing both lexemes. An
    empty query yields an empty tsquery, which matches nothing."""
    import re

    terms = re.findall(r"[a-z0-9]+", querytext.lower())
    if not terms:
        return F.lit(False)
    cond = F.array_contains(ts, terms[0])
    for t in terms[1:]:
        cond = cond & F.array_contains(ts, t)
    return cond


def websearch_to_tsquery(ts: Column, querytext: str) -> Column:
    """websearch_to_tsquery (to_tsany.cpp websearch grammar): bare words
    AND together, "quoted text" compiles to a followed-by phrase, a
    leading - negates the next word or phrase, the OR keyword separates
    disjuncts. Never raises on malformed input (the web-search
    contract) — unparseable fragments are dropped."""
    import re

    # an optional leading - must attach to its quoted phrase, else the
    # tokenizer splits -"a b" into -"a and b"
    raw = re.findall(r'-?"[^"]*"|\S+', querytext)
    groups: list[list[Column]] = [[]]
    for tok in raw:
        if not tok.startswith('"') and tok.upper() == "OR":
            groups.append([])
            continue
        neg = tok.startswith("-")
        if neg:
            tok = tok[1:]
        words = re.findall(r"[a-z0-9]+", tok.lower())
        if not words:
            continue
        item = (
            ts_phrase_chain(ts, words)
            if tok.startswith('"') and len(words) > 1
            else plainto_tsquery(ts, " ".join(words))
        )
        groups[-1].append(~item if neg else item)
    disjuncts = []
    for g in groups:
        if not g:
            continue
        cond = g[0]
        for c in g[1:]:
            cond = cond & c
        disjuncts.append(cond)
    if not disjuncts:
        return F.lit(False)
    out = disjuncts[0]
    for c in disjuncts[1:]:
        out = out | c
    return out


@query(
    "fts_plainto_websearch",
    """
    WITH toks AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')),
                          ' ') AS ts
      FROM documents WHERE doc_id < 300
    )
    SELECT doc_id,
           (list_contains(ts, 'table') AND list_contains(ts, 'scan'))
             AS m_plain,
           (len(list_filter(range(1, len(ts)),
                            i -> ts[i] = 'table' AND ts[i+1] = 'scan')) > 0
            AND NOT list_contains(ts, 'hash')) AS m_web_phrase_not,
           (list_contains(ts, 'vector') OR list_contains(ts, 'stream'))
             AS m_web_or
    FROM toks ORDER BY doc_id
    """,
)
def fts_plainto_websearch(spark, sf_dir):
    """The two remaining tsquery constructors (to_tsany.cpp):
    plainto_tsquery('Table, Scan!') — punctuation-stripped AND — and
    websearch_to_tsquery with its full grammar ('"table scan" -hash'
    compiles phrase + negation; 'vector OR stream' compiles a
    disjunction). All three predicates are pure codegen'd Column
    expressions over the lexeme array (no explode, no join), evaluated
    per-doc so the oracle pins the compiled semantics row by row, not
    just a count."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    ts = ts_lexemes(F.col("text"))
    return d.select(
        "doc_id",
        plainto_tsquery(ts, "Table, Scan!").alias("m_plain"),
        websearch_to_tsquery(ts, '"table scan" -hash').alias(
            "m_web_phrase_not"
        ),
        websearch_to_tsquery(ts, "vector OR stream").alias("m_web_or"),
    ).orderBy("doc_id")


@query(
    "fts_headline",
    r"""
    WITH w AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS words
      FROM documents
    ), m AS (
      SELECT doc_id, words,
             list_min(list_filter(
               list_transform(range(1, len(words) + 1),
                 i -> CASE WHEN regexp_replace(lower(words[i]), '[^a-z0-9]', '', 'g')
                             IN ('table', 'scan') THEN i END),
               x -> x IS NOT NULL)) AS first
      FROM w
    )
    SELECT doc_id,
           array_to_string(
             list_transform(
               words[GREATEST(1, first - 2) : GREATEST(1, first - 2) + 5],
               t -> CASE WHEN regexp_replace(lower(t), '[^a-z0-9]', '', 'g')
                           IN ('table', 'scan')
                         THEN '<b>' || t || '</b>' ELSE t END),
             ' ') AS headline
    FROM m WHERE first IS NOT NULL
    ORDER BY doc_id LIMIT 100
    """,
)
def fts_headline(spark, sf_dir):
    """ts_headline (wparser.cpp / wparser_def.cpp prsd_headline): show
    the best cover of the query in context — here the token-model
    reduction: locate the first query-term hit, excerpt a 6-word window
    starting two words before it, and wrap every query term in the
    excerpt with <b></b> (the reference's default StartSel/StopSel).
    Everything is array arithmetic over one split — per-row map work
    with no shuffle before the final ordered limit, so snippet
    generation streams over a 100 TB corpus as a pure scan. The
    term-match flags are computed as ONE boolean array per row (higher-
    order functions are interpreted, not codegen'd, so the regexp
    normalization pass is the cost driver — a sequence+element_at
    formulation re-ran it per use site and cost 6× this plan)."""
    terms = ("table", "scan")
    d = table(spark, sf_dir, "documents")
    words = F.split(F.trim(F.col("text")), r"\s+")
    # one normalization+membership pass over the words → boolean array;
    # every downstream expression indexes this array instead of
    # re-running the regexp
    hits = F.transform(
        words,
        lambda w: F.regexp_replace(F.lower(w), "[^a-z0-9]", "").isin(*terms),
    )
    d = d.select("doc_id", words.alias("_w"), hits.alias("_h"))
    first = F.nullif(F.array_position(F.col("_h"), F.lit(True)), F.lit(0))
    d = d.withColumn("_first", first).filter(F.col("_first").isNotNull())
    start = F.greatest(F.lit(1), F.col("_first") - 2)
    headline = F.array_join(
        F.zip_with(
            F.slice(F.col("_w"), start, 6),
            F.slice(F.col("_h"), start, 6),
            lambda t, b: F.when(
                b, F.concat(F.lit("<b>"), t, F.lit("</b>"))
            ).otherwise(t),
        ),
        " ",
    )
    return (
        d.select("doc_id", headline.alias("headline"))
        .orderBy("doc_id")
        .limit(100)
    )


@query(
    "text_repetition_filter",
    """
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split(trim(regexp_replace(lower(text),
               '[^a-z0-9]+', ' ', 'g')), ' '), x -> x <> '') AS ts
      FROM documents WHERE doc_id < 300
    ), big AS (
      SELECT doc_id, ts[i] || ' ' || ts[i+1] AS bg
      FROM toks CROSS JOIN unnest(range(1, len(ts))) AS r(i)
    ), bigc AS (
      SELECT doc_id, MAX(c) AS top_bigram_n
      FROM (SELECT doc_id, bg, COUNT(*) AS c FROM big GROUP BY doc_id, bg) t
      GROUP BY doc_id
    )
    SELECT t.doc_id,
           len(ts) AS n_tokens,
           ROUND(1.0 - len(list_distinct(ts)) * 1.0 / len(ts), 6)
             AS dup_word_frac,
           ROUND(b.top_bigram_n * 2.0 / len(ts), 6) AS top_bigram_frac,
           (1.0 - len(list_distinct(ts)) * 1.0 / len(ts) <= 0.70
            AND b.top_bigram_n * 2.0 / len(ts) <= 0.18) AS keep
    FROM toks t JOIN bigc b ON t.doc_id = b.doc_id
    ORDER BY t.doc_id
    """,
)
def text_repetition_filter(spark, sf_dir):
    """Repetition-based quality filtering — the Gopher/MassiveText rule
    family (duplicate-token fraction, top-bigram mass) that modern
    training pipelines apply before dedup: highly repetitive documents
    are boilerplate or generation loops. dup_word_frac is pure array
    arithmetic per row; the top-bigram count explodes (doc, bigram)
    pairs into a two-level partial aggregation — the shuffle key is the
    bigram hash, carrying counts, never text bodies, so the pass stays
    linear at corpus scale. Thresholds (0.70 / 0.18) are calibrated to
    the synthetic corpus so the keep flag is non-vacuous (both true and
    false rows occur at sf0.01)."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    ts = F.filter(ts_lexemes(F.col("text")), lambda x: x != "")
    base = d.select("doc_id", ts.alias("ts"))
    bigrams = base.select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.col("ts"),
                F.slice(F.col("ts"), 2, F.greatest(F.size("ts") - 1, F.lit(0))),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        ).alias("bg"),
    ).filter(F.col("bg").contains(" "))  # zip_with null-pads the tail
    # pair and concat_ws skips the null, leaving a lone word — drop it
    top = (
        bigrams.groupBy("doc_id", "bg")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_bigram_n"))
    )
    n = F.size("ts")
    dup = F.lit(1.0) - F.size(F.array_distinct("ts")) * F.lit(1.0) / n
    bigfrac = F.col("top_bigram_n") * F.lit(2.0) / n
    return (
        base.join(top, "doc_id")
        .select(
            "doc_id",
            n.alias("n_tokens"),
            F.round(dup, 6).alias("dup_word_frac"),
            F.round(bigfrac, 6).alias("top_bigram_frac"),
            ((dup <= 0.70) & (bigfrac <= 0.18)).alias("keep"),
        )
        .orderBy("doc_id")
    )


# --- ts_stat: corpus word statistics ---------------------------------------


@query(
    "fts_ts_stat",
    """
    WITH toks AS (
      SELECT doc_id,
             unnest(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+',
                                                     ' ', 'g')), ' ')) AS word
      FROM documents
    ), per_doc AS (
      SELECT doc_id, word, COUNT(*) AS cnt
      FROM toks WHERE word <> '' GROUP BY doc_id, word
    )
    SELECT word,
           CAST(COUNT(*) AS BIGINT) AS ndoc,
           CAST(SUM(cnt) AS BIGINT) AS nentry
    FROM per_doc GROUP BY word
    ORDER BY nentry DESC, word LIMIT 20
    """,
)
def fts_ts_stat(spark, sf_dir):
    """ts_stat parity (tsvector_op.cpp:787 "ts_stat statistic function
    support", ts_stat_sql :1041, ts_stat1 :1121): per-word corpus
    statistics word | ndoc (documents containing it) | nentry (total
    occurrences), the index-inspection companion to to_tsvector.

    Scale shape: two-level aggregation — the first groupBy(doc_id,
    word) collapses within-document repeats MAP-SIDE (partial agg), so
    the word-key shuffle carries per-document distinct words (bounded
    by vocabulary x docs) rather than every token occurrence; the
    second groupBy(word) reduces to vocabulary size, then a 20-row
    bounded heap. Same tokenizer as the whole FTS family
    (ts_lexemes), so ts_stat's numbers describe exactly what @@ and
    ts_rank search over."""
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(ts_lexemes(F.col("text"))).alias("word")
    ).filter(F.col("word") != "")
    per_doc = toks.groupBy("doc_id", "word").agg(F.count("*").alias("cnt"))
    return (
        per_doc.groupBy("word")
        .agg(
            F.count("*").cast("bigint").alias("ndoc"),
            F.sum("cnt").cast("bigint").alias("nentry"),
        )
        .orderBy(F.desc("nentry"), "word")
        .limit(20)
    )


# --- unigram language-model scoring (perplexity filter) --------------------


def unigram_logprob_scores(
    docs, text_col: str = "text", id_col: str = "doc_id",
    vocab_cap: int | None = None, oov_floor: float = 1e-9,
):
    """Per-document average negative log-probability under a unigram
    LM trained on the corpus itself — the relational core of the
    CCNet/KenLM-style perplexity filter every pretraining pipeline
    runs (docs whose token distribution diverges from the corpus score
    high and get cut).

    Scale shape: one tf pass groupBy(doc, token) collapses repeats
    map-side; the vocabulary aggregate reduces it to vocab size and is
    BROADCAST back into the scoring join (with vocab_cap, a bounded
    top-V heap keeps the broadcast small at 100 TB and out-of-vocab
    tokens take the oov_floor probability); scoring is one partial/
    final aggregate on doc_id over already-collapsed (doc, token)
    rows. Nothing corpus-sized is collected or shuffled twice.

    Determinism: per-token log-probs are rounded to 9 dp and carried
    as DECIMAL(18,9), so the per-doc sum is exact/associative — the
    cross-engine (and cross-cluster shuffle-order) reproducibility
    convention (registry.py docstring)."""
    import math

    from pyspark.sql import functions as F

    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(ts_lexemes(F.col(text_col))).alias("tok"),
    ).filter(F.col("tok") != "")
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("cnt"))
    vocab = tf.groupBy("tok").agg(F.sum("cnt").alias("c"))
    if vocab_cap is not None:
        vocab = vocab.orderBy(F.desc("c"), "tok").limit(vocab_cap)
    total = vocab.agg(F.sum("c").cast("double").alias("n_total"))
    lp = (
        vocab.crossJoin(F.broadcast(total))
        .select(
            "tok",
            F.round(F.log(F.col("c") / F.col("n_total")), 9)
            .cast("decimal(18,9)")
            .alias("lp"),
        )
    )
    floor = F.lit(round(math.log(oov_floor), 9)).cast("decimal(18,9)")
    scored = (
        tf.join(F.broadcast(lp), "tok", "left")
        .select(
            "doc_id",
            "cnt",
            F.coalesce(F.col("lp"), floor).alias("lp"),
        )
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_tokens"),
            F.sum(F.col("cnt") * F.col("lp")).alias("sum_lp"),
        )
    )
    return scored.select(
        "doc_id",
        "n_tokens",
        F.round(
            -(F.col("sum_lp").cast("double")) / F.col("n_tokens"), 6
        ).alias("avg_nll"),
    )


@query(
    "text_unigram_logprob_filter",
    """
    WITH toks AS (
      SELECT doc_id,
             unnest(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+',
                                                     ' ', 'g')), ' ')) AS tok
      FROM documents
    ), tf AS (
      SELECT doc_id, tok, COUNT(*) AS cnt
      FROM toks WHERE tok <> '' GROUP BY doc_id, tok
    ), vocab AS (
      SELECT tok, SUM(cnt) AS c FROM tf GROUP BY tok
    ), total AS (
      SELECT CAST(SUM(c) AS DOUBLE) AS n_total FROM vocab
    ), lp AS (
      SELECT tok, CAST(ROUND(ln(c / n_total), 9) AS DECIMAL(18,9)) AS lp
      FROM vocab CROSS JOIN total
    ), scored AS (
      SELECT tf.doc_id,
             CAST(SUM(cnt) AS BIGINT) AS n_tokens,
             SUM(cnt * lp) AS sum_lp
      FROM tf JOIN lp ON tf.tok = lp.tok
      GROUP BY tf.doc_id
    )
    SELECT doc_id, n_tokens,
           ROUND(-CAST(sum_lp AS DOUBLE) / n_tokens, 6) AS avg_nll,
           ROUND(-CAST(sum_lp AS DOUBLE) / n_tokens, 6) <= 3.6 AS keep
    FROM scored ORDER BY doc_id
    """,
)
def text_unigram_logprob_filter(spark, sf_dir):
    """Unigram-LM perplexity filter over the documents corpus (see
    unigram_logprob_scores): every doc scored by average negative
    log-probability of its tokens under the corpus unigram
    distribution, kept when below the threshold. The oracle rebuilds
    the LM and the scores independently in SQL — a hash match proves
    tf, vocabulary, log-prob quantization, and the per-doc exact-
    decimal aggregation all agree. Self-trained (no cap) so the gate
    is closed-form; the capped+OOV operating point is the same code
    path (vocab_cap/oov_floor)."""
    d = table(spark, sf_dir, "documents")
    scored = unigram_logprob_scores(d)
    return scored.select(
        "doc_id",
        "n_tokens",
        "avg_nll",
        (F.col("avg_nll") <= 3.6).alias("keep"),
    ).orderBy("doc_id")


@query(
    "fts_query_rewrite",
    """
    WITH toks AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(lower(text),
                 '[^a-z0-9]+', ' ', 'g')), ' ') AS ts
      FROM documents
    )
    SELECT doc_id,
           (list_contains(ts, 'scan') AND list_contains(ts, 'fast'))
               AS matched_orig
    FROM toks
    WHERE list_contains(ts, 'scan')
      AND (list_contains(ts, 'fast') OR list_contains(ts, 'slow'))
    ORDER BY doc_id
    """,
)
def fts_query_rewrite(spark, sf_dir):
    """tsquery rewriting (tsquery_rewrite.cpp:346 ts_rewrite): expand
    'fast' to '(fast | slow)' inside the query 'scan & fast' — the
    synonym/expansion-table pattern — then match documents against the
    REWRITTEN query while reporting whether the original also matched
    (the rows where matched_orig is false are what the expansion
    gained). The rewrite runs on the AST at plan-build time on the
    driver; the executed predicate is an ordinary to_tsquery Catalyst
    expression, so query expansion costs nothing per row and nothing
    at scale."""
    d = table(spark, sf_dir, "documents")
    ts = ts_lexemes(F.col("text"))
    rewritten = ts_rewrite("scan & fast", "fast", "fast | slow")
    return (
        d.select(
            "doc_id",
            to_tsquery(ts, "scan & fast").alias("matched_orig"),
            to_tsquery(ts, rewritten).alias("_m"),
        )
        .filter(F.col("_m"))
        .drop("_m")
        .orderBy("doc_id")
    )


def _tsquery_size(node) -> int:
    """QueryItem count of the AST — the reference's ``TSQuery.size``
    (operators + values; a phrase is one operator + two values)."""
    kind = node[0]
    if kind == "term":
        return 1
    if kind in ("phrase", "phrasen"):
        # n values + (n-1) followed-by operators
        return 2 * len(node[1:]) - 1
    if kind == "not":
        return 1 + _tsquery_size(node[1])
    return 1 + _tsquery_size(node[1]) + _tsquery_size(node[2])


def _tsquery_lexemes(node) -> set:
    kind = node[0]
    if kind == "term":
        return {node[1]}
    if kind == "phrase":
        return set(node[1:])
    if kind == "phrasen":
        return {w for w, _off in node[1:]}
    if kind == "not":
        return _tsquery_lexemes(node[1])
    return _tsquery_lexemes(node[1]) | _tsquery_lexemes(node[2])


def tsquery_contains(query: str, ex: str) -> bool:
    """``tsquery @> tsquery`` — tsquery_op.cpp:198 ``tsq_mcontains``:
    true when every lexeme of ``ex`` appears among ``query``'s lexemes
    (the reference compares valcrc values only, not operator structure),
    after the same fast size gate (query.size < ex.size → false)."""
    qa, ea = _tsquery_ast(query), _tsquery_ast(ex)
    if _tsquery_size(qa) < _tsquery_size(ea):
        return False
    return _tsquery_lexemes(ea) <= _tsquery_lexemes(qa)


def tsquery_contained(ex: str, query: str) -> bool:
    """``tsquery <@ tsquery`` — tsquery_op.cpp:248 ``tsq_mcontained``
    (argument-swapped tsq_mcontains)."""
    return tsquery_contains(query, ex)


@query(
    "corpus_token_histogram",
    """
    WITH toks AS (
      SELECT string_split(trim(regexp_replace(lower(text),
                 '[^a-z0-9]+', ' ', 'g')), ' ') AS ts
      FROM documents
    ), tf AS (
      SELECT t.tok, COUNT(*) AS freq
      FROM toks, unnest(ts) AS t(tok)
      WHERE t.tok != ''
      GROUP BY t.tok
    )
    SELECT CAST(floor(log2(freq)) AS INT) AS freq_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(freq) AS BIGINT) AS occurrences,
           min(tok) AS example_token
    FROM tf
    GROUP BY freq_bucket ORDER BY freq_bucket
    """,
)
def corpus_token_histogram(spark, sf_dir):
    """Corpus token-frequency histogram (the Zipf-curve /
    vocabulary-growth report every corpus build sanity-checks):
    term frequency over the whole corpus, bucketed by floor(log2(tf)),
    with vocabulary size and occurrence mass per bucket. ADDITIVE
    corpus-analytics op alongside `text_heavy_hitters` (which keeps the
    head; this keeps the shape of the whole distribution — the fat tail
    of hapax legomena is what dedup/quality filters act on).

    Scale shape: explode → two partial-aggregated groupBys (token,
    then bucket). The first shuffle carries (token, partial-count) —
    the same linear profile as heavy hitters; the second is 60-odd
    bucket rows. log2/floor are IEEE-identical in both engines, so the
    bucket boundaries hash-match exactly."""
    d = table(spark, sf_dir, "documents")
    tf = (
        d.select(F.explode(ts_lexemes(F.col("text"))).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    return (
        tf.select(
            F.floor(F.log2("freq")).cast("int").alias("freq_bucket"),
            "tok",
            "freq",
        )
        .groupBy("freq_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("freq").cast("bigint").alias("occurrences"),
            F.min("tok").alias("example_token"),
        )
        .orderBy("freq_bucket")
    )


_SW_TERMS = ("table", "scan")
_SW_TITLE = 6  # leading tokens form the 'A'-weighted title zone


@query(
    "fts_setweight_rank",
    f"""
    WITH toks AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(lower(text),
                 '[^a-z0-9]+', ' ', 'g')), ' ') AS ts
      FROM documents
    ), pos AS (
      SELECT doc_id, i <= {_SW_TITLE} AS in_title, ts[i] AS term
      FROM toks CROSS JOIN unnest(range(1, len(ts) + 1)) AS r(i)
      WHERE ts[i] IN ('table', 'scan')
    ), w AS (
      SELECT doc_id,
             SUM(CASE WHEN in_title THEN 1 ELSE 0 END) AS tf_a,
             SUM(CASE WHEN in_title THEN 0 ELSE 1 END) AS tf_d
      FROM pos GROUP BY doc_id
    )
    SELECT doc_id,
           CAST(tf_a AS INT) AS tf_title,
           CAST(tf_d AS INT) AS tf_body,
           CAST(ROUND(1.0 * tf_a + 0.1 * tf_d, 6) AS DOUBLE)
             AS weighted_rank
    FROM w
    WHERE tf_a > 0
    ORDER BY weighted_rank DESC, doc_id LIMIT 25
    """,
)
def fts_setweight_rank(spark, sf_dir):
    f"""Weighted-zone ranking — setweight(to_tsvector(title), 'A') ||
    setweight(to_tsvector(body), 'D') then ts_rank with PG's default
    weight vector {{D,C,B,A}} = {{0.1, 0.2, 0.4, 1.0}}
    (tsvector_op.cpp:211 tsvector_setweight; tsrank.cpp:23 weights).
    The zone is positional here (first {_SW_TITLE} tokens = title), so
    the weighted term frequency is 1.0·tf_A + 0.1·tf_D — computed as a
    single posexplode + conditional aggregation, one shuffle on doc_id,
    then a bounded heap. Only docs whose TITLE zone matches survive,
    the query shape zone weighting exists for."""
    d = table(spark, sf_dir, "documents")
    ex = d.select(
        "doc_id",
        F.posexplode(ts_lexemes(F.col("text"))).alias("i", "term"),
    ).filter(F.col("term").isin(*_SW_TERMS))
    in_title = F.col("i") < _SW_TITLE  # posexplode is 0-based
    w = (
        ex.groupBy("doc_id")
        .agg(
            F.sum(F.when(in_title, 1).otherwise(0)).alias("tf_a"),
            F.sum(F.when(in_title, 0).otherwise(1)).alias("tf_d"),
        )
        .filter(F.col("tf_a") > 0)
    )
    return (
        w.select(
            "doc_id",
            F.col("tf_a").cast("int").alias("tf_title"),
            F.col("tf_d").cast("int").alias("tf_body"),
            F.round(
                F.col("tf_a") * 1.0 + F.col("tf_d") * 0.1, 6
            ).alias("weighted_rank"),
        )
        .orderBy(F.desc("weighted_rank"), "doc_id")
        .limit(25)
    )


# --- Gopher / MassiveText document-level quality rules --------------------

# Rae et al. 2021 (Gopher), Table A1: the document-level heuristics that
# complement `text_repetition_filter`'s repetition rules.  Thresholds are
# the published ones; the symbol set is reduced to the characters that
# can occur in the synthetic corpus (the corpus is lowercase words with
# no '#'/'…', so the symbol rule demonstrates the expression, not a
# discriminative gate here).
_GOPHER_MIN_WORDS = 50
_GOPHER_MAX_WORDS = 100_000
_GOPHER_MIN_MEAN_LEN = 3.0
_GOPHER_MAX_MEAN_LEN = 10.0
_GOPHER_MAX_SYMBOL_RATIO = 0.1
_GOPHER_MIN_ALPHA_WORD_FRAC = 0.80
_GOPHER_MIN_STOPWORDS = 2


@query(
    "text_gopher_quality_filter",
    rf"""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS w,
             length(text)
               - length(replace(replace(text, '#', ''), '...', '')) AS sym
      FROM documents
    ),
    m AS (
      SELECT doc_id,
             len(w) AS n_words,
             ROUND(list_sum(list_transform(w, x -> length(x))) * 1.0
                   / len(w), 6) AS mean_word_len,
             ROUND(sym * 1.0 / len(w), 6) AS symbol_ratio,
             ROUND(len(list_filter(w, x -> regexp_matches(x, '[a-zA-Z]')))
                   * 1.0 / len(w), 6) AS alpha_word_frac,
             len(list_filter(w, x -> x IN {_SQL_STOPS})) AS n_stopwords
      FROM t
    )
    SELECT doc_id, n_words, mean_word_len, symbol_ratio, alpha_word_frac,
           n_stopwords,
           CASE WHEN n_words BETWEEN {_GOPHER_MIN_WORDS} AND {_GOPHER_MAX_WORDS}
                 AND mean_word_len BETWEEN {_GOPHER_MIN_MEAN_LEN} AND {_GOPHER_MAX_MEAN_LEN}
                 AND symbol_ratio <= {_GOPHER_MAX_SYMBOL_RATIO}
                 AND alpha_word_frac >= {_GOPHER_MIN_ALPHA_WORD_FRAC}
                 AND n_stopwords >= {_GOPHER_MIN_STOPWORDS}
                THEN 1 ELSE 0 END AS gopher_pass
    FROM m WHERE doc_id < 300 ORDER BY doc_id
    """,
)
def text_gopher_quality_filter(spark, sf_dir):
    """Gopher/MassiveText document-level quality rules (Rae et al. 2021,
    Table A1): word-count bounds, mean-word-length band, symbol-to-word
    ratio, alphabetic-word fraction, and minimum stopword count — the
    five rules `text_repetition_filter` (dup-token / top-bigram mass)
    does not cover.  Reference analogue: the curation gates a corpus
    pipeline runs before ingest; none exist in the reference engine, so
    this is part of the LLM-pipeline extension surface (BASELINE.json).

    Scale: pure Column expressions over one scan — no shuffle, no UDF;
    the filter runs map-side ahead of any dedup shuffle exactly like
    `corpus_curation_pipeline`'s quality gate."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    w = tokens(F.col("text"))
    nw = F.size(w)
    mean_len = F.round(
        F.aggregate(w, F.lit(0), lambda acc, x: acc + F.length(x))
        * F.lit(1.0) / nw, 6)
    sym = F.length("text") - F.length(
        F.replace(F.replace(F.col("text"), F.lit("#"), F.lit("")),
                  F.lit("..."), F.lit("")))
    symbol_ratio = F.round(sym * F.lit(1.0) / nw, 6)
    alpha_frac = F.round(
        F.size(F.filter(w, lambda x: x.rlike("[a-zA-Z]")))
        * F.lit(1.0) / nw, 6)
    n_stop = F.size(F.filter(w, lambda x: x.isin(*STOPWORDS)))
    passed = (
        nw.between(_GOPHER_MIN_WORDS, _GOPHER_MAX_WORDS)
        & mean_len.between(_GOPHER_MIN_MEAN_LEN, _GOPHER_MAX_MEAN_LEN)
        & (symbol_ratio <= _GOPHER_MAX_SYMBOL_RATIO)
        & (alpha_frac >= _GOPHER_MIN_ALPHA_WORD_FRAC)
        & (n_stop >= _GOPHER_MIN_STOPWORDS)
    )
    return d.select(
        "doc_id",
        nw.alias("n_words"),
        mean_len.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        alpha_frac.alias("alpha_word_frac"),
        n_stop.alias("n_stopwords"),
        F.when(passed, 1).otherwise(0).alias("gopher_pass"),
    ).orderBy("doc_id")


# --- tsvector manipulation (tsvector_op.cpp): || concat, ts_delete, strip -

_TSOPS_TITLE = 5  # leading tokens form the title zone (as fts_setweight_rank)


@query(
    "fts_tsvector_ops",
    rf"""
    WITH t AS (
      SELECT doc_id,
             string_split_regex(trim(regexp_replace(lower(text),
                                 '[^a-z0-9]+', ' ', 'g')), ' ') AS lex
      FROM documents WHERE doc_id < 60
    ),
    z AS (
      SELECT doc_id,
             list_sort(list_distinct(lex[1:{_TSOPS_TITLE}])) AS title_vec,
             list_sort(list_distinct(lex[{_TSOPS_TITLE + 1}:])) AS body_vec
      FROM t
    )
    SELECT doc_id,
           len(title_vec) AS title_len,
           len(body_vec) AS body_len,
           len(list_sort(list_distinct(list_concat(title_vec, body_vec))))
             AS concat_len,
           len(list_filter(list_sort(list_distinct(
                 list_concat(title_vec, body_vec))), x -> x <> 'the'))
             AS len_after_delete,
           array_to_string(list_sort(list_distinct(title_vec)), ' ')
             AS title_strip
    FROM z ORDER BY doc_id
    """,
)
def fts_tsvector_ops(spark, sf_dir):
    """tsvector manipulation operators (tsvector_op.cpp): `||`
    concatenation (tsvector_concat :431), ts_delete (:582), strip
    (:303) and length(tsvector).  The engine's tsvector model is the
    sorted-distinct lexeme array (SURVEY.md §2.7 full-text row), so
    concat = sorted distinct union, ts_delete = array_remove, strip =
    the identity that forgets positions — rendered here as the
    canonical space-joined text, the form PG's strip() output prints.

    Two zones per document (leading {5} tokens = title, rest = body)
    exercise concat across real vectors.  Pure column expressions, one
    scan, no shuffle."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)
    lex = ts_lexemes(F.col("text"))
    z = (
        d.select("doc_id", lex.alias("ts_lex"))
        .select(
            "doc_id",
            F.array_sort(F.array_distinct(
                F.slice(F.col("ts_lex"), 1, _TSOPS_TITLE))).alias("title_vec"),
            F.array_sort(F.array_distinct(
                F.slice(
                    F.col("ts_lex"),
                    _TSOPS_TITLE + 1,
                    F.greatest(F.size("ts_lex") - _TSOPS_TITLE, F.lit(0)),
                ))).alias("body_vec"),
        )
    )
    cat = F.array_sort(F.array_distinct(
        F.concat(F.col("title_vec"), F.col("body_vec"))))
    return z.select(
        "doc_id",
        F.size("title_vec").alias("title_len"),
        F.size("body_vec").alias("body_len"),
        F.size(cat).alias("concat_len"),
        F.size(F.array_remove(cat, "the")).alias("len_after_delete"),
        F.array_join(F.array_sort(F.array_distinct(F.col("title_vec"))), " ")
            .alias("title_strip"),
    ).orderBy("doc_id")
