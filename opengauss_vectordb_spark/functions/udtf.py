"""Python UDTF surface — the reference's user-defined table functions
(PL functions RETURNS SETOF / RETURNS TABLE, SURVEY.md §2.10) expressed
through Spark's native Python UDTF API (`pyspark.sql.functions.udtf`,
usable from SQL via LATERAL after `spark.udtf.register`).

The demo operator is token chunking — split each document into
fixed-size token windows, the preprocessing step that turns a corpus
into training sequences. NOTE the engine's position on Python in hot
paths still stands: set-returning logic that IS expressible relationally
(unnest/posexplode/slice — see functions_ext.unnest_project_set) should
stay JVM-side; the UDTF exists for the API surface the reference exposes
to users whose table function is arbitrary Python. Chunking is also
implemented relationally right below in the same gated query's oracle
(slice arithmetic), which keeps the UDTF oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query

CHUNK = 32  # tokens per chunk


def _chunk_udtf_class():
    """Defined lazily so importing this module never requires a live
    Spark session (the decorator validates the return schema eagerly)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_id int, n_tokens int, chunk string")
    class ChunkTokens:
        def eval(self, text: str):
            if text is None:
                return
            toks = text.split()
            for j in range(0, len(toks), CHUNK):
                window = toks[j : j + CHUNK]
                yield j // CHUNK, len(window), " ".join(window)

    return ChunkTokens


@query(
    "udtf_token_chunks",
    rf"""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
      FROM documents WHERE doc_id < 20 AND len(trim(text)) > 0
    ), chunks AS (
      SELECT doc_id,
             unnest(list_transform(
               range(0, CAST(ceil(len(w) / {CHUNK}.0) AS INT)),
               c -> {{'chunk_id': c,
                      'n_tokens': len(w[c * {CHUNK} + 1 : c * {CHUNK} + {CHUNK}]),
                      'chunk': array_to_string(
                        w[c * {CHUNK} + 1 : c * {CHUNK} + {CHUNK}], ' ')}})) AS ch
      FROM t
    )
    SELECT doc_id, ch.chunk_id AS chunk_id,
           CAST(ch.n_tokens AS INT) AS n_tokens, ch.chunk AS chunk
    FROM chunks
    ORDER BY doc_id, chunk_id
    """,
)
def udtf_token_chunks(spark, sf_dir):
    """Token chunking through the Python UDTF API: LATERAL-join each
    document to its fixed-size token windows. The oracle states the same
    chunking relationally (list slices), pinning the UDTF's semantics.
    Bounded to 20 docs at the gate — the UDTF is the deliberate
    Python-path surface, not the scale path (posexplode+window is)."""
    ChunkTokens = _chunk_udtf_class()
    spark.udtf.register("chunk_tokens", ChunkTokens)
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    d.createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_id, c.n_tokens, c.chunk
        FROM _udtf_docs d, LATERAL chunk_tokens(d.text) c
        ORDER BY d.doc_id, c.chunk_id
        """
    )
