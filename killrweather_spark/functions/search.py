"""Ranked full-text retrieval (BM25 family) over the documents corpus.

The reference's query surface is key-addressed (SURVEY §2.11); ranked
retrieval is part of the beyond-reference LLM-data-pipeline surface: given a
bag of query terms, score every matching document and return the top-k —
the "find near-duplicate / relevant training docs" primitive that pairs
with the inverted index (`text.py` / `inverted_index`).

Spark-first shape (all JVM expressions, no Python in the row path):

1. tokenize once (`regexp_extract_all`, shared with token_counts) and
   explode term occurrences — a narrow map;
2. corpus stats (N docs, total token length) reduce to ONE row that joins
   back by broadcast — no shuffle of the fact side;
3. per-(doc, term) term frequencies group on doc_id — the only shuffle,
   keyed by the natural output key;
4. document frequencies per query term reduce to ≤|query| rows, broadcast;
5. score = Σ_terms tf_norm × idf, then a global top-k
   (TakeOrderedAndProject — no total sort).

At 100 TB: the explode fans out ~200× rows but they stay narrow
(doc_id, term); partial aggregation (map-side combine) collapses them
before the shuffle, so exchanged bytes ≈ |distinct (doc, query-term)|,
bounded by |query| × N. Query terms are filtered BEFORE the tf shuffle, so
exchanged rows ∝ matching terms only, not corpus vocabulary.

Cross-engine determinism (DuckDB oracle hash-compares values): BM25's
`ln`-idf and float divisions drift in the last ulp across engines, so both
factors are computed in scaled integer arithmetic with floor division —
exact on both engines:

- `tf_norm_micro = 1e6·tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))`, with
  k1 = 6/5 and b = 3/4 cleared to the integer form
  `(1_000_000·22·tf·L) div (10·tf·L + 3·L + 9·dl·N)` where L = Σdl;
- idf uses the Robertson ratio `(N−df+½)/(df+½) = (2N−2df+1)/(2df+1)`
  scaled to milli-units, log-free. (Production swap: `ln` of the same
  ratio — one float per query term; kept integer here so ranking is
  bit-reproducible and oracle-replayable.)

Magnitudes: tf ≤ dl ≤ ~10⁴, L ≤ ~10⁹ at sf0.1-scale ⇒ the widest product
10⁶·22·tf·L stays under 2⁶³ through ~10¹² total tokens; beyond that,
rescale micro→milli or switch the two factors to DECIMAL(38,0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from killrweather_spark.functions.text import tokens

SCALE_TF = 1_000_000  # micro-units for the tf saturation factor
SCALE_IDF = 1_000  # milli-units for the rational idf


def bm25_topk(docs: DataFrame, query_terms: list[str], k: int = 10) -> DataFrame:
    """Top-``k`` documents for ``query_terms`` under integer-exact BM25.

    Returns ``(doc_id, n_terms_matched, score)`` where ``score`` is the
    summed ``tf_norm_micro × idf_milli`` (bigint; larger = more relevant),
    ordered score-desc with doc_id as the total tiebreak.
    """
    toks = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("term")
    )
    # per-document token length, kept with each occurrence via a doc-keyed
    # aggregation at the end; corpus totals reduce to one broadcast row
    dl = docs.select(
        "doc_id", F.size(tokens(F.col("text"))).alias("dl")
    )
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").cast("bigint").alias("total_len"),
    )

    hits = toks.filter(F.col("term").isin(query_terms))
    tf = hits.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    df_ = (
        hits.groupBy("term")
        .agg(F.count_distinct("doc_id").cast("bigint").alias("df"))
    )

    scored = (
        tf.join(F.broadcast(df_), "term")
        .join(F.broadcast(stats))
        .join(dl, "doc_id")
        .withColumn(
            "tf_norm_micro",
            F.expr(
                f"({SCALE_TF} * 22 * tf * total_len) div "
                "(10 * tf * total_len + 3 * total_len + 9 * dl * n_docs)"
            ),
        )
        .withColumn(
            "idf_milli",
            F.expr(
                f"({SCALE_IDF} * (2 * n_docs - 2 * df + 1)) div (2 * df + 1)"
            ),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_terms_matched"),
            F.sum(F.col("tf_norm_micro") * F.col("idf_milli"))
            .cast("bigint")
            .alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("doc_id"))
        .limit(k)
    )


RRF_K = 60  # the standard reciprocal-rank-fusion damping constant
RRF_SCALE = 1_000_000  # integer micro-units: 1e6 div (K + rank)


def hybrid_rrf_search(
    docs: DataFrame,
    emb: DataFrame,
    query_terms: list[str],
    query_vec_id: int = 0,
    depth: int = 20,
    k: int = 10,
) -> DataFrame:
    """Hybrid lexical+semantic retrieval via RECIPROCAL RANK FUSION
    [Cormack et al. 2009]: BM25 ranks the term query, exact cosine ranks
    the vector query (the embedding of ``query_vec_id`` — ids align with
    ``doc_id`` in the synthetic corpus), each list is cut at ``depth``,
    and a document's fused score is ``Σ_lists 1e6 div (60 + rank)`` —
    integer micro-units, so both engines agree bit-for-bit where float
    1/(k+r) sums would drift.  Returns the top-``k``
    ``(doc_id, lex_rank, sem_rank, rrf_micro)`` (ranks NULL for a list
    that missed the doc), ordered fused-desc with doc_id tiebreak.

    Scale shape: each side is an independently bounded top-``depth``
    (BM25's TakeOrdered; the semantic side is one broadcast-query dot
    pass — swap in ``ann_pq_adc``/``ivf_probe_topk`` for the
    corpus-scale candidate generator, the fusion is agnostic); the
    fusion itself joins two ≤depth-row lists — driver-free,
    broadcast-trivial."""
    from killrweather_spark.functions.similarity import (
        cosine_norms,
        quantized_components,
    )

    lex = bm25_topk(docs, query_terms, k=depth).select(
        "doc_id",
        F.row_number()
        .over(
            Window.orderBy(F.col("score").desc(), F.col("doc_id"))
        )
        .cast("bigint")
        .alias("lex_rank"),
    )
    comp = quantized_components(emb)
    qv = comp.filter(F.col("vec_id") == query_vec_id).select(
        "pos", F.col("q").alias("qa")
    )
    nrm = cosine_norms(comp)
    qn = nrm.filter(F.col("vec_id") == query_vec_id).select(
        F.col("norm2").alias("qnorm2")
    )
    sem = (
        comp.filter(F.col("vec_id") != query_vec_id)
        .join(F.broadcast(qv), "pos")
        .groupBy("vec_id")
        .agg(F.sum(F.col("q") * F.col("qa")).alias("dot"))
        .join(nrm, "vec_id")
        .crossJoin(F.broadcast(qn))
        .withColumn(
            "cosine",
            F.col("dot")
            / (F.sqrt(F.col("qnorm2")) * F.sqrt(F.col("norm2"))),
        )
        # bounded TakeOrdered first, then rank the <=depth survivors —
        # never a corpus-wide single-partition row_number
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(depth)
        .select(
            F.col("vec_id").alias("doc_id"),
            F.row_number()
            .over(Window.orderBy(F.col("cosine").desc(), F.col("vec_id")))
            .cast("bigint")
            .alias("sem_rank"),
        )
    )
    fused = (
        lex.join(sem, "doc_id", "full_outer")
        .withColumn(
            "rrf_micro",
            (
                F.coalesce(
                    F.expr(f"{RRF_SCALE} div ({RRF_K} + lex_rank)"),
                    F.lit(0),
                )
                + F.coalesce(
                    F.expr(f"{RRF_SCALE} div ({RRF_K} + sem_rank)"),
                    F.lit(0),
                )
            ).cast("bigint"),
        )
    )
    return (
        fused.orderBy(F.col("rrf_micro").desc(), F.col("doc_id"))
        .limit(k)
        .select("doc_id", "lex_rank", "sem_rank", "rrf_micro")
    )


def hybrid_rrf_search_sql(
    query_terms: list[str],
    query_vec_id: int = 0,
    depth: int = 20,
    k: int = 10,
) -> str:
    """DuckDB oracle for :func:`hybrid_rrf_search` — same BM25 integer
    arithmetic, same quantized cosine, same integer fusion."""
    return f"""
    WITH {_bm25_ctes_sql(query_terms)},
    bm AS (
      SELECT doc_id, CAST(SUM(tf_norm_micro * idf_milli) AS BIGINT) AS score
      FROM scored GROUP BY doc_id
      ORDER BY score DESC, doc_id LIMIT {depth}
    ),
    lex AS (
      SELECT doc_id,
             CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
               AS lex_rank
      FROM bm
    ),
    comp AS (
      SELECT e.vec_id, i.i AS pos,
             CAST(ROUND(CAST(e.embedding[i.i] AS DOUBLE) * 1000000) AS BIGINT)
               AS q
      FROM embeddings e,
           unnest(generate_series(1, len(e.embedding))) AS i(i)
    ),
    nrm AS (SELECT vec_id, SUM(q * q) AS norm2 FROM comp GROUP BY vec_id
            HAVING SUM(q * q) > 0),
    qv AS (SELECT pos, q AS qa FROM comp WHERE vec_id = {query_vec_id}),
    qn AS (SELECT norm2 AS qnorm2 FROM nrm WHERE vec_id = {query_vec_id}),
    sem AS (
      SELECT doc_id, sem_rank FROM (
        SELECT c.vec_id AS doc_id,
               CAST(ROW_NUMBER() OVER (
                 ORDER BY SUM(c.q * qv.qa)
                          / (SQRT(ANY_VALUE(qn.qnorm2))
                             * SQRT(ANY_VALUE(n.norm2))) DESC,
                          c.vec_id) AS BIGINT) AS sem_rank
        FROM comp c
        JOIN qv USING (pos)
        JOIN nrm n ON n.vec_id = c.vec_id
        CROSS JOIN qn
        WHERE c.vec_id != {query_vec_id}
        GROUP BY c.vec_id)
      WHERE sem_rank <= {depth}
    )
    SELECT COALESCE(l.doc_id, s.doc_id) AS doc_id,
           l.lex_rank AS lex_rank,
           s.sem_rank AS sem_rank,
           CAST(COALESCE({RRF_SCALE} // ({RRF_K} + l.lex_rank), 0)
                + COALESCE({RRF_SCALE} // ({RRF_K} + s.sem_rank), 0)
                AS BIGINT) AS rrf_micro
    FROM lex l
    FULL OUTER JOIN sem s ON s.doc_id = l.doc_id
    ORDER BY rrf_micro DESC, doc_id
    LIMIT {k}
    """


def _bm25_ctes_sql(query_terms: list[str]) -> str:
    """The BM25 scoring CTE chain through ``scored`` — shared by the
    stand-alone oracle and the RRF-fusion oracle."""
    terms = ", ".join(f"'{t}'" for t in query_terms)
    return f"""tok AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
      FROM documents
    ),
    dl AS (
      SELECT doc_id, len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS dl
      FROM documents
    ),
    stats AS (
      SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS total_len FROM dl
    ),
    hits AS (SELECT * FROM tok WHERE term IN ({terms})),
    tf AS (
      SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM hits GROUP BY doc_id, term
    ),
    df AS (
      SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
      FROM hits GROUP BY term
    ),
    scored AS (
      SELECT tf.doc_id,
             ({SCALE_TF} * 22 * tf.tf * s.total_len)
               // (10 * tf.tf * s.total_len + 3 * s.total_len
                   + 9 * dl.dl * s.n_docs) AS tf_norm_micro,
             ({SCALE_IDF} * (2 * s.n_docs - 2 * df.df + 1))
               // (2 * df.df + 1) AS idf_milli
      FROM tf JOIN df USING (term) CROSS JOIN stats s
      JOIN dl ON tf.doc_id = dl.doc_id
    )"""


def bm25_topk_sql(query_terms: list[str], k: int = 10) -> str:
    """DuckDB oracle for :func:`bm25_topk` — same integer arithmetic."""
    return f"""
    WITH {_bm25_ctes_sql(query_terms)}
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_terms_matched,
           CAST(SUM(tf_norm_micro * idf_milli) AS BIGINT) AS score
    FROM scored
    GROUP BY doc_id
    ORDER BY score DESC, doc_id
    LIMIT {k}
    """


