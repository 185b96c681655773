"""SentencePiece-style unigram-LM tokenizer induction — in scaled integers.

Completes the tokenizer family next to BPE (``functions/bpe.py``): where
BPE grows a vocabulary bottom-up by greedy pair merges, the unigram LM
[Kudo 2018, "Subword Regularization"] starts from an over-complete seed
vocabulary and lets segmentation likelihood decide which pieces carry the
corpus.  This is hard-EM (Viterbi-EM), the deterministic variant:

1. **Seed** — every substring of length 1..:data:`UNI_MAX_PIECE` of every
   corpus word, massed by ``Σ word_count · occurrences``; keep the top
   :data:`UNI_SEED_K` by ``(mass DESC, piece)`` plus ALL single
   characters (so every word stays segmentable).
2. **E-step** — per distinct word, the single best segmentation under
   the current piece costs, via Viterbi.  Costs are scaled-integer
   NEGATIVE LOG probabilities: ``cost(p) = ilog2fp(total) −
   ilog2fp(count(p))`` where ``ilog2fp(x) = floor(2¹⁶·log₂ x)`` is
   computed by a pure-integer shift-and-square fold — no transcendental
   library call anywhere, so Spark and DuckDB produce bit-identical
   costs (IEEE ``ln`` is not correctly rounded and differs across
   libms; integer folds don't).  Ties break on the lexicographically
   smallest piece sequence — total order, engine-independent.
3. **M-step** — piece counts = ``Σ word_count · uses`` over the best
   segmentations; multi-char pieces that went unused DROP OUT, single
   chars floor at count 1 (the SentencePiece keep-chars rule).
4. repeat 2-3 for ``rounds``.

**Scale shape (the BPE guard, inherited):** the corpus is touched once —
:func:`killrweather_spark.functions.bpe._word_counts` — and every EM
round runs on vocabulary-sized state only: the word table, the piece
table (≤ seed_k + |alphabet| rows), and a per-word edge list bounded by
``word_len · max_piece``.  The Viterbi DP is ONE JVM ``aggregate``
expression per word (array-of-structs dynamic program over positions —
no per-round shuffle at all beyond the piece-cost broadcast join), so a
32k-piece production build costs per-round what the vocabulary costs,
never what the corpus does.  Rounds localCheckpoint the piece table, the
BPE lineage rule.

The DuckDB oracle replays induction with the same integer arithmetic;
its E-step enumerates all segmentations of each distinct word through a
recursive CTE and takes the struct-MIN — exponential in word length
where the engine's DP is quadratic, which is fine for an oracle over
bounded-length words and deliberately NOT the engine's plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from killrweather_spark.functions.bpe import _TOK_SQL, _word_counts

UNI_MAX_PIECE = 4
UNI_SEED_K = 64
UNI_ROUNDS = 2

# Unreachable-DP sentinel: far above any real path cost (≤ word_len ·
# 2¹⁶·log₂(total) ≈ 2²⁶ even at 10¹² corpus pieces) yet far below
# int64 overflow when a handful of them add.
_INF = 1_125_899_906_842_624  # 2^50


def _ilog2fp_expr(x: str) -> str:
    """``floor(2¹⁶·log₂(x))`` for a positive int64 expression, as pure
    integer arithmetic: exponent from the binary-string length, mantissa
    normalized to fixed-point 2³⁰, then a 16-step branchless
    shift-and-square fold packing ``(mantissa, frac_bits)`` into one
    BIGINT (``state = m·2¹⁷ + f``).  Exact on both engines for every
    value tested (including > 2³⁰); what parity needs is only that both
    engines run THIS algorithm."""
    e = f"(length(conv(cast({x} as string), 10, 2)) - 1)"
    m0 = (
        f"CASE WHEN {e} <= 30 THEN shiftleft({x}, 30 - {e}) "
        f"ELSE shiftright({x}, {e} - 30) END"
    )
    v = "shiftright(shiftright(s, 17) * shiftright(s, 17), 30)"
    step = (
        f"shiftleft(shiftright({v}, cast({v} div 2147483648 as int)), 17)"
        f" + ((s % 131072) * 2 + ({v} div 2147483648))"
    )
    return (
        f"(cast({e} as bigint) * 65536 + "
        f"(aggregate(sequence(1, 16), shiftleft({m0}, 17), "
        f"(s, i) -> {step}) % 131072))"
    )


# Viterbi over positions 1..len(word): dp[i] (= acc[i+1]) is the best
# (cost, path) of the prefix of length i; each step folds the edges
# ending at i (edge = (s, l, c, p): piece p covers chars s..s+l-1, so it
# extends dp[s-1] = acc[s]).  least() on the (c, p) struct gives min cost
# with lexicographic path tiebreak — a total order, so the fold is
# insensitive to the edge list's (collect_list, nondeterministic) order.
_VITERBI_EXPR = f"""
element_at(
 aggregate(
   sequence(1, length(word)),
   array(named_struct('c', 0L, 'p', '')),
   (acc, i) -> concat(acc, array(
      aggregate(
        filter(edges, e -> e.s + e.l - 1 = i),
        named_struct('c', {_INF}L, 'p', ''),
        (m, e) -> least(m, named_struct(
            'c', element_at(acc, e.s).c + e.c,
            'p', CASE WHEN element_at(acc, e.s).p = ''
                      THEN e.p
                      ELSE concat(element_at(acc, e.s).p, ' ', e.p) END))
      )))
 ), -1)
"""

# all (start, len, piece) substrings of `word` up to UNI_MAX_PIECE chars
_SUBSTR_EXPR = (
    "flatten(transform(sequence(1, length(word)), "
    f"s -> transform(sequence(1, least({UNI_MAX_PIECE}, "
    "length(word) - s + 1)), "
    "l -> named_struct('s', s, 'l', l, 'piece', substring(word, s, l)))))"
)


def _seed_vocab(words: DataFrame, seed_k: int) -> DataFrame:
    """``(piece, cnt)``: top-``seed_k`` substrings by corpus mass plus
    every single character (union dedups the overlap)."""
    subs = words.select(
        "cnt", F.explode(F.expr(_SUBSTR_EXPR)).alias("e")
    ).select("cnt", F.col("e.piece").alias("piece"))
    c0 = subs.groupBy("piece").agg(
        F.sum("cnt").cast("bigint").alias("cnt")
    )
    top = c0.orderBy(F.col("cnt").desc(), "piece").limit(seed_k)
    chars = c0.filter(F.length("piece") == 1)
    return top.union(chars).distinct()


def _piece_costs(vocab: DataFrame) -> DataFrame:
    """``(piece, cost_fp)`` — scaled-integer neg-log prob against the
    vocab's total mass (a 1-row broadcast scalar)."""
    total = vocab.agg(F.sum("cnt").cast("bigint").alias("__t"))
    return (
        vocab.crossJoin(F.broadcast(total))
        .select(
            "piece",
            "cnt",
            (
                F.expr(_ilog2fp_expr("__t")) - F.expr(_ilog2fp_expr("cnt"))
            ).cast("bigint").alias("cost_fp"),
        )
    )


def _segment(words: DataFrame, costs: DataFrame) -> DataFrame:
    """``(word, cnt, path)`` — the Viterbi-best segmentation of every
    distinct word under ``costs``, path as space-joined pieces.

    r13 edge build: the cost table is vocabulary-sized (≤ seed_k +
    |alphabet| rows), so it collects to the driver and enters the plan
    as a literal map — the per-word edge list is then a row-local
    ``filter(transform(...))`` over the word's own substrings instead
    of an explode → broadcast-join → collect_list groupBy → join-back
    chain (one Exchange and two joins per E-step round removed).  Map
    lookup ≡ the former inner join on piece, so the edge set and the
    Viterbi fold are value-identical."""
    rows = costs.select("piece", "cost_fp").collect()
    # ONE parsed map(...) expression instead of 2·|vocab| F.lit py4j
    # round-trips per E-step round (r13): with ~90 pieces × 4 segment
    # calls per query the Column-API form spent ~0.5 s of driver time
    # just BUILDING the literal map.  Same map, one parse.
    entries = ", ".join(
        "'{}', {}L".format(r["piece"].replace("'", "''"), int(r["cost_fp"]))
        for r in rows
    )
    cmap = F.expr(f"map({entries})") if rows else F.create_map()
    edges_expr = F.expr(
        f"filter(transform({_SUBSTR_EXPR}, "
        "e -> named_struct('s', e.s, 'l', e.l, "
        "'c', element_at(__cmap, e.piece), 'p', e.piece)), "
        "e -> e.c IS NOT NULL)"
    )
    return (
        words.withColumn("__cmap", cmap)
        .withColumn("edges", edges_expr)
        .select("word", "cnt", F.expr(_VITERBI_EXPR).alias("best"))
        .select("word", "cnt", F.col("best.p").alias("path"))
    )


def _induce(
    words: DataFrame,
    rounds: int,
    seed_k: int,
    prune_schedule: tuple[int, ...] | None = None,
) -> DataFrame:
    """Run seeding + ``rounds`` of Viterbi-EM on a bare ``(word, cnt)``
    frame; returns the final ``(piece, cnt)`` vocabulary.  State is
    localCheckpointed per round (the BPE lineage rule), so round N's
    plan never embeds round N-1's.

    With ``prune_schedule`` (one entry per round, overriding ``rounds``),
    round *r* additionally PRUNES the multi-char vocabulary to the top
    ``prune_schedule[r-1]`` pieces by ``(count DESC, piece)`` after its
    M-step — the SentencePiece outer loop, with Viterbi usage mass as
    the loss proxy (the piece the corpus barely routes through is the
    piece whose removal costs least); single chars are never pruned, so
    every word stays segmentable."""
    if prune_schedule is not None:
        rounds = len(prune_schedule)
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    words = words.localCheckpoint(eager=True)
    vocab = _seed_vocab(words, seed_k).localCheckpoint(eager=True)
    chars = vocab.filter(F.length("piece") == 1).select("piece")
    for rnd in range(rounds):
        seg = _segment(words, _piece_costs(vocab))
        usage = (
            seg.select(
                "cnt", F.explode(F.split("path", " ")).alias("piece")
            )
            .groupBy("piece")
            .agg(F.sum("cnt").cast("bigint").alias("used"))
        )
        kept_chars = (
            chars.join(usage, "piece", "left")
            .select(
                "piece",
                F.greatest(
                    F.coalesce(F.col("used"), F.lit(0)), F.lit(1)
                ).cast("bigint").alias("cnt"),
            )
        )
        kept_multi = usage.filter(F.length("piece") > 1).select(
            "piece", F.col("used").alias("cnt")
        )
        if prune_schedule is not None:
            kept_multi = (
                kept_multi.orderBy(F.col("cnt").desc(), "piece")
                .limit(prune_schedule[rnd])
            )
        vocab = kept_chars.union(kept_multi).localCheckpoint(eager=True)
    return vocab


def unigram_lm_vocab(
    docs: DataFrame, rounds: int = UNI_ROUNDS, seed_k: int = UNI_SEED_K
) -> DataFrame:
    """The induced unigram-LM vocabulary after ``rounds`` of Viterbi-EM:
    ``(piece, piece_count, cost_fp)`` with counts from the final E-step
    and costs from those counts (what a Viterbi APPLY would consume)."""
    vocab = _induce(_word_counts(docs), rounds, seed_k)
    return _piece_costs(vocab).select(
        "piece",
        F.col("cnt").alias("piece_count"),
        "cost_fp",
    )


UNI_PRUNE_SCHEDULE = (48, 32, 24)


def unigram_lm_pruned(
    docs: DataFrame,
    prune_schedule: tuple[int, ...] = UNI_PRUNE_SCHEDULE,
    seed_k: int = UNI_SEED_K,
) -> DataFrame:
    """The SentencePiece OUTER loop: Viterbi-EM rounds interleaved with
    vocabulary pruning down a fixed schedule of multi-char piece budgets
    (production: ~20% shaved per iteration from an over-complete seed
    until the target vocab size; here ``seed_k``→48→32→24 so the oracle
    replays a structurally fixed chain).  The loss proxy is Viterbi
    usage mass — hard-EM's analogue of SentencePiece's
    likelihood-drop-if-removed score: a piece the corpus rarely routes
    through contributes least to corpus likelihood.  Pruning is
    ``(count DESC, piece)`` — deterministic on both engines.  Single
    characters are exempt (the keep-chars rule), so segmentability is
    invariant.  Returns ``(piece, piece_count, cost_fp)`` like
    :func:`unigram_lm_vocab`.

    Scale shape: identical to :func:`unigram_lm_vocab` — every round is
    vocabulary-bound (the corpus is touched once for word counts), and
    the prune is a top-k over ≤ seed_k rows."""
    vocab = _induce(
        _word_counts(docs), 0, seed_k, prune_schedule=prune_schedule
    )
    return _piece_costs(vocab).select(
        "piece",
        F.col("cnt").alias("piece_count"),
        "cost_fp",
    )


def unigram_subword_stats(
    docs: DataFrame, rounds: int = UNI_ROUNDS, seed_k: int = UNI_SEED_K
) -> DataFrame:
    """Tokenizer APPLY: segment every document with the induced
    vocabulary — ``(doc_id, n_words, n_subwords, compression_micro)``,
    mirroring ``bpe_subword_stats`` (chars per subword, integer micro).
    One corpus pass builds doc word counts; segmentation is per DISTINCT
    word (vocabulary-sized) and joins back by word."""
    from killrweather_spark.functions.text import tokens
    from killrweather_spark.plans.caching import persist_once

    doc_words = (
        docs.select(
            "doc_id", F.explode(tokens(F.col("text"))).alias("word")
        )
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("wcnt"))
        .transform(persist_once)
    )
    words = doc_words.groupBy("word").agg(
        F.sum("wcnt").cast("bigint").alias("cnt")
    )
    vocab = _induce(words, rounds, seed_k)
    seg = _segment(words, _piece_costs(vocab)).select(
        "word",
        F.size(F.split("path", " ")).cast("bigint").alias("n_sub"),
        F.length("word").cast("bigint").alias("n_chars"),
    )
    return (
        doc_words.join(seg, "word")
        .groupBy("doc_id")
        .agg(
            F.sum("wcnt").cast("bigint").alias("n_words"),
            F.sum(F.col("wcnt") * F.col("n_sub"))
            .cast("bigint")
            .alias("n_subwords"),
            F.expr(
                "(1000000 * sum(wcnt * n_chars)) div sum(wcnt * n_sub)"
            )
            .cast("bigint")
            .alias("compression_micro"),
        )
    )


# --------------------------------------------------------------------------
# DuckDB oracles
# --------------------------------------------------------------------------

def _ilog2fp_sql(x: str) -> str:
    """The DuckDB twin of :func:`_ilog2fp_expr` — same exponent/mantissa
    split, same 16-step branchless packed-BIGINT fold via
    ``list_reduce`` (every step rebuilds the scalar accumulator, so the
    conditional-skip ``list_reduce`` bug class this repo documents on
    the BPE oracle cannot bite).  NOTE: DuckDB binds comparison TIGHTER
    than ``>>``/``<<``, so every shift is fully parenthesized."""
    e = f"(length(bin({x})) - 1)"
    m0 = (
        f"CASE WHEN {e} <= 30 THEN ({x} << (30 - {e})) "
        f"ELSE ({x} >> ({e} - 30)) END"
    )
    v = "(((s >> 17) * (s >> 17)) >> 30)"
    step = (
        f"((({v} >> ({v} // 2147483648)) << 17)"
        f" + ((s % 131072) * 2 + ({v} // 2147483648)))"
    )
    return (
        f"(CAST({e} AS BIGINT) * 65536 + "
        f"(list_reduce(list_transform(generate_series(0, 16), "
        f"i -> CASE WHEN i = 0 THEN (({m0}) << 17) ELSE 0::BIGINT END), "
        f"(s, st) -> {step}) % 131072))"
    )


def _uni_ctes(
    rounds: int,
    seed_k: int,
    w0_from: str | None = None,
    prune_schedule: tuple[int, ...] | None = None,
) -> str:
    """The induction CTE chain (``uw`` → ``uvocab{rounds}`` →
    ``ucosts_final``).  Per round: costs (integer fold), edges, a
    recursive all-segmentations enumeration, struct-MIN best path,
    usage rollup, char floor.  Multiply-referenced CTEs are
    MATERIALIZED (the 2^k inlining class).  ``prune_schedule`` mirrors
    :func:`_induce`'s prune: round r keeps the top schedule[r-1]
    multi-char pieces by (cnt DESC, piece), chars exempt."""
    if prune_schedule is not None:
        rounds = len(prune_schedule)
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    src = (
        w0_from
        if w0_from is not None
        else f"(SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt FROM "
        f"(SELECT unnest({_TOK_SQL}) AS word FROM documents) GROUP BY word)"
    )
    parts = [
        f"uw AS MATERIALIZED (SELECT word, cnt FROM {src})",
        "usub AS MATERIALIZED (\n"
        "      SELECT word, cnt, s.s AS s, l.l AS l,\n"
        "             substr(word, s.s, l.l) AS piece\n"
        "      FROM uw,\n"
        "           unnest(generate_series(1, len(word))) AS s(s),\n"
        f"           unnest(generate_series(1, least({UNI_MAX_PIECE},"
        " len(word) - s.s + 1))) AS l(l))",
        "uc0 AS MATERIALIZED (\n"
        "      SELECT piece, CAST(SUM(cnt) AS BIGINT) AS cnt\n"
        "      FROM usub GROUP BY piece)",
        f"utop AS (SELECT piece, cnt FROM uc0"
        f" ORDER BY cnt DESC, piece LIMIT {seed_k})",
        "uchars AS MATERIALIZED (SELECT piece, cnt FROM uc0"
        " WHERE len(piece) = 1)",
        "uvocab0 AS MATERIALIZED (SELECT piece, cnt FROM utop"
        " UNION SELECT piece, cnt FROM uchars)",
    ]
    def vname(r: int) -> str:
        return (
            f"uvp{r}"
            if prune_schedule is not None and r >= 1
            else f"uvocab{r}"
        )

    for r in range(1, rounds + 1):
        prev = vname(r - 1)
        parts.append(
            f"utot{r} AS (SELECT CAST(SUM(cnt) AS BIGINT) AS t FROM {prev})"
        )
        parts.append(
            f"ucosts{r} AS MATERIALIZED (\n"
            f"      SELECT piece, {_ilog2fp_sql('t')}"
            f" - {_ilog2fp_sql('cnt')} AS cost_fp\n"
            f"      FROM {prev} CROSS JOIN utot{r})"
        )
        parts.append(
            f"uedges{r} AS MATERIALIZED (\n"
            "      SELECT u.word, u.s, u.l, u.piece, c.cost_fp AS c\n"
            f"      FROM usub u JOIN ucosts{r} c USING (piece))"
        )
        parts.append(
            f"ureach{r}(word, pos, c, p) AS (\n"
            "      SELECT word, 0, CAST(0 AS BIGINT), '' FROM uw\n"
            "      UNION\n"
            f"      SELECT r.word, e.s + e.l - 1, r.c + e.c,\n"
            "             CASE WHEN r.p = '' THEN e.piece\n"
            "                  ELSE r.p || ' ' || e.piece END\n"
            f"      FROM ureach{r} r JOIN uedges{r} e\n"
            "        ON e.word = r.word AND e.s = r.pos + 1)"
        )
        parts.append(
            f"ubest{r} AS MATERIALIZED (\n"
            "      SELECT r.word, MIN({'c': r.c, 'p': r.p}) AS b\n"
            f"      FROM ureach{r} r JOIN uw ON uw.word = r.word\n"
            "      WHERE r.pos = len(r.word) GROUP BY r.word)"
        )
        parts.append(
            f"uusage{r} AS MATERIALIZED (\n"
            "      SELECT t.piece, CAST(SUM(uw.cnt) AS BIGINT) AS used\n"
            f"      FROM ubest{r} b JOIN uw ON uw.word = b.word,\n"
            "           unnest(string_split(b.b['p'], ' ')) AS t(piece)\n"
            "      GROUP BY t.piece)"
        )
        parts.append(
            f"uvocab{r} AS MATERIALIZED (\n"
            "      SELECT ch.piece,\n"
            "             GREATEST(COALESCE(u.used, 0), 1) AS cnt\n"
            f"      FROM uchars ch LEFT JOIN uusage{r} u USING (piece)\n"
            "      UNION ALL\n"
            f"      SELECT piece, used AS cnt FROM uusage{r}"
            " WHERE len(piece) > 1)"
        )
        if prune_schedule is not None:
            parts.append(
                f"uvp{r} AS MATERIALIZED (\n"
                f"      SELECT piece, cnt FROM uvocab{r}"
                " WHERE len(piece) = 1\n"
                "      UNION ALL\n"
                "      SELECT piece, cnt FROM (\n"
                f"        SELECT piece, cnt FROM uvocab{r}"
                " WHERE len(piece) > 1\n"
                f"        ORDER BY cnt DESC, piece"
                f" LIMIT {prune_schedule[r - 1]}))"
            )
    parts.append(
        f"utot_f AS (SELECT CAST(SUM(cnt) AS BIGINT) AS t"
        f" FROM {vname(rounds)})"
    )
    parts.append(
        "ucosts_final AS MATERIALIZED (\n"
        "      SELECT piece, cnt AS piece_count,\n"
        f"             {_ilog2fp_sql('t')} - {_ilog2fp_sql('cnt')}"
        " AS cost_fp\n"
        f"      FROM {vname(rounds)} CROSS JOIN utot_f)"
    )
    return ",\n    ".join(parts)


def unigram_lm_vocab_sql(
    rounds: int = UNI_ROUNDS, seed_k: int = UNI_SEED_K
) -> str:
    return f"""
    WITH RECURSIVE {_uni_ctes(rounds, seed_k)}
    SELECT piece, piece_count, cost_fp FROM ucosts_final
    """


def unigram_lm_pruned_sql(
    prune_schedule: tuple[int, ...] = UNI_PRUNE_SCHEDULE,
    seed_k: int = UNI_SEED_K,
) -> str:
    return f"""
    WITH RECURSIVE {_uni_ctes(0, seed_k, prune_schedule=prune_schedule)}
    SELECT piece, piece_count, cost_fp FROM ucosts_final
    """


def unigram_subword_stats_sql(
    rounds: int = UNI_ROUNDS, seed_k: int = UNI_SEED_K
) -> str:
    """Apply oracle: one extra Viterbi pass (enumeration) under the
    FINAL costs, joined back to per-doc word counts — the
    ``bpe_subword_stats`` shape."""
    dw = (
        "(SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS wcnt FROM "
        f"(SELECT doc_id, unnest({_TOK_SQL}) AS word FROM documents) "
        "GROUP BY doc_id, word)"
    )
    return f"""
    WITH RECURSIVE udw AS MATERIALIZED {dw},
    {_uni_ctes(rounds, seed_k,
               w0_from="(SELECT word, CAST(SUM(wcnt) AS BIGINT) AS cnt"
                       " FROM udw GROUP BY word)")},
    fedges AS MATERIALIZED (
      SELECT u.word, u.s, u.l, u.piece, c.cost_fp AS c
      FROM usub u JOIN ucosts_final c USING (piece)),
    freach(word, pos, c, p) AS (
      SELECT word, 0, CAST(0 AS BIGINT), '' FROM uw
      UNION
      SELECT r.word, e.s + e.l - 1, r.c + e.c,
             CASE WHEN r.p = '' THEN e.piece
                  ELSE r.p || ' ' || e.piece END
      FROM freach r JOIN fedges e
        ON e.word = r.word AND e.s = r.pos + 1),
    fbest AS MATERIALIZED (
      SELECT r.word, MIN({{'c': r.c, 'p': r.p}}) AS b
      FROM freach r JOIN uw ON uw.word = r.word
      WHERE r.pos = len(r.word) GROUP BY r.word),
    fseg AS (
      SELECT word, len(string_split(b['p'], ' ')) AS n_sub,
             len(word) AS n_chars
      FROM fbest)
    SELECT d.doc_id,
           CAST(SUM(d.wcnt) AS BIGINT) AS n_words,
           CAST(SUM(d.wcnt * s.n_sub) AS BIGINT) AS n_subwords,
           CAST((1000000 * SUM(d.wcnt * s.n_chars))
                // SUM(d.wcnt * s.n_sub) AS BIGINT) AS compression_micro
    FROM udw d JOIN fseg s USING (word)
    GROUP BY d.doc_id
    """
