"""Distributed byte-pair-encoding vocabulary learning.

The tokenizer-fitting step of a pretraining pipeline (Sennrich et al.
2016, "Neural Machine Translation of Rare Words with Subword Units"):
repeatedly find the most frequent adjacent symbol pair in the corpus
and merge it into a new symbol.  The reference implementation trains on
the **word-frequency table**, not the raw corpus — and that is exactly
what makes the algorithm distributable: ONE corpus scan builds the
vocabulary-sized ``(word, freq)`` table, then every merge round is an
aggregation over that table (vocabulary-sized, bounded regardless of
corpus bytes).  At 100 TB the corpus scan is the only big job; the
merge loop never touches the corpus again.

Symbol sequences travel as delimiter-wrapped strings — ``low`` with the
end-of-word marker is ``(l)(o)(w)($)`` — so applying a merge is ONE
literal ``replace``: merging ``(l)(o)`` rewrites to ``(lo)``.  Literal
``replace`` is left-to-right and non-overlapping in every engine (the
same occurrence set BPE merges), and because ``(`` only ever starts a
symbol, a pattern ``(a)(b)`` can never false-match inside longer
symbols like ``(xa)(b...`` — the classic substring-boundary bug the
wrapping exists to prevent.  The naive space-separated form
("l o w") is WRONG under plain replace: merging ``b b`` in
``b b b b`` consumes the middle delimiter and yields
``[bb, b, b]`` instead of ``[bb, bb]``.

Every step (pair counts, argmax with a total tiebreak, replace) is
engine-portable integer/string work, so a SQL oracle replays training
bit-for-bit (q138).

Reference behavioral anchor: the reference repo has no tokenizer
trainer; this extends the curation family SURVEY.md §6 scopes for the
training-data pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: symbol delimiters + end-of-word marker.  Symbols must never contain
#: these characters — ``bpe_merges`` guards its input with a regex
#: filter the caller can widen.
SYM_OPEN, SYM_CLOSE, EOW = "(", ")", "$"


def encode_word(col: Column | str) -> Column:
    """``low`` -> ``(l)(o)(w)($)``: one wrapped symbol per character
    plus the end-of-word marker symbol."""
    c = F.col(col) if isinstance(col, str) else col
    return F.concat(
        F.regexp_replace(c, "(.)", f"{SYM_OPEN}$1{SYM_CLOSE}"),
        F.lit(f"{SYM_OPEN}{EOW}{SYM_CLOSE}"),
    )


def _symbols(seq: Column) -> Column:
    """``(l)(o)(w)`` -> array ``[l, o, w]``."""
    return F.split(F.substring(seq, F.lit(2), F.length(seq) - 2), "\\)\\(")


def bpe_merges(
    tokens: DataFrame,
    token_col: str = "token",
    rounds: int = 8,
    token_pattern: str = "^[a-z0-9]+$",
    checkpoint_every: int = 16,
    batch_size: int = 1,
) -> DataFrame:
    """Learn the first ``rounds`` BPE merges from a token column.

    Returns one row per merge round: ``(round, sym_l, sym_r, merged,
    cnt)`` — the trained artifact a tokenizer ships.  Tiebreak is total
    (count desc, then pair lexicographic), so training is deterministic
    on any engine and any partitioning.

    Plan shape: ``groupBy(token).count()`` collapses the corpus to the
    word-frequency table ONCE (persisted — every round reads it); each
    round is then exactly one job — a vocabulary-sized pair aggregation
    topped by a 1-row ``orderBy().limit(1)`` argmax
    (TakeOrderedAndProject) — whose single winning row is collected to
    the driver.  The collect is configuration-bounded by construction
    (1 row × ``rounds``; the repo's bounded-collect convention): BPE is
    inherently sequential — round r's merge RULE is data the round-r+1
    plan must contain as a literal — so the alternative (a broadcast
    crossJoin of the uncollected 1-row argmax) just moves the same
    1-row materialization into a broadcast exchange while doubling the
    per-round job count (the argmax subtree gets re-evaluated for the
    result union) and forcing a per-round persist.  Measured on the
    q138 corpus: 16.1 s lazy-broadcast form → ~2 s this form.

    Merges are applied as a chained literal ``replace`` expression over
    the ONE persisted word table (narrow, whole-stage-codegen'd — no
    per-round shuffle or cache); every ``checkpoint_every`` rounds the
    rewritten vocabulary is re-persisted to cap expression depth, so
    plan size stays O(checkpoint_every), not O(rounds).  Nothing ever
    rescans the corpus after the first aggregation.

    Tokens not matching ``token_pattern`` are dropped (the delimiters
    ``( ) $`` must not occur inside symbols).

    ``batch_size=m`` (> 1) is the standard BATCHED variant for
    production vocabularies (10⁴–10⁵ merges): each JOB collects the
    top ``m + slack`` pairs (still a bounded TakeOrderedAndProject —
    m·4 rows, configuration-sized) and applies, in count order, the
    prefix of pairs that are pairwise SYMBOL-DISJOINT — no selected
    pair shares a symbol with an earlier selected pair, so the m
    literal replaces commute and the batch is order-independent (the
    classic correctness condition: overlapping pairs like (a,b),(b,c)
    compete for the same occurrences, so only the best of an
    overlapping family merges per batch).  Each selected pair's
    recorded ``cnt`` is its count BEFORE the batch (the count the
    argmax ranked on).  ``batch_size=1`` is exact sequential BPE;
    batched training is the throughput knob — rounds/m jobs instead of
    rounds — at the cost of the (standard, quantified) deviation that
    a later in-batch pair was ranked on pre-batch counts.
    """
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    if checkpoint_every < 1:
        raise ValueError(f"checkpoint_every must be >= 1, got {checkpoint_every}")
    if batch_size < 1:
        raise ValueError(f"batch_size must be >= 1, got {batch_size}")
    spark = tokens.sparkSession
    base = (
        tokens.filter(F.col(token_col).rlike(token_pattern))
        .groupBy(token_col)
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
        .select(encode_word(token_col).alias("seq"), "freq")
        .persist()
    )
    caches = [base]
    seq_expr: Column = F.col("seq")
    merges: list[tuple[int, str, str, str, int]] = []
    jobs_since_ckpt = 0
    while len(merges) < rounds:
        syms = _symbols(seq_expr)
        n = F.size(syms)
        pairs = caches[-1].select(
            "freq",
            F.explode(
                F.when(
                    n >= 2,
                    F.transform(
                        F.sequence(F.lit(1), n - 1),
                        lambda i: F.struct(
                            syms[i - 1].alias("sym_l"), syms[i].alias("sym_r")
                        ),
                    ),
                ).otherwise(
                    F.array().cast("array<struct<sym_l:string,sym_r:string>>")
                )
            ).alias("_p"),
        ).select(F.col("_p.sym_l"), F.col("_p.sym_r"), "freq")
        want = min(batch_size, rounds - len(merges))
        # over-fetch 4x so the disjointness filter still fills the batch
        # when top pairs overlap; the collect stays configuration-bounded
        fetch = want if want == 1 else want * 4
        best = (
            pairs.groupBy("sym_l", "sym_r")
            .agg(F.sum("freq").cast("long").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("sym_l"), F.asc("sym_r"))
            .limit(fetch)
            .collect()
        )
        if not best:
            break  # vocabulary fully merged: no adjacent pairs left
        used: set[str] = set()
        selected = 0
        for row in best:
            if selected == want:
                break
            left, right, cnt = row["sym_l"], row["sym_r"], row["cnt"]
            # symbol-disjointness within the batch: the replaces commute
            if left in used or right in used or (left + right) in used:
                continue
            used.update((left, right, left + right))
            merges.append((len(merges) + 1, left, right, left + right, cnt))
            seq_expr = F.replace(
                seq_expr,
                F.lit(f"{SYM_OPEN}{left}{SYM_CLOSE}{SYM_OPEN}{right}{SYM_CLOSE}"),
                F.lit(f"{SYM_OPEN}{left}{right}{SYM_CLOSE}"),
            )
            selected += 1
        jobs_since_ckpt += 1
        if jobs_since_ckpt % checkpoint_every == 0 and len(merges) < rounds:
            caches.append(
                caches[-1].select(seq_expr.alias("seq"), "freq").persist()
            )
            seq_expr = F.col("seq")
    for c in caches:
        c.unpersist()
    return spark.createDataFrame(
        merges, "round long, sym_l string, sym_r string, merged string, cnt long"
    )


def bpe_segment(
    df: DataFrame,
    text_col: str,
    merges: list[tuple[str, str]],
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Apply learned merges to a WORD column: the encode side of the
    tokenizer.  ``merges`` is the (bounded, rounds-sized) learned rule
    list — a plain Python list because a trained tokenizer is a shipped
    configuration artifact, not data.  Pure column expressions: encode,
    then one literal ``replace`` per merge in training order, then
    split back to symbols.

    The delimiter guard is symmetric with ``bpe_merges``'s
    ``token_pattern`` filter: a word containing ``(``, ``)`` or ``$``
    would encode AMBIGUOUSLY (its characters collide with the symbol
    wrapping / end-of-word marker) and corrupt segmentation silently —
    so such rows RAISE at execution time rather than mis-tokenize
    (the segment side must not silently drop rows the way the training
    side's filter may)."""
    guard = F.col(text_col).rlike(r"[()$]")
    encoded = F.when(
        ~F.coalesce(guard, F.lit(False)),
        encode_word(text_col),
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    "bpe_segment: word contains a symbol delimiter "
                    f"( ) $ and cannot encode unambiguously: {text_col}="
                ),
                F.col(text_col),
            )
        )
    )
    expr: Column = encoded
    for left, right in merges:
        for ch in left + right:
            if ch in (SYM_OPEN + SYM_CLOSE):
                raise ValueError(f"merge symbol contains delimiter: {left, right}")
        expr = F.replace(
            expr,
            F.lit(f"{SYM_OPEN}{left}{SYM_CLOSE}{SYM_OPEN}{right}{SYM_CLOSE}"),
            F.lit(f"{SYM_OPEN}{left}{right}{SYM_CLOSE}"),
        )
    return df.withColumn(out_col, _symbols(expr))
