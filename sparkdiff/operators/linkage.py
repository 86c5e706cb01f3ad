"""Fellegi-Sunter record-linkage scoring (Fellegi & Sunter 1969, JASA;
Winkler's frequency-based refinements): the classical probabilistic
model behind every production entity-resolution system.  Given
candidate pairs from a BLOCKER (FastSS edit-distance join, sorted
neighborhood, LSH — this repo ships all three), each comparison field
contributes a likelihood ratio

    agree:     m_f / u_f
    disagree:  (1 - m_f) / (1 - u_f)

where m_f = P(field agrees | same entity) is a model parameter and
u_f = P(field agrees | different entities) is ESTIMATED FROM THE DATA:
for an equality comparison on field f, two random records agree with
probability sum_v (freq_v / n)^2 — a one-pass vocabulary-sized
aggregate.  The pair's composite score is the product of its field
ratios; thresholds split match / possible / non-match.

Engine-exactness discipline (same rules as the rest of the repo):

* u numerators are EXACT int64 sums of freq^2 (associative — safe under
  any partial-agg order); the single double division by n^2 happens
  once, at the end,
* the per-pair ratio product multiplies a FIXED, caller-given field
  order inside one row — no cross-row double aggregation anywhere — so
  the score is bit-identical on any IEEE-754 engine and the score
  itself can be value-hash oracled (q160),
* no logs: the traditional log2 weights need libm; the raw likelihood
  ratio carries the same decision information.

Scale shape: u estimation is |distinct values| per field; the scoring
join broadcasts one 1-row u table; candidates come from a blocker that
is already linear-ish — nothing here is pairwise in the corpus.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class LinkageField:
    """One comparison field: ``agree`` is any 0/1 integer Column over
    the candidate-pair frame; ``m`` the match-agreement parameter;
    ``u_col`` the name of this field's u-probability column in the
    broadcast stats row."""

    name: str
    agree: Column
    m: float
    u_col: str


def field_u_stats(df: DataFrame, cols: list[str]) -> DataFrame:
    """ONE-ROW frame with ``n`` and, per field f, ``u_<f>_num`` — the
    exact int64 sum of squared value frequencies (NULL counts as a
    value: two NULLs "agree" under null-safe equality, matching the
    oracle's GROUP BY semantics).  u_f itself is u_<f>_num / n^2,
    divided once by the consumer so everything upstream stays exact."""
    aggs = []
    for c in cols:
        freq = df.groupBy(c).agg(F.count(F.lit(1)).alias("_f"))
        aggs.append(
            freq.agg(
                F.sum(F.col("_f") * F.col("_f")).cast("long").alias(f"u_{c}_num")
            )
        )
    out = df.agg(F.count(F.lit(1)).cast("long").alias("n"))
    for a in aggs:
        out = out.crossJoin(F.broadcast(a))
    return out


def fellegi_sunter_score(
    pairs: DataFrame,
    u_stats: DataFrame,
    fields: list[LinkageField],
    upper: float,
    lower: float,
) -> DataFrame:
    """Score candidate pairs: composite likelihood ratio as the product
    of per-field ratios in the GIVEN field order (fixed order = fixed
    rounding = engine-exact), classified match / possible / non_match
    against the two thresholds.  Adds per-field 0/1 agreement columns
    (``agree_<name>``), ``score`` (double) and ``decision``."""
    scored = pairs.crossJoin(F.broadcast(u_stats))
    n2 = (F.col("n") * F.col("n")).cast("double")
    ratio = F.lit(1.0)
    for f in fields:
        agree = f.agree.cast("int")
        scored = scored.withColumn(f"agree_{f.name}", agree)
        u = F.col(f.u_col).cast("double") / n2
        r = F.when(
            F.col(f"agree_{f.name}") == 1, F.lit(f.m) / u
        ).otherwise(F.lit(1.0 - f.m) / (F.lit(1.0) - u))
        ratio = ratio * r
    scored = scored.withColumn("score", ratio)
    decision = (
        F.when(F.col("score") >= F.lit(upper), F.lit("match"))
        .when(F.col("score") >= F.lit(lower), F.lit("possible"))
        .otherwise(F.lit("non_match"))
    )
    drop = ["n"] + [f.u_col for f in fields]
    return scored.withColumn("decision", decision).drop(*drop)
