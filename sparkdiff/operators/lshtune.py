"""Closed-form LSH parameter tuning.

The dedup operators ship fixed defaults (64 perms / 16 bands MinHash,
6×12 SRP planes).  This module derives (bands, rows_per_band) from what
a user actually knows — the similarity threshold they care about and the
recall they need at it — using the standard banding probability model:

    P(candidate | sim = s) = 1 - (1 - p(s)^rows)^bands

where ``p(s)`` is the per-hash agreement probability of the family:
``s`` itself for MinHash on Jaccard, ``1 - arccos(s)/pi`` for
sign-random-projections on cosine.

``tune_bands`` scans rows=1..max and picks, among all (bands, rows)
whose predicted recall at the threshold meets the target within the
hash budget (bands*rows <= max_total), the one minimizing the
false-candidate probability at a configurable "background" similarity —
i.e. the most selective banding that still recalls.  Everything is exact
arithmetic on the model; no data pass is needed, so tuning is free at
any scale.
"""

from __future__ import annotations

import math
from dataclasses import dataclass


@dataclass(frozen=True)
class LshPlan:
    bands: int
    rows_per_band: int
    #: model-predicted P(candidate) at the tuned threshold
    recall_at_threshold: float
    #: model-predicted P(candidate) at the background similarity
    false_candidate_rate: float

    @property
    def total_hashes(self) -> int:
        return self.bands * self.rows_per_band


def candidate_prob(p_agree: float, bands: int, rows_per_band: int) -> float:
    """P(some band fully agrees) under per-hash agreement ``p_agree``."""
    if not 0.0 <= p_agree <= 1.0:
        raise ValueError(f"p_agree must be in [0,1], got {p_agree}")
    return 1.0 - (1.0 - p_agree**rows_per_band) ** bands


def tune_bands(
    p_at_threshold: float,
    recall: float = 0.95,
    max_total: int = 512,
    p_background: float | None = None,
) -> LshPlan:
    """Most selective (bands, rows) meeting ``recall`` at the threshold
    within a ``max_total`` hash budget."""
    if not 0.0 < p_at_threshold <= 1.0:
        raise ValueError(f"p_at_threshold must be in (0,1], got {p_at_threshold}")
    if not 0.0 < recall < 1.0:
        raise ValueError(f"recall must be in (0,1), got {recall}")
    if p_background is None:
        p_background = p_at_threshold / 2.0
    best: LshPlan | None = None
    for rows in range(1, max_total + 1):
        pr = p_at_threshold**rows
        if pr >= 1.0:
            bands = 1
        else:
            # smallest b with 1-(1-pr)^b >= recall
            denom = math.log1p(-pr)
            if denom == 0.0:
                continue
            bands = max(1, math.ceil(math.log1p(-recall) / denom))
        if bands * rows > max_total:
            continue
        plan = LshPlan(
            bands,
            rows,
            candidate_prob(p_at_threshold, bands, rows),
            candidate_prob(p_background, bands, rows),
        )
        if best is None or plan.false_candidate_rate < best.false_candidate_rate:
            best = plan
    if best is None:
        raise ValueError(
            f"no (bands, rows) meets recall={recall} at "
            f"p={p_at_threshold} within {max_total} hashes"
        )
    return best


def tune_minhash(
    jaccard_threshold: float,
    recall: float = 0.95,
    max_perm: int = 512,
    background_jaccard: float | None = None,
) -> LshPlan:
    """MinHash banding for a Jaccard threshold: per-hash agreement IS the
    Jaccard similarity."""
    return tune_bands(jaccard_threshold, recall, max_perm, background_jaccard)


def tune_srp(
    cosine_threshold: float,
    recall: float = 0.95,
    max_planes: int = 256,
    background_cosine: float = 0.0,
) -> LshPlan:
    """SRP banding for a cosine threshold: a hyperplane splits a pair at
    angle theta with probability theta/pi, so p = 1 - arccos(cos)/pi."""
    if not -1.0 <= cosine_threshold <= 1.0:
        raise ValueError(f"cosine must be in [-1,1], got {cosine_threshold}")
    p_t = 1.0 - math.acos(cosine_threshold) / math.pi
    p_b = 1.0 - math.acos(background_cosine) / math.pi
    return tune_bands(p_t, recall, max_planes, p_b)
