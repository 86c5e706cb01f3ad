"""Exact-substring benchmark decontamination via a broadcast
Aho-Corasick automaton.

The 8-gram overlap screen (``queries.q66_decontamination``) catches
token-level contamination but misses verbatim strings that cross token
boundaries or are shorter than the gram width, and it cannot handle a
test suite whose items have many different lengths.  This operator runs
the complementary EXACT check: flag every training document whose raw
text contains any held-out test string as a contiguous substring —
the "exact substring match" pass of the standard two-stage
decontamination recipe.

Scale shape (the part that must survive 100 TB):

* The test side is a benchmark suite — MBs, not TBs.  It is collected
  to the driver ONCE (bounded, like the LSH dirty-bucket and k-means
  seed collects elsewhere in this package), compiled into a single
  Aho-Corasick automaton, and **broadcast** to every executor.
* The corpus is then scanned EXACTLY ONCE with ``mapInPandas`` — zero
  shuffle before the final per-document aggregation, no join fan-out,
  and cost O(total_text + matches) regardless of how many patterns the
  suite holds.  This is the one shape that stays linear when both the
  corpus and the benchmark suite grow.

Why not built-in expressions?  Multi-pattern *variable-length*
substring search has no linear-time DataFrame expression: ``rlike``
with an alternation recompiles a backtracking regex per task and scans
O(patterns × text); the q66 window-hash trick only works when every
pattern has one fixed length.  Aho-Corasick is the textbook automaton
for this exact job (it is what `pyahocorasick` implements), and the
implementation below is pure stdlib so the container can run it; a C
automaton with the same ``search_ids`` interface can be slotted in via
the ``automaton_factory`` hook without touching the Spark plumbing.
"""

from __future__ import annotations

from collections import deque
from collections.abc import Callable, Iterable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType


class AhoCorasick:
    """Multi-pattern exact substring matcher (Aho–Corasick 1975).

    Built once from ``(pattern_id, pattern)`` pairs; ``search_ids``
    returns the set of pattern ids occurring in a text in
    O(len(text) + matches).  Duplicate pattern strings are allowed —
    every id registered for a string is reported.
    """

    __slots__ = ("_goto", "_out")

    def __init__(self, patterns: Iterable[tuple[int, str]]):
        goto: list[dict[str, int]] = [{}]
        # output entries are (pattern_id, pattern_length) so a match
        # ending at char i locates its start at i - length + 1
        out: list[list[tuple[int, int]]] = [[]]
        n_patterns = 0
        for pid, pat in patterns:
            if not pat:
                raise ValueError(f"empty pattern (id={pid!r})")
            n_patterns += 1
            state = 0
            for ch in pat:
                nxt = goto[state].get(ch)
                if nxt is None:
                    goto.append({})
                    out.append([])
                    nxt = len(goto) - 1
                    goto[state][ch] = nxt
                state = nxt
            out[state].append((pid, len(pat)))
        if not n_patterns:
            raise ValueError("need at least one pattern")
        # BFS failure links, folded directly into the goto tables so the
        # scan loop is a single dict hop per character (no fail-chasing).
        fail = [0] * len(goto)
        queue: deque[int] = deque()
        for state in goto[0].values():
            queue.append(state)
        while queue:
            state = queue.popleft()
            for ch, nxt in list(goto[state].items()):
                queue.append(nxt)
                f = fail[state]
                fail[nxt] = goto[f].get(ch, 0)
                out[nxt].extend(out[fail[nxt]])
            # fold: transitions missing here fall back to fail-state's
            for ch, tgt in goto[fail[state]].items():
                goto[state].setdefault(ch, tgt)
        self._goto = goto
        self._out = out

    def search_ids(self, text: str) -> set[int]:
        """Distinct pattern ids occurring anywhere in ``text``."""
        goto = self._goto
        out = self._out
        root = goto[0]
        state = 0
        hits: set[int] = set()
        for ch in text:
            state = goto[state].get(ch) if state else root.get(ch)
            if state is None:
                state = 0
                continue
            if out[state]:
                hits.update(pid for pid, _ in out[state])
        return hits

    def search_spans(self, text: str) -> list[tuple[int, int]]:
        """MERGED half-open [start, end) intervals covering every
        occurrence of every pattern — the excision set of a surgical
        decontamination pass.  Overlapping and adjacent matches
        coalesce, so cutting the spans right-to-left is well-defined."""
        goto = self._goto
        out = self._out
        root = goto[0]
        state = 0
        spans: list[tuple[int, int]] = []
        for i, ch in enumerate(text):
            state = goto[state].get(ch) if state else root.get(ch)
            if state is None:
                state = 0
                continue
            for _, ln in out[state]:
                spans.append((i - ln + 1, i + 1))
        if not spans:
            return spans
        spans.sort()
        merged = [spans[0]]
        for s, e in spans[1:]:
            ls, le = merged[-1]
            if s <= le:
                if e > le:
                    merged[-1] = (ls, e)
            else:
                merged.append((s, e))
        return merged

    def search_first(self, text: str) -> dict[int, int]:
        """Per pattern id, the 0-based start of its FIRST occurrence in
        ``text`` — the span a decontamination pass excises."""
        goto = self._goto
        out = self._out
        root = goto[0]
        state = 0
        first: dict[int, int] = {}
        for i, ch in enumerate(text):
            state = goto[state].get(ch) if state else root.get(ch)
            if state is None:
                state = 0
                continue
            for pid, ln in out[state]:
                start = i - ln + 1
                prev = first.get(pid)
                if prev is None or start < prev:
                    first[pid] = start
        return first


MATCH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("test_id", LongType(), False),
    ]
)

POSITION_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("test_id", LongType(), False),
        StructField("first_pos", LongType(), False),
    ]
)


def exact_contamination(
    docs: DataFrame,
    patterns: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    pattern_id_col: str = "test_id",
    pattern_col: str = "pat",
    max_patterns: int = 5_000_000,
    positions: bool = False,
    automaton_factory: Callable[[Iterable[tuple[int, str]]], AhoCorasick] | None = None,
) -> DataFrame:
    """(doc_id, test_id) pairs where the document's text contains the
    test pattern as an exact substring; with ``positions=True`` each
    pair also carries ``first_pos`` — the 0-based start of the first
    occurrence, the span a surgical decontamination pass excises
    instead of dropping the whole document.

    ``patterns`` is the held-out suite — collected to the driver (capped
    at ``max_patterns``; a benchmark suite is MBs), compiled into one
    automaton, broadcast, and matched in a single Arrow-batched corpus
    scan.  Output pairs are distinct per (doc, pattern id).

    Note: the suite collect is a CONSTRUCTION-TIME Spark job (the
    automaton must exist before the scan closure is defined) — the one
    deliberate exception to the lazy-builder convention, same class as
    the bounded conf/seed collects elsewhere in this package.  An empty
    suite yields an empty result (no patterns — nothing can be
    contaminated), not an error.
    """
    rows = (
        patterns.select(
            F.col(pattern_id_col).cast("long").alias("pid"),
            F.col(pattern_col).cast("string").alias("pat"),
        )
        .limit(max_patterns + 1)
        .collect()
    )
    if len(rows) > max_patterns:
        raise ValueError(
            f"pattern side exceeds max_patterns={max_patterns}; exact "
            "decontamination broadcasts the test suite — it must stay "
            "benchmark-sized, not corpus-sized"
        )
    schema = POSITION_SCHEMA if positions else MATCH_SCHEMA
    if not rows:
        return docs.sparkSession.createDataFrame([], schema)
    factory = automaton_factory or AhoCorasick
    automaton = factory([(r.pid, r.pat) for r in rows])
    bc = docs.sparkSession.sparkContext.broadcast(automaton)
    return scan_with_automaton(
        docs, bc, id_col=id_col, text_col=text_col, positions=positions
    )


def scan_with_automaton(
    docs: DataFrame,
    bc,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    positions: bool = False,
) -> DataFrame:
    """One-pass match scan against an ALREADY-broadcast automaton —
    the reusable half of :func:`exact_contamination`, for callers that
    scan many DataFrames against one suite (e.g. the streaming ingest
    gate, which must not mint a new broadcast per micro-batch)."""
    schema = POSITION_SCHEMA if positions else MATCH_SCHEMA

    def scan(batches) -> Iterator:
        import pandas as pd

        ac = bc.value
        for pdf in batches:
            doc_ids: list[int] = []
            test_ids: list[int] = []
            first: list[int] = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                if text is None:
                    continue
                if positions:
                    for pid, start in ac.search_first(text).items():
                        doc_ids.append(did)
                        test_ids.append(pid)
                        first.append(start)
                else:
                    for pid in ac.search_ids(text):
                        doc_ids.append(did)
                        test_ids.append(pid)
            cols = {"doc_id": doc_ids, "test_id": test_ids}
            if positions:
                cols["first_pos"] = first
            yield pd.DataFrame(cols)

    base = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(text_col).alias("text"),
    )
    return base.mapInPandas(scan, schema=schema)


EXCISED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("clean_text", StringType(), True),
        StructField("n_spans", LongType(), False),
        StructField("n_chars_excised", LongType(), False),
    ]
)


def excise_contamination(
    docs: DataFrame,
    patterns: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    pattern_id_col: str = "test_id",
    pattern_col: str = "pat",
    max_patterns: int = 5_000_000,
    automaton_factory: Callable[[Iterable[tuple[int, str]]], AhoCorasick] | None = None,
    rescan: int = 0,
) -> DataFrame:
    """Surgical decontamination: CUT every occurrence of every test
    pattern out of each document instead of dropping the document —
    the span-level remedy for verbatim leakage inside otherwise-good
    training text.

    Spans come from the same broadcast Aho-Corasick automaton as
    :func:`exact_contamination` (one corpus scan, no join), merged so
    overlapping/adjacent matches coalesce before cutting.  Returns one
    row per input document: ``clean_text`` (untouched when nothing
    matched), span count, and excised char count.

    ONE-PASS LIMITATION (``rescan=0``, the default): excision
    guarantees every span matched in the ORIGINAL text is removed, but
    ``clean_text`` is not certified pattern-free — cutting a span
    splices its flanking text together, and that splice can itself
    form a NEW occurrence of another pattern (patterns ``{'ab',
    'XY'}``, text ``'aXYb'`` → ``'ab'``).  Iterative per-pattern
    ``regexp_replace`` has the same failure mode plus
    order-dependence; a single merged-interval pass at least makes the
    result deterministic and independent of pattern order.

    ``rescan=N`` iterates to fixpoint PER DOCUMENT inside the same
    single corpus scan (no extra Spark jobs): after cutting, the
    spliced text is re-scanned and cut again, up to N extra passes or
    until a pass finds nothing.  Each pass removes >= 1 character, so
    a generous N certifies: any document whose final pass found zero
    spans is pattern-free; ``n_spans``/``n_chars_excised`` accumulate
    across passes.  A document still matching after N extra passes
    (adversarial nesting) keeps its last splice — gate with
    :func:`exact_contamination` afterwards if absolute certainty is
    required.
    """
    if rescan < 0:
        raise ValueError(f"rescan must be >= 0, got {rescan}")
    rows = (
        patterns.select(
            F.col(pattern_id_col).cast("long").alias("pid"),
            F.col(pattern_col).cast("string").alias("pat"),
        )
        .limit(max_patterns + 1)
        .collect()
    )
    if len(rows) > max_patterns:
        raise ValueError(
            f"pattern side exceeds max_patterns={max_patterns}; exact "
            "decontamination broadcasts the test suite — it must stay "
            "benchmark-sized, not corpus-sized"
        )
    base = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(text_col).alias("text"),
    )
    if not rows:
        return base.select(
            "doc_id",
            F.col("text").alias("clean_text"),
            F.lit(0).cast("long").alias("n_spans"),
            F.lit(0).cast("long").alias("n_chars_excised"),
        )
    factory = automaton_factory or AhoCorasick
    automaton = factory([(r.pid, r.pat) for r in rows])
    bc = docs.sparkSession.sparkContext.broadcast(automaton)

    def cut(batches) -> Iterator:
        import pandas as pd

        ac = bc.value

        def cut_once(text: str) -> tuple[str, int, int]:
            spans = ac.search_spans(text)
            if not spans:
                return text, 0, 0
            pieces, prev = [], 0
            for s, e in spans:
                pieces.append(text[prev:s])
                prev = e
            pieces.append(text[prev:])
            return (
                "".join(pieces),
                len(spans),
                sum(e - s for s, e in spans),
            )

        for pdf in batches:
            ids, cleans, counts, removed = [], [], [], []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                ids.append(did)
                if text is None:
                    cleans.append(None)
                    counts.append(0)
                    removed.append(0)
                    continue
                total_n = total_c = 0
                text, n, c = cut_once(text)
                total_n, total_c = total_n + n, total_c + c
                # per-doc fixpoint: re-scan the spliced text in-place
                for _ in range(rescan if total_n else 0):
                    text, n, c = cut_once(text)
                    if not n:
                        break
                    total_n, total_c = total_n + n, total_c + c
                cleans.append(text)
                counts.append(total_n)
                removed.append(total_c)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "clean_text": cleans,
                    "n_spans": counts,
                    "n_chars_excised": removed,
                }
            )

    return base.mapInPandas(cut, schema=EXCISED_SCHEMA)
