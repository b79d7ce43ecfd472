"""Aho–Corasick multi-pattern matching — the blocklist/PII-term scan a
web-scale curation pipeline runs against thousands of patterns at once.

Why not a regex alternation (``ext/text.py``'s tx6 approach): an
alternation recompiles per pattern-set and backtracks per alternative;
the Aho–Corasick automaton (Aho & Corasick 1975, CACM 18(6)) matches
ALL patterns in one O(len(text) + matches) pass regardless of how many
patterns the blocklist holds — at 10k+ terms this is the difference
between a linear scan and a per-term multiplier.

Implementation: classic trie + BFS failure links with output-link
merging at construction (every node's terminal set absorbs its failure
target's), so the match loop is two dict hops per character with no
output-chain walking.  Matches are reported at every end position for
every pattern — including overlapping and nested occurrences (the
standard AC semantics; "he" inside "she" is reported).

Spark surface: the pattern list broadcasts (KB–MB scale); the automaton
builds ONCE per executor per pattern-set (process-level cache keyed by
the tuple) inside Arrow-batched stages — map-side only, the text never
shuffles.  :func:`blocklist_hits_udf` returns per-document hit counts;
:func:`mask_blocklist` replaces the UNION of matched spans with a mask
character (length-preserving, order-independent — overlapping matches
cannot double-mask).

Reference analog: none (the reference pipeline is XML-only); north-star
text curation beside tx6's regex PII scrub.
"""

from __future__ import annotations

from collections import deque
from collections.abc import Iterator  # noqa: TC003 (pandas_udf resolves)

import pandas as pd


class Automaton:
    """Built Aho–Corasick automaton over ``patterns`` (exact, case
    sensitive; deduplicated, empty patterns rejected)."""

    __slots__ = ("patterns", "goto", "fail", "out")

    def __init__(self, patterns: list[str]):
        pats = list(dict.fromkeys(patterns))  # dedupe, keep order
        if not pats:
            raise ValueError("Automaton needs at least one pattern")
        if any(not p for p in pats):
            raise ValueError("empty pattern is not matchable")
        self.patterns = pats
        # node 0 is the root; goto[node] is {char: node}
        self.goto: list[dict[str, int]] = [{}]
        self.fail: list[int] = [0]
        self.out: list[tuple[int, ...]] = [()]
        for idx, p in enumerate(pats):
            node = 0
            for ch in p:
                nxt = self.goto[node].get(ch)
                if nxt is None:
                    self.goto.append({})
                    self.fail.append(0)
                    self.out.append(())
                    nxt = len(self.goto) - 1
                    self.goto[node][ch] = nxt
                node = nxt
            self.out[node] = self.out[node] + (idx,)
        # BFS failure links; merge the failure target's outputs into
        # each node so matching never walks output chains
        queue = deque()
        for child in self.goto[0].values():
            queue.append(child)
        while queue:
            node = queue.popleft()
            for ch, child in self.goto[node].items():
                queue.append(child)
                f = self.fail[node]
                while f and ch not in self.goto[f]:
                    f = self.fail[f]
                target = self.goto[f].get(ch, 0)
                self.fail[child] = target if target != child else 0
                self.out[child] = self.out[child] + self.out[target]

    def _step(self, node: int, ch: str) -> int:
        goto = self.goto
        while node and ch not in goto[node]:
            node = self.fail[node]
        return goto[node].get(ch, 0)

    def iter_matches(self, text: str):
        """Yield ``(end_exclusive, pattern_index)`` for EVERY occurrence
        of every pattern (overlaps and nestings included)."""
        node = 0
        step = self._step
        out = self.out
        for i, ch in enumerate(text):
            node = step(node, ch)
            for idx in out[node]:
                yield i + 1, idx

    def count_matches(self, text: str) -> list[int]:
        """Per-pattern occurrence counts (index-aligned with
        ``self.patterns``)."""
        counts = [0] * len(self.patterns)
        for _, idx in self.iter_matches(text):
            counts[idx] += 1
        return counts

    def mask(self, text: str, mask_char: str = "*") -> str:
        """Replace the UNION of all matched spans with ``mask_char``
        (length-preserving; overlapping matches merge, so the result is
        independent of match order)."""
        if len(mask_char) != 1:
            raise ValueError("mask_char must be a single character")
        spans = bytearray(len(text))
        for end, idx in self.iter_matches(text):
            start = end - len(self.patterns[idx])
            for i in range(start, end):
                spans[i] = 1
        if not any(spans):
            return text
        return "".join(
            mask_char if hit else ch for ch, hit in zip(text, spans)
        )


# process-level automaton cache: one build per executor per pattern set
_CACHE: dict[tuple[str, ...], Automaton] = {}


def cached_automaton(patterns: tuple[str, ...]) -> Automaton:
    a = _CACHE.get(patterns)
    if a is None:
        if len(_CACHE) > 32:
            _CACHE.clear()  # bound executor memory across pattern sets
        a = _CACHE[patterns] = Automaton(list(patterns))
    return a


def blocklist_hits_udf(patterns: list[str]):
    """Arrow-batched UDF factory: ``col(text) -> struct(total_hits,
    distinct_patterns)`` counted by one shared automaton per executor."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    pats = tuple(patterns)
    out_type = StructType([
        StructField("total_hits", LongType()),
        StructField("distinct_patterns", IntegerType()),
    ])

    @pandas_udf(out_type)
    def _hits(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        a = cached_automaton(pats)
        for s in batches:
            totals = []
            distincts = []
            for text in s:
                if text is None:
                    totals.append(None)
                    distincts.append(None)
                    continue
                counts = a.count_matches(text)
                totals.append(sum(counts))
                distincts.append(sum(1 for c in counts if c))
            yield pd.DataFrame(
                {"total_hits": pd.array(totals, dtype="Int64"),
                 "distinct_patterns": pd.array(distincts, dtype="Int32")}
            )

    return _hits


def mask_blocklist_udf(patterns: list[str], mask_char: str = "*"):
    """Arrow-batched UDF factory: length-preserving span masking."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType

    if len(mask_char) != 1:
        # fail on the driver at construction, not per-row inside a job
        raise ValueError("mask_char must be a single character")
    pats = tuple(patterns)

    @pandas_udf(StringType())
    def _mask(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        a = cached_automaton(pats)
        for s in batches:
            yield s.map(
                lambda t: a.mask(t, mask_char) if t is not None else None
            )

    return _mask


__all__ = [
    "Automaton",
    "blocklist_hits_udf",
    "cached_automaton",
    "mask_blocklist_udf",
]
