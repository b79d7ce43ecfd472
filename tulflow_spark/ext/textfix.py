"""Encoding-corruption (mojibake) detection and repair — the ftfy-class
cleaning stage a web-scale training corpus needs before tokenization:
text that was UTF-8 on disk but decoded as latin-1/cp1252 somewhere in
the pipeline reads as ``Ã©`` for ``é``, ``â€™`` for ``’``, and poisons
both quality filters (non-English-looking bigrams) and dedup (the same
document in clean and mangled form stops matching).

Pure-stdlib core (no ftfy in the container, and none needed for the
reversible class of corruption):

- :func:`mojibake_score` — the number of "UTF-8 lead byte seen as a
  latin-1/cp1252 character, followed by a continuation-byte image"
  bigrams; 0 for clean text.  The continuation class includes both the
  latin-1 images (U+0080–U+00BF) and the cp1252 remappings of the
  0x80–0x9F range (€ ‚ ƒ „ … ‰ Š ‘ ’ “ ” • – — ™ š œ ž Ÿ …), so both
  decode flavors are detected.
- :func:`fix_mojibake` — re-encode through latin-1 (then cp1252) and
  re-decode as UTF-8, repeated up to ``max_passes`` times for
  double-mangled text; a pass is applied only when the signature fires
  AND the byte round-trip is valid UTF-8, so clean text (including
  legitimately accented text, whose single accented characters are not
  followed by continuation-class characters) is a fixed point.

Repair is per ENCODABLE SEGMENT (runs of characters that re-encode to a
single latin-1/cp1252 byte): documents mixing mojibake with legit CJK /
emoji / non-latin-1 text still get their corrupted spans fixed, because
mojibake consists only of encodable characters and the split can never
cut through one.  Known trade-off (ftfy's own): a segment that
LEGITIMATELY reads as a lead+continuation bigram (the literal string
``Ã©`` in a document about encodings) is indistinguishable from
mojibake and will be "repaired" when the whole segment reverses to
valid UTF-8.  Score-then-fix lets a pipeline route by confidence.

Spark surface: :func:`fix_mojibake_udf` / :func:`mojibake_score_udf`
are Arrow-batched pandas UDFs (never row-at-a-time) — the stage is
map-side only, shuffles nothing, and runs where the text already lives.

Reference analog: none (the reference pipeline is XML-only); this is
north-star text-curation surface beside ext/text.py's quality filters.
"""

from __future__ import annotations

import re
from collections.abc import Iterator  # noqa: TC003 (pandas_udf resolves)

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import IntegerType, StringType

# UTF-8 lead bytes 0xC2-0xF4 as latin-1/cp1252 characters (0xC2-0xF4
# all map to themselves in latin-1; cp1252 agrees on this range)
_LEAD = "\u00c2-\u00f4"
# continuation bytes 0x80-0xBF: latin-1 images U+0080-U+00BF, plus the
# printable cp1252 remappings of 0x80-0x9F (the cp1252 decode of a
# continuation byte); 0x81/0x8D/0x8F/0x90/0x9D are unmapped in cp1252
# and only appear via the latin-1 flavor, already inside the range
_CONT = (
    "\u0080-\u00bf"
    "\u20ac\u201a\u0192\u201e\u2026\u2020\u2021\u02c6\u2030\u0160"
    "\u2039\u0152\u017d\u2018\u2019\u201c\u201d\u2022\u2013\u2014"
    "\u02dc\u2122\u0161\u203a\u0153\u017e\u0178"
)
_SIGNATURE = re.compile(f"[{_LEAD}][{_CONT}]")


def mojibake_score(s: str) -> int:
    """Count of lead+continuation signature bigrams (0 = looks clean)."""
    if not s:
        return 0
    return len(_SIGNATURE.findall(s))


# characters re-encodable into a single byte (latin-1 range or a cp1252
# remapping) — mojibake consists ONLY of such characters, so splitting a
# document at non-encodable runs (CJK, emoji, already-clean text beyond
# latin-1) isolates the repairable segments without ever cutting through
# a corrupted byte sequence
_NON_ENCODABLE = re.compile(f"([^\\x00-\\u00ff{_CONT[3:]}]+)")


def _reverse(seg: str) -> str | None:
    for enc in ("latin-1", "cp1252"):
        try:
            return seg.encode(enc).decode("utf-8")
        except (UnicodeEncodeError, UnicodeDecodeError):
            continue
    return None


def fix_mojibake(s: str, max_passes: int = 3) -> str:
    """Undo UTF-8-decoded-as-latin-1/cp1252 corruption, up to
    ``max_passes`` layers deep.  Repairs per ENCODABLE SEGMENT: a
    document mixing mojibake with legit non-latin-1 text (CJK, emoji)
    still gets its corrupted spans fixed — the non-encodable characters
    split the string and are never touched.  A segment whose reverse
    transform is not valid UTF-8 is left unchanged."""
    if not s:
        return s
    for _ in range(max_passes):
        if not _SIGNATURE.search(s):
            break
        pieces = _NON_ENCODABLE.split(s)  # odd indexes = non-encodable
        changed = False
        for i in range(0, len(pieces), 2):
            seg = pieces[i]
            if seg and _SIGNATURE.search(seg):
                fixed = _reverse(seg)
                if fixed is not None and fixed != seg:
                    pieces[i] = fixed
                    changed = True
        if not changed:
            break
        s = "".join(pieces)
    return s


@pandas_udf(StringType())
def fix_mojibake_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    for s in batches:
        yield s.map(lambda v: fix_mojibake(v) if v is not None else None)


@pandas_udf(IntegerType())
def mojibake_score_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    for s in batches:
        yield s.map(
            lambda v: mojibake_score(v) if v is not None else None
        ).astype("Int32")


__all__ = [
    "fix_mojibake",
    "fix_mojibake_udf",
    "mojibake_score",
    "mojibake_score_udf",
]
