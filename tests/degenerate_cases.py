"""THE shared degenerate-documents case table.

Single source of truth for every regen-proof sweep that salts the
documents table: the batch oracle sweep (``test_oracle_queries.py``)
and the streaming twins (``test_streaming_ingest.py``) both import
THIS table, so the two can never drift — a degenerate class added for
a future driver testdata revision is automatically exercised on both
the batch SQL-semantics side and the ``readStream`` ingest side.

Rows: ``(doc_id, text, lang, source, n_chars)`` — the degenerate
documents a driver testdata revision could legally contain (the r3
revision already changed a column encoding once).
"""

from __future__ import annotations

from itertools import combinations

#: label -> row; labels name the degenerate class and double as the
#: streaming-twin case-id fragments
DEGENERATE_DOC_ROWS: dict[str, tuple] = {
    "empty": (900001, "", "en", "src0", 0),
    "null": (900002, None, "en", "src1", 0),
    "whitespace": (900003, "   ", "en", "src2", 3),
    "single_char": (900004, "a", "de", "src3", 1),
    "unicode": (900005, "😀😀 漢字 test €uro", "fr", "src4", 14),
    "repeated": (900006, "word word word", "en", "src9", 14),
}

#: the batch sweep's salted rows — all six classes at once
DEGENERATE_DOCS: list[tuple] = list(DEGENERATE_DOC_ROWS.values())


def doc_permutations() -> dict[str, list[tuple]]:
    """The streaming-twin case matrix: every subset of the class table
    of size 1 (each class alone), 2 and 3 (all pairwise / three-way
    interactions — e.g. an empty doc changing the quality-gate
    threshold that decides a unicode doc's fate), every leave-one-out
    5-subset (the full corpus minus each class), and the full corpus —
    48 salted permutations. Size-4 subsets are the one interaction
    grain skipped: every 4-subset's row interactions are covered by
    its four 3-subsets below and its two 5-supersets above."""
    labels = list(DEGENERATE_DOC_ROWS)
    cases: dict[str, list[tuple]] = {}
    for size in (1, 2, 3, 5, 6):
        for combo in combinations(labels, size):
            name = "+".join(combo) if size < 6 else "combined"
            cases[name] = [DEGENERATE_DOC_ROWS[c] for c in combo]
    return cases
