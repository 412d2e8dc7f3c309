"""Frozen text analysis: normalizer + tokenizer + position assignment.

This module is THE per-row invariant surface: the exact same pure-Python
function objects are used by (a) the Spark extraction stage (Arrow-batched,
via ``mapInPandas`` in ``build.py``), (b) the single-process oracle
(``oracle/bm25.py``), and (c) fixture generation. Any drift breaks BM25
rank identity, so nothing here may change without regenerating fixtures.

Semantics (reference parity):

* normalize: NFKD decompose, drop combining marks (Mn), lowercase —
  Meilisearch-style normalization (reference builds its analyzer in
  ``src/update/analyzer_settings.rs:7-151``; default stack is
  charfilter + tokenizer + lowercase per ``src/search/query_parser.rs:137-153``).
* token = maximal run of alphanumeric characters (``str.isalnum``); all other
  characters are separators.
* positions: first token at 0; word->word advances +1; if any HARD separator
  (. ! ? ; : newline ( ) [ ] { } | " …) occurred in the gap the advance is +8
  — reference ``process_tokens``
  (``src/update/index_documents/extract/extract_docid_word_positions.rs:242-265``).
  We keep EXACT positions rather than the reference's log-bucketed positions
  (``src/lib.rs:195-207``): BM25/WAND doesn't need buckets and phrase
  matching wants exact adjacency (documented deviation, SURVEY.md A5).
* tokens longer than MAX_WORD_LENGTH UTF-8 bytes are dropped —
  reference ``src/lib.rs:109`` / ``extract_docid_word_positions.rs:187``.
* emission stops once a position would exceed MAX_POSITION —
  reference ``src/lib.rs:111``.

On pure-ASCII lowercase corpora (the driver's ``documents`` table) this
tokenizer is exactly equivalent to DuckDB's
``regexp_extract_all(text, '[a-z0-9]+')``, which is what the SQL oracle uses.
"""

from __future__ import annotations

import re
import unicodedata

from search_engine_spark.config import (
    HARD_SEPARATOR_GAP,
    MAX_POSITION,
    MAX_WORD_LENGTH,
    SOFT_SEPARATOR_GAP,
)

# Hard separators: sentence-ish breaks. Reference treats ., !, ?, newline etc.
# as hard (gap +8); everything else non-alphanumeric is soft (gap +1).
HARD_SEPARATORS = frozenset('.!?;:\n\r()[]{}|"…')

_TOKEN_RE = re.compile(r"[^\W_]+", re.UNICODE)  # runs of isalnum() chars
_HARD_RE = re.compile("[" + re.escape("".join(sorted(HARD_SEPARATORS))) + "]")


def normalize(text: str) -> str:
    """NFKD-decompose, strip combining marks, lowercase."""
    decomposed = unicodedata.normalize("NFKD", text)
    stripped = "".join(c for c in decomposed if not unicodedata.combining(c))
    return stripped.lower()


def tokenize_with_positions(text: str) -> list[tuple[str, int]]:
    """Normalize + tokenize, returning [(term, position), ...].

    Single source of truth for extraction; see module docstring.
    """
    if not text:
        return []
    s = normalize(text)
    out: list[tuple[str, int]] = []
    pos = -1
    prev_end = 0
    for m in _TOKEN_RE.finditer(s):
        tok = m.group()
        if pos < 0:
            pos = 0
        else:
            gap = s[prev_end : m.start()]
            pos += HARD_SEPARATOR_GAP if _HARD_RE.search(gap) else SOFT_SEPARATOR_GAP
        prev_end = m.end()
        if pos > MAX_POSITION:
            break
        if len(tok.encode("utf-8")) > MAX_WORD_LENGTH:
            continue
        out.append((tok, pos))
    return out


def tokenize(text: str) -> list[str]:
    """Terms only (used for query parsing, dedup shingles, token counts)."""
    return [t for t, _ in tokenize_with_positions(text)]
