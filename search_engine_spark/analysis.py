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
    s = normalize_fast(text)
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


# --- exact-equivalent fast paths (hot extraction loop) ---------------------
#
# These produce byte-identical output to the reference functions above —
# property-tested in tests/test_analysis.py — but skip work that provably
# cannot change the result:
#  * pure-ASCII text: NFKD is the identity and has no combining marks, so
#    normalize() collapses to str.lower() (C-speed, no per-char Python).
#  * token stream: one C-level findall() instead of the finditer loop,
#    valid when no token can exceed MAX_WORD_LENGTH and no position can
#    exceed MAX_POSITION (≤62-char tokens are ≤248 UTF-8 bytes; the worst
#    case all-hard-gap position is 8·(n−1)). Docs that trip either guard
#    fall back to the reference loop.

def normalize_fast(text: str) -> str:
    if text.isascii():
        return text.lower()
    return normalize(text)


def tokenize_fast(text: str) -> list[str]:
    """Same output as ``tokenize`` (terms only, no positions)."""
    if not text:
        return []
    toks = _TOKEN_RE.findall(normalize_fast(text))
    if not toks:
        return []
    if (
        HARD_SEPARATOR_GAP * (len(toks) - 1) > MAX_POSITION
        or max(map(len, toks)) > MAX_WORD_LENGTH // 4
    ):
        return [t for t, _ in tokenize_with_positions(text)]
    return toks


def tokenize_positions_arrow_batch(texts):
    """Vectorized tokenize WITH positions for a ``pa.StringArray``.

    Returns ``(flat_tokens, flat_doc_idx, counts, flat_positions)`` such
    that zipping tokens/positions per doc equals
    ``tokenize_with_positions(texts[i])`` exactly (property-tested).

    The hard-separator position rule vectorizes via a two-level split:

    1. literal ``#`` (itself a soft separator) is canonicalized to ``-``;
    2. every separator run CONTAINING a hard separator collapses to one
       ``#``; remaining (soft) runs collapse to one space;
    3. split by ``#`` → segments, split segments by space → tokens.
       With gaps between tokens now exactly one char, position becomes
       pure index math: ``pos = token_index + (GAP-1) * segment_index``
       (each hard gap adds GAP where a soft gap adds 1).

    Tokens longer than MAX_WORD_LENGTH advance the position but are not
    emitted (reference semantics) — they are dropped after position
    assignment. Non-ASCII or MAX_POSITION-risk docs take the frozen
    per-doc path.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    n = len(texts)
    texts = pc.fill_null(texts, "")
    nbytes = pc.binary_length(texts).to_numpy(zero_copy_only=False).astype(np.int64)
    ascii_mask = (
        pc.string_is_ascii(texts).to_numpy(zero_copy_only=False).astype(bool)
    )
    fast_mask = ascii_mask & (nbytes < 2 * (MAX_POSITION // HARD_SEPARATOR_GAP))

    counts = np.zeros(n, dtype=np.int64)
    flats: list = []
    idxs: list = []
    poss: list = []

    fast_idx = np.flatnonzero(fast_mask)
    if len(fast_idx):
        sub = texts if len(fast_idx) == n else pc.take(texts, pa.array(fast_idx))
        low = pc.ascii_lower(sub)
        s0 = pc.replace_substring(low, pattern="#", replacement="-")
        s0 = pc.replace_substring_regex(
            s0, pattern=r"^[^a-z0-9]+|[^a-z0-9]+$", replacement=""
        )
        hard = '.!?;:\n\r()\\[\\]{}|"'
        s1 = pc.replace_substring_regex(
            s0,
            pattern=f"[^a-z0-9]*[{hard}][^a-z0-9]*",
            replacement="#",
        )
        s2 = pc.replace_substring_regex(
            s1, pattern="[^a-z0-9#]+", replacement=" "
        )
        segs = pc.split_pattern(s2, pattern="#")  # list<str> per doc
        seg_per_doc = (
            pc.list_value_length(segs).to_numpy(zero_copy_only=False).astype(np.int64)
        )
        seg_flat = segs.flatten()
        toks = pc.split_pattern(seg_flat, pattern=" ")  # list<str> per segment
        tok_per_seg = (
            pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        )
        flat = toks.flatten()
        n_tok = len(flat)

        # doc index of each segment / token
        seg_doc = np.repeat(np.arange(len(fast_idx)), seg_per_doc)
        tok_doc = np.repeat(seg_doc, tok_per_seg)
        # token index within doc (0-based) and segment index within doc
        doc_tok_counts = np.bincount(tok_doc, minlength=len(fast_idx))
        doc_starts = np.zeros(len(fast_idx) + 1, dtype=np.int64)
        np.cumsum(doc_tok_counts, out=doc_starts[1:])
        tok_i = np.arange(n_tok, dtype=np.int64) - np.repeat(
            doc_starts[:-1], doc_tok_counts
        )
        seg_starts = np.zeros(len(fast_idx) + 1, dtype=np.int64)
        np.cumsum(seg_per_doc, out=seg_starts[1:])
        seg_i_global = np.repeat(np.arange(len(seg_flat), dtype=np.int64), tok_per_seg)
        seg_i = seg_i_global - np.repeat(seg_starts[:-1], doc_tok_counts)
        positions = tok_i + (HARD_SEPARATOR_GAP - SOFT_SEPARATOR_GAP) * seg_i

        lens = pc.binary_length(flat).to_numpy(zero_copy_only=False)
        bad = (lens == 0) | (lens > MAX_WORD_LENGTH)
        if bad.any():
            keep = ~bad
            drop = np.bincount(tok_doc[bad], minlength=len(fast_idx))
            flat = flat.filter(pa.array(keep))
            doc_tok_counts = doc_tok_counts - drop
            tok_doc = tok_doc[keep]
            positions = positions[keep]
        counts[fast_idx] = doc_tok_counts
        flats.append(flat)
        idxs.append(fast_idx[tok_doc])
        poss.append(positions)

    for i in np.flatnonzero(~fast_mask):
        tp = tokenize_with_positions(texts[i].as_py())
        counts[i] = len(tp)
        if tp:
            flats.append(pa.array([t for t, _ in tp], type=pa.string()))
            idxs.append(np.full(len(tp), i, dtype=np.int64))
            poss.append(np.asarray([p for _, p in tp], dtype=np.int64))

    if not flats:
        return (
            pa.array([], type=pa.string()),
            np.empty(0, dtype=np.int64),
            counts,
            np.empty(0, dtype=np.int64),
        )
    flat_all = (
        pa.concat_arrays([f.cast(pa.string()) for f in flats])
        if len(flats) > 1
        else flats[0].cast(pa.string())
    )
    idx_all = np.concatenate(idxs) if len(idxs) > 1 else idxs[0]
    pos_all = np.concatenate(poss) if len(poss) > 1 else poss[0]
    return flat_all, idx_all, counts, pos_all


def tokenize_arrow_batch(texts):
    """Fully vectorized tokenize of a ``pa.StringArray`` (no positions).

    Returns ``(flat_tokens: pa.StringArray, flat_doc_idx: np.int64[],
    counts: np.int64[len(texts)])`` where ``flat_tokens[flat_doc_idx == i]``
    equals ``tokenize(texts[i])`` exactly (property-tested).

    Pure-ASCII short docs never allocate a Python string: lowercasing,
    edge-trimming, separator splitting, and length filtering all run in
    Arrow C++ (RE2). This is what keeps the extract stage strong-scaling —
    per-token PyObject churn was measured as kernel-time-bound (mmap/TLB)
    at high parallelism. Docs that are non-ASCII, or big enough that the
    MAX_POSITION emission stop could trigger (>16384 bytes), take the
    frozen per-doc path.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    n = len(texts)
    texts = pc.fill_null(texts, "")
    nbytes = pc.binary_length(texts).to_numpy(zero_copy_only=False).astype(np.int64)
    ascii_mask = (
        pc.string_is_ascii(texts).to_numpy(zero_copy_only=False).astype(bool)
    )
    # n tokens need >= 2n-1 chars, so <16384 ASCII bytes caps tokens at 8192
    # and the all-hard-gap worst case position at 8*8191 <= MAX_POSITION
    fast_mask = ascii_mask & (nbytes < 2 * (MAX_POSITION // HARD_SEPARATOR_GAP))

    counts = np.zeros(n, dtype=np.int64)
    flats: list = []
    idxs: list = []

    fast_idx = np.flatnonzero(fast_mask)
    if len(fast_idx):
        sub = texts if len(fast_idx) == n else pc.take(texts, pa.array(fast_idx))
        low = pc.ascii_lower(sub)
        trimmed = pc.replace_substring_regex(
            low, pattern=r"^[^a-z0-9]+|[^a-z0-9]+$", replacement=""
        )
        toks = pc.split_pattern_regex(trimmed, pattern="[^a-z0-9]+")
        c = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = toks.flatten()
        lens = pc.binary_length(flat).to_numpy(zero_copy_only=False)
        # "" sentinels (all-separator docs) and >MAX_WORD_LENGTH-byte tokens
        bad = (lens == 0) | (lens > MAX_WORD_LENGTH)
        di = np.repeat(fast_idx, c)
        if bad.any():
            keep = ~bad
            drop = np.bincount(
                np.repeat(np.arange(len(fast_idx)), c)[bad], minlength=len(fast_idx)
            )
            flat = flat.filter(pa.array(keep))
            c = c - drop
            di = di[keep]
        counts[fast_idx] = c
        flats.append(flat)
        idxs.append(di)

    for i in np.flatnonzero(~fast_mask):
        toks = tokenize_fast(texts[i].as_py())
        counts[i] = len(toks)
        if toks:
            flats.append(pa.array(toks, type=pa.string()))
            idxs.append(np.full(len(toks), i, dtype=np.int64))

    if not flats:
        return pa.array([], type=pa.string()), np.empty(0, dtype=np.int64), counts
    flat_all = (
        pa.concat_arrays([f.cast(pa.string()) for f in flats])
        if len(flats) > 1
        else flats[0].cast(pa.string())
    )
    idx_all = np.concatenate(idxs) if len(idxs) > 1 else idxs[0]
    return flat_all, idx_all, counts
