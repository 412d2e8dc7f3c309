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
# cannot change the result.
#
# The batch fast path is a BYTE-LEVEL kernel (`_ascii_byte_tokenize`): the
# Arrow string buffer is lowercased with one vectorized add, classified
# through a 256-entry LUT (alnum / hard-separator / soft-separator), token
# runs found by boundary detection (with forced breaks at doc boundaries),
# and the flat token array rebuilt with a single gather + zero-copy
# ``pa.Array.from_buffers``. This replaces the earlier 4-regex-replace +
# 2-split RE2 pipeline (measured ~60% of extract kernel time; each replace
# was a full-corpus allocation pass) — extract is DRAM-bandwidth-bound at
# high parallelism (SCALE.md), so fewer full-text passes is the strong-
# scaling lever, not just a constant factor.
#
# Positions come from pure index math (same rule as the docstring above):
# ``pos = token_index + (GAP-1) * n_hard_gaps_before`` where a hard gap is
# a maximal separator run containing >=1 hard char between two tokens of
# the same doc. A hard char is the first of its run iff at least one
# alphanumeric byte lies between it and the previous hard char (tokens
# separate runs); leading-gap markers cancel out by subtracting the marker
# count at the doc's first token.
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


_CLS_LUT = None  # built lazily: 0 = soft separator, 1 = alnum, 2 = hard


def _cls_lut():
    global _CLS_LUT
    if _CLS_LUT is None:
        import numpy as np

        lut = np.zeros(256, dtype=np.uint8)
        for c in range(ord("a"), ord("z") + 1):
            lut[c] = 1
        for c in range(ord("0"), ord("9") + 1):
            lut[c] = 1
        for ch in HARD_SEPARATORS:
            if ord(ch) < 128:
                lut[ord(ch)] = 2
        _CLS_LUT = lut
    return _CLS_LUT


def _cumsum0(a, dtype):
    import numpy as np

    out = np.zeros(len(a) + 1, dtype=dtype)
    np.cumsum(a, out=out[1:])
    return out


def _ascii_byte_tokenize(sub, want_positions: bool):
    """Byte-level tokenize of an all-ASCII ``pa.StringArray``.

    Returns ``(flat_tokens: pa.StringArray, tok_doc: np.int64[],
    counts: np.int64[len(sub)], positions: np.int64[] | None)`` —
    byte-identical to mapping ``tokenize_with_positions`` over the docs
    (property-tested). ``counts`` excludes >MAX_WORD_LENGTH tokens, whose
    positions still advance (frozen semantics). See the fast-path comment
    block above for the algorithm.

    ``sub`` must be null-free (Arrow permits null slots to carry arbitrary
    offset ranges whose bytes would be read as phantom tokens) — nulls are
    filled to "" here as a guard; callers normally ``fill_null`` upstream.
    """
    import numpy as np
    import pyarrow as pa

    if isinstance(sub, pa.ChunkedArray):
        sub = sub.combine_chunks()
    if sub.null_count:
        import pyarrow.compute as pc

        sub = pc.fill_null(sub, "")
    if sub.type != pa.string():  # e.g. large_string: 8-byte offsets
        sub = sub.cast(pa.string())
    n_sub = len(sub)
    counts = np.zeros(n_sub, dtype=np.int64)
    empty = (
        pa.array([], type=pa.string()),
        np.empty(0, dtype=np.int64),
        counts,
        np.empty(0, dtype=np.int64) if want_positions else None,
    )
    if n_sub == 0:
        return empty
    bufs = sub.buffers()
    off_all = np.frombuffer(bufs[1], dtype=np.int32)
    off = off_all[sub.offset : sub.offset + n_sub + 1].astype(np.int64)
    if bufs[2] is None or off[-1] == off[0]:
        return empty
    data = np.frombuffer(bufs[2], dtype=np.uint8)
    buf = data[off[0] : off[-1]]
    doc_off = off - off[0]

    # lowercase (one pass) + classify (one LUT gather)
    low = buf.copy()
    upper = (low >= 65) & (low <= 90)
    low[upper] += 32
    cls = _cls_lut()[low]
    is_al = cls == 1

    nb = len(low)
    prev_al = np.empty(nb, dtype=bool)
    prev_al[0] = False
    prev_al[1:] = is_al[:-1]
    next_al = np.empty(nb, dtype=bool)
    next_al[-1] = False
    next_al[:-1] = is_al[1:]
    # force token breaks at doc boundaries
    inner = doc_off[1:-1]
    inner = inner[(inner > 0) & (inner < nb)]
    if len(inner):
        prev_al[inner] = False
        next_al[inner - 1] = False

    starts = np.flatnonzero(is_al & ~prev_al)
    n_tok = len(starts)
    if n_tok == 0:
        return empty
    ends = np.flatnonzero(is_al & ~next_al) + 1
    lens = ends - starts
    # per-doc token counts via n_docs (not n_tokens) binary searches
    tok_starts_per_doc = np.searchsorted(starts, doc_off)
    counts_all = np.diff(tok_starts_per_doc)
    tok_doc = np.repeat(
        np.arange(n_sub, dtype=np.int64), counts_all
    )

    positions = None
    if want_positions:
        # markers: first hard char of each separator run (see comment block)
        hard_idx = np.flatnonzero(cls == 2)
        if len(hard_idx):
            al_cum = np.cumsum(is_al)
            first = np.empty(len(hard_idx), dtype=bool)
            first[0] = True
            first[1:] = al_cum[hard_idx[1:]] != al_cum[hard_idx[:-1]]
            marker_cum = np.zeros(nb + 1, dtype=np.int64)
            marker_cum[hard_idx[first] + 1] = 1  # marker positions unique
            np.cumsum(marker_cum, out=marker_cum)
            m_at_start = marker_cum[starts]
            # marker count at the doc's FIRST token start, per token
            has_tok = counts_all > 0
            first_tok = tok_starts_per_doc[:-1][has_tok]
            m_at_first = np.repeat(m_at_start[first_tok], counts_all[has_tok])
            tok_i = np.arange(n_tok, dtype=np.int64) - np.repeat(
                first_tok, counts_all[has_tok]
            )
            positions = tok_i + (HARD_SEPARATOR_GAP - SOFT_SEPARATOR_GAP) * (
                m_at_start - m_at_first
            )
        else:
            has_tok = counts_all > 0
            positions = np.arange(n_tok, dtype=np.int64) - np.repeat(
                tok_starts_per_doc[:-1][has_tok], counts_all[has_tok]
            )

    # drop over-long tokens AFTER position assignment (frozen semantics)
    bad = lens > MAX_WORD_LENGTH
    if bad.any():
        keep = ~bad
        drop = np.bincount(tok_doc[bad], minlength=n_sub)
        counts[:] = counts_all - drop
        starts = starts[keep]
        lens = lens[keep]
        tok_doc = tok_doc[keep]
        if positions is not None:
            positions = positions[keep]
        n_tok = len(starts)
        if n_tok == 0:
            return empty  # counts is shared by reference and already set
    else:
        counts[:] = counts_all

    # single gather into a packed values buffer; zero-copy from_buffers
    excl = _cumsum0(lens, np.int64)
    tot = int(excl[-1])
    gidx = np.arange(tot, dtype=np.int64) + np.repeat(starts - excl[:-1], lens)
    values = low[gidx]
    offsets32 = excl.astype(np.int32)
    flat = pa.Array.from_buffers(
        pa.utf8(),
        n_tok,
        [None, pa.py_buffer(offsets32), pa.py_buffer(values)],
    )
    return flat, tok_doc, counts, positions


def tokenize_positions_arrow_batch(texts):
    """Vectorized tokenize WITH positions for a ``pa.StringArray``.

    Returns ``(flat_tokens, flat_doc_idx, counts, flat_positions)`` such
    that zipping tokens/positions per doc equals
    ``tokenize_with_positions(texts[i])`` exactly (property-tested).

    ASCII docs run through the byte-level kernel ``_ascii_byte_tokenize``
    (see the fast-path comment block); positions are pure index math:
    ``pos = token_index + (GAP-1) * n_hard_gaps_before_token``.

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
        flat, tok_doc, sub_counts, positions = _ascii_byte_tokenize(
            sub, want_positions=True
        )
        counts[fast_idx] = sub_counts
        if len(flat):
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

    Pure-ASCII short docs never allocate a Python string: they run through
    the byte-level numpy kernel ``_ascii_byte_tokenize`` (see the fast-path
    comment block). This is what keeps the extract stage strong-scaling —
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
        flat, tok_doc, sub_counts, _ = _ascii_byte_tokenize(
            sub, want_positions=False
        )
        counts[fast_idx] = sub_counts
        if len(flat):
            flats.append(flat)
            idxs.append(fast_idx[tok_doc])

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
