"""Query parsing shared by the Spark engine and the oracle.

Grammar per the reference (``/root/reference/src/search/query_parser.rs:9-121``):

* bare words — disjunctive (BM25 OR retrieval; the reference's
  ``TermsMatchingStrategy::Last`` drop-last-words semantics maps onto
  disjunctive scoring, SURVEY.md Q7);
* ``"quoted phrase"`` — words must appear at consecutive positions;
* ``-word`` — negation: matching docs are excluded;
* trailing ``*`` — prefix expansion of that word (reference: trailing word is
  a prefix term, we require the explicit ``*`` marker to keep bare-word
  queries oracle-simple);
* trailing ``~`` — typo expansion via Levenshtein distance over the term
  dictionary (reference Q4: 1 typo for len>=4, 2 for len>=7, max 20
  expansions, ``src/update/typo_config.rs:14-35``).
* at most 100 tokens are considered (reference cap).

Parsing normalizes every token with the frozen tokenizer so query terms and
indexed terms live in the same space.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from collections.abc import Iterable

from search_engine_spark.analysis import tokenize
from search_engine_spark.config import (
    TYPO_MAX_EXPANSIONS,
    TYPO_ONE_MIN_LEN,
    TYPO_TWO_MIN_LEN,
)

MAX_QUERY_TOKENS = 100

_SEGMENT_RE = re.compile(r'"([^"]*)"|(\S+)')


@dataclass
class ParsedQuery:
    words: list[str] = field(default_factory=list)
    phrases: list[list[str]] = field(default_factory=list)
    negated: list[str] = field(default_factory=list)
    prefixes: list[str] = field(default_factory=list)
    typos: list[str] = field(default_factory=list)

    def all_scoring_words(self) -> list[str]:
        out = list(self.words)
        for ph in self.phrases:
            out.extend(ph)
        return out


def parse_query(query: str) -> ParsedQuery:
    pq = ParsedQuery()
    n_tokens = 0
    for m in _SEGMENT_RE.finditer(query or ""):
        if n_tokens >= MAX_QUERY_TOKENS:
            break
        quoted, bare = m.group(1), m.group(2)
        if quoted is not None:
            ph = tokenize(quoted)
            n_tokens += len(ph)
            if ph:
                pq.phrases.append(ph)
            continue
        neg = bare.startswith("-")
        prefix = bare.endswith("*")
        typo = bare.endswith("~")
        toks = tokenize(bare)
        n_tokens += len(toks)
        if not toks:
            continue
        if neg:
            pq.negated.extend(toks)
        elif prefix:
            pq.words.extend(toks[:-1])
            pq.prefixes.append(toks[-1])
        elif typo:
            pq.words.extend(toks[:-1])
            pq.typos.append(toks[-1])
        else:
            pq.words.extend(toks)
    return pq


def levenshtein(a: str, b: str, cap: int = 3) -> int:
    """Plain DP edit distance with early cap."""
    if a == b:
        return 0
    if abs(len(a) - len(b)) > cap:
        return cap
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        row_min = i
        for j, cb in enumerate(b, 1):
            v = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            cur.append(v)
            row_min = min(row_min, v)
        if row_min >= cap:
            return cap
        prev = cur
    return min(prev[-1], cap)


def max_typos_for(
    word: str,
    one_min_len: int = TYPO_ONE_MIN_LEN,
    two_min_len: int = TYPO_TWO_MIN_LEN,
) -> int:
    """Reference typo thresholds (src/update/typo_config.rs:27-35).
    Thresholds default to the frozen reference values; a persisted
    ``IndexSettings`` can override them per index."""
    n = len(word)
    if n >= two_min_len:
        return 2
    if n >= one_min_len:
        return 1
    return 0


def typo_candidates(
    word: str,
    dictionary: Iterable[str],
    budget: int | None = None,
    max_expansions: int = TYPO_MAX_EXPANSIONS,
) -> list[str]:
    """Dictionary terms within the word's typo budget, ranked
    (distance asc, term asc), capped at ``max_expansions``.
    Distance-0 (exact) is included first when present."""
    if budget is None:
        budget = max_typos_for(word)
    if budget == 0:
        return [word] if word in set(dictionary) else []
    scored: list[tuple[int, str]] = []
    for t in dictionary:
        if abs(len(t) - len(word)) > budget:
            continue
        d = levenshtein(word, t, cap=budget + 1)
        if d <= budget:
            scored.append((d, t))
    scored.sort()
    return [t for _, t in scored[:max_expansions]]
