"""Single-process BM25 oracle (SURVEY.md §5.2 item 2).

A deliberately simple, obviously-correct implementation over plain Python
dicts, sharing the EXACT tokenizer function with the Spark engine
(``search_engine_spark.analysis``). The distributed engine must reproduce its
top-k docids AND scores rank-identically (ties: score desc, docid asc).

Plays the role of the reference's ``TestContext`` in-memory-postings harness
(``/root/reference/src/search/query_graph.rs:536-543``), with BM25 in place
of the reference's ranking-rule bucket sort (the reference has no BM25 and
stores postings as docid *sets*; SURVEY.md header note).

BM25 spec (frozen): k1=1.2, b=0.75,
idf = ln(1 + (N - df + 0.5) / (df + 0.5)),
score(d, q) = sum_t idf(t) * tf / (tf + k1*(1 - b + b*dl/avgdl)),
N = total docs (including token-less ones), avgdl = mean dl over all N docs.
"""

from __future__ import annotations

import math
from collections import defaultdict
from dataclasses import dataclass, field

import pandas as pd

from search_engine_spark.analysis import tokenize_with_positions
from search_engine_spark.config import (
    BM25_B,
    BM25_K1,
    PREFIX_PENALTY,
    TYPO_PENALTY,
)
from search_engine_spark.query_parse import (
    ParsedQuery,
    levenshtein,
    parse_query,
    typo_candidates,
)


@dataclass
class OracleIndex:
    n_docs: int = 0
    avgdl: float = 0.0
    dl: dict[int, int] = field(default_factory=dict)
    # term -> {docid -> tf}
    postings: dict[str, dict[int, int]] = field(default_factory=dict)
    # term -> {docid -> [positions]}
    positions: dict[str, dict[int, list[int]]] = field(default_factory=dict)
    docid_to_pk: dict[int, str] = field(default_factory=dict)
    attrs: dict[int, dict] = field(default_factory=dict)
    # single-field indexes verify ExactAttribute with dl == n (nothing
    # follows the query words); multi-field mirrors the engine's
    # whole-field-prefix deviation (per-field word counts not stored)
    dl_check: bool = True

    def df(self, term: str) -> int:
        return len(self.postings.get(term, {}))

    def idf(self, term: str) -> float:
        d = self.df(term)
        return math.log(1.0 + (self.n_docs - d + 0.5) / (d + 0.5))


def build_oracle_index(
    pages: pd.DataFrame,
    text_col: str = "text",
    pk_col: str = "url",
    ts_col: str | None = "warc_ts",
    attr_cols: tuple[str, ...] = (),
    fields: list[tuple[str, int]] | None = None,
) -> OracleIndex:
    """Last-write-wins dedupe by pk, docid = rank of pk in sorted order
    (matches the engine's row_number-over-url docid assignment).

    ``fields`` mirrors ``IndexConfig.field_cols`` (BM25F, reference K5):
    each (column, integer weight) field's tokens count weight-times toward
    tf and dl (Lucene content-boost identity), positions are packed
    ``fid << 16 | pos`` and replicated weight-times — exactly what the
    engine's multi-field extract kernel produces."""
    df = pages
    if ts_col is not None and ts_col in df.columns:
        df = df.sort_values([pk_col, ts_col]).groupby(pk_col, as_index=False).last()
    else:
        df = df.drop_duplicates(subset=[pk_col], keep="last")
    df = df.sort_values(pk_col).reset_index(drop=True)

    field_list = fields if fields is not None else [(text_col, 1)]

    idx = OracleIndex()
    idx.dl_check = fields is None
    idx.n_docs = len(df)
    total_dl = 0
    for docid, row in df.iterrows():
        docid = int(docid)
        idx.docid_to_pk[docid] = row[pk_col]
        idx.attrs[docid] = {c: row[c] for c in attr_cols}
        toks: list[tuple[str, int]] = []
        dl = 0
        for fid, (col, w) in enumerate(field_list):
            ftoks = tokenize_with_positions(row[col] or "")
            dl += w * len(ftoks)
            for t, p in ftoks:
                toks.extend([(t, (fid << 16) | p)] * w)
        idx.dl[docid] = dl
        total_dl += dl
        per_term: dict[str, list[int]] = defaultdict(list)
        for t, p in toks:
            per_term[t].append(p)
        for t, ps in per_term.items():
            idx.postings.setdefault(t, {})[docid] = len(ps)
            idx.positions.setdefault(t, {})[docid] = sorted(ps)
    idx.avgdl = total_dl / idx.n_docs if idx.n_docs else 0.0
    return idx


def _bm25_score(idx: OracleIndex, term_weights: list[tuple[str, float]], docid: int) -> float:
    s = 0.0
    dl = idx.dl[docid]
    norm = BM25_K1 * (1.0 - BM25_B + BM25_B * dl / max(idx.avgdl, 1e-12))
    for term, idf in term_weights:
        tf = idx.postings.get(term, {}).get(docid)
        if tf:
            s += idf * tf / (tf + norm)
    return s


def _phrase_docids(idx: OracleIndex, phrase: list[str]) -> set[int]:
    """Docs where phrase terms occur at consecutive positions (+1 steps)."""
    if not phrase:
        return set()
    cand: set[int] | None = None
    for t in phrase:
        docs = set(idx.positions.get(t, {}))
        cand = docs if cand is None else (cand & docs)
        if not cand:
            return set()
    out = set()
    for d in cand or set():
        starts = set(idx.positions[phrase[0]][d])
        ok = False
        for s in starts:
            if all((s + i) in idx.positions[phrase[i]][d] for i in range(1, len(phrase))):
                ok = True
                break
        if ok:
            out.add(d)
    return out


def _expand_prefix(idx: OracleIndex, prefix: str) -> list[str]:
    return sorted(t for t in idx.postings if t.startswith(prefix))


def _min_prox(pa: list[int], pb: list[int]) -> float:
    """Reference asymmetric word distance (``src/proximity.rs:7-15``):
    min over occurrence pairs of (pb - pa) forward, (pa - pb + 1) backward,
    clamped to >= 1."""
    best = float("inf")
    for x in pa:
        for y in pb:
            d = (y - x) if y > x else (x - y + 1)
            best = min(best, d)
    return max(best, 1.0)


def oracle_search(
    idx: OracleIndex,
    query: str,
    k: int = 10,
    allowed_docids: set[int] | None = None,
    prox_weight: float = 0.0,
    prox_mode: str = "pairs",
    exact_boost: float = 0.0,
) -> list[tuple[int, float]]:
    """-> [(docid, score)] top-k, ties (score desc, docid asc).

    Supports the reference query grammar (``src/search/query_parser.rs:9-121``):
    bare words (OR semantics a la TermsMatchingStrategy::Last reduced to
    disjunctive BM25), "quoted phrases" (must match adjacently; phrase words
    also contribute to the score), -negated words, trailing * prefix,
    trailing ~ typo expansion.
    """
    pq: ParsedQuery = parse_query(query)

    # scoring terms: words + phrase members + expansions. Derived terms
    # carry the frozen derivation penalties (config.py, reference K3/K6
    # analogue); a term reachable both exactly and derived keeps the
    # larger weight — mirrors SearchIndex.plan exactly.
    term_weights: list[tuple[str, float]] = []
    candidate_docs: set[int] = set()

    weight_of: dict[str, float] = {}

    def add_scoring_term(t: str, penalty: float = 1.0):
        if idx.df(t) == 0:
            return
        w = idx.idf(t) * penalty
        if t in weight_of:
            weight_of[t] = max(weight_of[t], w)
            return
        weight_of[t] = w
        candidate_docs.update(idx.postings[t])

    for w in pq.words:
        add_scoring_term(w)
    for pref in pq.prefixes:
        for t in _expand_prefix(idx, pref):
            add_scoring_term(t, 1.0 if t == pref else PREFIX_PENALTY)
    for ty in pq.typos:
        for t in typo_candidates(ty, idx.postings.keys()):
            add_scoring_term(t, TYPO_PENALTY ** levenshtein(ty, t, cap=3))
    for ph in pq.phrases:
        for w in ph:
            add_scoring_term(w)
    term_weights = sorted(weight_of.items())

    # phrase constraint: candidates must contain every phrase adjacently
    # (phrase terms are scoring terms, so phrase docs ⊆ current candidates)
    for ph in pq.phrases:
        candidate_docs &= _phrase_docids(idx, ph)

    # negation: drop docs containing any negated term
    for neg in pq.negated:
        nd = set(idx.postings.get(neg, {}))
        candidate_docs -= nd

    if allowed_docids is not None:
        candidate_docs &= allowed_docids

    # proximity bonus (reference K4, frozen spec shared with QueryPlan):
    # 'pairs' — consecutive query word pairs (exact words, a != b, both
    #   indexed) add prox_weight / minprox when minprox <= 7;
    # 'cost' — multi-pair budgeted cost model (QueryPlan.prox_gaps spec):
    #   ALL pairs i<j with gap weight g = 1/(j-i), pair cost
    #   min(minprox, 8) (8 when absent), bonus
    #   prox_weight * max(0, 4S - cost)/4S with S = sum g.
    prox_pairs: list[tuple[str, str, float]] = []
    if prox_weight:
        if prox_mode == "cost":
            ws = pq.words
            prox_pairs = [
                (ws[i], ws[j], 1.0 / (j - i))
                for i in range(len(ws))
                for j in range(i + 1, len(ws))
                if ws[i] != ws[j] and idx.df(ws[i]) and idx.df(ws[j])
            ]
        else:
            prox_pairs = [
                (a, b, 1.0)
                for a, b in zip(pq.words, pq.words[1:])
                if a != b and idx.df(a) and idx.df(b)
            ]

    # ExactAttribute (QueryPlan.exact_boost spec): a field's whole content
    # equals the query words — anchored occurrence a + i in positions[w_i]
    # for some field anchor a = fid << 16, plus dl == n on single-field
    # indexes (so nothing follows)
    def is_exact(d: int) -> bool:
        ws = pq.words
        if not ws:
            return False
        if idx.dl_check and idx.dl.get(d) != len(ws):
            return False
        p0 = idx.positions.get(ws[0], {}).get(d)
        if not p0:
            return False
        for a in p0:
            if a & 0xFFFF:
                continue  # not a field start
            if all((a + i) in idx.positions.get(w, {}).get(d, ())
                   for i, w in enumerate(ws)):
                return True
        return False

    def total_score(d: int) -> float:
        s = _bm25_score(idx, term_weights, d)
        if exact_boost and is_exact(d):
            s += exact_boost
        if prox_mode == "cost" and prox_pairs:
            S = sum(g for _, _, g in prox_pairs)
            cost = 0.0
            for a, b, g in prox_pairs:
                pa = idx.positions.get(a, {}).get(d)
                pb = idx.positions.get(b, {}).get(d)
                c = min(_min_prox(pa, pb), 8.0) if (pa and pb) else 8.0
                cost += g * c
            s += prox_weight * max(0.0, 4.0 * S - cost) / (4.0 * S)
            return s
        for a, b, _g in prox_pairs:
            pa = idx.positions.get(a, {}).get(d)
            pb = idx.positions.get(b, {}).get(d)
            if pa and pb:
                mp = _min_prox(pa, pb)
                if mp <= 7:
                    s += prox_weight / mp
        return s

    scored = [(d, total_score(d)) for d in candidate_docs]
    scored.sort(key=lambda x: (-x[1], x[0]))
    return scored[:k]
