"""Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md §1).

Schema mandated by the north rule's input hint:
``(url string, warc_ts timestamp, html binary, text string, lang string)``.

Properties engineered into the text:
* Zipfian vocabulary (~5k terms, s≈1.1) so head terms exercise skew/salting;
* hard separators (". ") injected to exercise the +8 position rule;
* planted known-answer phrases ("quick brown fox" family) in known docs;
* mixed case + accents to exercise the normalizer;
* a small fraction of duplicate urls with later ``warc_ts`` to exercise
  last-write-wins upsert (reference ``ReplaceDocuments``,
  ``src/update/index_documents/transform.rs:107-110``).

Everything is seeded (seed=42 by default) and pure — no external data. The
generator is plain Python/numpy producing a pandas DataFrame; callers turn it
into a Spark DataFrame or write parquet.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd

LANGS = ["en", "de", "fr", "ru"]

# a few accented/cased variants to exercise normalization; they normalize to
# plain ascii terms that also exist in the vocab
ACCENT_VARIANTS = {
    "search": "Séarch",
    "engine": "Enginé",
    "index": "Índex",
    "table": "Täble",
}

PLANTED_PHRASES = [
    "quick brown fox",
    "lazy sleeping dog",
    "distributed inverted index",
]


def _vocab(n_terms: int, rng: np.random.Generator) -> list[str]:
    """Deterministic pseudo-words: cv-syllable terms, unique."""
    consonants = list("bcdfghjklmnprstvwz")
    vowels = list("aeiou")
    words: list[str] = []
    seen: set[str] = set()
    base = ["the", "of", "and", "web", "search", "engine", "index", "data",
            "page", "crawl", "spark", "query", "term", "score", "rank",
            "table", "quick", "brown", "fox", "lazy", "sleeping", "dog",
            "distributed", "inverted"]
    for w in base:
        words.append(w)
        seen.add(w)
    while len(words) < n_terms:
        n_syll = int(rng.integers(2, 5))
        w = "".join(
            consonants[int(rng.integers(len(consonants)))] + vowels[int(rng.integers(len(vowels)))]
            for _ in range(n_syll)
        )
        if w not in seen:
            seen.add(w)
            words.append(w)
    return words


def generate_pages(
    n_docs: int = 1000,
    seed: int = 42,
    n_terms: int = 5000,
    zipf_s: float = 1.1,
    dup_frac: float = 0.02,
) -> pd.DataFrame:
    """Generate the ``pages`` corpus as a pandas DataFrame."""
    rng = np.random.default_rng(seed)
    vocab = np.array(_vocab(n_terms, rng))

    # Zipf over vocab ranks (rejection-free: normalized power-law weights)
    ranks = np.arange(1, n_terms + 1, dtype=np.float64)
    probs = ranks**-zipf_s
    probs /= probs.sum()

    lengths = rng.integers(20, 501, size=n_docs)
    langs = rng.choice(LANGS, size=n_docs, p=[0.6, 0.15, 0.15, 0.1])

    texts: list[str] = []
    for i in range(n_docs):
        words = list(vocab[rng.choice(n_terms, size=int(lengths[i]), p=probs)])
        # inject accent/case variants occasionally
        for j in range(len(words)):
            if words[j] in ACCENT_VARIANTS and rng.random() < 0.3:
                words[j] = ACCENT_VARIANTS[words[j]]
        # plant known phrases in deterministic docs
        for p_i, phrase in enumerate(PLANTED_PHRASES):
            if i % 97 == p_i * 13 + 5:
                at = int(rng.integers(0, len(words)))
                words[at:at] = phrase.split()
        # sentence breaks: hard separator roughly every 8-15 words
        out: list[str] = []
        next_break = int(rng.integers(8, 16))
        for j, w in enumerate(words):
            out.append(w)
            if j + 1 == next_break:
                out.append(".")
                next_break += int(rng.integers(8, 16))
        text = " ".join(out).replace(" .", ".")
        texts.append(text)

    base_ts = dt.datetime(2024, 1, 1)
    ts = [base_ts + dt.timedelta(seconds=int(s)) for s in rng.integers(0, 365 * 86400, n_docs)]
    urls = [f"https://site{i % 127}.example.com/page/{i:08d}" for i in range(n_docs)]

    df = pd.DataFrame(
        {
            "url": urls,
            "warc_ts": ts,
            "text": texts,
            "lang": langs,
        }
    )

    # duplicates: re-crawl of an existing url with later ts and different text
    n_dup = int(n_docs * dup_frac)
    if n_dup:
        dup_idx = rng.choice(n_docs, size=n_dup, replace=False)
        dups = df.iloc[dup_idx].copy()
        dups["warc_ts"] = dups["warc_ts"] + pd.Timedelta(days=400)
        dups["text"] = "recrawl updated content. " + dups["text"].str.slice(0, 200)
        df = pd.concat([df, dups], ignore_index=True)

    df["html"] = [f"<html><body>{t}</body></html>".encode() for t in df["text"]]
    return df[["url", "warc_ts", "html", "text", "lang"]]


def generate_pages_spark(spark, n_docs: int, seed: int = 42, n_terms: int = 5000,
                         zipf_s: float = 1.1, n_parts: int | None = None):
    """Distributed deterministic corpus generator (for large bench/scaling
    runs): each doc is generated from ``rng([seed, doc_index])``, so the
    output is identical at ANY partitioning/parallelism — the property the
    north rule's two-cluster-size comparison depends on. Vocab and Zipf
    weights are built once per executor batch (cheap, deterministic).

    No planted phrases/duplicates here — this is the throughput corpus; the
    pandas ``generate_pages`` stays the correctness-fixture generator.
    """
    import pandas as pd  # noqa: F811 (executor-side import)

    n_parts = n_parts or max(32, n_docs // 4000)

    def gen(batches):
        rng0 = np.random.default_rng(seed)
        vocab = np.array(_vocab(n_terms, rng0))
        ranks = np.arange(1, n_terms + 1, dtype=np.float64)
        probs = ranks**-zipf_s
        probs /= probs.sum()
        base = dt.datetime(2024, 1, 1)
        for pdf in batches:
            rows = {"url": [], "warc_ts": [], "html": [], "text": [], "lang": []}
            for i in pdf["id"].to_numpy():
                rng = np.random.default_rng([seed, int(i)])
                length = int(rng.integers(20, 501))
                words = vocab[rng.choice(n_terms, size=length, p=probs)]
                text = " ".join(words)
                rows["url"].append(f"https://site{int(i) % 127}.example.com/page/{int(i):010d}")
                rows["warc_ts"].append(base + dt.timedelta(seconds=int(rng.integers(0, 365 * 86400))))
                rows["html"].append(b"<html><body>...</body></html>")
                rows["text"].append(text)
                rows["lang"].append(LANGS[int(rng.integers(len(LANGS)))])
            yield pd.DataFrame(rows)

    return (
        spark.range(n_docs, numPartitions=n_parts)
        .mapInPandas(gen, schema=pages_spark_schema())
    )


def query_fixture() -> pd.DataFrame:
    """Frozen reference query set (FIXTURES.md §2)."""
    queries = [
        # 1-term
        (1, "search", 10),
        (2, "spark", 10),
        # 3-term
        (3, "web search engine", 10),
        (4, "distributed data index", 10),
        # head-term heavy
        (5, "the of and", 10),
        # rare-term (deep-rank vocab words are rare under zipf)
        (6, "crawl rank score", 10),
        # planted phrase, quoted
        (7, '"quick brown fox"', 10),
        (8, '"distributed inverted index"', 10),
        # trailing-prefix token
        (9, "sea*", 10),
        # negation
        (10, "search -engine", 10),
        # accent/case in query (normalizes to same terms)
        (11, "Séarch ENGINE", 10),
        # typo (1 edit from 'search')
        (12, "searhc~", 10),
    ]
    return pd.DataFrame(queries, columns=["qid", "query", "k"])


def pages_spark_schema() -> str:
    return "url string, warc_ts timestamp, html binary, text string, lang string"


def write_pages_parquet(path: str, n_docs: int = 1000, seed: int = 42, **kw) -> str:
    df = generate_pages(n_docs=n_docs, seed=seed, **kw)
    df.to_parquet(path, index=False)
    return path
