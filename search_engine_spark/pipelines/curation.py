"""Corpus-curation operators: test-set decontamination, repetition-based
quality stats, deterministic stratified sampling.

The training-data companions to dedup/textstats: before a web corpus is
fed to a model you (a) strip documents that overlap the eval sets
(n-gram decontamination, the C4/GPT-3 procedure), (b) drop pathologically
repetitive pages (Gopher repetition rules), and (c) downsample strata
(language/source) to a target mix with a reproducible coin.

All operators are JVM-side DataFrame expressions (no Python in the hot
path), deterministic (md5 coins), and have exact DuckDB oracles.

Scale shapes (100 TB):
* ``decontaminate`` — ONE hash join on a 32-char md5 gram key. The probe
  (eval-set) side is tiny by construction (benchmarks are MBs, corpora are
  TBs), deduped before the join, and broadcast by AQE; the corpus side
  streams through map-side. No corpus shuffle.
* ``repetition_stats`` — pure per-row projection (sort_array + one
  aggregate pass per doc computes the max duplicate-run); zero exchanges,
  embarrassingly parallel.
* ``stratified_sample`` — stateless per-row md5 coin; zero exchanges,
  identical output at any parallelism (the coin depends only on
  (seed, doc_id), never on partitioning).

Reference parity: the reference engine has no corpus-curation layer (its
dedup is by external document id only, ``/root/reference/src/update/
index_documents/transform.rs:150-360``); these are extensions mandated by
the training-data-pipeline brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from search_engine_spark.pipelines.dedup import doc_term_array, shingle_expr, tokens_col

ROUND = 6  # fraction rounding (oracle float-compare stability)


def _grams(
    df: DataFrame, n: int, id_col: str, text_col: str, distinct: bool
) -> DataFrame:
    """(doc_id, terms: array<string>) word n-grams per doc, per-row."""
    return doc_term_array(
        df, id_col=id_col, text_col=text_col, distinct=distinct, shingle_size=n
    )


def decontaminate(
    docs: DataFrame,
    probes: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    probe_id_col: str = "doc_id",
    probe_text_col: str = "text",
) -> DataFrame:
    """Flag corpus docs sharing >= 1 word n-gram with the probe set.

    -> (doc_id, n_hits): one row per CONTAMINATED doc; n_hits = number of
    distinct probe n-grams the doc contains. Filter the corpus with an
    anti-join on this result (or keep docs below a hit threshold).

    Grams are md5-hashed before the join: fixed 32-char keys instead of
    arbitrarily long 13-gram strings, same match semantics (md5 is
    injective for any real corpus), and the probe side is distinct-deduped
    so the join fan-out is bounded by true containment.
    """
    doc_g = _grams(docs, n, id_col, text_col, distinct=True).select(
        "doc_id", F.explode("terms").alias("g")
    ).select("doc_id", F.md5("g").alias("gh"))
    probe_g = (
        _grams(probes, n, probe_id_col, probe_text_col, distinct=True)
        .select(F.explode("terms").alias("g"))
        .select(F.md5("g").alias("gh"))
        .distinct()
    )
    return (
        doc_g.join(probe_g, "gh")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"))
    )


def decontaminate_bloom(
    docs: DataFrame,
    probes: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    probe_id_col: str = "doc_id",
    probe_text_col: str = "text",
    bits_per_key: int = 16,
    num_hashes: int | None = None,
) -> DataFrame:
    """``decontaminate`` with a broadcast Bloom prefilter — IDENTICAL
    output (the Bloom only prunes; survivors are confirmed by the exact
    md5-key join), different scale envelope.

    When to use which: plain ``decontaminate`` streams corpus grams
    through one hash join whose build side is the probe gram set — ideal
    while that set fits a broadcast hash relation (eval benchmarks,
    ~MBs). When the "contamination set" is itself large (every eval set
    ever shipped, a blocklist of known-benchmark paraphrases — 10^8+
    grams, tens of GB as a hash table), the JVM relation no longer
    broadcasts, and the join shuffles EVERY corpus gram. This variant
    packs the probe grams into an m-bit Bloom filter (``bits_per_key``
    bits/key -> ~0.04% FP at 16) that is 10-100x smaller than the hash
    relation, ships it once per executor, and drops non-matching corpus
    grams MAP-SIDE before any exchange; only true hits + the tiny FP
    trickle reach the exact confirm join, whose input is now bounded by
    actual contamination, not corpus size.

    Plan shape: gram hashes (xxhash64 x2) are computed JVM-side; the
    membership test is one Arrow-batched pandas UDF doing vectorized
    numpy bit probes against the broadcast bitset (zero per-row Python);
    the confirm join reuses ``decontaminate``'s md5 keys, so FPs can
    never surface. Deterministic at any parallelism.
    """
    import numpy as np
    from pyspark.sql.types import BooleanType

    doc_g = _grams(docs, n, id_col, text_col, distinct=True).select(
        "doc_id", F.explode("terms").alias("g")
    ).select("doc_id", F.md5("g").alias("gh"))
    probe_g = (
        _grams(probes, n, probe_id_col, probe_text_col, distinct=True)
        .select(F.explode("terms").alias("g"))
        .select(F.md5("g").alias("gh"))
        .distinct()
    )

    # double hashing h_i = h1 + i*h2 (Kirsch-Mitzenmacher): two JVM-side
    # xxhash64 values per gram are enough for any k
    h1 = F.xxhash64("gh")
    h2 = F.xxhash64(F.lit("bloom2"), F.col("gh"))

    probe_h = probe_g.select(h1.alias("h1"), h2.alias("h2")).toPandas()
    n_keys = len(probe_h)
    m_bits = 64
    while m_bits < bits_per_key * max(1, n_keys):
        m_bits <<= 1  # power of two -> mod is a mask
    k = num_hashes or min(16, max(1, round(0.6931 * bits_per_key)))

    bits = np.zeros(m_bits >> 6, dtype=np.uint64)
    if n_keys:
        a = probe_h["h1"].to_numpy().astype(np.int64).view(np.uint64)
        b = probe_h["h2"].to_numpy().astype(np.int64).view(np.uint64)
        mask = np.uint64(m_bits - 1)
        for i in range(k):
            idx = (a + np.uint64(i) * b) & mask
            np.bitwise_or.at(
                bits, (idx >> np.uint64(6)).astype(np.int64),
                np.uint64(1) << (idx & np.uint64(63)),
            )
    bc = docs.sparkSession.sparkContext.broadcast(bits)

    @F.pandas_udf(BooleanType())
    def _member(s1, s2):
        import pandas as pd

        bset = bc.value
        a = s1.to_numpy().astype(np.int64).view(np.uint64)
        b = s2.to_numpy().astype(np.int64).view(np.uint64)
        mask = np.uint64(len(bset) * 64 - 1)
        hit = np.ones(len(a), dtype=bool)
        for i in range(k):
            idx = (a + np.uint64(i) * b) & mask
            word = bset[(idx >> np.uint64(6)).astype(np.int64)]
            hit &= (word >> (idx & np.uint64(63))) & np.uint64(1) != 0
        return pd.Series(hit)

    survivors = doc_g.filter(_member(h1, h2))
    return (
        survivors.join(probe_g, "gh")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"))
    )


def _max_run(sorted_arr: Column) -> Column:
    """Longest run of equal adjacent elements in a SORTED array
    (== max multiplicity of any element). One linear aggregate pass;
    empty array -> 0."""
    init = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
    )

    def step(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    return F.aggregate(sorted_arr, init, step, lambda acc: acc["best"])


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 2,
) -> DataFrame:
    """Gopher-style repetition signals, one row per doc (docs with no
    tokens keep zero fractions).

    -> (doc_id, n_tokens, dup_word_frac, dup_ngram_frac, top_ngram_frac):
    * dup_word_frac  = 1 - distinct_words / words (0 when empty)
    * dup_ngram_frac = 1 - distinct_ngrams / ngrams
    * top_ngram_frac = occurrences of the most frequent n-gram / ngrams

    The max-multiplicity is computed per row as the longest equal run of
    the SORTED gram array — O(len log len) per doc, no groupBy, so the
    operator is a pure projection at any corpus size: one scan, zero
    exchanges. The gram array is derived from the token array in-row
    (``shingle_expr``) and pinned behind its own Generate barrier so the
    four consumers below don't each rebuild it (CollapseProject).
    """
    words = _grams(df, 1, id_col, text_col, distinct=False)
    j = words.select(
        "doc_id",
        "terms",
        F.explode(F.array(shingle_expr(F.col("terms"), ngram))).alias("grams"),
    )
    nw = F.size("terms")
    ng = F.size("grams")

    def frac(num, den):
        return F.round(
            F.when(den > 0, num / den.cast("double")).otherwise(F.lit(0.0)), ROUND
        )

    return j.select(
        "doc_id",
        nw.alias("n_tokens"),
        frac(nw - F.size(F.array_distinct("terms")), nw).alias("dup_word_frac"),
        frac(ng - F.size(F.array_distinct("grams")), ng).alias("dup_ngram_frac"),
        frac(_max_run(F.sort_array("grams")), ng).alias("top_ngram_frac"),
    )


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    seed: int = 42,
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum downsampling with an md5 coin.

    Keeps a row iff ``u(seed, id) < rates[stratum]`` where
    ``u = int(md5(seed ':' id)[:15 hex], 16) / 2^60`` — uniform in [0, 1),
    independent of partitioning and cluster size, reproducible in DuckDB
    and Python. Unlisted strata get ``default_rate``. Returns the
    surviving rows unchanged (all original columns).

    Unlike ``df.sample``, the decision is a pure function of the row, so
    the same doc survives in every run, at any parallelism, and across
    engines — the property a 100 TB pipeline needs for resumable,
    auditable mixes.
    """
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(float(1 << 60))
    )
    rate = F.lit(float(default_rate))
    for k, v in sorted(rates.items()):
        rate = F.when(F.col(stratum_col) == k, F.lit(float(v))).otherwise(rate)
    return df.filter(u < rate)


def stratified_sample_n(
    df: DataFrame,
    n: int,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    seed: int = 42,
    prefilter: bool = True,
    margin: float = 4.0,
) -> DataFrame:
    """Exactly ``min(n, |stratum|)`` rows per stratum, deterministically.

    ``stratified_sample`` keeps a FRACTION per stratum; this keeps a
    FIXED COUNT — the shape a training mix actually specifies ("200k
    docs per language"). Selection is the first n rows of each stratum
    ordered by ``(md5(seed ':' id), id)``: a pure function of the row,
    so the sample is identical at any parallelism, resumable, and
    reproducible in DuckDB (``row_number() OVER (PARTITION BY stratum
    ORDER BY md5(...), id) <= n``).

    Scale shape (100 TB): the naive plan — a row_number window over each
    full stratum — sorts ENTIRE strata on single reducers (a billion-row
    'en' stratum lands on one task). With ``prefilter=True`` (default)
    the operator first drops every row whose md5-coin exceeds
    ``margin * n / |stratum|`` (per-stratum counts from one cheap agg,
    broadcast back), so the window only ever sorts ~margin*n rows per
    stratum regardless of corpus size. The prefilter is EXACT, not
    approximate: ordering by the full md5 hex refines the coin's
    15-hex-digit prefix consistently, so the global top-n of a stratum
    is a subset of any coin-threshold cut that retains >= n rows; the
    rare stratum where the Binomial tail leaves fewer than min(n, total)
    survivors (P ~ exp(-n(margin-1-ln margin)), ~1e-77 at n=100,
    margin=4) is detected by a second tiny agg and re-ranked over its
    full rows — output is therefore ALWAYS the exact top-n, the
    prefilter only bounds the sort.
    """
    from pyspark.sql import Window

    sk = F.md5(
        F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string"))
    )
    w = Window.partitionBy(stratum_col).orderBy("__sk", id_col)
    cols = df.columns

    base = df
    if prefilter:
        u = (
            F.conv(F.substring(sk, 1, 15), 16, 10).cast("double")
            / F.lit(float(1 << 60))
        )
        totals = df.groupBy(stratum_col).agg(F.count("*").alias("__total"))
        cand = (
            df.join(F.broadcast(totals), stratum_col)
            .filter(u < F.least(F.lit(1.0), F.lit(margin * n) / F.col("__total")))
            .select(*cols)
        )
        got = cand.groupBy(stratum_col).agg(F.count("*").alias("__got"))
        # strata whose survivor count fell under min(n, total): re-rank full
        bad = (
            totals.join(got, stratum_col, "left")
            .filter(
                F.coalesce(F.col("__got"), F.lit(0))
                < F.least(F.lit(n), F.col("__total"))
            )
            .select(stratum_col)
        )
        base = cand.join(F.broadcast(bad), stratum_col, "left_anti").unionByName(
            df.join(F.broadcast(bad), stratum_col, "left_semi")
        )

    return (
        base.withColumn("__sk", sk)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .select(*cols)
    )


def unigram_logloss(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_df: DataFrame | None = None,
) -> DataFrame:
    """CCNet-style perplexity-proxy quality score from a SELF-TRAINED
    unigram LM (Wenzek et al. 2019 score documents with a KenLM 5-gram;
    with no pretrained LM in the sandbox the corpus's own unigram
    distribution is the deterministic stand-in — the plumbing is the real
    thing a KenLM scorer would need, the model is one broadcast dict).

    cross_entropy(d) = -(1/|d|) * sum_t log2( cf(t) / total_tokens ),
    perplexity(d) = 2 ** cross_entropy(d); token-less docs score NULL.

    Scale shape: ONE map-side-combined aggregation builds the vocabulary
    (vocab-sized rows — but a 100 TB web corpus holds 10^8-10^9 distinct
    terms, so the vocab is NOT force-broadcast: the tf<->vocab join is
    left to AQE, which broadcasts when the built side is actually small
    and sort-merge-joins otherwise). The 1-row corpus total rides a
    broadcast cross join (always safe). A doc's unseen-token probability
    can't occur (the model is self-trained), so no smoothing constant
    enters the frozen formula.

    Pass ``vocab_df`` (columns ``term``, ``cf``) to reuse an
    already-built term dictionary — e.g. the index's ``term_dict`` cf
    column — instead of recounting the corpus.

    -> (doc_id, n_tokens, cross_entropy, perplexity), all corpus-level
    deterministic (md5-free: pure counting).
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens_col(text_col)).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    if vocab_df is None:
        vocab = tf.groupBy("term").agg(F.sum("tf").alias("cf"))
    else:
        vocab = vocab_df.select("term", F.col("cf").cast("long").alias("cf"))
    total = vocab.agg(F.sum("cf").cast("double").alias("n"))
    scored = (
        tf.join(vocab, "term")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_tokens"),
            (
                -F.sum(F.col("tf") * F.log2(F.col("cf") / F.col("n")))
                / F.sum("tf")
            ).alias("ce"),
        )
    )
    out = df.select(F.col(id_col).alias("doc_id")).join(scored, "doc_id", "left")
    return out.select(
        "doc_id",
        F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
        F.round("ce", ROUND).alias("cross_entropy"),
        F.round(F.pow(F.lit(2.0), "ce"), ROUND).alias("perplexity"),
    )


def bigram_logloss(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lam: float = 0.75,
) -> DataFrame:
    """Interpolated-bigram LM cross-entropy per doc — the next step up
    from ``unigram_logloss`` toward the KenLM n-gram scorer CCNet uses
    (Wenzek et al. 2019): still self-trained and fully deterministic,
    but context-aware, so word-salad pages that fool a unigram model
    (common words in impossible orders) score high.

    p(cur | prev) = lam * c(prev,cur)/c(prev,*) + (1-lam) * cf(cur)/N
    ce(d) = -(1/(|d|-1)) * sum over transitions of log2 p;  docs with
    fewer than 2 tokens score NULL; ``n_bigrams`` = |d|-1.

    Scale shape: bigram pairing is IN-ROW (an array ``transform`` over
    the token array — no self-join, no window over positions, zero extra
    exchanges to form pairs). Three map-side-combined aggregations build
    the model tables (bigram counts, left-context totals, unigram cf);
    like ``unigram_logloss`` none is force-broadcast — a 100 TB corpus
    has ~10^10 distinct bigrams, so the doc-side joins are left to AQE
    (broadcast when genuinely small, sort-merge otherwise, all on the
    same (prev,cur)/(prev)/(cur) keys). The 1-row total rides a
    broadcast cross join. Every observed transition has c(prev,cur) >= 1
    (self-trained), so the interpolation is a smoothing choice, not an
    out-of-vocabulary fix.

    -> (doc_id, n_bigrams, cross_entropy, perplexity).
    """
    t = df.select(F.col(id_col).alias("doc_id"), tokens_col(text_col).alias("t"))
    bg = (
        t.filter(F.size("t") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 1),"
                    " i -> struct(t[i-1] AS prev, t[i] AS cur))"
                )
            ).alias("b"),
        )
        .select("doc_id", "b.prev", "b.cur")
    )
    tf = bg.groupBy("doc_id", "prev", "cur").agg(F.count("*").alias("bf"))
    bvoc = tf.groupBy("prev", "cur").agg(F.sum("bf").cast("double").alias("cbg"))
    ctx = tf.groupBy("prev").agg(F.sum("bf").cast("double").alias("cprev"))
    toks = df.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens_col(text_col)).alias("term")
    )
    uni = toks.groupBy("term").agg(F.count("*").cast("double").alias("cf"))
    total = uni.agg(F.sum("cf").alias("n"))
    p = (
        F.lit(float(lam)) * F.col("cbg") / F.col("cprev")
        + F.lit(1.0 - float(lam)) * F.col("cf") / F.col("n")
    )
    scored = (
        tf.join(bvoc, ["prev", "cur"])
        .join(ctx, "prev")
        .join(uni.withColumnRenamed("term", "cur"), "cur")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.sum("bf").alias("n_bigrams"),
            (-F.sum(F.col("bf") * F.log2(p)) / F.sum("bf")).alias("ce"),
        )
    )
    out = df.select(F.col(id_col).alias("doc_id")).join(scored, "doc_id", "left")
    return out.select(
        "doc_id",
        F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
        F.round("ce", ROUND).alias("cross_entropy"),
        F.round(F.pow(F.lit(2.0), "ce"), ROUND).alias("perplexity"),
    )


# PII patterns, chosen to parse identically in Java regex (Spark) and RE2
# (DuckDB): no backrefs, no lookaround, no dialect-specific classes. Order
# matters — emails are masked before phones so an address's digits can't be
# half-eaten by the phone pattern.
PII_PATTERNS = (
    ("emails", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phones", r"\+\d[\d\- ]{7,}\d", "<PHONE>"),
)


def pii_redact(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """FineWeb/CCNet-style PII masking: replace emails, IPv4 addresses and
    international-format phone numbers with typed placeholder tokens and
    report per-doc match counts (the audit trail a redaction pass must
    leave). The deliberately-narrow phone pattern (+country prefix
    required) trades recall for a near-zero false-positive rate on
    numeric prose — the same call FineWeb's pipeline makes.

    Scale shape: pure per-row JVM projection (regexp_replace /
    regexp_extract_all inside whole-stage codegen) — zero exchanges, zero
    Python. Patterns are RE2-compatible so the DuckDB oracle runs the
    exact same regexes.

    Count semantics (deliberate): ``n_*`` are INDEPENDENT raw-text match
    counts per pattern, while redaction is sequential (emails first, then
    IPs, then phones on the progressively-redacted text). Overlapping
    matches are therefore attributed to every pattern they match — e.g. a
    phone-shaped email local part (``+12345678901@x.com``) counts toward
    both ``n_emails`` and ``n_phones`` but is consumed once by
    ``<EMAIL>``. The counts answer "how many pattern hits did the raw
    text contain" (the audit question), not "how many placeholders were
    inserted"; count ``<EMAIL>``/``<IP>``/``<PHONE>`` occurrences in
    ``text_redacted`` for the latter. The DuckDB oracle mirrors this.

    -> (doc_id, text_redacted, n_emails, n_ipv4, n_phones)
    """
    text = F.col(text_col)
    counts = [
        F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0)))
        .alias(f"n_{name}")
        for name, pat, _tok in PII_PATTERNS
    ]
    red = text
    for _name, pat, tok in PII_PATTERNS:
        red = F.regexp_replace(red, pat, tok)
    return df.select(
        F.col(id_col).alias("doc_id"),
        red.alias("text_redacted"),
        *counts,
    )


def cross_doc_ngram_dup(
    df: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cross-document duplicate n-gram fraction — the corpus-level twin of
    ``repetition_stats`` (which is within-doc): for each doc, the share of
    its DISTINCT word n-grams that also occur in at least one OTHER doc.
    This is the "fraction of text duplicated across documents" signal of
    Lee et al. 2021 (Deduplicating Training Data Makes LMs Better) /
    FineWeb's inter-document dup stats, used both as a quality filter and
    to decide whether substring-level dedup is worth running.

    -> (doc_id, n_grams, n_dup_grams, dup_frac), one row per input doc
    (token-less docs keep zeros). A gram counts as duplicated when its
    corpus doc-frequency > 1; per-doc distinctness means a doc repeating
    its own boilerplate does NOT inflate its score (that is
    ``repetition_stats``' job).

    Scale shape (100 TB): per-doc distinct gram arrays are built in-row
    (``doc_term_array``, zero exchanges), grams ride as fixed 32-char md5
    keys. Three linear, map-side-combined exchanges total: (1) groupBy
    gram-hash for corpus doc-frequency, (2) the gram->doc-frequency join
    back (same hash partitioning as (1) — Catalyst reuses the exchange on
    the aggregated side), (3) groupBy doc for the fraction. Head grams
    (common phrases) are absorbed by partial aggregation in (1) and fan
    out only per (doc, gram) row in (2) — no pair explosion anywhere.
    """
    tset = (
        _grams(df, n, id_col, text_col, distinct=True)
        .select("doc_id", F.explode("terms").alias("g"))
        .select("doc_id", F.md5("g").alias("gh"))
    )
    dfreq = tset.groupBy("gh").agg(F.count("*").alias("dc"))
    per = (
        tset.join(dfreq, "gh")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("ng"),
            F.sum(F.when(F.col("dc") > 1, 1).otherwise(0)).alias("nd"),
        )
    )
    ng = F.coalesce(F.col("ng"), F.lit(0))
    nd = F.coalesce(F.col("nd"), F.lit(0))
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            ng.alias("n_grams"),
            nd.cast("long").alias("n_dup_grams"),
            F.round(
                F.when(ng > 0, nd / ng.cast("double")).otherwise(F.lit(0.0)), ROUND
            ).alias("dup_frac"),
        )
    )


# Query params stripped during URL canonicalization: click/campaign trackers
# that vary per visit without changing the fetched page. Anchored at the
# param start and matched identically by Java regex and RE2 (the DuckDB
# oracle shares the literal pattern).
URL_TRACKING_PARAM_RE = r"^(utm_[a-z0-9_]*|fbclid|gclid|msclkid|ref|ref_src)(=|$)"


def canonicalize_urls(
    df: DataFrame,
    url_col: str = "url",
    out_col: str = "url_canon",
    host_col: str = "url_host",
) -> DataFrame:
    """Crawl-style URL canonicalization — the key-maker for URL-level
    dedup of a web corpus (the first dedup any Common-Crawl pipeline runs,
    before any content hashing): two fetches of the same page under
    tracking-param / fragment / case / default-port variations must map to
    ONE canonical key.

    Rules (deterministic, documented order):
      1. trim surrounding whitespace;
      2. scheme and host lowercased (path/query case is preserved — it is
         significant on most origins);
      3. fragment (``#...``) dropped;
      4. default port stripped (``:80`` for http, ``:443`` for https);
      5. leading ``www.`` stripped from the host;
      6. tracking params removed (``utm_*``, ``fbclid``, ``gclid``,
         ``msclkid``, ``ref``, ``ref_src`` — ``URL_TRACKING_PARAM_RE``);
      7. remaining query params sorted byte-wise (param order never
         changes the resource); empty query dropped;
      8. trailing ``/`` stripped from the path (`/a/` == `/a`; the root
         path canonicalizes to the bare origin).
    A value with no ``scheme://`` does not parse as a URL and
    canonicalizes to its trimmed, lowercased self (documented fallback —
    quarantine-grade input).

    Scale shape: pure per-row JVM projection (regexp_extract / array_sort
    / concat inside whole-stage codegen) — zero exchanges, zero Python.
    Compose with ``exact_dedup(df, text_col=out_col)`` for the actual
    URL-level dedup; the canonical key is also the right shuffle key for
    per-site aggregations (host-prefixed, so one site's pages co-locate).

    -> input columns + ``url_canon`` + ``url_host``.
    """
    raw = F.trim(F.col(url_col))
    scheme = F.lower(F.regexp_extract(raw, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    auth = F.lower(F.regexp_extract(raw, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1))
    host = (
        F.when(scheme == "http", F.regexp_replace(auth, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(auth, ":443$", ""))
        .otherwise(auth)
    )
    host = F.regexp_replace(host, r"^www\.", "")
    path = F.regexp_replace(
        F.regexp_extract(raw, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1),
        "/+$",
        "",
    )
    qs = F.concat_ws(
        "&",
        F.array_sort(
            F.filter(
                F.split(F.regexp_extract(raw, r"\?([^#]*)", 1), "&"),
                lambda p: (p != "") & ~p.rlike(URL_TRACKING_PARAM_RE),
            )
        ),
    )
    canon = F.when(
        scheme == "",
        F.lower(raw),
    ).otherwise(
        F.concat(
            scheme,
            F.lit("://"),
            host,
            path,
            F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs)),
        )
    )
    return df.withColumn(out_col, canon).withColumn(
        host_col, F.when(scheme == "", F.lit("")).otherwise(host)
    )


def dup_passages(
    df: DataFrame,
    L: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Duplicated-passage detection — the span-level member of the dedup
    suite (exact_dedup = whole doc, minhash/simhash = near-dup doc,
    cross_doc_ngram_dup = per-doc fraction; this one says WHERE the
    duplicated text sits). Spark-native equivalent of Lee et al. 2021's
    ExactSubstr pass: any substring of >= L tokens shared by two docs is
    exactly a run of shared stride-1 L-token windows, so hashing every
    window and keeping those whose corpus doc-frequency > 1 finds all
    such substrings without a suffix array; overlapping/adjacent
    duplicated windows then merge into maximal spans (the union of dup
    regions — partners are not distinguished, matching the "cut these
    bytes" use of the original).

    -> (doc_id, span_start, span_end, n_tokens_span, n_windows): one row
    per maximal duplicated span, token offsets [span_start, span_end).
    Docs shorter than L tokens degrade to one whole-doc window (the
    shingle partial), so they only flag on exact whole-doc duplication;
    span_end is clamped to the doc length.

    Scale shape (100 TB): the window explosion is one row per token —
    the same cost class as the postings extraction, linear. Three
    exchanges: (1) groupBy window-hash with partial count-distinct (head
    windows — boilerplate — are absorbed map-side and fan back out only
    per occurrence: no pair explosion, unlike all-pairs suffix compare),
    (2) the dup-window semi-join back, (3) repartition by doc for the
    lag/running-sum span merge, whose per-doc state is bounded by the
    doc's own token count.
    """
    from pyspark.sql import Window

    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array(tokens_col(text_col))).alias("toks"),
    )
    win = base.select(
        "doc_id",
        F.size("toks").alias("n_toks"),
        F.posexplode(shingle_expr(F.col("toks"), L)).alias("pos", "g"),
    ).select("doc_id", "n_toks", "pos", F.md5("g").alias("gh"))
    dup = (
        win.groupBy("gh")
        .agg(F.count_distinct("doc_id").alias("dc"))
        .filter(F.col("dc") > 1)
    )
    hits = win.join(dup.select("gh"), "gh").select("doc_id", "n_toks", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    return (
        hits.withColumn("prev", F.lag("pos").over(w))
        .withColumn(
            "new_span",
            (F.col("prev").isNull() | (F.col("pos") - F.col("prev") > L)).cast("int"),
        )
        .withColumn("span_id", F.sum("new_span").over(run))
        .groupBy("doc_id", "span_id")
        .agg(
            F.min("pos").alias("span_start"),
            F.least(F.max("pos") + L, F.first("n_toks")).alias("span_end"),
            F.count("*").alias("n_windows"),
        )
        .select(
            "doc_id",
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start")).alias("n_tokens_span"),
            "n_windows",
        )
    )


def dedup_lines(
    df: DataFrame,
    min_docs: int = 2,
    delimiter: str = "\n",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cross-document line (segment) deduplication — the boilerplate
    remover of CCNet / RefinedWeb: split every document into segments on
    ``delimiter``, count how many DISTINCT documents each exact segment
    occurs in, and delete segments appearing in >= ``min_docs`` documents
    (nav bars, cookie banners, footers repeat verbatim across a site;
    body text does not). Remaining segments are re-joined in original
    order. Exact match by design (normalization belongs upstream).

    -> (doc_id, text_clean, n_segments, n_removed): every input doc keeps
    a row; a fully-boilerplate doc comes back with ``text_clean = ''``
    (filter on ``n_segments > n_removed`` to drop husks).

    Scale shape (100 TB): linear exchanges only — (1) distinct (segment
    md5, doc) then a map-side-combined count per hash (head segments
    collapse in the combiner; no pair explosion), (2) one semi/anti join
    of the exploded segments against the heavy-hash set (hash join on the
    md5 key), (3) one groupBy(doc) re-assembly whose state is bounded by
    the doc's own segment count. Segment strings never shuffle twice:
    the count and the join both key on the 16-byte md5.
    """
    import re as _re

    delim_re = _re.escape(delimiter)
    segs = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), delim_re)).alias("pos", "seg"),
    ).withColumn("sh", F.md5("seg"))
    heavy = (
        segs.select("sh", "doc_id")
        .distinct()
        .groupBy("sh")
        .agg(F.count("*").alias("dc"))
        .filter(F.col("dc") >= min_docs)
        .select("sh")
    )
    kept = segs.join(heavy, "sh", "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.concat_ws(
            delimiter,
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "seg"))),
                lambda s: s.getField("seg"),
            ),
        ).alias("text_clean"),
        F.count("*").alias("n_kept"),
    )
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.split(F.col(text_col), delim_re)).alias("n_segments"),
    )
    return base.join(rebuilt, "doc_id", "left").select(
        "doc_id",
        F.coalesce("text_clean", F.lit("")).alias("text_clean"),
        "n_segments",
        (F.col("n_segments") - F.coalesce("n_kept", F.lit(0)))
        .cast("int")
        .alias("n_removed"),
    )


def pack_sequences(
    df: DataFrame,
    max_len: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
    count_col: str | None = None,
    n_parts: int = 32,
) -> DataFrame:
    """LLM pretraining sequence packing: concatenate all documents (in
    ascending ``id_col`` order) into one logical token stream and cut it
    into fixed ``max_len``-token training sequences, emitting the span
    map — one row per (document, sequence) overlap. This is the greedy
    concat-and-chunk packing of GPT/Llama-style pretraining: no padding
    waste, documents split across sequence boundaries, every sequence
    except the last exactly full.

    Tokens are the engine's standard ``[a-z0-9]+`` regex tokens (pass
    ``count_col`` to use a precomputed per-doc token count — e.g. a real
    BPE count — instead). The actual token *materialization* stays with
    the caller: this operator computes the placement plan (which is the
    shuffle-heavy part), so the follow-up gather is a map-only join.

    -> (seq_id, doc_id, doc_start, seq_start, span_len): sequence
    ``seq_id`` contains tokens ``[doc_start, doc_start + span_len)`` of
    ``doc_id`` at positions ``[seq_start, seq_start + span_len)``.
    Deterministic at any parallelism (depends only on the total order of
    ids). Zero-token docs emit no rows.

    Scale shape (100 TB): the global exclusive cumsum over doc order is
    the same two-pass range pattern as the index builder's docid
    assignment (``build.assign_docids``): ONE repartitionByRange exchange,
    a collect of n_parts partition subtotals (bytes: n_parts * 16), then a
    partition-local window — never a single-partition global window. The
    span explode fans out ceil(n_tokens / max_len) + 1 rows per doc,
    linear in corpus tokens / max_len.
    """
    from search_engine_spark.build import _offset_lookup

    n_expr = (
        F.col(count_col).cast("long")
        if count_col
        else F.size(tokens_col(text_col)).cast("long")
    )
    counts = df.select(F.col(id_col).alias("doc_id"), n_expr.alias("n"))
    d = counts.repartitionByRange(n_parts, F.col("doc_id")).sortWithinPartitions(
        "doc_id"
    )
    d = d.withColumn("_pid", F.spark_partition_id())
    d.persist()
    try:
        sums = {
            r["_pid"]: r["s"]
            for r in d.groupBy("_pid").agg(F.sum("n").alias("s")).collect()
        }
        offsets, acc = {}, 0
        for pid in sorted(sums):
            offsets[pid] = acc
            acc += int(sums[pid] or 0)
        from pyspark.sql import Window

        w = (
            Window.partitionBy("_pid")
            .orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        L = int(max_len)
        spans = (
            d.withColumn(
                "start", F.sum("n").over(w) - F.col("n") + _offset_lookup(offsets)
            )
            .filter(F.col("n") > 0)
            .withColumn("stop", F.col("start") + F.col("n"))
            .withColumn(
                # integer `div`, not float `/`+cast: float truncation
                # diverges from floor once the global token cumsum nears
                # 2^53 (~9e15 tokens); `div` keeps the plan exact at any
                # scale and matches the oracle's integer `//`
                "seq_id",
                F.explode(
                    F.sequence(
                        F.expr(f"start div {L}"),
                        F.expr(f"(stop - 1) div {L}"),
                    )
                ),
            )
            .select(
                F.col("seq_id").cast("long"),
                "doc_id",
                (F.greatest(F.col("start"), F.col("seq_id") * L) - F.col("start"))
                .cast("long")
                .alias("doc_start"),
                (F.greatest(F.col("start"), F.col("seq_id") * L) - F.col("seq_id") * L)
                .cast("long")
                .alias("seq_start"),
                (
                    F.least(F.col("stop"), (F.col("seq_id") + 1) * L)
                    - F.greatest(F.col("start"), F.col("seq_id") * L)
                )
                .cast("long")
                .alias("span_len"),
            )
        )
        # materialization note: the persist must outlive the returned
        # plan's first action; localCheckpoint the exploded spans (small:
        # one row per span, no text) so the handle can be released now.
        out = spans.localCheckpoint(eager=True)
    finally:
        d.unpersist()
    return out


def mixture_weights(
    df: DataFrame,
    target: dict[str, float],
    stratum_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Training-mix reweighting: per-stratum token counts and the sampling
    weight that turns the corpus's observed token distribution into the
    ``target`` distribution (the domain/language mixture step of every
    pretraining recipe — e.g. upsample code, downsample low-quality web).

    ``target`` maps stratum value -> desired share; shares are normalized
    to sum 1. ``weight = target_share / corpus_share``: feed it to
    ``stratified_sample`` (weights <= 1) or a sampling-with-replacement
    epoch planner (weights > 1 mean the stratum repeats). Strata present
    in the corpus but absent from ``target`` get weight 0.0 (excluded);
    target strata absent from the corpus are dropped (nothing to sample).

    -> (stratum, n_docs, n_tokens, corpus_share, target_share, weight),
    floats are single-division float64 on exact integer sums — identical
    doubles in Spark and the SQL oracle, no rounding step.

    Scale shape (100 TB): ONE map-side-combined groupBy on the stratum key
    (cardinality ~10^1-10^3); the token count is a per-row projection.
    """
    z = float(sum(target.values()))
    norm = {k: v / z for k, v in target.items()}
    per = df.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(tokens_col(text_col)).cast("long")).alias("n_tokens"),
    )
    total = per.agg(F.sum("n_tokens")).head()[0] or 0
    tmap = F.create_map(
        *[x for k, v in sorted(norm.items()) for x in (F.lit(k), F.lit(v))]
    )
    share = F.col("n_tokens") / F.lit(float(total))
    tshare = F.coalesce(tmap.getItem(F.col("stratum")), F.lit(0.0))
    return per.select(
        "stratum",
        "n_docs",
        "n_tokens",
        share.alias("corpus_share"),
        tshare.alias("target_share"),
        (tshare / share).alias("weight"),
    )


def host_stats(
    df: DataFrame,
    host_col: str = "url_host",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-site corpus statistics — the host-level aggregation every
    Common-Crawl curation pipeline runs before site-level policy (block-
    list a spam domain, downweight a boilerplate farm, cap per-site doc
    share): document and token counts plus the within-host exact-duplicate
    fraction (a site whose pages hash to few distinct texts is template
    noise).

    ``host_col`` is any site key — ``canonicalize_urls``'s ``url_host``
    on a real crawl, or a source/domain tag column. Floats are single
    float64 divisions of exact integer aggregates (hash-identical in the
    SQL oracle, no rounding step).

    -> (host, n_docs, n_tokens, avg_doc_tokens, n_unique_texts, dup_frac)
    with dup_frac = (n_docs - n_unique_texts) / n_docs.

    Scale shape (100 TB): ONE groupBy on the host key. count/sum combine
    map-side; count_distinct(md5) is Spark's two-phase distinct aggregate
    (partial distinct per partition, then merge) — per-host state is the
    host's distinct hash set, bounded by its page count, never the corpus.
    Host keys are Zipfian but the per-row payload is a 32-byte hash, so
    even a 10^8-page host is ~3 GB in one reducer — cap with a pre-filter
    or salt+re-merge if a crawl ever concentrates worse than that.
    """
    n_docs = F.count("*").alias("n_docs")
    n_tokens = F.sum(F.size(tokens_col(text_col)).cast("long")).alias("n_tokens")
    n_unique = F.count_distinct(F.md5(F.col(text_col))).alias("n_unique_texts")
    return (
        df.groupBy(F.col(host_col).alias("host"))
        .agg(n_docs, n_tokens, n_unique)
        .select(
            "host",
            "n_docs",
            "n_tokens",
            (F.col("n_tokens") / F.col("n_docs")).alias("avg_doc_tokens"),
            "n_unique_texts",
            ((F.col("n_docs") - F.col("n_unique_texts")) / F.col("n_docs"))
            .alias("dup_frac"),
        )
    )


def pmi_bigrams(
    df: DataFrame,
    min_count: int = 5,
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-level collocation mining: top-``k`` adjacent word pairs by
    pointwise mutual information (Church & Hanks 1990) with a
    ``min_count`` support floor (PMI of rare pairs is noise — the
    standard guard).

    pmi(w1, w2) = ln( (c12 / B) / ((c1 / T) * (c2 / T)) ) where c12 is
    the adjacent-pair count, B the total number of bigram tokens, c1/c2
    unigram counts and T total tokens — all corpus-level, self-trained,
    fully deterministic. Used by training-data pipelines to freeze a
    multi-word-expression vocabulary (e.g. for tokenizer merges or
    phrase-aware dedup shingles).

    Scale shape (100 TB): bigram pairing is IN-ROW (same array
    ``transform`` as :func:`bigram_logloss` — zero exchanges to form
    pairs), then TWO map-side-combined aggregations (pair counts, term
    counts) whose outputs are vocabulary-sized, joined on their own keys
    under AQE (never force-broadcast: a web corpus holds ~10^10 distinct
    bigrams). The two 1-row totals ride broadcast cross joins, and the
    final top-k is a ``TakeOrdered`` (per-partition heads + driver merge
    of k rows), never a global sort.

    -> (w1, w2, n_pair, pmi) — pmi rounded to 6dp, ordered by
    (pmi DESC, w1, w2), exactly ``k`` rows (fewer if the corpus has
    fewer qualifying pairs).
    """
    t = df.select(F.col(id_col).alias("doc_id"), tokens_col(text_col).alias("t"))
    bg = (
        t.filter(F.size("t") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 1),"
                    " i -> struct(t[i-1] AS w1, t[i] AS w2))"
                )
            ).alias("b")
        )
        .select("b.w1", "b.w2")
    )
    pair = bg.groupBy("w1", "w2").agg(F.count("*").alias("n_pair"))
    btot = pair.agg(F.sum("n_pair").cast("double").alias("B"))
    toks = df.select(F.explode(tokens_col(text_col)).alias("term"))
    uni = toks.groupBy("term").agg(F.count("*").cast("double").alias("cf"))
    ttot = uni.agg(F.sum("cf").alias("T"))
    scored = (
        pair.filter(F.col("n_pair") >= int(min_count))
        .join(uni.select(F.col("term").alias("w1"), F.col("cf").alias("c1")), "w1")
        .join(uni.select(F.col("term").alias("w2"), F.col("cf").alias("c2")), "w2")
        .crossJoin(F.broadcast(btot))
        .crossJoin(F.broadcast(ttot))
        .select(
            "w1",
            "w2",
            "n_pair",
            F.round(
                F.log(
                    (F.col("n_pair") / F.col("B"))
                    / ((F.col("c1") / F.col("T")) * (F.col("c2") / F.col("T")))
                ),
                ROUND,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.desc("pmi"), "w1", "w2").limit(int(k))


def perplexity_buckets(
    df: DataFrame,
    n_buckets: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2019 §4.3): score
    every document with the self-trained unigram LM
    (:func:`unigram_logloss`), cut the scored corpus into ``n_buckets``
    equal-population quality tiers at the (i/n)-quantile cross-entropy
    cutoffs, and label each doc with its tier (0 = lowest cross-entropy
    = most "fluent" under the model). CCNet keeps head/middle tiers for
    LM training and drops the tail; the bucket column is that decision
    as data.

    Two-phase, scale-honest design: phase 1 computes the cutoff VALUES
    (one exact-percentile aggregation over the rounded per-doc scores —
    at 10^12 docs swap ``percentile`` for ``approx_percentile`` or a
    fixed held-out sample, exactly as CCNet trains its cutoffs on a
    sample; the bucketing phase is unchanged), phase 2 is a stateless
    per-row comparison against the broadcast 1-row cutoff array — NO
    global sort, NO ntile window (an ntile over 10^12 rows would be a
    single-partition sort; thresholds-then-compare is linear).

    Cutoffs and scores are compared at 6dp on both engines so the
    bucket boundary is reproducible bit-for-bit. Docs with no tokens
    (NULL cross-entropy) get a NULL bucket.

    -> (doc_id, cross_entropy, bucket), ordered by doc_id.
    """
    scored = unigram_logloss(df, id_col=id_col, text_col=text_col).select(
        "doc_id", "cross_entropy"
    )
    ps = [i / n_buckets for i in range(1, n_buckets)]
    cuts = scored.filter(F.col("cross_entropy").isNotNull()).agg(
        F.percentile("cross_entropy", F.array(*[F.lit(p) for p in ps])).alias("cuts")
    )
    bucket = F.when(
        F.col("cross_entropy").isNotNull(),
        F.aggregate(
            F.col("cuts"),
            F.lit(0),
            lambda acc, c: acc
            + F.when(F.col("cross_entropy") > F.round(c, ROUND), 1).otherwise(0),
        ),
    )
    return (
        scored.crossJoin(F.broadcast(cuts))
        .select("doc_id", "cross_entropy", bucket.alias("bucket"))
        .orderBy("doc_id")
    )


def ngram_counts(
    df: DataFrame,
    n: int = 3,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-wide word n-gram counts — the raw material a KenLM-style
    LM trainer (the scorer CCNet uses) consumes, and the shared
    statistic behind decontamination / dup-n-gram analysis. Grams use
    the engine-wide shingle convention (:func:`~search_engine_spark.
    pipelines.dedup.shingle_expr`: full windows for len >= n, one
    partial shingle for shorter docs).

    Scale shape (100 TB): in-row shingling (zero exchanges to form
    grams) then ONE map-side-combined count keyed by gram; the
    ``min_count`` floor is applied post-aggregation (HAVING), which at
    web scale drops the singleton long tail — typically >70% of
    distinct grams — before anything is written. Output is
    vocabulary-sized, unordered (order/limit at the consumer).

    -> (gram, n_occurrences).
    """
    g = _grams(df, n, id_col, text_col, distinct=False).select(
        F.explode("terms").alias("gram")
    )
    return (
        g.groupBy("gram")
        .agg(F.count("*").alias("n_occurrences"))
        .filter(F.col("n_occurrences") >= int(min_count))
    )
