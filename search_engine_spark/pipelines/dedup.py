"""Deduplication operators (exact, Jaccard, MinHash+LSH, SimHash).

Scale notes (the 100 TB story):

* every operator is expressed as DataFrame joins/groupBys — shuffles happen
  on (term) or (band, bucket) keys whose cardinality grows with the corpus,
  so the work spreads across executors; there is no driver-side loop.
* ``jaccard_pairs`` is the small-scale exact method: its term self-join is
  quadratic in per-term document frequency, so at web scale you ALWAYS run
  ``minhash_lsh_pairs`` (cost ~ n_docs * n_hashes + bucket-local pairs)
  and use Jaccard only to verify the LSH candidates (which this module does).
* all hashing is ``md5`` (JVM-side ``F.md5``), so results are deterministic,
  cluster-size independent, and reproducible in DuckDB/Python oracles.

Reference parity: the reference engine deduplicates only by external
document id (last-write-wins, ``/root/reference/src/update/index_documents/
transform.rs:150-360``); content-level dedup is an extension mandated by the
training-data-pipeline brief.
"""

from __future__ import annotations

import logging

from pyspark.sql import Column, DataFrame, functions as F

logger = logging.getLogger(__name__)

# Default per-(band, bucket) occupancy cap for the LSH candidate self-joins.
# A web corpus contains exact-duplicate/boilerplate clusters of 10^5+ docs;
# one such cluster lands in ONE bucket and fans out occupancy^2 candidate
# pairs (10^10 at 10^5 docs) — the classic LSH skew bomb. 4096 keeps a
# pathological bucket at <= ~8.4M pairs per band while never touching honest
# buckets. The CONTRACT for near-dup pipelines remains: run exact_dedup
# first, so byte-identical clusters collapse before LSH sees them.
DEFAULT_BUCKET_CAP = 4096


def cap_bucket_occupancy(
    bk: DataFrame,
    bucket_keys: tuple[str, ...],
    cap: int | None,
    id_col: str = "doc_id",
    audit: bool = False,
) -> DataFrame:
    """Keep at most ``cap`` rows per LSH bucket (deterministic: the ``cap``
    smallest ids survive). Docs beyond the cap lose candidate pairs from
    that bucket — acceptable for dedup because a bucket that large is a
    near-identical cluster whose surviving members still chain through
    ``cluster_pairs``; NOT silent: pass ``audit=True`` to count and log the
    rows truncated per call (one extra pass over the bucketed rows — run it
    on samples/periodically at 100 TB, not in the steady-state job).
    ``cap=None`` disables.
    """
    if cap is None:
        return bk
    from pyspark.sql import Window

    w = Window.partitionBy(*bucket_keys).orderBy(id_col)
    ranked = bk.withColumn("_rn", F.row_number().over(w))
    if audit:
        dropped = ranked.filter(F.col("_rn") > cap).count()
        if dropped:
            logger.warning(
                "LSH bucket cap %d truncated %d bucket-membership rows "
                "(oversized near-duplicate clusters; run exact_dedup first "
                "or raise the cap)", cap, dropped,
            )
        else:
            logger.info("LSH bucket cap %d: no bucket exceeded the cap", cap)
    return ranked.filter(F.col("_rn") <= cap).drop("_rn")


# JVM-side tokenizer for pure-ASCII corpora: identical to the frozen Python
# tokenizer (analysis.tokenize) on [a-z0-9 ]-only text, and identical to
# DuckDB's regexp_extract_all(text, '[a-z0-9]+') — the oracle bridge.
TOKEN_PATTERN = "[a-z0-9]+"


def tokens_col(text_col: str = "text") -> Column:
    return F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_PATTERN), 0)


def doc_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    distinct: bool = True,
    shingle_size: int = 1,
) -> DataFrame:
    """(doc, term) feature pairs; ``distinct=True`` gives the feature *set*.

    ``shingle_size > 1`` switches from unigram tokens to word n-gram
    shingles — the feature space becomes |V|^n, so near-identical word
    *sequences*, not just shared vocabulary, drive MinHash signatures.

    Shingles are assembled with posexplode + window ``lead`` rather than
    array higher-order functions: Catalyst's CollapseProject would inline
    the ``regexp_extract_all`` token array into every element access of a
    ``transform`` lambda (O(len^2) regex work per doc); the explode
    evaluates it exactly once per document. Short docs (< n tokens) keep
    one partial shingle (their full token sequence), matching the oracle's
    ``greatest(len - n + 1, 1)`` window count.
    """
    if shingle_size == 1:
        out = df.select(
            F.col(id_col).alias("doc_id"), F.explode(tokens_col(text_col)).alias("term")
        )
        return out.distinct() if distinct else out
    from pyspark.sql import Window

    tok = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens_col(text_col)).alias("pos", "term"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    parts = [F.col("term")] + [F.lead("term", j).over(w) for j in range(1, shingle_size)]
    out = (
        tok.select(
            "doc_id",
            "pos",
            F.concat_ws(" ", *parts).alias("term"),
            F.lead("term", shingle_size - 1).over(w).alias("_tail"),
        )
        .filter(F.col("_tail").isNotNull() | (F.col("pos") == 0))
        .select("doc_id", "term")
    )
    return out.distinct() if distinct else out


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact-duplicate groups by content hash.

    -> (doc_id, dup_count): one row per distinct content, doc_id = smallest
    member id (the canonical survivor), dup_count = group size. A single
    hash-shuffle with map-side combine; at 100 TB this is the cheapest and
    first dedup pass.
    """
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("_h"))
        .agg(F.min(id_col).alias("doc_id"), F.count("*").alias("dup_count"))
        .select("doc_id", "dup_count")
    )


def jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int | None = None,
    shingle_size: int = 1,
) -> DataFrame:
    """Token-set Jaccard similarity pairs via inverted-index self-join.

    -> (a, b, jaccard) with a < b and jaccard >= threshold (rounded 6dp).

    ``max_df`` drops terms appearing in more than that many docs before the
    self-join (the classic positional-filter guard against head-term pair
    blowup); when set, the score is Jaccard over the *pruned* token sets —
    callers wanting exact scores at scale should verify candidates with
    ``_verified_jaccard`` over unpruned sets instead.
    """
    t = doc_terms(df, id_col, text_col, shingle_size=shingle_size)
    if max_df is not None:
        light = t.groupBy("term").count().filter(F.col("count") <= max_df).select("term")
        t = t.join(light, "term")
    sizes = t.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = t.alias("a")
    b = t.alias("b")
    inter = (
        a.join(b, (F.col("a.term") == F.col("b.term")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("a"), F.col("b.doc_id").alias("b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("a"), F.col("sz").alias("sza"))
    sb = sizes.select(F.col("doc_id").alias("b"), F.col("sz").alias("szb"))
    return (
        inter.join(sa, "a")
        .join(sb, "b")
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def doc_term_array(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    distinct: bool = True,
    shingle_size: int = 1,
) -> DataFrame:
    """-> (doc_id, terms: array<string>): per-doc feature array, ONE row per
    doc, zero exchanges. Same features as ``doc_terms`` (which explodes to
    long rows); docs with no tokens keep an empty array.

    The token array is materialized behind a Generate barrier
    (``explode(array(tokens))``) so the shingle ``transform`` lambda
    references a concrete attribute — referencing ``regexp_extract_all``
    directly from inside the lambda would let CollapseProject inline the
    regex into every element access (O(len^2) regex work per doc; the
    pitfall that originally forced doc_terms onto posexplode + window).
    The FINAL terms array gets the same barrier: consumers like
    ``_minhash_wide`` reference it 16 times (one transform per seed), and
    without a barrier CollapseProject would rebuild the shingle array /
    re-run array_distinct once per reference (measured 1.7x wall on the
    sf0.1 minhash bench).
    """
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array(tokens_col(text_col))).alias("toks"),
    )
    if shingle_size == 1:
        if not distinct:
            return base.select("doc_id", F.col("toks").alias("terms"))
        terms = F.col("toks")
    else:
        terms = shingle_expr(F.col("toks"), shingle_size)
    if distinct:
        terms = F.array_distinct(terms)
    return base.select("doc_id", F.explode(F.array(terms)).alias("terms"))


def shingle_expr(toks: Column, n: int) -> Column:
    """Word n-gram array from a token-array COLUMN (must be a concrete
    attribute, not an inlineable expression — see doc_term_array's barrier
    note). greatest(len - n, 0) + 1 windows: full shingles for len >= n,
    ONE partial shingle (the whole doc) for 0 < len < n — matching
    doc_terms' posexplode formulation; slice truncates at the end."""
    shingles = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    return F.when(
        F.size(toks) == 0, F.array().cast("array<string>")
    ).otherwise(shingles)


def _minhash_wide(
    df: DataFrame,
    n_hashes: int,
    id_col: str,
    text_col: str,
    shingle_size: int,
) -> DataFrame:
    """-> (doc_id, _h0.._hN): per-doc MinHash row, ONE tiny exchange.

    hash_i(term) = md5(i || ':' || term) compared lexicographically — the
    string min is a valid uniform MinHash and is bit-identical across Spark,
    DuckDB and Python. No UDF. Terms are built per-row as an array (see
    doc_term_array: no window/distinct shuffles), then exploded so the 16
    min-md5 aggregates run inside whole-stage-codegen'd hash aggregation —
    measured ~3x faster than evaluating md5 through interpreted
    array higher-order-function lambdas. The ``groupBy(doc_id)`` combines
    map-side (every doc's terms sit in one task), so the exchange moves
    exactly one 16-column row per doc — AND that exchange is the subtree
    the LSH self-join's two sides share, so Spark's exchange reuse computes
    signatures once, not once per join side. Docs with no tokens have no
    rows to group — they simply have no signature, as before.
    """
    t = doc_term_array(
        df, id_col, text_col, distinct=True, shingle_size=shingle_size
    ).select("doc_id", F.explode("terms").alias("term"))
    return t.groupBy("doc_id").agg(
        *[
            F.min(
                F.md5(F.concat_ws(":", F.lit(str(i)), F.col("term")))
            ).alias(f"_h{i}")
            for i in range(n_hashes)
        ]
    )


def minhash_signatures(
    df: DataFrame,
    n_hashes: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_size: int = 1,
) -> DataFrame:
    """-> (doc_id, seed, sig): per-seed MinHash over the token set.

    Computed from the per-doc wide row (see _minhash_wide: one
    map-side-combined exchange of n_docs rows); the long
    (doc_id, seed, sig) output shape is restored by an inline array
    explode, which is per-doc and free. (The earlier
    crossJoin-with-seeds formulation fanned the (doc, term) rows 16x
    through an exchange before aggregating.)
    """
    wide = _minhash_wide(df, n_hashes, id_col, text_col, shingle_size)
    z = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("seed"), F.col(f"_h{i}").alias("sig")
                )
                for i in range(n_hashes)
            ]
        )
    ).alias("z")
    return wide.select("doc_id", z).select(
        "doc_id", F.col("z.seed").alias("seed"), F.col("z.sig").alias("sig")
    )


def minhash_band_buckets(
    sigs: DataFrame, bands: int = 4, rows_per_band: int = 4
) -> DataFrame:
    """-> (doc_id, band, bucket): LSH band key = md5 of the band's ordered sigs."""
    return (
        sigs.withColumn("band", (F.col("seed") / rows_per_band).cast("int"))
        .groupBy("doc_id", "band")
        .agg(
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("seed", "sig"))),
                        lambda x: x["sig"],
                    ),
                    "|",
                )
            ).alias("bucket")
        )
    )


def _wide_band_buckets(
    wide: DataFrame, bands: int, rows_per_band: int
) -> DataFrame:
    """(doc_id, band, bucket) from a ``_minhash_wide`` row: md5 over each
    band's seed-ordered sigs, as a pure per-row projection."""
    return wide.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat_ws(
                                "|",
                                *[
                                    F.col(f"_h{b * rows_per_band + r}")
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("z"),
    ).select(
        "doc_id", F.col("z.band").alias("band"), F.col("z.bucket").alias("bucket")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    n_hashes: int = 16,
    bands: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_size: int = 1,
    bucket_cap: int | None = DEFAULT_BUCKET_CAP,
    audit_cap: bool = False,
) -> DataFrame:
    """MinHash-LSH near-duplicate pairs, Jaccard-verified.

    -> (a, b, jaccard): pairs sharing >= 1 LSH band bucket whose true token-set
    Jaccard >= threshold. The band join shuffles on (band, bucket) — bucket
    count grows with the corpus, so the join is balanced at any scale; the
    exact-Jaccard verification runs only on the candidate pairs.

    ``bucket_cap`` bounds per-(band, bucket) occupancy before the self-join
    (see ``cap_bucket_occupancy``) — the guard against the occupancy^2 pair
    fan-out of giant boilerplate clusters. Contract: run ``exact_dedup``
    first so byte-identical clusters never reach LSH.
    """
    rows_per_band = n_hashes // bands
    # band buckets straight off the per-doc wide row (pure projection —
    # md5 over the band's seed-ordered sigs, identical to
    # minhash_band_buckets' sort+join on the long shape). Both sides of
    # the self-join below share the wide row's groupBy exchange
    # (ReusedExchange), so tokenization + signature hashing run ONCE.
    wide = _minhash_wide(df, n_hashes, id_col, text_col, shingle_size)
    bk = _wide_band_buckets(wide, bands, rows_per_band)
    bk = cap_bucket_occupancy(bk, ("band", "bucket"), bucket_cap, audit=audit_cap)
    a = bk.alias("a")
    b = bk.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("a"), F.col("b.doc_id").alias("b"))
        .distinct()
    )
    return _verified_jaccard(df, cand, threshold, id_col, text_col, shingle_size)


def _verified_jaccard(
    df: DataFrame, cand: DataFrame, threshold: float, id_col: str, text_col: str,
    shingle_size: int = 1,
) -> DataFrame:
    """Exact feature-set Jaccard for candidate (a, b) pairs only.

    The INPUT rows are restricted to docs appearing in >= 1 candidate pair
    (semi-join against the exploded pair ids) BEFORE tokenization, so at
    web scale verification cost — scan bytes, regex, shingling, the
    intersection join — tracks the candidate set, not the corpus. The
    repartition pins one exchange over that reduced set so both sides of
    the intersection join share a single tokenization via exchange reuse.
    Set sizes ride the exploded rows (F.size per row, no groupBy and no
    extra join pair).
    """
    ids = cand.select(F.explode(F.array("a", "b")).alias(id_col)).distinct()
    sub = df.join(ids, id_col, "left_semi")
    arr = (
        doc_term_array(sub, id_col, text_col, distinct=True,
                       shingle_size=shingle_size)
        .repartition("doc_id")
    )
    t = arr.select(
        "doc_id", F.size("terms").alias("sz"), F.explode("terms").alias("term")
    )
    ta = t.select(F.col("doc_id").alias("a"), F.col("sz").alias("sza"), "term")
    tb = t.select(F.col("doc_id").alias("b"), F.col("sz").alias("szb"), "term")
    inter = (
        cand.join(ta, "a")
        .join(tb, ["b", "term"])
        .groupBy("a", "b")
        .agg(
            F.count("*").alias("inter"),
            F.first("sza").alias("sza"),
            F.first("szb").alias("szb"),
        )
    )
    return (
        inter.withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def minhash_novel(
    new_df: DataFrame,
    ref_df: DataFrame,
    threshold: float = 0.5,
    n_hashes: int = 16,
    bands: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_size: int = 1,
    bucket_cap: int | None = DEFAULT_BUCKET_CAP,
    audit_cap: bool = False,
) -> DataFrame:
    """Cross-corpus MinHash-LSH: flag NEW docs that near-duplicate a
    frozen REFERENCE corpus — the continual-pretraining / crawl-refresh
    shape ("which of this month's pages are already in the training
    set?"), where deduping new-vs-new is a separate (cheaper) pass.

    -> (a, b, jaccard): a = new-side id, b = reference-side id, one row
    per verified pair with token-set Jaccard >= threshold. Keep the
    novel corpus with an anti-join of ``new_df`` against ``a``.

    Plan shape vs ``minhash_lsh_pairs``: NOT a self-join — each side
    computes its own wide signature row (one map-side-combined exchange
    per corpus), the band join is new x ref on (band, bucket) with no
    ordering predicate (the id spaces are disjoint by contract), and
    verification tokenizes only docs appearing in candidate pairs, per
    side. The reference side's signatures are recomputed here; at scale
    persist them once (``_minhash_wide`` output is one row per doc) and
    pass the stored frame — the band projection is a free per-row map.
    Occupancy caps apply per side, so a boilerplate bucket with B new
    and R ref members fans out min(B, cap) * min(R, cap), not B * R.
    """
    rows_per_band = n_hashes // bands
    nb = cap_bucket_occupancy(
        _wide_band_buckets(
            _minhash_wide(new_df, n_hashes, id_col, text_col, shingle_size),
            bands, rows_per_band,
        ),
        ("band", "bucket"), bucket_cap, audit=audit_cap,
    )
    rb = cap_bucket_occupancy(
        _wide_band_buckets(
            _minhash_wide(ref_df, n_hashes, id_col, text_col, shingle_size),
            bands, rows_per_band,
        ),
        ("band", "bucket"), bucket_cap, audit=audit_cap,
    )
    cand = (
        nb.alias("a")
        .join(
            rb.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket")),
        )
        .select(F.col("a.doc_id").alias("a"), F.col("b.doc_id").alias("b"))
        .distinct()
    )
    return _verified_jaccard_cross(
        new_df, ref_df, cand, threshold, id_col, text_col, shingle_size
    )


def _verified_jaccard_cross(
    new_df: DataFrame,
    ref_df: DataFrame,
    cand: DataFrame,
    threshold: float,
    id_col: str,
    text_col: str,
    shingle_size: int = 1,
) -> DataFrame:
    """``_verified_jaccard`` for pairs spanning two corpora: the a-side
    tokenizes only ``new_df`` docs in a candidate pair, the b-side only
    ``ref_df`` docs — cost tracks the candidate set on both sides."""
    sub_a = new_df.join(
        cand.select(F.col("a").alias(id_col)).distinct(), id_col, "left_semi"
    )
    sub_b = ref_df.join(
        cand.select(F.col("b").alias(id_col)).distinct(), id_col, "left_semi"
    )

    def toks(sub):
        arr = doc_term_array(
            sub, id_col, text_col, distinct=True, shingle_size=shingle_size
        ).repartition("doc_id")
        return arr.select(
            "doc_id", F.size("terms").alias("sz"), F.explode("terms").alias("term")
        )

    ta = toks(sub_a).select(
        F.col("doc_id").alias("a"), F.col("sz").alias("sza"), "term"
    )
    tb = toks(sub_b).select(
        F.col("doc_id").alias("b"), F.col("sz").alias("szb"), "term"
    )
    inter = (
        cand.join(ta, "a")
        .join(tb, ["b", "term"])
        .groupBy("a", "b")
        .agg(
            F.count("*").alias("inter"),
            F.first("sza").alias("sza"),
            F.first("szb").alias("szb"),
        )
    )
    return (
        inter.withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 60  # 15 hex chars of md5 -> fits signed int64 in Spark & DuckDB


def _term_hash60(term: Column) -> Column:
    """First 60 bits of md5(term) as a non-negative bigint (JVM-side)."""
    return F.conv(F.substring(F.md5(term), 1, 15), 16, 10).cast("long")


def simhash(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """-> (doc_id, simhash): 60-bit tf-weighted SimHash fingerprint.

    bit_j = 1 iff sum over terms of tf * (2*bit_j(md5(term)) - 1) > 0.

    Shape: explode the 60 bit positions into ROWS and fold them with two
    narrow single-column aggregations — groupBy(doc_id, j).sum(contrib),
    then groupBy(doc_id) packing the sign bits. The bit fan-out is map-side
    (the partial hash-agg combines each task down to its local
    (doc, j) groups before any exchange), so the extra aggregation adds NO
    extra full-data shuffle; the (doc_id, j) exchange carries n_docs*60
    3-column rows ≈ the same bytes as one n_docs-row 61-column wide-agg
    exchange.

    Measured (sf0.1, local[32], warm, same session, 2026-08-18): this shape
    0.68-0.73s; the 60-conditional-sum wide agg 1.7-2.0s (the 60 aggregate
    expressions are evaluated per (doc, term) row — ~60M expression evals
    dominate); a 21-bit-packed 20-sum variant 2.0-2.9s. Narrow hash-agg
    probes beat per-row expression width, and the bytes shuffled are
    equivalent, so the exploded shape wins at bench scale and holds the
    same scale story at 100 TB.
    """
    tf = (
        df.select(F.col(id_col).alias("doc_id"), F.explode(tokens_col(text_col)).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        .withColumn("h", _term_hash60(F.col("term")))
    )
    bits = tf.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1))).alias("j"),
        "tf",
        "h",
    ).withColumn(
        # shiftright/shiftleft with a Column shift amount needs expr()
        "contrib",
        F.col("tf") * (F.expr("shiftright(h, j) & 1") * 2 - 1),
    )
    return (
        bits.groupBy("doc_id", "j")
        .agg(F.sum("contrib").alias("s"))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.when(F.col("s") > 0, F.expr("shiftleft(cast(1 as bigint), j)")).otherwise(
                    F.lit(0).cast("long")
                )
            ).alias("simhash")
        )
    )


def simhash_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_bands: int = 4,
    bucket_cap: int | None = DEFAULT_BUCKET_CAP,
    audit_cap: bool = False,
) -> DataFrame:
    """SimHash near-duplicate pairs via banded Hamming join.

    Pigeonhole: hamming <= n_bands-1 guarantees >= 1 identical 15-bit band,
    so the candidate join is on (band_index, band_value) — linear shuffle —
    and exact ``bit_count(xor)`` verifies. -> (a, b, hamming), a < b.

    ``bucket_cap`` bounds per-(band, seg) occupancy before the self-join
    (see ``cap_bucket_occupancy``); run ``exact_dedup`` first.
    """
    band_bits = SIMHASH_BITS // n_bands
    sh = simhash(df, id_col, text_col)
    banded = sh.select(
        "doc_id",
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(n_bands - 1))).alias("band"),
    ).withColumn(
        "seg",
        F.expr(f"shiftright(simhash, band * {band_bits}) & {(1 << band_bits) - 1}"),
    )
    banded = cap_bucket_occupancy(banded, ("band", "seg"), bucket_cap, audit=audit_cap)
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.seg") == F.col("b.seg"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("a"),
            F.col("b.doc_id").alias("b"),
            F.col("a.simhash").alias("ha"),
            F.col("b.simhash").alias("hb"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )


def cluster_pairs(
    nodes: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 50,
) -> DataFrame:
    """Connected components over a near-duplicate pair graph: every doc is
    assigned ``cluster_id`` = the smallest doc id reachable through the
    pairs (singletons map to themselves). This is the step real dedup
    pipelines run between "emit candidate pairs" and "keep one per group" —
    pairs alone under-delete whenever duplicates chain (a~b, b~c but a!~c).

    Min-label propagation (the Hash-Min CC algorithm): each round every
    node takes the min of its own label and its neighbors'; converges in
    O(component diameter) rounds — near-dup components are clique-ish, so
    2-4 rounds in practice. Each round is one hash join + one groupBy on
    node id (two bounded shuffles), with ``localCheckpoint`` cutting the
    iterative lineage; at cluster scale swap for ``checkpoint()`` to
    reliable storage. Raises after ``max_iter`` rounds instead of
    returning a half-propagated labeling.

    ``pairs`` must carry columns (a, b); ``nodes`` supplies the id
    universe — pair endpoints outside it are dropped (semi-join) so the
    output contains exactly one row per node.
    -> (id_col, cluster_id), deterministic at any parallelism.
    """
    labels = (
        nodes.select(F.col(id_col).cast("long").alias("node"))
        .distinct()
        .withColumn("lbl", F.col("node"))
    )
    node_ids = labels.select("node")
    a, b = F.col("a").cast("long"), F.col("b").cast("long")
    edges = (
        pairs.select(a.alias("src"), b.alias("dst"))
        .union(pairs.select(b.alias("src"), a.alias("dst")))
        .distinct()
        # enforce the documented contract: nodes IS the id universe
        .join(node_ids.withColumnRenamed("node", "src"), "src", "left_semi")
        .join(node_ids.withColumnRenamed("node", "dst"), "dst", "left_semi")
        .localCheckpoint()
    )
    for _ in range(max_iter):
        nbr = edges.join(labels.withColumnRenamed("node", "src"), "src").select(
            F.col("dst").alias("node"), "lbl"
        )
        new = (
            labels.union(nbr)
            .groupBy("node")
            .agg(F.min("lbl").alias("lbl"))
            .localCheckpoint()  # eager: materialized before old blocks go
        )
        changed = (
            new.join(labels.withColumnRenamed("lbl", "old"), "node")
            .filter(F.col("lbl") != F.col("old"))
            .count()
        )
        # free the previous round's localCheckpoint blocks (no-op on the
        # round-0 input, which is not persisted) — without this, cached
        # blocks accumulate across rounds
        labels.unpersist()
        labels = new
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"cluster_pairs did not converge within {max_iter} rounds; "
            "the pair graph has a component with a longer diameter — "
            "raise max_iter"
        )
    edges.unpersist()
    return labels.select(
        F.col("node").alias(id_col), F.col("lbl").alias("cluster_id")
    )


def dedup_keep(
    nodes: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 50,
) -> DataFrame:
    """End-to-end dedup verdict: compose ``cluster_pairs`` with the
    keep-one-per-cluster rule every real pipeline ends on. The canonical
    survivor is the SMALLEST doc id in each connected component —
    deterministic, parallelism-independent, and the convention MinHash
    dedup pipelines use absent a quality signal (swap the rule by joining
    a quality column and re-ranking before the filter).

    -> (id_col, cluster_id, cluster_size, keep boolean): one row per node;
    ``keep`` is true for singletons and each cluster's min-id member, so
    ``filter(keep)`` IS the deduplicated corpus and
    ``filter(~keep)`` the removal manifest (the audit trail).

    Scale shape (100 TB): cluster_pairs' bounded label-propagation
    shuffles plus ONE groupBy(cluster_id) count on the (doc, label) rows
    — linear in docs; cluster sizes are the natural skew point but the
    count is a map-side-combining scalar agg, never a row explosion.
    """
    labels = cluster_pairs(nodes, pairs, id_col=id_col, max_iter=max_iter)
    sizes = labels.groupBy("cluster_id").agg(
        F.count("*").alias("cluster_size")
    )
    return labels.join(sizes, "cluster_id").select(
        F.col(id_col),
        "cluster_id",
        "cluster_size",
        (F.col(id_col) == F.col("cluster_id")).alias("keep"),
    )
