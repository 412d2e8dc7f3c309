"""Training-data pipeline operator tests (dedup / similarity / textstats /
multimodal) against small hand-built fixtures with known answers."""

import hashlib

import numpy as np
import pytest


@pytest.fixture(scope="module")
def docs_df(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog", "en"),
        (1, "the quick brown fox jumps over the lazy dog", "en"),  # exact dup of 0
        (2, "the quick brown fox jumps over a lazy dog", "en"),  # near dup of 0
        (3, "completely different text about spark query engines", "en"),
        (4, "spark query engines process completely different text", "de"),  # perm of 3
        (5, "numbers 123 456 789 only here", "fr"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_exact_dedup(spark, docs_df):
    from search_engine_spark.pipelines.dedup import exact_dedup

    got = {r["doc_id"]: r["dup_count"] for r in exact_dedup(docs_df).collect()}
    assert got[0] == 2  # doc 1 collapsed into 0
    assert 1 not in got
    assert got[2] == 1 and got[3] == 1


def test_jaccard_pairs(spark, docs_df):
    from search_engine_spark.pipelines.dedup import jaccard_pairs

    pairs = {(r["a"], r["b"]): r["jaccard"] for r in jaccard_pairs(docs_df, 0.5).collect()}
    assert pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs and pairs[(0, 2)] > 0.7
    # reordered doc with one word swapped: 6 shared / 8 union
    assert pairs[(3, 4)] == 0.75
    assert (0, 5) not in pairs


def test_minhash_lsh_finds_exact_and_near_dups(spark, docs_df):
    from search_engine_spark.pipelines.dedup import minhash_lsh_pairs

    pairs = {(r["a"], r["b"]) for r in minhash_lsh_pairs(docs_df, threshold=0.4).collect()}
    assert (0, 1) in pairs  # identical docs always share all bands
    got_shingled = {
        (r["a"], r["b"])
        for r in minhash_lsh_pairs(docs_df, threshold=0.3, shingle_size=3).collect()
    }
    assert (0, 1) in got_shingled
    # shingles separate the permuted pair (3,4): word order differs
    from search_engine_spark.pipelines.dedup import jaccard_pairs

    jp = {
        (r["a"], r["b"]): r["jaccard"]
        for r in jaccard_pairs(docs_df, 0.0, shingle_size=3).collect()
    }
    assert jp.get((3, 4), 0.0) < 0.4


def test_simhash_identical_docs_equal_hash(spark, docs_df):
    from search_engine_spark.pipelines.dedup import simhash, simhash_pairs

    sh = {r["doc_id"]: r["simhash"] for r in simhash(docs_df).collect()}
    assert sh[0] == sh[1]
    assert all(0 <= v < (1 << 60) for v in sh.values())
    # near-dup hamming small; unrelated hamming large
    def ham(a, b):
        return bin(a ^ b).count("1")

    assert ham(sh[0], sh[2]) < ham(sh[0], sh[5])
    pairs = {(r["a"], r["b"]): r["hamming"] for r in simhash_pairs(docs_df, 3).collect()}
    assert pairs[(0, 1)] == 0


def test_cosine_topk_matches_numpy(spark):
    from search_engine_spark.pipelines.similarity import cosine_topk

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(50, 16)).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(50)],
        "vec_id long, embedding array<float>",
    )
    q = vecs[0].astype(np.float64)
    sims = (vecs.astype(np.float64) @ q) / (
        np.linalg.norm(vecs.astype(np.float64), axis=1) * np.linalg.norm(q)
    )
    sims[0] = -np.inf  # excluded
    expect = np.argsort(-sims, kind="stable")[:5]
    got = cosine_topk(emb, [float(x) for x in q], k=5, exclude_ids=[0]).collect()
    assert [r["vec_id"] for r in got] == [int(i) for i in expect]
    for r in got:
        assert abs(r["sim"] - sims[r["vec_id"]]) < 1e-5


def test_lsh_ann_recall(spark):
    from search_engine_spark.pipelines.similarity import cosine_topk, lsh_cosine_topk

    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(200, 16)).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(200)],
        "vec_id long, embedding array<float>",
    )
    q = [float(x) for x in vecs[3]]
    exact = {r["vec_id"] for r in cosine_topk(emb, q, k=10).collect()}
    approx = {r["vec_id"] for r in lsh_cosine_topk(emb, q, k=10, n_planes=8,
                                                   multiprobe_hamming=2).collect()}
    # candidates are bucket-pruned; require non-trivial recall incl. self
    assert 3 in approx
    assert len(exact & approx) >= 3


def test_ivf_ann_recall_and_exhaustive_parity(spark):
    from search_engine_spark.pipelines.similarity import cosine_topk, ivf_cosine_topk

    rng = np.random.default_rng(31)
    vecs = rng.normal(size=(200, 16)).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(200)],
        "vec_id long, embedding array<float>",
    )
    q = [float(x) for x in vecs[5]]
    exact = [r["vec_id"] for r in cosine_topk(emb, q, k=10).collect()]
    probed = [r["vec_id"] for r in
              ivf_cosine_topk(emb, q, k=10, n_centroids=16, n_probe=4).collect()]
    # the query's own list is always probed -> self is found
    assert 5 in probed
    assert len(set(exact) & set(probed)) >= 3
    # n_probe == n_centroids degenerates to exhaustive: rank-identical
    full = [r["vec_id"] for r in
            ivf_cosine_topk(emb, q, k=10, n_centroids=16, n_probe=16).collect()]
    assert full == exact


def test_cosine_near_dup_pairs(spark):
    from search_engine_spark.pipelines.similarity import cosine_near_dup_pairs

    rng = np.random.default_rng(23)
    vecs = rng.normal(size=(60, 16)).astype(np.float32)
    # plant two true near-dup pairs: tiny perturbations of rows 0 and 7
    vecs[1] = vecs[0] + rng.normal(scale=0.01, size=16).astype(np.float32)
    vecs[9] = vecs[7] + rng.normal(scale=0.01, size=16).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(60)],
        "vec_id long, embedding array<float>",
    )
    got = cosine_near_dup_pairs(emb, threshold=0.95).collect()
    pairs = {(r["a"], r["b"]) for r in got}
    # near-identical vectors agree on every sign bit -> every band matches,
    # so the planted pairs are guaranteed candidates and must be found
    assert (0, 1) in pairs and (7, 9) in pairs
    for r in got:
        v64 = vecs.astype(np.float64)
        a, b = v64[r["a"]], v64[r["b"]]
        sim = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert sim >= 0.95
        assert abs(r["sim"] - sim) < 1e-5


def test_token_stats_and_quality(spark, docs_df):
    from search_engine_spark.pipelines.textstats import quality_score, token_stats

    ts = {r["doc_id"]: r for r in token_stats(docs_df).collect()}
    assert ts[0]["n_tokens"] == 9
    assert ts[0]["n_uniq"] == 8  # 'the' twice
    q = {r["doc_id"]: r for r in quality_score(docs_df).collect()}
    assert q[5]["digit_ratio"] == pytest.approx(3 / 6)
    assert q[0]["stopword_ratio"] == pytest.approx(2 / 9)  # 'the' twice
    assert q[0]["uniq_ratio"] == pytest.approx(8 / 9)


def test_lang_id_markers(spark):
    from search_engine_spark.pipelines.textstats import lang_id

    rows = [
        (0, "the cat and the dog of it"),
        (1, "der hund und die katze ist nicht ein tier"),
        (2, "xyzzy plugh zork"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["pred_lang"] for r in lang_id(df).collect()}
    assert got[0] == "en"
    assert got[1] == "de"
    assert got[2] == "und"


def test_fingerprint_separator_insensitive(spark):
    from search_engine_spark.pipelines.textstats import fingerprint

    df = spark.createDataFrame(
        [(0, "hello world"), (1, "hello,  world!"), (2, "hello there")],
        "doc_id long, text string",
    )
    fp = {r["doc_id"]: r["fp"] for r in fingerprint(df).collect()}
    assert fp[0] == fp[1]
    assert fp[0] != fp[2]


def test_multimodal_features_roundtrip(spark, docs_df):
    from search_engine_spark.pipelines.multimodal import (
        attach_binary_payload,
        decode_payload,
        extract_features,
    )

    feats = {r["doc_id"]: r for r in
             extract_features(attach_binary_payload(docs_df)).collect()}
    text0 = docs_df.filter("doc_id = 0").head()["text"]
    assert feats[0]["n_bytes"] == len(text0.encode())
    assert feats[0]["content_md5"] == hashlib.md5(text0.encode()).hexdigest()
    assert 1 <= feats[0]["fake_w"] <= 64 and 1 <= feats[0]["fake_h"] <= 64
    # truncated JPEG = corrupt data (loud ValueError from the real decoder);
    # WebP is a format no stdlib decoder covers -> honest Pillow import gate
    with pytest.raises(ValueError):
        decode_payload(b"\xff\xd8\xff", "image/jpeg")
    with pytest.raises(NotImplementedError):
        decode_payload(b"RIFF\x00\x00\x00\x00WEBPVP8 ", "image/webp")


def test_multimodal_resize_clamps_and_fingerprints(spark, docs_df):
    from search_engine_spark.pipelines.multimodal import (
        attach_binary_payload,
        decode_payload,
        resize_media,
    )

    out = {r["doc_id"]: r for r in
           resize_media(attach_binary_payload(docs_df), target_w=8, target_h=8).collect()}
    for doc_id, text, _ in docs_df.collect():
        payload = text.encode()
        feats = decode_payload(payload, "text/plain", fake="deterministic")
        w, h = min(feats["fake_w"], 8), min(feats["fake_h"], 8)
        r = out[doc_id]
        assert (r["out_w"], r["out_h"]) == (w, h)
        assert r["out_w"] <= 8 and r["out_h"] <= 8
        assert r["thumb_md5"] == hashlib.md5(payload + f":{w}x{h}".encode()).hexdigest()


def test_multimodal_frame_sampling_windows(spark, docs_df):
    from search_engine_spark.pipelines.multimodal import (
        attach_binary_payload,
        sample_frames,
    )

    frames = sample_frames(
        attach_binary_payload(docs_df), frame_size=10, every=2
    ).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, text, _ in docs_df.collect():
        b = text.encode()
        expect = [(i, off, b[off:off + 10]) for i, off in
                  enumerate(range(0, len(b), 20))]
        got = sorted(by_doc[doc_id], key=lambda r: r["frame_idx"])
        assert len(got) == len(expect)
        for r, (idx, off, fb) in zip(got, expect):
            assert (r["frame_idx"], r["frame_offset"], r["frame_bytes"]) == (idx, off, len(fb))
            assert r["frame_md5"] == hashlib.md5(fb).hexdigest()


def test_facets(spark, docs_df):
    from search_engine_spark.facets import facet_distribution, facet_value_search

    dist = facet_distribution(docs_df, "lang").collect()
    assert [(r["value"], r["count"]) for r in dist] == [("en", 4), ("de", 1), ("fr", 1)]
    filtered = facet_distribution(docs_df, "lang", filter_ast={"lang": {"$ne": "en"}}).collect()
    assert {r["value"] for r in filtered} == {"de", "fr"}
    fv = facet_value_search(docs_df, "lang", "e", typo_tolerant=False).collect()
    assert [r["value"] for r in fv] == ["en"]


def test_decontaminate(spark, docs_df):
    from search_engine_spark.pipelines.curation import decontaminate

    probes = docs_df.filter("doc_id = 0")
    got = {r["doc_id"]: r["n_hits"] for r in
           decontaminate(docs_df, probes, n=3).collect()}
    # doc 0/1 exact: all 7 distinct 3-grams hit; doc 2 shares the first 4
    # 3-grams (the "a"-for-"the" swap breaks every gram from "jumps over
    # the" on); 3-5 share none
    assert got == {0: 7, 1: 7, 2: 4}
    # n too large for any doc -> whole-doc partial shingles; only exact
    # dups collide
    got_big = {r["doc_id"]: r["n_hits"] for r in
               decontaminate(docs_df, probes, n=50).collect()}
    assert got_big == {0: 1, 1: 1}


def test_minhash_novel_cross_corpus(spark, docs_df):
    from search_engine_spark.pipelines.dedup import minhash_novel

    # new = docs 1,2,5; reference = docs 0,3,4 (fixture: 1 exact-dups 0,
    # 2 near-dups 0, 5 is unrelated, 4 permutes 3)
    new = docs_df.filter("doc_id in (1, 2, 5)")
    ref = docs_df.filter("doc_id in (0, 3, 4)")
    got = {(r["a"], r["b"]): r["jaccard"]
           for r in minhash_novel(new, ref, threshold=0.5).collect()}
    assert got[(1, 0)] == 1.0          # exact dup of a reference doc
    assert (5, 0) not in got and (5, 3) not in got
    assert all(a in (1, 2) for a, _ in got)  # 5 is novel
    # novel set = new ids with no flagged pair
    flagged = {a for a, _ in got}
    assert 5 not in flagged
    # symmetric sanity: swapping sides flags the reference twin instead
    rev = {(r["a"], r["b"]) for r in
           minhash_novel(ref, new, threshold=0.99).collect()}
    assert (0, 1) in rev


def test_decontaminate_bloom_matches_exact(spark, docs_df):
    from search_engine_spark.pipelines.curation import (
        decontaminate,
        decontaminate_bloom,
    )

    probes = docs_df.filter("doc_id = 0")
    exact = {r["doc_id"]: r["n_hits"] for r in
             decontaminate(docs_df, probes, n=3).collect()}
    bloom = {r["doc_id"]: r["n_hits"] for r in
             decontaminate_bloom(docs_df, probes, n=3).collect()}
    assert bloom == exact == {0: 7, 1: 7, 2: 4}
    # a deliberately saturated filter (1 bit/key, 1 hash) floods the
    # prefilter with false positives; the confirm join must still make
    # the output exact
    noisy = {r["doc_id"]: r["n_hits"] for r in
             decontaminate_bloom(docs_df, probes, n=3, bits_per_key=1,
                                 num_hashes=1).collect()}
    assert noisy == exact
    # empty probe set -> empty result (all-zero bitset)
    empty = decontaminate_bloom(
        docs_df, docs_df.filter("doc_id = -1"), n=3).collect()
    assert empty == []


def test_bigram_logloss(spark):
    import math

    from collections import Counter

    from search_engine_spark.pipelines.curation import bigram_logloss

    rows = [(0, "a b a b"), (1, "a b c"), (2, "c"), (3, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in bigram_logloss(df, lam=0.75).collect()}

    # reference model computed by hand from the same corpus
    toks = {0: ["a", "b", "a", "b"], 1: ["a", "b", "c"], 2: ["c"], 3: []}
    uni = Counter(t for ts in toks.values() for t in ts)
    n = sum(uni.values())
    bgs = [(ts[i], ts[i + 1]) for ts in toks.values() for i in range(len(ts) - 1)]
    cbg, cprev = Counter(bgs), Counter(p for p, _ in bgs)

    def ce(ts):
        ps = [0.75 * cbg[(p, c)] / cprev[p] + 0.25 * uni[c] / n
              for p, c in zip(ts, ts[1:])]
        return -sum(math.log2(x) for x in ps) / len(ps)

    for d in (0, 1):
        assert got[d]["n_bigrams"] == len(toks[d]) - 1
        assert got[d]["cross_entropy"] == round(ce(toks[d]), 6)
        assert got[d]["perplexity"] == round(2 ** ce(toks[d]), 6)
    # <2 tokens: no transitions, NULL score
    for d in (2, 3):
        assert got[d]["n_bigrams"] == 0
        assert got[d]["cross_entropy"] is None
    # context-awareness: scrambled word order must score worse than the
    # corpus's dominant order even though unigram counts are identical
    df2 = spark.createDataFrame(
        [(i, "a b c a b c") for i in range(5)] + [(9, "b a c b a c")],
        "doc_id long, text string")
    g2 = {r["doc_id"]: r["cross_entropy"]
          for r in bigram_logloss(df2, lam=0.75).collect()}
    assert g2[9] > g2[0]


def test_stratified_sample_n(spark, docs_df):
    import hashlib

    from search_engine_spark.pipelines.curation import stratified_sample_n

    def key(seed, i):
        return hashlib.md5(f"{seed}:{i}".encode()).hexdigest()

    # expected: first 2 of the 4 en docs by (md5, id); de/fr keep their
    # single doc each
    en = sorted((key(7, i), i) for i in (0, 1, 2, 3))[:2]
    expect = sorted([i for _, i in en] + [4, 5])
    got = sorted(r["doc_id"] for r in
                 stratified_sample_n(docs_df, 2, seed=7).collect())
    assert got == expect
    # prefilter and naive window agree, at any parallelism
    naive = sorted(r["doc_id"] for r in stratified_sample_n(
        docs_df.repartition(7), 2, seed=7, prefilter=False).collect())
    assert naive == expect
    # margin so tight every stratum falls back to the full re-rank
    tight = sorted(r["doc_id"] for r in stratified_sample_n(
        docs_df, 2, seed=7, margin=1e-9).collect())
    assert tight == expect
    # n >= stratum size keeps everything
    assert sorted(r["doc_id"] for r in
                  stratified_sample_n(docs_df, 50, seed=7).collect()) == list(range(6))


def test_repetition_stats(spark):
    from search_engine_spark.pipelines.curation import repetition_stats

    rows = [
        (0, "a b a b a b"),   # 2-grams: ab,ba,ab,ba,ab -> dup 3/5, top 3/5
        (1, "x y z w"),
        (2, "q"),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in repetition_stats(df, ngram=2).collect()}
    assert got[0]["n_tokens"] == 6
    assert got[0]["dup_word_frac"] == round(4 / 6, 6)
    assert got[0]["dup_ngram_frac"] == 0.6
    assert got[0]["top_ngram_frac"] == 0.6
    assert got[1]["dup_ngram_frac"] == 0.0
    assert got[1]["top_ngram_frac"] == round(1 / 3, 6)
    assert got[2]["n_tokens"] == 1 and got[2]["top_ngram_frac"] == 1.0
    assert got[3]["n_tokens"] == 0 and got[3]["top_ngram_frac"] == 0.0


def test_stratified_sample_deterministic(spark, docs_df):
    from search_engine_spark.pipelines.curation import stratified_sample

    kept = sorted(
        r["doc_id"]
        for r in stratified_sample(docs_df, {"en": 1.0, "de": 1.0}, seed=7).collect()
    )
    assert kept == [0, 1, 2, 3, 4]  # fr default-rate 0 drops doc 5
    # identical at different parallelism (partitioning-independent coin)
    again = sorted(
        r["doc_id"]
        for r in stratified_sample(
            docs_df.repartition(7), {"en": 1.0, "de": 1.0}, seed=7
        ).collect()
    )
    assert again == kept
    # the coin matches the documented formula
    import hashlib

    def u(seed, i):
        return int(hashlib.md5(f"{seed}:{i}".encode()).hexdigest()[:15], 16) / 2**60

    half = {r["doc_id"] for r in
            stratified_sample(docs_df, {"en": 0.5}, seed=7).collect()}
    expect = {i for i in (0, 1, 2, 3) if u(7, i) < 0.5}  # en docs only
    assert half == expect


def test_embed_documents_deterministic_and_normalized(spark, docs_df):
    """P8 embedder slot: the default md5-projection embedder matches the
    documented per-token formula, L2-normalizes, is partitioning-invariant,
    and the pluggable-callable contract works."""
    import hashlib

    import numpy as np

    from search_engine_spark.pipelines.embed import (
        HashedBowEmbedder,
        embed_documents,
    )

    out = {r["doc_id"]: np.array(r["embedding"])
           for r in embed_documents(docs_df, dim=4).collect()}
    assert len(out) == docs_df.count()
    # normalized (or all-zero for token-less docs)
    for v in out.values():
        n = float(np.linalg.norm(v))
        assert abs(n - 1.0) < 1e-9 or n == 0.0
    # partitioning-invariant
    again = {r["doc_id"]: np.array(r["embedding"])
             for r in embed_documents(docs_df.repartition(5), dim=4).collect()}
    for k in out:
        assert np.allclose(out[k], again[k], atol=1e-12)
    # formula check against hashlib for a one-token doc
    import pandas as pd

    one = spark.createDataFrame(
        pd.DataFrame({"doc_id": [99], "text": ["hello"]})
    )
    got = np.array(
        embed_documents(one, dim=4).collect()[0]["embedding"]
    )
    raw = np.array([
        int(hashlib.md5(f"hello:{d}".encode()).hexdigest()[:15], 16) / 2**59 - 1.0
        for d in range(4)
    ])
    assert np.allclose(got, raw / np.linalg.norm(raw), atol=1e-12)
    # pluggable embedder: a custom callable takes over
    class Const:
        def __call__(self, texts):
            return np.tile(np.arange(3, dtype=np.float64), (len(texts), 1))

    cst = embed_documents(one, dim=3, embedder=Const()).collect()[0]["embedding"]
    assert list(cst) == [0.0, 1.0, 2.0]


def test_unigram_logloss_matches_hand_computed(spark):
    """Self-trained unigram LM cross-entropy: tiny corpus with known
    counts; token-less docs score NULL with n_tokens 0."""
    import math

    import pandas as pd

    from search_engine_spark.pipelines.curation import unigram_logloss

    pdf = pd.DataFrame(
        {"doc_id": [0, 1, 2], "text": ["a a b", "b c", ""]}
    )
    out = {r["doc_id"]: r for r in
           unigram_logloss(spark.createDataFrame(pdf)).collect()}
    # corpus counts: a=2, b=2, c=1, total=5
    p = {"a": 2 / 5, "b": 2 / 5, "c": 1 / 5}
    ce0 = -(2 * math.log2(p["a"]) + 1 * math.log2(p["b"])) / 3
    ce1 = -(math.log2(p["b"]) + math.log2(p["c"])) / 2
    assert out[0]["n_tokens"] == 3
    assert out[0]["cross_entropy"] == pytest.approx(ce0, abs=1e-6)
    assert out[0]["perplexity"] == pytest.approx(2 ** ce0, abs=1e-5)
    assert out[1]["cross_entropy"] == pytest.approx(ce1, abs=1e-6)
    assert out[2]["n_tokens"] == 0 and out[2]["cross_entropy"] is None
    # higher-probability docs have lower cross-entropy
    assert out[0]["cross_entropy"] < out[1]["cross_entropy"]


def test_pii_redact_masks_and_counts(spark):
    """Email / IPv4 / phone masking with per-type counts; emails are
    masked before phones so an address's digits can't be half-eaten."""
    import pandas as pd

    from search_engine_spark.pipelines.curation import pii_redact

    rows = [
        (0, "contact bob.smith+spam@ex-ample.co.uk or +1 555 123 4567 now"),
        (1, "server at 10.0.255.3 and 192.168.1.1, mail root@host.org"),
        (2, "no pii here, just 1234 numbers and a dot. end"),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    out = {r["doc_id"]: r.asDict() for r in pii_redact(df).collect()}
    assert out[0]["text_redacted"] == "contact <EMAIL> or <PHONE> now"
    assert (out[0]["n_emails"], out[0]["n_ipv4"], out[0]["n_phones"]) == (1, 0, 1)
    assert out[1]["text_redacted"] == "server at <IP> and <IP>, mail <EMAIL>"
    assert (out[1]["n_emails"], out[1]["n_ipv4"], out[1]["n_phones"]) == (1, 2, 0)
    assert out[2]["text_redacted"] == rows[2][1]
    assert (out[2]["n_emails"], out[2]["n_ipv4"], out[2]["n_phones"]) == (0, 0, 0)


def test_cluster_pairs_connected_components(spark):
    """Transitive chains collapse into one cluster (a~b, b~c => {a,b,c}
    even though a!~c); singletons keep their own id; a long path still
    converges (propagation = one hop per round)."""
    import pandas as pd

    from search_engine_spark.pipelines.dedup import cluster_pairs

    nodes = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1, 2, 3, 10, 11, 12, 13, 14, 20]}))
    pairs = spark.createDataFrame(
        pd.DataFrame([(0, 1), (1, 2), (2, 3),          # chain -> cluster 0
                      (13, 14), (12, 13), (11, 12), (10, 11)],  # path -> 10
                     columns=["a", "b"]))
    got = {r["doc_id"]: r["cluster_id"]
           for r in cluster_pairs(nodes, pairs).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 0,
                   10: 10, 11: 10, 12: 10, 13: 10, 14: 10, 20: 20}


# ---------------------------------------------------------------------------
# round 4: LSH bucket caps, prompt templates, REST adapter
# ---------------------------------------------------------------------------


def test_lsh_bucket_cap_bounds_pathological_cluster(spark, caplog):
    """The LSH skew bomb: N identical docs land in ONE (band, bucket) and
    fan out N^2/2 candidate pairs. With bucket_cap the candidate count is
    bounded by cap^2/2 per band, and audit mode logs the truncation."""
    import logging

    from search_engine_spark.pipelines import dedup

    n = 400
    rows = [(i, "the same boilerplate page text repeated everywhere")
            for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    cap = 16
    with caplog.at_level(logging.WARNING,
                         logger="search_engine_spark.pipelines.dedup"):
        pairs = dedup.minhash_lsh_pairs(
            df, threshold=0.5, bucket_cap=cap, audit_cap=True
        ).collect()
    assert any("truncated" in r.message for r in caplog.records)
    # every band keeps the same cap smallest doc_ids -> C(cap,2) pairs
    assert len(pairs) == cap * (cap - 1) // 2
    assert all(p["a"] < cap and p["b"] < cap for p in pairs)

    # simhash path: same bound
    sp = dedup.simhash_pairs(df, bucket_cap=cap).collect()
    assert len(sp) == cap * (cap - 1) // 2

    # uncapped on a small healthy corpus: cap=None is the old behavior
    small = spark.createDataFrame(rows[:10], "doc_id long, text string")
    assert len(dedup.minhash_lsh_pairs(small, threshold=0.5,
                                       bucket_cap=None).collect()) == 45


def test_cosine_near_dup_bucket_cap(spark):
    from search_engine_spark.pipelines import similarity

    n = 100
    vec = [1.0, 0.0, 0.5, 0.25]
    emb = spark.createDataFrame(
        [(i, vec) for i in range(n)], "vec_id long, embedding array<double>"
    )
    cap = 8
    pairs = similarity.cosine_near_dup_pairs(
        emb, threshold=0.9, bucket_cap=cap
    ).collect()
    assert len(pairs) == cap * (cap - 1) // 2
    assert all(p["a"] < cap and p["b"] < cap for p in pairs)


def test_cluster_pairs_respects_node_universe(spark):
    """Pair endpoints outside `nodes` are dropped: the output is exactly
    one row per node (the documented contract)."""
    from search_engine_spark.pipelines import dedup

    nodes = spark.createDataFrame([(1,), (2,), (3,)], "doc_id long")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 99), (98, 97)], "a long, b long"
    )
    out = {r["doc_id"]: r["cluster_id"]
           for r in dedup.cluster_pairs(nodes, pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 3}


def test_prompt_template_render_and_check(spark):
    from search_engine_spark.pipelines.prompt import PromptTemplate

    t = PromptTemplate("{{ lang }}: {{doc.text}}!")
    assert t.fields() == ["lang", "text"]
    assert t.render({"lang": "en", "text": "hi"}) == "en: hi!"
    assert t.render({"lang": None, "text": "hi"}) == ": hi!"
    t2 = PromptTemplate("{{text}}", max_chars=3)
    assert t2.render({"text": "abcdef"}) == "abc"

    df = spark.createDataFrame([(1, "en", "hello")],
                               "doc_id long, lang string, text string")
    rendered = df.select(t.column().alias("p")).collect()[0]["p"]
    assert rendered == "en: hello!"

    with pytest.raises(ValueError, match="missing document fields"):
        PromptTemplate("{{nope}}").check(df)
    with pytest.raises(ValueError, match="references no"):
        PromptTemplate("static text only")


def test_embed_documents_with_template(spark):
    """Template rendering changes the embedded text: '{{lang}}: {{text}}'
    equals embedding a pre-concatenated column; NULL fields render ''."""
    import numpy as np

    from search_engine_spark.pipelines import embed

    df = spark.createDataFrame(
        [(1, "en", "hello world"), (2, None, "hello world")],
        "doc_id long, lang string, text string",
    )
    out = {r["doc_id"]: np.array(r["embedding"])
           for r in embed.embed_documents(
               df, dim=8, template="{{lang}}: {{text}}").collect()}
    manual = embed.HashedBowEmbedder(8)(["en: hello world", ": hello world"])
    assert np.allclose(out[1], manual[0])
    assert np.allclose(out[2], manual[1])
    # lang token shifts the embedding vs the raw-text path
    raw = {r["doc_id"]: np.array(r["embedding"])
           for r in embed.embed_documents(df, dim=8).collect()}
    assert not np.allclose(out[1], raw[1])


def test_rest_embedder_batching_retry_backoff():
    import numpy as np
    import pytest as _pytest

    from search_engine_spark.pipelines.embed import (
        RestEmbedder, RetryableEmbedderError,
    )

    calls: list[dict] = []
    fails = {"left": 2}

    def transport(payload):
        calls.append(payload)
        if fails["left"] > 0:
            fails["left"] -= 1
            raise RetryableEmbedderError("429")
        return {"data": [{"embedding": [float(len(t)), 0.0]}
                         for t in payload["input"]]}

    sleeps: list[float] = []
    emb = RestEmbedder(transport, dim=2, max_batch=3, max_retries=3,
                       backoff_s=0.5, extra={"model": "m1"},
                       sleep=sleeps.append)
    texts = ["a", "bb", "ccc", "dddd", "eeeee", "ffffff", "g"]
    out = emb(texts)
    assert out.shape == (7, 2)
    assert [v[0] for v in out] == [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 1.0]
    # 3 batches of <=3, +2 retried calls on the first batch
    assert len(calls) == 3 + 2
    assert all(c["model"] == "m1" for c in calls)
    assert sleeps == [0.5, 1.0]  # exponential backoff

    # retry budget exhausted -> the retryable error propagates
    def always_429(payload):
        raise RetryableEmbedderError("429")

    emb2 = RestEmbedder(always_429, dim=2, max_retries=1, backoff_s=0,
                        sleep=lambda s: None)
    with _pytest.raises(RetryableEmbedderError):
        emb2(["x"])

    # shape validation
    def bad_shape(payload):
        return {"data": [{"embedding": [1.0, 2.0, 3.0]}]}

    with _pytest.raises(ValueError, match="dim mismatch"):
        RestEmbedder(bad_shape, dim=2)(["x"])
    with _pytest.raises(ValueError):
        RestEmbedder(None, dim=2)


def test_per_service_embedder_adapters():
    """OpenAI / Ollama / HF payload shapes as RestEmbedder hooks
    (reference src/vector/{openai,ollama,hf}.rs), fake-transport tested:
    request bodies match each service's wire shape, responses parse in
    input order (OpenAI rows reordered by index), malformed responses
    fail loudly."""
    import numpy as np
    import pytest as _pytest

    from search_engine_spark.pipelines.embed import (
        HFEmbedder, OllamaEmbedder, OpenAIEmbedder,
    )

    # OpenAI: index-keyed rows arrive OUT OF ORDER -> reordered
    calls = []

    def openai_transport(payload):
        calls.append(payload)
        data = [{"index": i, "embedding": [float(len(t)), 1.0]}
                for i, t in enumerate(payload["input"])]
        return {"data": list(reversed(data))}

    emb = OpenAIEmbedder(openai_transport, dim=2, model="text-emb-3",
                         dimensions=2)
    out = emb(["a", "bb", "ccc"])
    assert [v[0] for v in out] == [1.0, 2.0, 3.0]
    assert calls[0] == {"input": ["a", "bb", "ccc"],
                        "model": "text-emb-3", "dimensions": 2}

    # duplicate / out-of-range index -> loud failure, not silent zeros
    def dup_index(payload):
        return {"data": [{"index": 0, "embedding": [1.0, 0.0]}] * 2}

    with _pytest.raises(ValueError, match="index invalid"):
        OpenAIEmbedder(dup_index, dim=2, model="m")(["x", "y"])

    # Ollama: {"embeddings": [...]} in input order
    def ollama_transport(payload):
        assert payload["model"] == "nomic-embed-text"
        return {"embeddings": [[float(len(t)), 0.0] for t in payload["input"]]}

    out = OllamaEmbedder(ollama_transport, dim=2, model="nomic-embed-text")(
        ["a", "bb"])
    assert [v[0] for v in out] == [1.0, 2.0]

    def ollama_short(payload):
        return {"embeddings": [[1.0, 0.0]]}

    with _pytest.raises(ValueError, match="shape mismatch"):
        OllamaEmbedder(ollama_short, dim=2, model="m")(["x", "y"])

    # HF TEI: {"inputs": [...]} request, bare-array response accepted
    def hf_transport(payload):
        assert "inputs" in payload and "input" not in payload
        return [[float(len(t)), 0.0] for t in payload["inputs"]]

    out = HFEmbedder(hf_transport, dim=2, extra={"truncate": True})(
        ["a", "bb", "ccc"])
    assert [v[0] for v in out] == [1.0, 2.0, 3.0]
    assert np.asarray(out).shape == (3, 2)

    with _pytest.raises(ValueError, match="shape mismatch"):
        HFEmbedder(lambda p: {"bogus": 1}, dim=2)(["x"])


def test_unigram_logloss_no_forced_broadcast(spark):
    """The vocab join must not carry an unconditional broadcast hint (a
    100 TB corpus has 10^8+ distinct terms); values are unchanged and an
    injected vocab_df (term dictionary reuse) gives identical results."""
    from pyspark.sql import functions as F

    from search_engine_spark.pipelines import curation
    from search_engine_spark.pipelines.dedup import tokens_col

    df = spark.createDataFrame(
        [(1, "a a b"), (2, "a c"), (3, "")],
        "doc_id long, text string",
    )
    out = curation.unigram_logloss(df)
    # the vocab side must carry no broadcast hint; the 1-row total is the
    # only hinted relation
    plan = out._jdf.queryExecution().analyzed().toString()
    assert plan.count("ResolvedHint") <= 1
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[3]["n_tokens"] == 0 and rows[3]["cross_entropy"] is None
    # hand check doc 2: total=5, p(a)=3/5, p(c)=1/5
    import math
    ce2 = -(math.log2(3 / 5) + math.log2(1 / 5)) / 2
    assert abs(rows[2]["cross_entropy"] - round(ce2, 6)) < 1e-9

    vocab = (
        df.select(F.explode(tokens_col("text")).alias("term"))
        .groupBy("term").agg(F.count("*").alias("cf"))
    )
    rows2 = {r["doc_id"]: r
             for r in curation.unigram_logloss(df, vocab_df=vocab).collect()}
    assert rows2[2]["cross_entropy"] == rows[2]["cross_entropy"]


def test_ivf_auto_centroids_and_lloyd_recall(spark):
    """IVF upgrade: n_centroids='auto' sizes the codebook to ~sqrt(n);
    Lloyd refinement keeps the fixed-seed init path intact (lloyd_iters=0
    default unchanged) and reaches good recall on clustered data."""
    import numpy as np

    from search_engine_spark.pipelines import similarity

    rng = np.random.default_rng(7)
    centers = rng.normal(size=(8, 12))
    n = 2000
    vecs = centers[rng.integers(0, 8, n)] + 0.05 * rng.normal(size=(n, 12))
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    cents, assigns = similarity.ivf_assignments(emb, "auto")
    assert cents.count() == 44  # isqrt(2000)
    assert assigns.count() == n

    q = [float(x) for x in centers[3]]
    brute = [r["vec_id"]
             for r in similarity.cosine_topk(emb, q, k=10).collect()]
    got = [r["vec_id"]
           for r in similarity.ivf_cosine_topk(
               emb, q, k=10, n_centroids="auto", n_probe=6,
               lloyd_iters=2).collect()]
    recall = len(set(brute) & set(got)) / 10.0
    assert recall >= 0.7, recall


def test_audio_wav_real_decode_roundtrip(spark):
    """REAL media decode: stdlib wave encode -> parse -> features; RMS is
    the exact integer-sum formula (bit-reproducible vs the SQL oracle)."""
    import numpy as np

    from search_engine_spark.pipelines import multimodal as mm

    # python-level roundtrip
    f = mm.decode_wav(mm.synth_wav(3))
    n = 800 + (3 % 5) * 160
    i = np.arange(n, dtype=np.int64)
    vals = (3 * 7919 + i * 997) % 65536 - 32768
    assert f["channels"] == 1 and f["sample_rate"] == 8000
    assert f["n_frames"] == n
    assert f["duration_s"] == round(n / 8000.0, 6)
    assert f["rms"] == round(float(np.sqrt((vals * vals).sum() / n)), 6)
    # decode_payload routes audio/wav to the real parser
    f2 = mm.decode_payload(mm.synth_wav(3), "audio/wav")
    assert f2 == f

    # Spark path
    import pandas as pd_

    def synth(batches):
        for pdf in batches:
            yield pd_.DataFrame({
                "doc_id": pdf["doc_id"],
                "payload": [mm.synth_wav(int(d)) for d in pdf["doc_id"]],
            })

    payloads = (
        spark.range(6).selectExpr("id AS doc_id")
        .mapInPandas(synth, schema="doc_id long, payload binary")
    )
    rows = {r["doc_id"]: r for r in mm.audio_features(payloads).collect()}
    assert len(rows) == 6
    assert rows[3]["rms"] == f["rms"]
    assert rows[0]["n_frames"] == 800 and rows[4]["n_frames"] == 1440

    # unknown media without a decoder still raises loudly
    with pytest.raises(NotImplementedError):
        mm.decode_payload(b"xx", "video/mp4")


def test_cross_doc_ngram_dup(spark):
    """Per-doc DISTINCT grams vs corpus doc-frequency: self-repetition does
    not inflate the score, partial shingles (len < n) collide only on
    exact duplicates, token-less docs keep zeros."""
    import pandas as pd

    from search_engine_spark.pipelines.curation import cross_doc_ngram_dup

    rows = [
        (0, "a b c"),      # grams: "a b"(shared w/ 1,6), "b c"
        (1, "a b x"),      # "a b", "b x"
        (2, "q r"),        # unique
        (3, ""),           # no tokens -> zeros
        (4, "z"),          # partial shingle "z" (dup with 5)
        (5, "z"),
        (6, "a b a b"),    # distinct {"a b","b a"} -> only "a b" is cross-dup
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    got = {r["doc_id"]: r for r in cross_doc_ngram_dup(df, n=2).collect()}
    assert (got[0]["n_grams"], got[0]["n_dup_grams"], got[0]["dup_frac"]) == (2, 1, 0.5)
    assert (got[1]["n_grams"], got[1]["n_dup_grams"], got[1]["dup_frac"]) == (2, 1, 0.5)
    assert (got[2]["n_grams"], got[2]["n_dup_grams"], got[2]["dup_frac"]) == (1, 0, 0.0)
    assert (got[3]["n_grams"], got[3]["n_dup_grams"], got[3]["dup_frac"]) == (0, 0, 0.0)
    assert got[4]["dup_frac"] == 1.0 and got[5]["dup_frac"] == 1.0
    assert (got[6]["n_grams"], got[6]["n_dup_grams"], got[6]["dup_frac"]) == (2, 1, 0.5)


def test_canonicalize_urls(spark):
    """Every documented rule plus the near-miss cases: non-default ports
    kept, path case preserved, 'refresh' param NOT eaten by the 'ref'
    tracking rule, scheme-less fallback."""
    import pandas as pd

    from search_engine_spark.pipelines.curation import canonicalize_urls

    cases = [
        (0, "https://WWW.Example.com:443/Path/?utm_source=a&b=2&a=1#f",
            "https://example.com/Path?a=1&b=2", "example.com"),
        (1, "http://example.com:80/", "http://example.com", "example.com"),
        (2, "http://example.com:8080/x", "http://example.com:8080/x",
            "example.com:8080"),
        (3, "not a url", "not a url", ""),
        (4, "  HTTPS://a.b/  ", "https://a.b", "a.b"),
        (5, "https://h/P?Q=V&ref=x", "https://h/P?Q=V", "h"),
        (6, "https://h/p?refresh=1&ref_src=tw", "https://h/p?refresh=1", "h"),
        (7, "https://www.h.io/a//", "https://h.io/a", "h.io"),
    ]
    df = spark.createDataFrame(
        pd.DataFrame([(i, u) for i, u, *_ in cases], columns=["doc_id", "url"])
    )
    got = {r["doc_id"]: r for r in canonicalize_urls(df).collect()}
    for i, _, canon, host in cases:
        assert got[i]["url_canon"] == canon, (i, got[i]["url_canon"])
        assert got[i]["url_host"] == host, (i, got[i]["url_host"])
    # the point of the exercise: tracking variants of one page dedupe to
    # one key via exact_dedup on url_canon
    from search_engine_spark.pipelines.dedup import exact_dedup

    two = spark.createDataFrame(
        pd.DataFrame(
            [(0, "https://x.io/a?utm_campaign=1"), (1, "https://WWW.x.io/a/")],
            columns=["doc_id", "url"],
        )
    )
    dd = exact_dedup(canonicalize_urls(two), text_col="url_canon")
    assert dd.count() == 1


def test_gopher_quality(spark):
    """One rule violated per row; verdict + audit string; empty text fails
    words/mean_len/alpha/stop but not symbols."""
    import pandas as pd

    from search_engine_spark.pipelines.textstats import gopher_quality

    good = "the quick brown fox jumps over with lazy dogs near " * 5  # 50 words
    rows = [
        (0, good),
        (1, "hello world"),                       # words + stop
        (2, good + "# # # # # #"),                # 6/50 symbols > 0.1
        (3, ("the of " + "11 22 33 44 55 66 77 88 " * 6).strip()),  # alpha
        (4, " ".join(["a"] * 48 + ["the", "of"])),  # mean_len < 3
        (5, ""),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    got = {r["doc_id"]: r for r in gopher_quality(df).collect()}
    assert got[0]["keep"] and got[0]["reasons"] == ""
    assert got[0]["n_words"] == 50 and got[0]["stop_hits"] >= 2
    assert not got[1]["keep"] and got[1]["reasons"] == "words,stop"
    assert not got[2]["keep"] and got[2]["reasons"] == "symbols"
    assert got[2]["symbol_ratio"] == round(6 / 50, 6)
    assert not got[3]["keep"] and "alpha" in got[3]["reasons"].split(",")
    assert not got[4]["keep"] and "mean_len" in got[4]["reasons"].split(",")
    assert got[4]["mean_word_len"] == round((48 + 3 + 2) / 50, 6)
    assert not got[5]["keep"]
    assert got[5]["reasons"] == "words,mean_len,alpha,stop"
    assert got[5]["n_words"] == 0 and got[5]["symbol_ratio"] == 0.0


def test_dup_passages(spark):
    """Maximal cross-doc duplicated spans: overlapping windows merge, a
    gap of exactly L merges (adjacent spans touch), within-doc-only
    repetition is NOT flagged, short docs flag only on exact whole-doc
    duplication, span_end clamps to doc length."""
    import pandas as pd

    from search_engine_spark.pipelines.curation import dup_passages

    rows = [
        (0, "a b c d e f"),            # shares "a b c d" with doc 1
        (1, "x a b c d y"),
        (2, "p q r"),                  # exact whole-doc dup with doc 3
        (3, "p q r"),
        (4, "zz"),                     # short + unique -> nothing
        (5, ""),                       # no tokens -> nothing
        (6, "a b c z z z z a b c"),    # 'z z z' repeats only WITHIN the doc
        (7, "a b c d p q r"),          # dup at pos {0,1,4}: gap==L merges
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    got = {
        (r["doc_id"], r["span_start"]): (
            r["span_end"], r["n_tokens_span"], r["n_windows"]
        )
        for r in dup_passages(df, L=3).collect()
    }
    assert got == {
        (0, 0): (4, 4, 2),
        (1, 1): (5, 4, 2),
        (2, 0): (3, 3, 1),
        (3, 0): (3, 3, 1),
        (6, 0): (3, 3, 1),
        (6, 7): (10, 3, 1),
        (7, 0): (7, 7, 3),
    }


def test_dedup_lines_removes_cross_doc_segments(spark):
    from search_engine_spark.pipelines.curation import dedup_lines

    rows = [
        (0, "alpha beta|shared boiler|unique zero"),
        (1, "shared boiler|unique one"),
        (2, "only here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in dedup_lines(df, min_docs=2, delimiter="|").collect()}
    assert out[0]["text_clean"] == "alpha beta|unique zero"
    assert (out[0]["n_segments"], out[0]["n_removed"]) == (3, 1)
    assert out[1]["text_clean"] == "unique one"
    assert (out[1]["n_segments"], out[1]["n_removed"]) == (2, 1)
    assert out[2]["text_clean"] == "only here"
    assert (out[2]["n_segments"], out[2]["n_removed"]) == (1, 0)


def test_dedup_lines_fully_boilerplate_doc_and_within_doc_repeat(spark):
    from search_engine_spark.pipelines.curation import dedup_lines

    rows = [
        (0, "boiler\nboiler\nbody zero"),  # repeats within ONE doc only
        (1, "shared\nbody one"),
        (2, "shared"),  # whole doc is a cross-doc segment
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in dedup_lines(df, min_docs=2).collect()}
    # within-doc repetition does not count: distinct-doc frequency is 1
    assert out[0]["text_clean"] == "boiler\nboiler\nbody zero"
    assert out[0]["n_removed"] == 0
    assert out[1]["text_clean"] == "body one"
    assert out[2]["text_clean"] == ""  # husk kept as a row
    assert (out[2]["n_segments"], out[2]["n_removed"]) == (1, 1)


def test_dedup_keep_min_id_survivor(spark):
    from search_engine_spark.pipelines.dedup import dedup_keep

    nodes = spark.createDataFrame([(i,) for i in range(5)], "doc_id long")
    pairs = spark.createDataFrame([(0, 1), (1, 2)], "a long, b long")
    out = {r["doc_id"]: r for r in dedup_keep(nodes, pairs).collect()}
    assert len(out) == 5
    assert [out[i]["cluster_id"] for i in range(5)] == [0, 0, 0, 3, 4]
    assert [out[i]["cluster_size"] for i in range(5)] == [3, 3, 3, 1, 1]
    assert [out[i]["keep"] for i in range(5)] == [True, False, False, True, True]


def test_bmp_ppm_real_decode_roundtrip(spark):
    """REAL image decode with zero codec deps: synth BMP encode -> pure
    numpy container parse -> features; mean_px is an exact integer-sum
    division (bit-reproducible vs the SQL oracle)."""
    import numpy as np

    from search_engine_spark.pipelines import multimodal as mm

    # python-level roundtrip: every width (padding 1-3 bytes) x height
    for did in range(20):
        w, h = 4 + did % 5, 3 + did % 4
        f = mm.decode_image(mm.synth_bmp(did))
        assert (f["width"], f["height"], f["channels"]) == (w, h, 3)
        r = np.arange(h)[:, None, None]
        c = np.arange(w)[None, :, None]
        k = np.arange(3)[None, None, :]
        s = int(((did * 31 + r * 17 + c * 7 + k * 3) % 256).sum())
        assert f["mean_px"] == s / float(w * h * 3)

    # decode_payload routes image/* through the magic-byte sniffer
    assert mm.decode_payload(mm.synth_bmp(2), "image/bmp") == mm.decode_bmp(
        mm.synth_bmp(2)
    )

    # PPM P6 with a header comment
    ppm = b"P6\n# comment\n4 3\n255\n" + bytes(range(36))
    f = mm.decode_ppm(ppm)
    assert (f["width"], f["height"]) == (4, 3)
    assert f["mean_px"] == sum(range(36)) / 36.0
    assert mm.decode_image(ppm) == f

    # top-down 32bpp BGRA decodes to the same RGB summary as the pixels
    import struct

    w, h = 5, 2
    rgb = np.arange(w * h * 3, dtype=np.uint8).reshape(h, w, 3)
    bgra = np.concatenate(
        [rgb[:, :, ::-1], np.full((h, w, 1), 200, np.uint8)], axis=2
    )
    pix = bgra.tobytes()
    hdr = struct.pack("<2sIHHI", b"BM", 54 + len(pix), 0, 0, 54)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, -h, 1, 32, 0, len(pix), 2835, 2835, 0, 0
    )
    f = mm.decode_bmp(hdr + dib + pix)
    assert f["mean_px"] == rgb.astype(np.int64).sum() / float(w * h * 3)

    # compressed formats still gate loudly (no Pillow in this container)
    with pytest.raises((NotImplementedError, ValueError)):
        mm.decode_image(b"\x89PNG\r\n\x1a\nxxxx")

    # Spark path
    import pandas as pd_

    def synth(batches):
        for pdf in batches:
            yield pd_.DataFrame({
                "doc_id": pdf["doc_id"],
                "payload": [mm.synth_bmp(int(d)) for d in pdf["doc_id"]],
            })

    payloads = (
        spark.range(7).selectExpr("id AS doc_id")
        .mapInPandas(synth, schema="doc_id long, payload binary")
    )
    rows = {r["doc_id"]: r for r in mm.image_features(payloads).collect()}
    assert len(rows) == 7
    assert (rows[3]["width"], rows[3]["height"]) == (7, 6)
    assert rows[3]["mean_px"] == mm.decode_bmp(mm.synth_bmp(3))["mean_px"]


def test_png_real_decode_roundtrip(spark):
    """REAL PNG decode with zero codec deps (stdlib zlib + numpy
    unfilter): synth_png uses the same pixel formula as synth_bmp but
    rotates through all five scanline filters, so the round trip proves
    every unfilter branch; RGBA drops alpha like the 32bpp BMP path."""
    import struct
    import zlib

    import numpy as np

    from search_engine_spark.pipelines import multimodal as mm

    # every (width, height, starting-filter) combination vs the BMP twin
    for did in range(25):
        png = mm.synth_png(did)
        assert png[:8] == mm.PNG_SIGNATURE
        assert mm.decode_png(png) == mm.decode_bmp(mm.synth_bmp(did))
        assert mm.decode_image(png) == mm.decode_png(png)

    # RGBA (color type 6): alpha dropped -> same summary as the RGB twin
    w, h = 6, 4
    rgb = np.arange(w * h * 3, dtype=np.uint8).reshape(h, w, 3)
    rgba = np.concatenate([rgb, np.full((h, w, 1), 9, np.uint8)], axis=2)
    scan = bytearray()
    for r in range(h):
        scan.append(0)
        scan += rgba[r].tobytes()
    png6 = (
        mm.PNG_SIGNATURE
        + mm._png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0))
        + mm._png_chunk(b"IDAT", zlib.compress(bytes(scan)))
        + mm._png_chunk(b"IEND", b"")
    )
    f = mm.decode_png(png6)
    assert f["channels"] == 3
    assert f["mean_px"] == rgb.astype(np.int64).sum() / float(w * h * 3)

    # unsupported shapes gate loudly: 16-bit depth, palette, interlaced
    for ihdr in [(w, h, 16, 2, 0, 0, 0), (w, h, 8, 3, 0, 0, 0),
                 (w, h, 8, 2, 0, 0, 1)]:
        bad = (
            mm.PNG_SIGNATURE
            + mm._png_chunk(b"IHDR", struct.pack(">IIBBBBB", *ihdr))
            + mm._png_chunk(b"IEND", b"")
        )
        with pytest.raises(NotImplementedError):
            mm.decode_png(bad)

    # Spark path: image_features sniffs PNG through the same mapInPandas
    import pandas as pd_

    def synth(batches):
        for pdf in batches:
            yield pd_.DataFrame({
                "doc_id": pdf["doc_id"],
                "payload": [mm.synth_png(int(d)) for d in pdf["doc_id"]],
            })

    payloads = (
        spark.range(7).selectExpr("id AS doc_id")
        .mapInPandas(synth, schema="doc_id long, payload binary")
    )
    rows = {r["doc_id"]: r for r in mm.image_features(payloads).collect()}
    assert len(rows) == 7
    assert rows[3]["mean_px"] == mm.decode_bmp(mm.synth_bmp(3))["mean_px"]


def test_jpeg_real_decode_roundtrip(spark):
    """REAL baseline-JPEG decode with zero codec deps (pipelines/jpeg.py:
    Huffman + dequant + float64 IDCT): encode->decode round trips across
    grayscale/RGB, 4:4:4/4:2:0, restart intervals; constant-per-block
    images round-trip EXACTLY (the synth_jpeg oracle contract); exotic
    variants gate loudly."""
    import numpy as np

    from search_engine_spark.pipelines import multimodal as mm
    from search_engine_spark.pipelines.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.RandomState(42)

    # constant 8x8 blocks -> EXACT (DC-only; integer end to end)
    blocks = rng.randint(0, 256, (2, 3)).astype(np.uint8)
    img = np.repeat(np.repeat(blocks, 8, 0), 8, 1)
    assert np.array_equal(decode_jpeg(encode_jpeg(img)), img)

    # arbitrary content, all-ones quant: loss is DCT float rounding only
    g = rng.randint(0, 256, (21, 29)).astype(np.uint8)  # non-multiple of 8
    out = decode_jpeg(encode_jpeg(g))
    assert out.shape == g.shape
    assert np.abs(out.astype(int) - g.astype(int)).max() <= 2

    rgb = rng.randint(0, 256, (17, 13, 3)).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(rgb))
    assert out.shape == rgb.shape
    assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 3

    # 4:2:0 with constant chroma (gray content): subsampling is lossless
    v = rng.randint(0, 256, (24, 32)).astype(np.uint8)
    gray3 = np.stack([v, v, v], -1)
    out = decode_jpeg(encode_jpeg(gray3, subsample="4:2:0"))
    assert np.abs(out.astype(int) - gray3.astype(int)).max() <= 2

    # restart intervals: DRI + RSTn markers, predictor resets
    out = decode_jpeg(encode_jpeg(g, restart_interval=2))
    assert np.abs(out.astype(int) - g.astype(int)).max() <= 2

    # non-trivial quant table (zigzag order): still decodes, bounded error
    q = np.full(64, 4, dtype=np.int64)
    out = decode_jpeg(encode_jpeg(g, qtable=q))
    assert np.abs(out.astype(int) - g.astype(int)).max() <= 2 + 4 * 8

    # boundaries gate loudly
    payload = bytearray(encode_jpeg(g))
    sof = payload.index(b"\xff\xc0")
    payload[sof + 1] = 0xC2  # pretend progressive
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(payload))
    with pytest.raises(ValueError):
        decode_jpeg(encode_jpeg(g)[:40])  # truncated
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01")  # not a JPEG

    # synth_jpeg: exact integer-formula oracle + decode_image dispatch
    for did in range(13):
        feats = mm.decode_image(mm.synth_jpeg(did))
        wb, hb = 1 + did % 3, 1 + did % 2
        s = sum((did * 37 + br * 19 + bc * 11) % 256
                for br in range(hb) for bc in range(wb))
        assert feats == {
            "width": 8 * wb, "height": 8 * hb, "channels": 1,
            "mean_px": (64 * s) / float(64 * wb * hb),
        }, did

    # Spark path: image_features sniffs JPEG through the same mapInPandas
    import pandas as pd_

    def synth(batches):
        for pdf in batches:
            yield pd_.DataFrame({
                "doc_id": pdf["doc_id"],
                "payload": [mm.synth_jpeg(int(d)) for d in pdf["doc_id"]],
            })

    payloads = (
        spark.range(7).selectExpr("id AS doc_id")
        .mapInPandas(synth, schema="doc_id long, payload binary")
    )
    rows = {r["doc_id"]: r for r in mm.image_features(payloads).collect()}
    assert len(rows) == 7 and rows[4]["channels"] == 1


def test_jpeg_decode_handcrafted_stream():
    """Decoder verified against a JPEG byte stream crafted by hand (NOT by
    our encoder — catches complementary encode/decode convention bugs):
    explicit Huffman tables, two 8x8 grayscale blocks entropy-coded
    bit-by-bit in the test, expected pixels computed with an independent
    textbook IDCT double loop."""
    import math
    import struct

    import numpy as np

    from search_engine_spark.pipelines.jpeg import decode_jpeg

    # DC table: symbols 0..3 at length 2 (canonical codes 00,01,10);
    # AC table: symbols EOB(0x00), 0x01, 0x11 at length 2.
    dht_dc = bytes([0x00, 0, 4, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
                   ) + bytes([0, 1, 2, 3])
    dht_ac = bytes([0x10, 0, 3, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
                   ) + bytes([0x00, 0x01, 0x11])
    # codes: DC {0:00, 1:01, 2:10, 3:11(unused—only 0..2 emitted)},
    # AC {EOB:00, 0x01:01, 0x11:10}
    bits = ""
    # block 1: DC size 2, bits '11' -> diff=3, pred 0 -> DC=3
    bits += "10" + "11"
    # block 1 AC: symbol 0x01 (run 0, size 1), bit '1' -> +1 at zigzag k=1
    bits += "01" + "1"
    # block 1: EOB
    bits += "00"
    # block 2: DC size 1, bit '0' -> diff=-1, pred 3 -> DC=2
    bits += "01" + "0"
    # block 2 AC: symbol 0x11 (run 1, size 1), bit '0' -> -1 at zigzag k=2
    bits += "10" + "0"
    # block 2: EOB
    bits += "00"
    bits += "1" * ((8 - len(bits) % 8) % 8)  # pad with 1s
    scan = bytes(int(bits[i:i + 8], 2) for i in range(0, len(bits), 8))
    assert 0xFF not in scan  # no stuffing needed for this stream

    jpg = (
        b"\xff\xd8"
        + b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([1] * 64)
        + b"\xff\xc0" + struct.pack(">H", 11)
        + struct.pack(">BHHB", 8, 8, 16, 1) + bytes([1, 0x11, 0])
        + b"\xff\xc4" + struct.pack(">H", 2 + len(dht_dc)) + dht_dc
        + b"\xff\xc4" + struct.pack(">H", 2 + len(dht_ac)) + dht_ac
        + b"\xff\xda" + struct.pack(">H", 8) + bytes([1, 1, 0x00])
        + b"\x00\x3f\x00"
        + scan
        + b"\xff\xd9"
    )
    got = decode_jpeg(jpg)
    assert got.shape == (8, 16)

    # independent textbook IDCT (ITU-T81 A.3.3), four explicit loops
    def idct_block(coef):
        out = np.zeros((8, 8))
        for x in range(8):
            for y in range(8):
                s = 0.0
                for u in range(8):
                    for v in range(8):
                        cu = 1 / math.sqrt(2) if u == 0 else 1.0
                        cv = 1 / math.sqrt(2) if v == 0 else 1.0
                        s += (cu * cv / 4.0 * coef[u, v]
                              * math.cos((2 * x + 1) * u * math.pi / 16)
                              * math.cos((2 * y + 1) * v * math.pi / 16))
                out[x, y] = s
        return np.clip(np.round(out + 128.0), 0, 255).astype(np.uint8)

    c1 = np.zeros((8, 8)); c1[0, 0] = 3.0; c1[0, 1] = 1.0  # zigzag 1 = (0,1)
    c2 = np.zeros((8, 8)); c2[0, 0] = 2.0; c2[1, 0] = -1.0  # zigzag 2 = (1,0)
    assert np.array_equal(got[:, :8], idct_block(c1))
    assert np.array_equal(got[:, 8:], idct_block(c2))


def test_pack_sequences_spans(spark):
    """Concat-and-chunk packing: spans tile each sequence exactly, docs
    split across boundaries, zero-token docs vanish, deterministic vs a
    straight python reimplementation."""
    from search_engine_spark.pipelines.curation import pack_sequences

    rows = [
        (0, "a b c d e"),          # 5 tokens
        (1, ""),                   # 0 tokens -> no rows
        (2, "f g h"),              # 3 tokens
        (3, "i j k l m n o p q"),  # 9 tokens
        (4, "r"),                  # 1 token
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r["seq_id"], r["doc_id"], r["doc_start"], r["seq_start"], r["span_len"])
        for r in pack_sequences(df, max_len=4, n_parts=3).collect()
    )
    # python oracle: cumsum in doc order, cut at multiples of 4
    ns = {0: 5, 1: 0, 2: 3, 3: 9, 4: 1}
    want, off = [], 0
    for did in sorted(ns):
        n = ns[did]
        start, stop = off, off + n
        off = stop
        if n == 0:
            continue
        for seq in range(start // 4, (stop - 1) // 4 + 1):
            lo, hi = max(start, seq * 4), min(stop, (seq + 1) * 4)
            want.append((seq, did, lo - start, lo - seq * 4, hi - lo))
    assert got == sorted(want)
    # every sequence except the last is exactly full
    per_seq = {}
    for seq, *_rest, ln in got:
        per_seq[seq] = per_seq.get(seq, 0) + ln
    last = max(per_seq)
    assert all(v == 4 for s, v in per_seq.items() if s != last)
    # parallelism invariance
    got1 = sorted(
        (r["seq_id"], r["doc_id"], r["doc_start"], r["seq_start"], r["span_len"])
        for r in pack_sequences(df, max_len=4, n_parts=1).collect()
    )
    assert got1 == got


def test_mixture_weights(spark):
    from search_engine_spark.pipelines.curation import mixture_weights

    rows = [
        (0, "en", "a b c d"),   # en: 6 tokens
        (1, "en", "e f"),
        (2, "de", "g h i"),     # de: 3 tokens
        (3, "zh", "j"),         # zh: 1 token, not in target -> weight 0
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = {r["stratum"]: r for r in
           mixture_weights(df, {"en": 1.0, "de": 1.0}).collect()}
    assert set(out) == {"en", "de", "zh"}
    assert (out["en"]["n_docs"], out["en"]["n_tokens"]) == (2, 6)
    assert out["en"]["corpus_share"] == 6 / 10
    assert out["en"]["target_share"] == 0.5
    assert out["en"]["weight"] == 0.5 / (6 / 10)
    assert out["de"]["weight"] == 0.5 / (3 / 10)  # upsampled: > 1
    assert out["zh"]["target_share"] == 0.0 and out["zh"]["weight"] == 0.0


def test_host_stats_counts_and_dup_frac(spark):
    """host_stats: per-host doc/token counts and exact-dup fraction."""
    from search_engine_spark.pipelines import curation

    df = spark.createDataFrame(
        [
            (0, "a.com", "one two three"),
            (1, "a.com", "one two three"),   # exact dup of doc 0
            (2, "a.com", "four five"),
            (3, "b.com", "six"),
        ],
        "doc_id long, url_host string, text string",
    )
    out = {r["host"]: r for r in curation.host_stats(df).collect()}
    a = out["a.com"]
    assert (a["n_docs"], a["n_tokens"], a["n_unique_texts"]) == (3, 8, 2)
    assert a["avg_doc_tokens"] == 8 / 3
    assert a["dup_frac"] == 1 / 3
    b = out["b.com"]
    assert (b["n_docs"], b["n_tokens"], b["dup_frac"]) == (1, 1, 0.0)
