"""Tokenizer freeze tests (reference A1-A4 semantics, SURVEY.md §2.3)."""

from search_engine_spark.analysis import normalize, tokenize, tokenize_with_positions
from search_engine_spark.config import MAX_WORD_LENGTH


def test_basic_tokens_and_positions():
    assert tokenize_with_positions("hello world") == [("hello", 0), ("world", 1)]


def test_hard_separator_adds_eight():
    # reference extract_docid_word_positions.rs:242-265: hard sep gap = +8
    assert tokenize_with_positions("a b. c") == [("a", 0), ("b", 1), ("c", 9)]
    assert tokenize_with_positions("x! y? z") == [("x", 0), ("y", 8), ("z", 16)]
    # soft separators (comma, space, dash) advance by 1
    assert tokenize_with_positions("x, y - z") == [("x", 0), ("y", 1), ("z", 2)]


def test_mixed_hard_soft_gap_counts_once():
    # one gap containing a hard separator advances by exactly 8
    assert tokenize_with_positions("a .,. b") == [("a", 0), ("b", 8)]


def test_normalization_lowercase_and_accents():
    assert normalize("Héllo WÖRLD") == "hello world"
    assert tokenize("Héllo, WÖRLD!") == ["hello", "world"]
    # NFKD compatibility: ﬁ ligature decomposes
    assert tokenize("ﬁsh") == ["fish"]


def test_cyrillic_and_digits():
    assert tokenize("Привет мир 42") == ["привет", "мир", "42"]


def test_underscore_is_separator():
    assert tokenize("foo_bar") == ["foo", "bar"]


def test_long_word_dropped():
    # reference src/lib.rs:109: words > 250 bytes are skipped
    long = "a" * (MAX_WORD_LENGTH + 1)
    assert tokenize(f"keep {long} also") == ["keep", "also"]
    # position of the word after the dropped one still advances
    toks = tokenize_with_positions(f"keep {long} also")
    assert toks == [("keep", 0), ("also", 2)]


def test_empty_and_separator_only():
    assert tokenize("") == []
    assert tokenize("   ... !!! ") == []
    assert tokenize(None if False else " ") == []


def test_ascii_equiv_regex():
    # on ascii lowercase corpora our tokenizer == regexp [a-z0-9]+ (DuckDB oracle)
    import re

    s = "key agg row scan slow fast table value part hash"
    assert tokenize(s) == re.findall(r"[a-z0-9]+", s)


def test_fast_paths_exactly_match_reference():
    """tokenize_fast / normalize_fast must be byte-identical to the frozen
    reference implementations on adversarial and random inputs."""
    import random
    import string

    from search_engine_spark.analysis import normalize, normalize_fast, tokenize, tokenize_fast

    cases = [
        "", " ", "hello world", "Héllo, WÖRLD!", "ﬁsh", "a.b!c?d",
        "x" * 300, ("word " * 9000) + "tail",  # MAX_POSITION overflow
        "a" * 63, "a" * 62, "é" * 80, "Привет мир 42", "foo_bar .,. baz",
        "\n\n.!?", "mixed ASCII und ünïcode tëxt 123",
    ]
    rng = random.Random(7)
    alphabet = string.ascii_letters + string.digits + " .,!?;:()[]{}|\"…éüñßЖ中"
    for _ in range(200):
        cases.append("".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 400))))
    for s in cases:
        assert normalize_fast(s) == normalize(s), repr(s)
        assert tokenize_fast(s) == tokenize(s), repr(s)


def test_tokenize_arrow_batch_matches_reference():
    import random
    import string

    import numpy as np
    import pyarrow as pa

    from search_engine_spark.analysis import tokenize, tokenize_arrow_batch

    rng = random.Random(11)
    alphabet = string.ascii_letters + string.digits + " .,!?;:()[]{}|\"…éüñЖ中_-"
    cases = ["", " ", None, "...", "Hello, World!", "x" * 300,
             "a" * 251 + " ok", "a" * 250 + " ok", ("w " * 9000) + "end",
             "ünïcode hërе", "foo_bar baz"]
    for _ in range(300):
        cases.append("".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 300))))
    arr = pa.array(cases, type=pa.string())
    flat, doc_idx, counts = tokenize_arrow_batch(arr)
    flat_py = flat.to_pylist()
    for i, s in enumerate(cases):
        want = tokenize(s) if s else []
        got = [flat_py[j] for j in np.flatnonzero(doc_idx == i)]
        assert got == want, (i, repr(s), got, want)
        assert counts[i] == len(want)


def test_tokenize_positions_arrow_batch_matches_reference():
    import random
    import string

    import numpy as np
    import pyarrow as pa

    from search_engine_spark.analysis import (
        tokenize_positions_arrow_batch,
        tokenize_with_positions,
    )

    rng = random.Random(31)
    alphabet = (string.ascii_letters + string.digits
                + " .,!?;:()[]{}|\"…#\n\r-_éüñЖ中" + "  ..")
    cases = ["", " ", None, "...", "Hello, World! Bye.", "a#b", "a # b",
             "a. .b", "x.!y", "a" * 251 + ". ok", ("w. " * 9000) + "end",
             "ünïcode. hërе", "(a)[b]{c}|d\"e\"", "a\nb\rc", "#", "a#"]
    for _ in range(400):
        cases.append("".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 200))))
    arr = pa.array(cases, type=pa.string())
    flat, doc_idx, counts, pos = tokenize_positions_arrow_batch(arr)
    flat_py = flat.to_pylist()
    for i, s in enumerate(cases):
        want = tokenize_with_positions(s) if s else []
        sel = np.flatnonzero(doc_idx == i)
        got = [(flat_py[j], int(pos[j])) for j in sel]
        assert got == want, (i, repr(s), got[:6], want[:6])
        assert counts[i] == len(want)


def test_ascii_byte_tokenize_sliced_and_large_string():
    """The byte kernel must honor Arrow slice offsets and 8-byte
    (large_string) offset buffers — both change buffer interpretation."""
    import numpy as np
    import pyarrow as pa

    from search_engine_spark.analysis import (
        _ascii_byte_tokenize,
        tokenize_with_positions,
    )

    docs = ["pad me out", "Hello. world", "", "end.", "a(b)c"]
    for typ in (pa.string(), pa.large_string()):
        arr = pa.array(docs, type=typ).slice(1, 4)
        flat, doc_idx, counts, pos = _ascii_byte_tokenize(arr, True)
        flat_py = flat.to_pylist()
        for i, s in enumerate(docs[1:]):
            want = tokenize_with_positions(s)
            sel = np.flatnonzero(doc_idx == i)
            got = [(flat_py[j], int(pos[j])) for j in sel]
            assert got == want, (typ, i, got, want)
            assert counts[i] == len(want)

    # all-empty / all-separator slice -> empty result, zero counts
    arr = pa.array(["x", "", "  ", "..."]).slice(1, 3)
    flat, doc_idx, counts, pos = _ascii_byte_tokenize(arr, True)
    assert len(flat) == 0 and counts.tolist() == [0, 0, 0]
