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
