"""Analyzer spec tests (pinned UAX#29 subset, SURVEY.md §7 risk 2)."""

import pandas as pd

from engine.tokenizer import MAX_TOKEN_LEN, tokenize


def test_basic():
    assert tokenize("The Quick  brown-Fox jumps") == [
        "the", "quick", "brown", "fox", "jumps",
    ]


def test_nfkc_and_case():
    # ﬁ ligature → fi (NFKC); fullwidth ABC → abc
    assert tokenize("ﬁre ＡＢＣ") == ["fire", "abc"]


def test_digits_and_mixed():
    assert tokenize("ipv6 2024-01-01 a1b2") == ["ipv6", "2024", "01", "01", "a1b2"]


def test_underscore_splits():
    assert tokenize("foo_bar") == ["foo", "bar"]


def test_cjk_unigrams():
    assert tokenize("中文abc漢字") == ["中", "文", "abc", "漢", "字"]


def test_max_token_len():
    long_tok = "x" * (MAX_TOKEN_LEN + 1)
    assert tokenize(f"ok {long_tok} fine") == ["ok", "fine"]


def test_empty_and_none():
    assert tokenize("") == []
    assert tokenize("   \t\n ") == []
    assert tokenize(None) == []


def test_matches_whitespace_split_on_clean_corpus():
    # fixture `documents.text` is space-separated lowercase alnum tokens —
    # the analyzer must equal whitespace split there (oracle equivalence)
    texts = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")["text"]
    for t in texts.head(100):
        assert tokenize(t) == t.split()
