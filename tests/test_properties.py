"""Property-based tests (hypothesis) for the deterministic text layer —
inputs the reference's golden fixtures never cover."""
import hypothesis.strategies as st
from hypothesis import given, settings

from vnlp_spark.functions.deasciifier import py_deasciify_token
from vnlp_spark.functions.normalizer import (
    py_remove_accent_marks,
    py_remove_punctuations,
    py_turkish_lower,
)
from vnlp_spark.functions.numbers import py_convert_numbers_to_words
from vnlp_spark.functions.sentence_splitter import py_split_sentences
from vnlp_spark.functions.tokenizer import py_treebank_tokenize, py_word_punct_tokenize
from vnlp_spark.operators.morphology import py_analyze_tokens

turkish_text = st.text(
    alphabet="abcçdefgğhıijklmnoöprsştuüvyzABCÇDEFGĞHIİJKLMNOÖPRSŞTUÜVYZ .,!?'\"0123456789",
    max_size=200,
)


@given(turkish_text)
@settings(max_examples=200, deadline=None)
def test_split_sentences_preserves_nonspace_chars(text):
    # splitting only rewrites whitespace: the multiset of non-space
    # characters survives
    out = " ".join(py_split_sentences(text))
    assert sorted(out.replace(" ", "")) == sorted(text.replace(" ", "").replace("\n", ""))


@given(turkish_text)
@settings(max_examples=200, deadline=None)
def test_tokenizers_never_crash_and_cover_text(text):
    for tok in (py_treebank_tokenize, py_word_punct_tokenize):
        toks = tok(text)
        assert all(isinstance(t, str) and t for t in toks)


@given(turkish_text)
@settings(max_examples=100, deadline=None)
def test_lower_idempotent(text):
    once = py_turkish_lower(text)
    assert py_turkish_lower(once) == once


@given(turkish_text)
@settings(max_examples=100, deadline=None)
def test_remove_punct_idempotent_and_clean(text):
    out = py_remove_punctuations(text)
    assert py_remove_punctuations(out) == out
    assert all(c.isalnum() or c == " " for c in out)


@given(turkish_text)
@settings(max_examples=100, deadline=None)
def test_accent_removal_leaves_no_accents(text):
    out = py_remove_accent_marks(text)
    assert not set(out) & set("âôîêûÂÔÎÊÛ")


@given(st.text(alphabet="abcçdefgğhıijklmnoöprsştuüvyz", min_size=1, max_size=20))
@settings(max_examples=100, deadline=None)
def test_deasciify_total_and_length_preserving(token):
    out = py_deasciify_token(token)
    assert len(out) == len(token)


@given(st.lists(st.text(alphabet="0123456789,.", min_size=1, max_size=12), max_size=6))
@settings(max_examples=150, deadline=None)
def test_numbers_to_words_total(tokens):
    out = py_convert_numbers_to_words(tokens)
    assert isinstance(out, list)
    assert all(isinstance(t, str) for t in out)


@given(st.lists(st.text(alphabet="abcçdefgğhıijklmnoöprsştuüvyzABCÇDEFGĞHIİ'", min_size=1, max_size=15), min_size=1, max_size=10))
@settings(max_examples=100, deadline=None)
def test_morphology_total_one_analysis_per_token(tokens):
    out = py_analyze_tokens(tokens)
    assert len(out) == len(tokens)
    assert all("+" in a for a in out)
