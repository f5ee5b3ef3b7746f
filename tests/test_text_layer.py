"""Golden-parity tests for the deterministic text layer.

Goldens are the reference's own unit-test expectations
(/root/reference/tests/test_general.py, mirrored in FIXTURES.md §4) — the
reference itself cannot be imported here (its package init pulls TF and
S3-hosted weights), so expectations are pinned verbatim.
"""
import pytest

from vnlp_spark.functions.deasciifier import py_deasciify
from vnlp_spark.functions.normalizer import (
    py_remove_accent_marks,
    py_remove_punctuations,
    py_turkish_lower,
)
from vnlp_spark.functions.numbers import py_convert_numbers_to_words
from vnlp_spark.functions.sentence_splitter import py_split_sentences
from vnlp_spark.functions.tokenizer import py_treebank_tokenize, py_word_punct_tokenize
from vnlp_spark.operators.stopwords import (
    py_drop_stop_words,
    py_dynamically_detect_stop_words,
)


# --- normalizer (test_general.py:173-218) --------------------------------

def test_lower_case():
    assert py_turkish_lower("Test karakterleri: İIĞÜÖŞÇ") == "test karakterleri: iığüöşç"


def test_remove_punctuations():
    assert py_remove_punctuations("noktalamalı test cümlesidir...") == "noktalamalı test cümlesidir"


def test_remove_accent_marks():
    assert py_remove_accent_marks("merhâbâ gûzel yîlkî atî") == "merhaba guzel yılkı atı"


def test_deasciify():
    assert py_deasciify("boyle sey gormedim duymadim".split()) == ["böyle", "şey", "görmedim", "duymadım"]
    assert py_deasciify(["yatirdim"]) == ["yatırdım"]
    assert py_deasciify("dusunuyorum da boyle sey gormedim duymadim".split()) == [
        "düşünüyorum", "da", "böyle", "şey", "görmedim", "duymadım",
    ]


def test_convert_numbers_to_words():
    inp = "sabah 2 yumurta yedim ve tartıldığımda 1,15 kilogram aldığımı gördüm".split()
    out = "sabah iki yumurta yedim ve tartıldığımda bir virgül on beş kilogram aldığımı gördüm".split()
    assert py_convert_numbers_to_words(inp) == out


def test_convert_numbers_scale_words():
    assert py_convert_numbers_to_words(["1000"]) == ["bin"]
    assert py_convert_numbers_to_words(["1010"]) == ["bin", "on"]
    # reference quirk (normalizer.py:355-360): for numbers > 1999 the scale
    # word of an all-zero group still prints — 2000000 reads "iki milyon bin"
    assert py_convert_numbers_to_words(["2000000"]) == ["iki", "milyon", "bin"]
    assert py_convert_numbers_to_words(["0"]) == ["sıfır"]


# --- sentence splitter (docstring golden, sentence_splitter.py:200-203) ---

def test_split_sentences_golden():
    text = (
        'Av. Meryem Beşer, 3.5 yıldır süren dava ile ilgili dedi ki, '
        '"Duruşma bitti, dava lehimize sonuçlandı." Bu harika bir haber.'
    )
    assert py_split_sentences(text) == [
        'Av. Meryem Beşer, 3.5 yıldır süren dava ile ilgili dedi ki, '
        '"Duruşma bitti, dava lehimize sonuçlandı."',
        "Bu harika bir haber.",
    ]


def test_split_sentences_rules():
    assert py_split_sentences("Geldi mi? Evet geldi.") == ["Geldi mi?", "Evet geldi."]
    assert py_split_sentences("Bekledik... Sonra gittik.") == ["Bekledik...", "Sonra gittik."]
    assert py_split_sentences("Dr. Ahmet geldi.") == ["Dr. Ahmet geldi."]
    assert py_split_sentences("") == []
    assert py_split_sentences("Tek cümle") == ["Tek cümle"]


# --- tokenizers -----------------------------------------------------------

def test_treebank_tokenize():
    assert py_treebank_tokenize("Üniversite sınavlarına canla başla çalışıyorlardı.") == [
        "Üniversite", "sınavlarına", "canla", "başla", "çalışıyorlardı", ".",
    ]
    assert py_treebank_tokenize('O, "gel" dedi.') == ["O", ",", '"', "gel", '"', "dedi", "."]


def test_word_punct_tokenize():
    assert py_word_punct_tokenize("İstanbul'da ikamet ediyorum.") == [
        "İstanbul", "'", "da", "ikamet", "ediyorum", ".",
    ]


# --- stopwords (test_general.py:225-247) ----------------------------------

def test_static_stopword_drop():
    inp = "acaba bugün kahvaltıda kahve yerine çay mı içsem ya da neyse süt içeyim".split()
    assert py_drop_stop_words(inp) == "bugün kahvaltıda kahve çay içsem süt içeyim".split()


def test_dynamic_stop_words_set_equality():
    inp = (
        "ben bugün gidip aşı olacağım sonra da eve gelip telefon açacağım "
        "aşı nasıl etkiledi eve gelip anlatırım aşı olmak bu dönemde çok "
        "ama ama ama ama çok önemli"
    ).split()
    detected = py_dynamically_detect_stop_words(inp)
    assert set(detected) == {"ama", "aşı", "çok", "eve", "gelip"}


def test_drop_after_add():
    inp = "aşı olmak önemli demiş miydim".split()
    extra = py_dynamically_detect_stop_words(
        (
            "ben bugün gidip aşı olacağım sonra da eve gelip telefon açacağım "
            "aşı nasıl etkiledi eve gelip anlatırım aşı olmak bu dönemde çok "
            "ama ama ama ama çok önemli"
        ).split()
    )
    assert py_drop_stop_words(inp, extra=extra) == "önemli demiş miydim".split()


def test_dynamic_stop_words_min_unique():
    with pytest.raises(ValueError):
        py_dynamically_detect_stop_words(["a", "a", "b"])
