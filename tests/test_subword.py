"""S4: SentencePiece unigram encoding over the reference's own vendored
16k model — protobuf parse, Viterbi encode, T4 pre-pad, Spark UDF."""
import pyspark.sql.functions as F
import pytest

from vnlp_spark.operators.subword import (
    SpmUnigramEncoder,
    make_spm_ids_udf,
    parse_spm_model,
    spm_tokenize_tokens,
    tokenize_single_word_spm,
)


@pytest.fixture(scope="module")
def enc():
    return SpmUnigramEncoder.from_model_file()


def test_model_parses(enc):
    pieces = parse_spm_model()
    assert len(pieces) == 16000
    # control/unk layout of the reference model
    assert pieces[0][0] == "<PAD>" and pieces[1][0] == "<UNK>"
    assert enc.unk_id == 1 and enc.vocab_size == 16000


def test_encode_roundtrip(enc):
    for w in ["İstanbul", "İstanbul'da", "çalışıyorum", "üniversite", "Melikşah"]:
        pieces = enc.encode_as_pieces(w)
        assert "".join(pieces) == enc.normalize(w)
        ids = enc.encode_as_ids(w)
        assert len(ids) == len(pieces)
        assert all(0 < i < 16000 for i in ids)


def test_frequent_words_are_single_pieces(enc):
    # the model was trained on Turkish: frequent words collapse to 1 piece
    assert len(enc.encode_as_ids("İstanbul")) == 1
    assert len(enc.encode_as_ids("üniversite")) == 1


def test_unknown_chars_fall_back_to_unk(enc):
    ids = enc.encode_as_ids("€𝄞")
    assert enc.unk_id in ids


def test_viterbi_beats_greedy(enc):
    # Viterbi must pick the max-score segmentation, not greedy-longest:
    # every alternative split of the chosen pieces scores no higher
    for w in ["çalışıyorlardı", "arkadaşlarımızı", "zenginleştirir"]:
        pieces = enc.encode_as_pieces(w)
        score = sum(enc.vocab[p][1] for p in pieces if p in enc.vocab)
        # char-by-char segmentation is a valid competitor
        chars = list(enc.normalize(w))
        if all(c in enc.vocab for c in chars):
            char_score = sum(enc.vocab[c][1] for c in chars)
            assert score >= char_score


def test_t4_pre_pad_contract(enc):
    out = tokenize_single_word_spm("İstanbul", enc)
    assert len(out) == 8 and out[:7] == [0] * 7 and out[7] == enc.encode_as_ids("İstanbul")[0]
    # truncating='pre': keep the LAST 8 pieces of a long word
    long_ids = enc.encode_as_ids("xqzwj123kprt456")
    assert len(long_ids) > 8
    assert tokenize_single_word_spm("xqzwj123kprt456", enc) == long_ids[-8:]
    assert tokenize_single_word_spm("", enc) == [0] * 8


def test_spm_tokenize_tokens_shapes(enc):
    rows = spm_tokenize_tokens(["İstanbul'da", "yaşıyorum", "."], enc)
    assert len(rows) == 3 and all(len(r) == 8 for r in rows)


def test_spm_udf(spark, enc):
    df = spark.createDataFrame(
        [(0, ["İstanbul'da", "yaşıyorum", "."]), (1, ["Ankara", "güzel"]), (2, None)],
        ["i", "tokens"],
    )
    udf = make_spm_ids_udf(spark)
    rows = {r["i"]: r["ids"] for r in df.select("i", udf("tokens").alias("ids")).collect()}
    assert rows[2] is None
    assert [list(x) for x in rows[1]] == spm_tokenize_tokens(["Ankara", "güzel"], enc)
    assert all(len(x) == 8 for x in rows[0])


def test_context_windows_consume_spm_ids(enc):
    from vnlp_spark.operators.model_harness import process_word_context

    token_ids = spm_tokenize_tokens(["Ahmet", "dün", "İstanbul'da", "açtı", "."], enc)
    mat = process_word_context(2, token_ids)
    assert mat.shape == (81, 8)  # 40 left + current + 40 right


def test_keras_vocab_resources():
    """S3: the reference's Keras tokenizer vocabularies, vendored as data."""
    from vnlp_spark import resources

    ner = resources.keras_vocab("ner_label")["word_index"]
    assert ner == {"O": 1, "ORG": 2, "PER": 3, "LOC": 4}
    assert resources.label_list("ner_label", pad="O") == ["O", "O", "ORG", "PER", "LOC"]
    pos = resources.label_list("pos_label", pad="X")
    assert pos[1:4] == ["NOUN", "PUNCT", "VERB"] and len(pos) == 18
    dp = resources.keras_vocab("dp_label")["word_index"]
    assert dp["punct"] == 1 and dp["root"] == 2
    tb = resources.keras_vocab("tb_word")["word_index"]
    assert len(tb) > 60000


def test_charner_char_ids_real_vocab():
    from vnlp_spark.operators.charner import charner_char_ids

    ids = charner_char_ids("ali İstanbul'da 𝄞")
    assert len(ids) == len("ali İstanbul'da 𝄞")
    from vnlp_spark import resources

    vocab = resources.keras_vocab("charner_char")
    oov = vocab["word_index"][vocab["oov_token"]]
    assert ids[-1] == oov            # exotic char -> OOV
    assert all(0 < i < (vocab["num_words"] or 99999) for i in ids)
