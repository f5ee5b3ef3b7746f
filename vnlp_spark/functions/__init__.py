from . import normalizer, numbers, tokenizer, sentence_splitter, deasciifier, text_stats  # noqa: F401
