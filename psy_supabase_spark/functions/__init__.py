from . import bpe, charset, hashing, json_ops, ner, pii, quality, response_clean, text, url, vector  # noqa: F401
