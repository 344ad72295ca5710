from . import bpe, hashing, json_ops, ner, pii, quality, response_clean, text, url, vector  # noqa: F401
