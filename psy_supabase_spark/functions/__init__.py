from . import hashing, json_ops, text, vector  # noqa: F401
