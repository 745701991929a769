from . import silver, gold, relational, dedup, similarity, text, multimodal  # noqa: F401
