from . import labels, textfns, vectors, timefns  # noqa: F401
