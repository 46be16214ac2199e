from .reader import InputReader  # noqa: F401
