"""Shared scalar/vectorized helpers used across operators."""

from .tokenize import split_tokens, token_set, jaccard, is_token_subset  # noqa: F401
