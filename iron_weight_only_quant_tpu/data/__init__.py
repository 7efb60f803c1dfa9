"""Dataset loaders (wikitext2 / ptb / c4, local-first) + synthetic fallback."""

from .loaders import CalibSample, TokenizedText, get_loaders

__all__ = ["CalibSample", "TokenizedText", "get_loaders"]
