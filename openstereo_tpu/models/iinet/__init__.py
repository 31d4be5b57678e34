from .iinet import IINet  # noqa: F401
