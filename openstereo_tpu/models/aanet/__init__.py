from .aanet import AANet  # noqa: F401
