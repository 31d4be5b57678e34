from .nmrf import NMRF  # noqa: F401
