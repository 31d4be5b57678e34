from .casnet import CasPSMNet, CasGwcNet  # noqa: F401
