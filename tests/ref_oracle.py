"""Load reference (torch) model classes as numerical oracles for parity tests.

The upstream reference at /root/reference is importable only in pieces (its
package __init__ chains pull in timm/torchvision, which aren't in this
image), so model files are loaded directly by path with synthetic parent
packages.  Used only by tests, and only when the reference checkout exists.
"""

import importlib.util
import os
import sys
import types

REF = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REF, "stereo"))


class NS(dict):
    """Minimal EasyDict: attribute access over a plain dict."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k)


def _make_pkg(name: str, path: str):
    if name in sys.modules:
        return
    m = types.ModuleType(name)
    m.__path__ = [path]
    m.__package__ = name
    sys.modules[name] = m


def load_ref_module(dotted: str):
    """Load e.g. 'stereo.modeling.models.psmnet.psmnet' without running any
    package __init__ along the way (they import unavailable deps)."""
    parts = dotted.split(".")
    for i in range(1, len(parts)):
        pkg = ".".join(parts[:i])
        _make_pkg(pkg, os.path.join(REF, *parts[:i]))
    name = dotted
    if name in sys.modules:
        return sys.modules[name]
    path = os.path.join(REF, *parts) + ".py"
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod
