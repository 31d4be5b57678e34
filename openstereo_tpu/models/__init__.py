"""Model zoo registry (reference: stereo/modeling/__init__.py:17-36).

Every model is a flax.linen Module obeying the contract
(reference docs/4.how_to_create_your_model.md):
  __call__(data: dict, train: bool) -> {'disp_pred': [B,H,W], ...aux}
  get_loss(pred, data) -> (scalar loss, info dict)
"""

from ..config import Config, get_valid_kwargs
from ..registry import MODELS
from .lightstereo import LightStereo  # noqa: F401
from .psmnet import PSMNet  # noqa: F401
from .gwcnet import GwcNet  # noqa: F401
from .igev import IGEV  # noqa: F401
from .sttr import STTR  # noqa: F401
from .coex import CoExNet  # noqa: F401
from .msnet import MSNet2D, MSNet3D  # noqa: F401
from .fadnet import FADNet  # noqa: F401
from .casnet import CasPSMNet, CasGwcNet  # noqa: F401
from .cfnet import CFNet  # noqa: F401
from .aanet import AANet  # noqa: F401
from .stereobase import StereoBase  # noqa: F401
from .igev_rt import IGEVRT  # noqa: F401
from .igevpp import IGEVPP  # noqa: F401
from .foundationstereo import FoundationStereo  # noqa: F401
from .monster import MonSter  # noqa: F401
from .fastfoundationstereo import FastFoundationStereo  # noqa: F401
from .nmrf import NMRF  # noqa: F401
from .iinet import IINet  # noqa: F401


def build_model(model_cfg: Config, dtype=None):
    """Instantiate a model from a MODEL config section.

    UPPER_CASE YAML keys map onto lower_case flax dataclass fields; unknown
    keys are dropped (the reference's signature-introspection behaviour,
    common_utils.py:50-71). Lists become tuples so module fields are hashable.
    """
    cls = MODELS.get(model_cfg.NAME)
    field_names = set(getattr(cls, "__dataclass_fields__", {})) or set(
        get_valid_kwargs(cls.__init__, model_cfg))
    kwargs = {}
    for k, v in model_cfg.items():
        lk = k.lower()
        if lk in field_names and lk != "name":
            kwargs[lk] = tuple(v) if isinstance(v, list) else v
    if dtype is not None and "dtype" in field_names:
        kwargs["dtype"] = dtype
    return cls(**kwargs)
