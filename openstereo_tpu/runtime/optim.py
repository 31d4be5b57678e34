"""Optimizer / LR-schedule / grad-clip construction from OPTIMIZATION config.

Maps the reference's torch.optim-by-name + scheduler-by-name + warmup + clip
machinery (reference: trainer_template.py:96-109,124-148; stereo/utils/lamb.py;
stereo/utils/warmup.py; stereo/utils/clip_grad.py) onto one optax chain:

    clip → (adamw | adam | sgd | rmsprop | lamb)(schedule)

Schedules are per-iteration functions of the global step with TOTAL_STEPS =
epochs × steps_per_epoch injected, like the reference (trainer_template.py:104).
AMP GradScaler has no TPU equivalent (bf16 needs no loss scaling) and is
intentionally absent.
"""

from __future__ import annotations

import re
from typing import Optional, Tuple

import jax
import optax

from ..config import Config


def build_schedule(opt_cfg: Config, total_steps: int) -> optax.Schedule:
    base_lr = float(opt_cfg.OPTIMIZER.LR)
    sched_cfg = opt_cfg.get("SCHEDULER", None)
    if sched_cfg is None:
        return optax.constant_schedule(base_lr)

    name = sched_cfg.NAME
    if name == "OneCycleLR":
        # torch OneCycleLR (cos strategy) ≈ optax cosine_onecycle_schedule.
        # Clamp pct_start so the warmup phase spans ≥1 step — a zero-width
        # phase makes the schedule divide by zero (NaN LR).
        pct_start = float(sched_cfg.get("PCT_START", 0.3))
        if total_steps > 1:
            pct_start = min(max(pct_start, 1.0 / total_steps), 1.0 - 1.0 / total_steps)
        sched = optax.cosine_onecycle_schedule(
            transition_steps=total_steps,
            peak_value=float(sched_cfg.get("MAX_LR", base_lr)),
            pct_start=pct_start,
            div_factor=float(sched_cfg.get("DIV_FACTOR", 25.0)),
            final_div_factor=float(sched_cfg.get("FINAL_DIV_FACTOR", 1e4)),
        )
    elif name == "MultiStepLR":
        steps_per_epoch = max(1, total_steps // max(1, int(opt_cfg.NUM_EPOCHS)))
        on_epoch = bool(sched_cfg.get("ON_EPOCH", True))
        unit = steps_per_epoch if on_epoch else 1
        gamma = float(sched_cfg.get("GAMMA", 0.1))
        boundaries = {int(m) * unit: gamma for m in sched_cfg.MILESTONES}
        sched = optax.piecewise_constant_schedule(base_lr, boundaries)
    elif name == "CosineAnnealingLR":
        sched = optax.cosine_decay_schedule(base_lr, decay_steps=total_steps)
    elif name == "StepLR":
        steps_per_epoch = max(1, total_steps // max(1, int(opt_cfg.NUM_EPOCHS)))
        size = int(sched_cfg.STEP_SIZE) * steps_per_epoch
        gamma = float(sched_cfg.get("GAMMA", 0.1))
        sched = optax.exponential_decay(base_lr, transition_steps=size,
                                        decay_rate=gamma, staircase=True)
    elif name == "ConstantLR":
        sched = optax.constant_schedule(base_lr)
    else:
        raise ValueError(f"unknown scheduler {name!r}")

    warm_cfg = sched_cfg.get("WARMUP", None) if hasattr(sched_cfg, "get") else None
    if warm_cfg:
        warm_steps = int(warm_cfg.get("WARM_STEPS", 0)) or (
            int(warm_cfg.get("WARM_EPOCHS", 0)) * max(1, total_steps // max(1, int(opt_cfg.NUM_EPOCHS))))
        if warm_steps > 0:
            warmup = optax.linear_schedule(0.0, 1.0, warm_steps)
            base = sched
            sched = lambda step: base(step) * warmup(step)  # noqa: E731
    return sched


def _make_tx(name: str, schedule, wd: float, eps: float,
             ocfg: Config) -> optax.GradientTransformation:
    if name == "adamw":
        return optax.adamw(schedule, weight_decay=wd, eps=eps)
    if name == "adam":
        return optax.adam(schedule, eps=eps)
    if name == "sgd":
        return optax.sgd(schedule, momentum=float(ocfg.get("MOMENTUM", 0.0)))
    if name == "rmsprop":
        return optax.rmsprop(schedule, eps=eps)
    if name == "lamb":
        return optax.lamb(schedule, weight_decay=wd, eps=eps)
    raise ValueError(f"unknown optimizer {ocfg.NAME!r}")


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                    for k in path)


def build_param_groups(opt_cfg: Config, schedule, name: str, wd: float,
                       eps: float) -> Optional[optax.GradientTransformation]:
    """OPTIMIZATION.PARAM_GROUPS → optax.multi_transform, or None.

    The reference builds its optimizers with per-group lr/weight-decay by
    iterating named_modules and bucketing params with substring rules
    (reference stereo/modeling/models/nmrf/build_optimizer.py:10-70:
    backbone lr×0.1 + wd 1e-5, MSDA sampling_offsets lr×0.1, rpe/norm
    tables wd 0).  Here the rules live in config as ordered
    ``{MATCH, LR_SCALE, WEIGHT_DECAY}`` entries: MATCH is a regex searched
    against the '/'-joined flax param path, FIRST matching rule wins, and
    unmatched params get the base (lr×1, WEIGHT_DECAY from OPTIMIZER).
    Implemented as one optax.multi_transform whose label tree is computed
    from the param paths at init — jit-compatible, no Python in the step.
    """
    rules = opt_cfg.OPTIMIZER.get("PARAM_GROUPS", None)
    if not rules:
        return None

    ocfg = opt_cfg.OPTIMIZER
    transforms = {"default": _make_tx(name, schedule, wd, eps, ocfg)}
    pats = []
    for i, rule in enumerate(rules):
        scale = float(rule.get("LR_SCALE", 1.0) or 1.0)
        gwd = rule.get("WEIGHT_DECAY", None)
        gwd = wd if gwd is None else float(gwd)
        if gwd != wd and name not in ("adamw", "lamb"):
            raise ValueError(
                f"PARAM_GROUPS[{i}].WEIGHT_DECAY needs a decoupled-decay "
                f"optimizer (adamw/lamb), got {name!r}")
        sched_g = schedule if scale == 1.0 else (
            lambda step, _s=scale: schedule(step) * _s)
        transforms[f"g{i}"] = _make_tx(name, sched_g, gwd, eps, ocfg)
        pats.append(re.compile(str(rule["MATCH"])))

    def label_params(params):
        def one(path, _):
            p = _path_str(path)
            for i, pat in enumerate(pats):
                if pat.search(p):
                    return f"g{i}"
            return "default"
        return jax.tree_util.tree_map_with_path(one, params)

    return optax.multi_transform(transforms, label_params)


def build_optimizer(opt_cfg: Config, total_steps: int) -> Tuple[optax.GradientTransformation, optax.Schedule]:
    """OPTIMIZATION section → (optax tx, lr schedule)."""
    schedule = build_schedule(opt_cfg, total_steps)
    ocfg = opt_cfg.OPTIMIZER
    name = ocfg.NAME.lower()
    wd = float(ocfg.get("WEIGHT_DECAY", 0.0))
    eps = float(ocfg.get("EPS", 1e-8))

    tx = build_param_groups(opt_cfg, schedule, name, wd, eps)
    if tx is None:
        tx = _make_tx(name, schedule, wd, eps, ocfg)

    clip_cfg: Optional[Config] = opt_cfg.get("CLIP_GRAD", None)
    if clip_cfg:
        ctype = clip_cfg.get("TYPE", "norm")
        if ctype == "value":
            clip = optax.clip(float(clip_cfg.CLIP_VALUE))
        elif ctype == "norm":
            clip = optax.clip_by_global_norm(float(clip_cfg.MAX_NORM))
        else:
            raise ValueError(ctype)
        tx = optax.chain(clip, tx)
    return tx, schedule
