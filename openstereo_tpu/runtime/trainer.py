"""Trainer runtime — the TPU-native counterpart of the reference's
TrainerTemplate (reference: stereo/modeling/trainer_template.py:20-330).

Design deltas from the reference, driven by the XLA compilation model:

- ONE jitted `train_step(state, batch) -> (state, metrics)` replaces the
  autocast/GradScaler/backward/unscale/clip/step/scheduler sequence
  (trainer_template.py:199-220): bf16 compute needs no loss scaling, the clip
  and schedule live inside the optax chain, and the DDP gradient all-reduce is
  inserted by XLA because the batch is sharded over the mesh 'data' axis while
  params are replicated.
- SyncBN (trainer_template.py:76-78) is implicit: BN batch statistics are
  global-batch reductions under jit.
- Distributed eval keeps the reference's exact semantics
  (trainer_template.py:300-317): per-image metrics + dataset indices are
  gathered across processes and deduplicated by index to undo sampler padding.
- Checkpoints are orbax-managed pytrees {params, batch_stats, opt_state, step}
  with the reference's rotation window (MAX_CKPT_SAVE_NUM) and epoch-granular
  resume (trainer_template.py:111-122,169-180).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data import StereoDataLoader
from ..evaluation import compute_metrics
from ..models import build_model
from ..models.losses import disp_valid_mask
from ..parallel import make_mesh, shard_batch, replicate
from ..utils import create_logger
from .optim import build_optimizer
from .train_state import TrainState


def _remat_policy(spec, logger):
    """Resolve OPTIMIZATION.REMAT to a jax.checkpoint policy.

    Accepts true/'full' (save nothing — maximum memory saving), or the name
    of any `jax.checkpoint_policies` member ('dots_saveable' keeps MXU
    outputs and recomputes the cheap elementwise/norm chains — usually the
    right trade for the 3D-conv models). None/false disables remat.
    """
    if not spec:
        return None
    if spec is True or str(spec).lower() == "full":
        logger.info("activation checkpointing enabled: full")
        return jax.checkpoint_policies.nothing_saveable
    name = str(spec)
    policy = getattr(jax.checkpoint_policies, name, None)
    if policy is None:
        raise ValueError(
            f"unknown OPTIMIZATION.REMAT policy {name!r}; use true/'full' or "
            "a jax.checkpoint_policies name like 'dots_saveable'")
    logger.info(f"activation checkpointing enabled: {name}")
    return policy


def input_hw(data_cfg: Config, mode: str):
    """Static input shape from the transform pipeline's SIZE (crop or pad)."""
    for t in data_cfg.DATA_TRANSFORM[mode.upper()]:
        if "SIZE" in t:
            return tuple(int(x) for x in t["SIZE"])
    raise ValueError(f"no SIZE-bearing transform for mode {mode}")


class Trainer:
    def __init__(
        self,
        cfg: Config,
        run_dir: str,
        run_mode: str = "train",
        mesh=None,
        seed: int = 3407,
        num_workers: int = 2,
        worker_type: str = "thread",
        logger=None,
    ):
        self.cfg = cfg
        self.run_dir = run_dir
        os.makedirs(run_dir, exist_ok=True)
        self.mesh = mesh if mesh is not None else make_mesh(model=1)
        self.process_index = jax.process_index()
        self.process_count = jax.process_count()
        self.logger = logger or create_logger(
            os.path.join(run_dir, "log.txt"), process_index=self.process_index)
        self.seed = seed

        opt = cfg.OPTIMIZATION
        self.use_bf16 = bool(opt.get("AMP", False))
        self.freeze_bn = bool(opt.get("FREEZE_BN", False))
        dtype = jnp.bfloat16 if self.use_bf16 else jnp.float32
        self.model = build_model(cfg.MODEL, dtype=dtype)
        self.max_disp = cfg.EVALUATOR.get("MAX_DISP", cfg.MODEL.get("MAX_DISP", 192))
        self.metric_names = tuple(cfg.EVALUATOR.get("METRIC", ["epe", "d1_all"]))

        # loaders
        global_bs = int(opt.BATCH_SIZE_PER_GPU) * self.mesh.shape["data"]
        eval_bs = int(cfg.EVALUATOR.get("BATCH_SIZE_PER_GPU", opt.BATCH_SIZE_PER_GPU)) \
            * self.mesh.shape["data"]
        self.train_loader = None
        if run_mode == "train":
            self.train_loader = StereoDataLoader(
                cfg.DATA_CONFIG, global_bs, mode="training", seed=seed,
                process_index=self.process_index, process_count=self.process_count,
                num_workers=num_workers, worker_type=worker_type)
        self.eval_loader = StereoDataLoader(
            cfg.DATA_CONFIG, eval_bs, mode="evaluating", seed=seed,
            process_index=self.process_index, process_count=self.process_count,
            num_workers=num_workers, worker_type=worker_type)

        self.num_epochs = int(opt.NUM_EPOCHS)
        steps_per_epoch = self.train_loader.steps_per_epoch if self.train_loader else 1
        total_steps = max(1, self.num_epochs * steps_per_epoch)
        self.tx, self.lr_schedule = build_optimizer(opt, total_steps)

        self.state = self._init_state()
        self.start_epoch = 0

        # reference MODEL.PRETRAINED_MODEL: shape-checked partial weight load
        # (trainer_template.py:86-94); accepts converted .msgpack or raw
        # reference .pth (auto-converted by model name)
        pretrained = cfg.MODEL.get("PRETRAINED_MODEL", "")
        if pretrained:
            from .pretrained import load_variables

            self.load_pretrained(
                load_variables(pretrained, cfg.MODEL.get("NAME")))

        # checkpointing
        import orbax.checkpoint as ocp

        self.ckpt_dir = os.path.join(os.path.abspath(run_dir), "ckpt")
        self.ckpt_mgr = ocp.CheckpointManager(
            self.ckpt_dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=int(cfg.get("TRAINER", {}).get("MAX_CKPT_SAVE_NUM", 30)),
                create=True,
            ),
        )

        self._train_step = self._build_train_step()
        self._eval_step = self._build_eval_step()
        self.metrics_file = os.path.join(run_dir, "metrics.jsonl")

        # TensorBoard scalars + disparity visualisations
        # (reference trainer_template.py:239-245,293-298; common_utils.py:183-220)
        self.tb = None
        if self.process_index == 0:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self.tb = SummaryWriter(os.path.join(run_dir, "tensorboard"))
            except Exception:
                self.logger.warning("tensorboard unavailable; JSONL metrics only")

    def backup_source(self):
        """Copy the framework source into the run dir
        (reference common_utils.py:74-83)."""
        import shutil

        dst = os.path.join(self.run_dir, "source_backup")
        if self.process_index != 0 or os.path.exists(dst):
            return
        pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        shutil.copytree(pkg_root, os.path.join(dst, "openstereo_tpu"),
                        ignore=shutil.ignore_patterns("__pycache__"))

    # ------------------------------------------------------------- state init
    def _dummy_batch(self, mode: str) -> Dict[str, jnp.ndarray]:
        h, w = input_hw(self.cfg.DATA_CONFIG, mode)
        return {
            "left": jnp.zeros((1, h, w, 3), jnp.float32),
            "right": jnp.zeros((1, h, w, 3), jnp.float32),
            "disp": jnp.zeros((1, h, w), jnp.float32),
        }

    def _init_state(self) -> TrainState:
        rng = jax.random.key(self.seed)
        mode = "training" if self.train_loader else "evaluating"
        # init with train=True so parameters used only by training-time heads
        # (e.g. GwcNet's classif0-2) are created too
        is_train = self.train_loader is not None
        variables = jax.jit(
            lambda r, b: self.model.init(r, b, train=is_train)
        )(rng, self._dummy_batch(mode))
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
        self.logger.info(f"model {self.cfg.MODEL.NAME}: {n_params/1e6:.2f}M params")
        state = TrainState.create(
            apply_fn=self.model.apply, params=params, batch_stats=batch_stats,
            tx=self.tx)
        return replicate(state, self.mesh)

    # ------------------------------------------------------------- steps
    def _build_train_step(self):
        model = self.model
        freeze_bn = self.freeze_bn
        remat_policy = _remat_policy(
            self.cfg.OPTIMIZATION.get("REMAT", None), self.logger)

        def train_step(state: TrainState, batch):
            def forward(params, batch):
                # FREEZE_BN (reference common_utils.py:114-139): calling apply
                # without a mutable 'batch_stats' collection makes every
                # BatchNorm use its running averages (see models/layers.py)
                out, mutated = state.apply_fn(
                    {"params": params, "batch_stats": state.batch_stats},
                    batch, train=True,
                    mutable=[] if freeze_bn else ["batch_stats"])
                loss, info = model.get_loss(out, batch)
                new_bs = state.batch_stats if freeze_bn else mutated["batch_stats"]
                return loss, (info, new_bs)

            if remat_policy is not None:
                # OPTIMIZATION.REMAT: rematerialize activations in the
                # backward pass under the named XLA saveable-policy — the
                # memory/compute trade the reference makes ad hoc with
                # torch.utils.checkpoint (SURVEY.md §2.12), exposed as one
                # config knob for the 3D-conv family's large cost volumes.
                forward = jax.checkpoint(forward, policy=remat_policy)

            def loss_fn(params):
                return forward(params, batch)

            (loss, (info, new_bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            new_state = state.apply_gradients(grads, new_bs)
            metrics = {"loss": loss, **info}
            return new_state, metrics

        return jax.jit(train_step, donate_argnums=(0,))

    def _build_eval_step(self):
        metric_names = self.metric_names
        max_disp = float(self.max_disp)
        # reference trainer_template.py:277-278 — occluded pixels are only
        # excluded when the evaluator opts in (Middlebury/ETH3D eval cfgs).
        apply_occ = bool(self.cfg.EVALUATOR.get("APPLY_OCC_MASK", False))

        def eval_step(state: TrainState, batch):
            out = state.apply_fn(
                {"params": state.params, "batch_stats": state.batch_stats},
                batch, train=False)
            disp_pred = out["disp_pred"]
            gt = batch["disp"]
            mask = disp_valid_mask(gt, max_disp)
            if apply_occ and "occ_mask" in batch:
                mask = mask & (batch["occ_mask"] < 0.5)
            return compute_metrics(disp_pred, gt, mask, metric_names), disp_pred

        return jax.jit(eval_step)

    # ------------------------------------------------------------- loops
    def train_one_epoch(self, epoch: int):
        assert self.train_loader is not None
        t_data = t_step = 0.0
        n = 0
        trainer_cfg = self.cfg.get("TRAINER", {})
        log_int = int(trainer_cfg.get("LOGGER_ITER_INTERVAL", 10))
        # TRAIN_VISUALIZATION (reference trainer_template.py:239-245): log a
        # colormapped gt/pred/error triptych for the first logged iteration of
        # each epoch. Runs the (already-jitted) eval forward on the train
        # batch — one extra forward per epoch, not per log interval.
        visualize = bool(trainer_cfg.get("TRAIN_VISUALIZATION", False)) \
            and self.tb is not None
        last_metrics = {}
        t0 = time.perf_counter()
        for i, batch in enumerate(self.train_loader.epoch(epoch)):
            batch = shard_batch(batch, self.mesh)
            t1 = time.perf_counter()
            # ambient mesh enables in-model sharding constraints
            # (parallel/sharding.py: disparity-dim TP over the 'model' axis)
            with jax.set_mesh(self.mesh):
                self.state, metrics = self._train_step(self.state, batch)
            if i % log_int == 0:
                metrics = jax.device_get(metrics)
                last_metrics = {k: float(v) for k, v in metrics.items()}
                t2 = time.perf_counter()
                step = int(jax.device_get(self.state.step))
                lr = float(self.lr_schedule(step))
                self.logger.info(
                    f"epoch {epoch} iter {i}/{self.train_loader.steps_per_epoch} "
                    f"loss {last_metrics.get('loss', 0):.4f} lr {lr:.2e} "
                    f"data {1e3*(t1-t0):.0f}ms step {1e3*(t2-t1):.0f}ms")
                self._log_jsonl({"phase": "train", "epoch": epoch, "iter": i,
                                 "lr": lr, **last_metrics})
                if visualize and i == 0 and self.process_index == 0:
                    with jax.set_mesh(self.mesh):
                        _, disp_pred = self._eval_step(self.state, batch)
                    self.log_visualization(
                        jax.device_get(disp_pred)[0],
                        np.asarray(jax.device_get(batch["disp"]))[0],
                        epoch, tag="train")
            t_data += t1 - t0
            n += 1
            t0 = time.perf_counter()
            t_step += t0 - t1
        return last_metrics

    def evaluate(self, epoch: int) -> Dict[str, float]:
        indices, values = [], {m: [] for m in self.metric_names}
        visualize = bool(self.cfg.get("TRAINER", {}).get("EVAL_VISUALIZATION", False))
        for bi, batch in enumerate(self.eval_loader.epoch(0)):
            idx = np.asarray(batch["index"])
            with jax.set_mesh(self.mesh):
                metrics, disp_pred = self._eval_step(
                    self.state, shard_batch(batch, self.mesh))
            metrics = jax.device_get(metrics)
            if visualize and bi == 0:  # first batch's first image per epoch
                self.log_visualization(jax.device_get(disp_pred)[0],
                                       batch["disp"][0], epoch)
            indices.append(idx)
            for m in self.metric_names:
                values[m].append(np.asarray(metrics[m]))
        if not indices:
            return {}
        idx = np.concatenate(indices)
        vals = {m: np.concatenate(v) for m, v in values.items()}
        if self.process_count > 1:  # cross-host gather (trainer_template.py:300-310)
            from jax.experimental import multihost_utils

            idx = np.asarray(multihost_utils.process_allgather(idx)).reshape(-1)
            vals = {m: np.asarray(multihost_utils.process_allgather(v)).reshape(-1)
                    for m, v in vals.items()}
        # dedup padded duplicates by dataset index (trainer_template.py:311-317)
        _, keep = np.unique(idx, return_index=True)
        results = {m: float(v[keep].mean()) for m, v in vals.items()}
        self.logger.info(f"eval epoch {epoch}: " +
                         " ".join(f"{m} {v:.4f}" for m, v in results.items()))
        self._log_jsonl({"phase": "eval", "epoch": epoch, **results})
        return results

    def train(self):
        ckpt_int = int(self.cfg.get("TRAINER", {}).get("CKPT_SAVE_INTERVAL", 1))
        eval_int = int(self.cfg.get("TRAINER", {}).get("EVAL_INTERVAL", 1))
        for epoch in range(self.start_epoch, self.num_epochs):
            self.train_one_epoch(epoch)
            if (epoch + 1) % ckpt_int == 0:
                self.save_ckpt(epoch)
            if (epoch + 1) % eval_int == 0:
                self.evaluate(epoch)
        self.ckpt_mgr.wait_until_finished()

    # ------------------------------------------------------------- ckpt
    def save_ckpt(self, epoch: int):
        import orbax.checkpoint as ocp

        payload = {
            "params": self.state.params,
            "batch_stats": self.state.batch_stats,
            "opt_state": self.state.opt_state,
            "step": self.state.step,
        }
        self.ckpt_mgr.save(epoch, args=ocp.args.StandardSave(payload))

    def resume_ckpt(self, epoch: Optional[int] = None) -> int:
        import orbax.checkpoint as ocp

        epoch = self.ckpt_mgr.latest_step() if epoch is None else epoch
        if epoch is None:
            return 0
        target = {
            "params": self.state.params,
            "batch_stats": self.state.batch_stats,
            "opt_state": self.state.opt_state,
            "step": self.state.step,
        }
        restored = self.ckpt_mgr.restore(
            epoch, args=ocp.args.StandardRestore(target))
        self.state = self.state.replace(**restored)
        self.start_epoch = epoch + 1
        self.logger.info(f"resumed from epoch {epoch}")
        return self.start_epoch

    def load_pretrained(self, variables_or_params) -> None:
        """Shape-checked partial load (reference common_utils.py:142-180).

        Accepts either a bare params tree or a full {'params','batch_stats'}
        tree (e.g. from tools/convert_ckpt.py); BN statistics are merged too
        when present, since eval parity depends on them.
        """
        from .pretrained import partial_load

        tree = variables_or_params
        if "params" not in tree:
            tree = {"params": tree}
        params, loaded, skipped = partial_load(self.state.params, tree["params"])
        updates = {"params": params}
        if tree.get("batch_stats") and self.state.batch_stats:
            bs, l2, s2 = partial_load(self.state.batch_stats, tree["batch_stats"])
            updates["batch_stats"] = bs
            loaded, skipped = loaded + l2, skipped + s2
        self.state = self.state.replace(**updates)
        self.logger.info(f"pretrained load: {loaded} tensors, {skipped} skipped")

    # ------------------------------------------------------------- misc
    def _log_jsonl(self, record: Dict):
        if self.process_index != 0:
            return
        with open(self.metrics_file, "a") as f:
            f.write(json.dumps(record) + "\n")
        if self.tb is not None:
            step = record.get("epoch", 0) * 100000 + record.get("iter", 0)
            prefix = record.get("phase", "train")
            for k, v in record.items():
                if isinstance(v, (int, float)) and k not in ("epoch", "iter"):
                    self.tb.add_scalar(f"{prefix}/{k}", v, step)

    def log_visualization(self, disp_pred, disp_gt, epoch: int, tag: str = "eval"):
        """Colormapped gt/pred/error triptych to TensorBoard
        (reference common_utils.py:183-208)."""
        if self.tb is None:
            return
        from ..utils.visualization import triptych

        img = triptych(np.asarray(disp_pred, np.float32),
                       np.asarray(disp_gt, np.float32), float(self.max_disp))
        self.tb.add_image(f"{tag}/disparity", img, epoch, dataformats="HWC")
