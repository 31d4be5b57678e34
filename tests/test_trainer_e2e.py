"""End-to-end: LightStereo training on synthetic data over an 8-device DP mesh.

Covers what the reference can only test by launching torchrun (SURVEY.md §4):
sharded train step with implicit grad all-reduce, global-batch BN stats,
eval with index-dedup, checkpoint save/resume.
"""

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from openstereo_tpu.config import Config
from openstereo_tpu.parallel import make_mesh
from openstereo_tpu.runtime import Trainer


@pytest.fixture(scope="module")
def run_cfg(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    rng = np.random.RandomState(0)
    lines = []
    for i in range(8):
        for sub in ("left", "right"):
            (root / sub).mkdir(exist_ok=True)
            img = rng.randint(0, 255, (32, 64, 3), np.uint8)
            Image.fromarray(img).save(root / sub / f"{i:04d}.png")
        disp = (rng.rand(32, 64) * 12 + 1).astype(np.float32)
        with open(root / "left" / f"{i:04d}.pfm", "wb") as f:
            f.write(b"Pf\n64 32\n-1.0\n")
            np.flipud(disp).astype("<f4").tofile(f)
        lines.append(f"left/{i:04d}.png right/{i:04d}.png left/{i:04d}.pfm")
    split = root / "split.txt"
    split.write_text("\n".join(lines))

    norm = {"NAME": "NormalizeImage", "MEAN": [0.485, 0.456, 0.406],
            "STD": [0.229, 0.224, 0.225]}
    cfg = Config.from_dict({
        "DATA_CONFIG": {
            "DATA_INFOS": [{
                "DATASET": "SceneFlowDataset",
                "DATA_SPLIT": {"TRAINING": str(split), "EVALUATING": str(split)},
                "DATA_PATH": str(root),
                "RETURN_RIGHT_DISP": False,
            }],
            "DATA_TRANSFORM": {
                "TRAINING": [{"NAME": "RandomCrop", "SIZE": [32, 64]}, norm],
                "EVALUATING": [{"NAME": "RightTopPad", "SIZE": [32, 64]}, norm],
            },
        },
        "MODEL": {"NAME": "LightStereo", "MAX_DISP": 16,
                  "AGGREGATION_BLOCKS": [1, 1, 1], "EXPANSE_RATIO": 2,
                  "LEFT_ATT": True},
        "OPTIMIZATION": {
            "AMP": False, "BATCH_SIZE_PER_GPU": 1, "NUM_EPOCHS": 3,
            "OPTIMIZER": {"NAME": "AdamW", "LR": 1.0e-3, "WEIGHT_DECAY": 1.0e-5},
            "SCHEDULER": {"NAME": "OneCycleLR", "MAX_LR": 1.0e-3, "PCT_START": 0.1,
                          "ON_EPOCH": False},
            "CLIP_GRAD": {"TYPE": "value", "CLIP_VALUE": 0.1},
        },
        "EVALUATOR": {"BATCH_SIZE_PER_GPU": 1, "MAX_DISP": 16,
                      "METRIC": ["epe", "d1_all", "thres_1"]},
        "TRAINER": {"EVAL_INTERVAL": 10, "CKPT_SAVE_INTERVAL": 10,
                    "MAX_CKPT_SAVE_NUM": 3, "LOGGER_ITER_INTERVAL": 1,
                    "EVAL_VISUALIZATION": True, "TRAIN_VISUALIZATION": True},
    })
    return cfg


def test_train_eval_ckpt_roundtrip(run_cfg, tmp_path):
    assert len(jax.devices()) == 8
    mesh = make_mesh(data=8, model=1)
    trainer = Trainer(run_cfg, str(tmp_path / "run"), mesh=mesh, num_workers=1)

    losses = []
    for epoch in range(3):
        m = trainer.train_one_epoch(epoch)
        losses.append(m["loss"])
    assert losses[-1] < losses[0], losses  # optimizes

    results = trainer.evaluate(0)
    assert set(results) == {"epe", "d1_all", "thres_1"}
    assert np.isfinite(list(results.values())).all()

    # checkpoint save/resume
    trainer.save_ckpt(2)
    trainer.ckpt_mgr.wait_until_finished()
    step_before = int(jax.device_get(trainer.state.step))

    trainer2 = Trainer(run_cfg, str(tmp_path / "run"), mesh=mesh, num_workers=1)
    start = trainer2.resume_ckpt()
    assert start == 3
    assert int(jax.device_get(trainer2.state.step)) == step_before
    p1 = jax.tree.leaves(trainer.state.params)[0]
    p2 = jax.tree.leaves(trainer2.state.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2))


def test_remat_policy(run_cfg, tmp_path):
    """OPTIMIZATION.REMAT: training must produce the same step result with
    activation checkpointing (gradients are exact, only recomputed)."""
    import copy

    mesh = make_mesh(data=8, model=1)
    cfg = copy.deepcopy(run_cfg)
    cfg.OPTIMIZATION.REMAT = "dots_saveable"
    tr_remat = Trainer(cfg, str(tmp_path / "run_remat"), mesh=mesh, num_workers=1)
    tr_plain = Trainer(run_cfg, str(tmp_path / "run_plain"), mesh=mesh,
                       num_workers=1)
    # same seed → identical init + identical batches
    m_r = tr_remat.train_one_epoch(0)
    m_p = tr_plain.train_one_epoch(0)
    assert np.isfinite(m_r["loss"])
    np.testing.assert_allclose(m_r["loss"], m_p["loss"], rtol=1e-5)
    p_r = np.asarray(jax.device_get(jax.tree.leaves(tr_remat.state.params)[0]))
    p_p = np.asarray(jax.device_get(jax.tree.leaves(tr_plain.state.params)[0]))
    np.testing.assert_allclose(p_r, p_p, rtol=1e-4, atol=1e-6)

    with pytest.raises(ValueError, match="REMAT"):
        bad = copy.deepcopy(run_cfg)
        bad.OPTIMIZATION.REMAT = "not_a_policy"
        Trainer(bad, str(tmp_path / "run_bad"), mesh=mesh, num_workers=1)


def test_freeze_bn(run_cfg, tmp_path):
    """FREEZE_BN: batch_stats must not change during training."""
    import copy

    cfg = copy.deepcopy(run_cfg)
    cfg.OPTIMIZATION.FREEZE_BN = True
    mesh = make_mesh(data=8, model=1)
    trainer = Trainer(cfg, str(tmp_path / "run_fbn"), mesh=mesh, num_workers=1)
    bs_before = jax.device_get(jax.tree.leaves(trainer.state.batch_stats))
    trainer.train_one_epoch(0)
    bs_after = jax.device_get(jax.tree.leaves(trainer.state.batch_stats))
    for a, b in zip(bs_before, bs_after):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bn_stats_are_global(run_cfg, tmp_path):
    """BatchNorm updates must reflect the full (sharded) batch — SyncBN parity."""
    mesh = make_mesh(data=8, model=1)
    trainer = Trainer(run_cfg, str(tmp_path / "run2"), mesh=mesh, num_workers=1)
    bs_before = jax.device_get(
        jax.tree.leaves(trainer.state.batch_stats)[0])
    trainer.train_one_epoch(0)
    bs_after = jax.device_get(jax.tree.leaves(trainer.state.batch_stats)[0])
    # running stats moved, and every shard sees the same (replicated) value
    assert not np.allclose(bs_before, bs_after)
    leaf = jax.tree.leaves(trainer.state.batch_stats)[0]
    assert leaf.sharding.is_fully_replicated
