"""Forward/loss/grad smoke tests for the model zoo on tiny shapes."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _data(b=1, h=32, w=64):
    rng = np.random.RandomState(0)
    return {
        "left": jnp.asarray(rng.randn(b, h, w, 3), jnp.float32),
        "right": jnp.asarray(rng.randn(b, h, w, 3), jnp.float32),
        "disp": jnp.asarray(rng.rand(b, h, w) * 12 + 1, jnp.float32),
    }


def _check_model(model, data, aux_key=None, n_aux=None):
    variables = jax.jit(lambda b: model.init(jax.random.key(0), b, train=True))(data)
    out, _ = model.apply(variables, data, train=True, mutable=["batch_stats"])
    h, w = data["left"].shape[1:3]
    assert out["disp_pred"].shape == (data["left"].shape[0], h, w)
    if aux_key:
        assert len(out[aux_key]) == n_aux
    loss, _ = model.get_loss(out, data)
    assert np.isfinite(float(loss))

    # eval path
    ev = model.apply(variables, data, train=False)
    assert ev["disp_pred"].shape == (data["left"].shape[0], h, w)

    # gradability
    extra = ({"batch_stats": variables["batch_stats"]}
             if "batch_stats" in variables else {})

    def loss_fn(params):
        o, _ = model.apply({"params": params, **extra},
                           data, train=True, mutable=["batch_stats"])
        return model.get_loss(o, data)[0]

    grads = jax.grad(loss_fn)(variables["params"])
    gnorm = sum(float(jnp.sum(g.astype(jnp.float32) ** 2)) for g in jax.tree.leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0
    return variables


def test_psmnet_forward():
    from openstereo_tpu.models.psmnet import PSMNet

    model = PSMNet(max_disp=16)
    _check_model(model, _data(), aux_key="train_preds", n_aux=3)


def test_gwcnet_forward():
    from openstereo_tpu.models.gwcnet import GwcNet

    model = GwcNet(max_disp=16, num_groups=40, use_concat_volume=True)
    _check_model(model, _data(), aux_key="disp_preds", n_aux=4)


def test_structural_remat_matches():
    """MODEL.REMAT (PSMNet/GwcNet): gradients with hourglass/head remat must
    equal the plain model's — checkpointing recomputes, never changes math."""
    from openstereo_tpu.models.gwcnet import GwcNet
    from openstereo_tpu.models.psmnet import PSMNet

    data = _data()
    for cls, kw in ((PSMNet, {}), (GwcNet, {"num_groups": 8,
                                            "use_concat_volume": False})):
        plain = cls(max_disp=16, remat=False, **kw)
        remat = cls(max_disp=16, remat=True, **kw)
        variables = jax.jit(
            lambda b: plain.init(jax.random.key(0), b, train=True))(data)

        def loss_fn(params, model):
            o, _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                data, train=True, mutable=["batch_stats"])
            return model.get_loss(o, data)[0]

        # identical param tree: remat must not change module structure.
        # Tolerance is an accumulation-order bound, not exactness: remat
        # recomputes the checkpointed segment, and XLA may re-associate the
        # f32 reductions inside it (observed ~1e-3 rel / ~1e-6 abs on a few
        # of ~1e4 gradient elements).
        g_plain = jax.grad(loss_fn)(variables["params"], plain)
        g_remat = jax.grad(loss_fn)(variables["params"], remat)
        for a, b in zip(jax.tree.leaves(g_plain), jax.tree.leaves(g_remat)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-3, atol=5e-6)


def test_gwcnet_gc_only():
    from openstereo_tpu.models.gwcnet import GwcNet

    model = GwcNet(max_disp=16, num_groups=40, use_concat_volume=False)
    data = _data()
    variables = jax.jit(lambda b: model.init(jax.random.key(0), b, train=True))(data)
    out = model.apply(variables, data, train=False)
    assert out["disp_pred"].shape == data["disp"].shape


def test_stereobase_forward():
    """StereoBase (reference flagship): gwc+concat fused volume, GRU loop."""
    from openstereo_tpu.models.stereobase import StereoBase

    model = StereoBase(max_disp=32, use_concat_volume=True, concat_channels=8,
                       train_iters=2, eval_iters=3)
    assert model.volume_channels == 8 + 16
    _check_model(model, _data(b=1, h=64, w=128), aux_key="disp_preds", n_aux=2)


def test_stereobase_volume_options():
    """Every fused-volume combination builds and regresses a disparity
    (reference stereobase_gru.py:33-41 channel accounting)."""
    import jax

    from openstereo_tpu.models.stereobase import StereoBase

    data = _data(b=1, h=32, w=64)
    # max_disp=32 → D/4=8: the smallest that survives 3-level D-halving
    model = StereoBase(max_disp=32, use_gwc_volume=True, use_concat_volume=False,
                       use_sub_volume=True, use_interlaced_volume=True,
                       interlaced_channels=4, train_iters=1, eval_iters=1)
    assert model.volume_channels == 8 + 1 + 4
    variables = jax.jit(
        lambda b: model.init(jax.random.key(0), b, train=False))(data)
    out = jax.jit(lambda v, b: model.apply(v, b, train=False))(variables, data)
    assert out["disp_pred"].shape == data["disp"].shape


def test_igevpp_forward():
    from openstereo_tpu.models.igevpp import IGEVPP

    # scaled-down ranges: every carved volume keeps D≥8 bins for the
    # 3-level hourglass (full d4=32; S=16 bins, M=16→8 pooled, L=32→8)
    model = IGEVPP(max_disp=128, s_disp_range=16, s_disp_interval=1,
                   m_disp_range=16, m_disp_interval=2,
                   l_disp_range=32, l_disp_interval=4,
                   train_iters=2, valid_iters=3)
    data = _data(b=1, h=64, w=128)
    variables = jax.jit(lambda b: model.init(jax.random.key(0), b, train=True))(data)
    out, _ = model.apply(variables, data, train=True, mutable=["batch_stats"])
    assert out["disp_pred"].shape == data["disp"].shape
    assert len(out["init_disp"]) == 3 and len(out["disp_preds"]) == 2
    loss, _ = model.get_loss(out, data)
    assert np.isfinite(float(loss))
    oe = model.apply(variables, data, train=False)
    assert oe["disp_pred"].shape == data["disp"].shape


def test_igev_rt_forward():
    from openstereo_tpu.models.igev_rt import IGEVRT

    model = IGEVRT(max_disp=32, train_iters=2, valid_iters=3)
    _check_model(model, _data(b=1, h=64, w=128), aux_key="disp_preds", n_aux=2)


def test_igev_forward():
    from openstereo_tpu.models.igev import IGEV

    # max_disp=32 → D/4=8, the smallest that survives the 3-level D-halving
    model = IGEV(max_disp=32, train_iters=2, valid_iters=3)
    _check_model(model, _data(b=1, h=64, w=128), aux_key="disp_preds", n_aux=2)


def test_coex_forward():
    from openstereo_tpu.models.coex import CoExNet

    model = CoExNet(max_disp=16)
    _check_model(model, _data(), aux_key="disp_preds", n_aux=2)


def test_msnet3d_forward():
    from openstereo_tpu.models.msnet import MSNet3D

    model = MSNet3D(max_disp=16)
    _check_model(model, _data(), aux_key="disp_preds", n_aux=4)


def test_msnet2d_forward():
    from openstereo_tpu.models.msnet import MSNet2D

    model = MSNet2D(max_disp=16)
    _check_model(model, _data(), aux_key="disp_preds", n_aux=4)


def test_casnet_forward():
    from openstereo_tpu.models.casnet import CasPSMNet

    model = CasPSMNet(max_disp=32, ndisps=(16, 8), disp_interval_pixel=(2.0, 1.0))
    data = _data(h=64, w=128)
    variables = jax.jit(lambda b: model.init(jax.random.key(0), b, train=True))(data)
    out, _ = model.apply(variables, data, train=True, mutable=["batch_stats"])
    assert len(out["stage1"]) == 4 and len(out["stage2"]) == 4
    loss, _ = model.get_loss(out, data)
    assert np.isfinite(float(loss))
    ev = model.apply(variables, data, train=False)
    assert ev["disp_pred"].shape == data["disp"].shape


def test_casgwc_forward():
    from openstereo_tpu.models.casnet import CasGwcNet

    model = CasGwcNet(max_disp=32, ndisps=(16, 8), disp_interval_pixel=(2.0, 1.0))
    data = _data(h=64, w=128)
    variables = jax.jit(lambda b: model.init(jax.random.key(0), b, train=True))(data)
    ev = model.apply(variables, data, train=False)
    assert ev["disp_pred"].shape == data["disp"].shape


def test_fadnet_forward():
    from openstereo_tpu.models.fadnet import FADNet

    model = FADNet(max_disp=64)
    data = _data(h=64, w=192)
    variables = jax.jit(lambda b: model.init(jax.random.key(0), b, train=True))(data)
    out, _ = model.apply(variables, data, train=True, mutable=["batch_stats"])
    assert len(out["flows_c"]) == 7 and len(out["flows_res"]) == 7
    loss, _ = model.get_loss(out, data)
    assert np.isfinite(float(loss))
    ev = model.apply(variables, data, train=False)
    assert ev["disp_pred"].shape == data["disp"].shape


def test_cfnet_forward():
    from openstereo_tpu.models.cfnet import CFNet

    model = CFNet(max_disp=64)
    data = _data(h=64, w=128)
    variables = jax.jit(lambda b: model.init(jax.random.key(0), b, train=True))(data)
    out, _ = model.apply(variables, data, train=True, mutable=["batch_stats"])
    assert len(out["disp_preds"]) == 9
    loss, _ = model.get_loss(out, data)
    assert np.isfinite(float(loss))
    ev = model.apply(variables, data, train=False)
    assert ev["disp_pred"].shape == data["disp"].shape


def test_aanet_stereonet_refinement_forward():
    """AANet's alternate REFINEMENT_TYPE (reference disp_refinement.py:32)."""
    from openstereo_tpu.models.aanet import AANet

    model = AANet(max_disp=48, refinement_type="stereonet")
    data = _data(h=48, w=96)
    variables = jax.jit(lambda b: model.init(jax.random.key(0), b, train=False))(data)
    out = jax.jit(lambda v, b: model.apply(v, b, train=False))(variables, data)
    assert out["disp_pred"].shape == data["disp"].shape


def test_aanet_forward():
    from openstereo_tpu.models.aanet import AANet

    model = AANet(max_disp=48)
    data = _data(h=48, w=96)  # divisible by 12 (stride-3 stem × /4)
    variables = jax.jit(lambda b: model.init(jax.random.key(0), b, train=True))(data)
    out, _ = model.apply(variables, data, train=True, mutable=["batch_stats"])
    assert len(out["disp_preds"]) == 5
    loss, _ = model.get_loss(out, data)
    assert np.isfinite(float(loss))
    ev = model.apply(variables, data, train=False)
    assert ev["disp_pred"].shape == data["disp"].shape


def test_deform_conv_matches_plain_conv():
    """Zero offsets + unit mask must reduce to a standard conv."""
    from openstereo_tpu.ops.deform_conv import modulated_deform_conv

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 8, 10, 4), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 4, 6), jnp.float32)
    off = jnp.zeros((1, 8, 10, 2 * 2 * 9))
    mask = jnp.ones((1, 8, 10, 2 * 9))
    got = modulated_deform_conv(x, off, mask, w, dilation=1, deformable_groups=2)
    exp = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(got), np.asarray(exp), atol=1e-4)


def test_deform_conv_matches_gather_reference():
    """The packed-patch single-gather path must match the plain 4-tap
    bilinear_sampler formulation bit-for-bit in f32, including samples
    pushed out of frame (grid_sample zeros semantics)."""
    from openstereo_tpu.ops.deform_conv import modulated_deform_conv
    from openstereo_tpu.ops.sampler import bilinear_sampler

    rng = np.random.RandomState(1)
    b, h, w, c, k, dg = 2, 9, 11, 8, 3, 2
    kk, cg = k * k, c // dg
    x = jnp.asarray(rng.randn(b, h, w, c), jnp.float32)
    wts = jnp.asarray(rng.randn(k, k, c, 5), jnp.float32)
    # large offsets so many taps land outside the frame
    off = jnp.asarray(rng.randn(b, h, w, dg * 2 * kk) * 6.0, jnp.float32)
    mask = jnp.asarray(rng.rand(b, h, w, dg * kk), jnp.float32)

    got = modulated_deform_conv(x, off, mask, wts, deformable_groups=dg)

    # reference: per-tap bilinear_sampler (the pre-round-5 formulation)
    offr = off.reshape(b, h, w, dg, kk, 2)
    maskr = mask.reshape(b, h, w, dg, kk)
    xg = x.reshape(b, h, w, dg, cg)
    ys = jnp.broadcast_to(jnp.arange(h, dtype=jnp.float32)[None, :, None], (b, h, w))
    xs = jnp.broadcast_to(jnp.arange(w, dtype=jnp.float32)[None, None, :], (b, h, w))
    taps = []
    for ki in range(kk):
        dy, dx = ki // k - 1, ki % k - 1
        per_group = []
        for g in range(dg):
            py = ys + dy + offr[:, :, :, g, ki, 0]
            px = xs + dx + offr[:, :, :, g, ki, 1]
            s = bilinear_sampler(xg[:, :, :, g], jnp.stack([px, py], -1))
            per_group.append(s * maskr[:, :, :, g, ki][..., None])
        taps.append(jnp.concatenate(per_group, -1))
    cols = jnp.concatenate(taps, -1)
    exp = jnp.einsum("bhwi,io->bhwo", cols, wts.reshape(kk * c, -1))
    np.testing.assert_allclose(np.asarray(got), np.asarray(exp),
                               atol=1e-4, rtol=1e-5)


def test_sttr_forward_and_grad():
    from openstereo_tpu.models.sttr import STTR

    model = STTR(max_disp=48, num_attn_layers=2, nheads=4, channel_dim=32,
                 cal_num_blocks=2)
    rng = np.random.RandomState(0)
    h, w = 48, 96
    data = {
        "left": jnp.asarray(rng.rand(1, h, w, 3), jnp.float32),
        "right": jnp.asarray(rng.rand(1, h, w, 3), jnp.float32),
        "disp": jnp.asarray(rng.rand(1, h, w) * 20 + 1, jnp.float32),
        "occ_mask": jnp.asarray(rng.rand(1, h, w) > 0.9, jnp.float32),
        "occ_mask_right": jnp.asarray(rng.rand(1, h, w) > 0.9, jnp.float32),
    }
    variables = jax.jit(lambda b: model.init(jax.random.key(0), b, train=True))(data)
    out = model.apply(variables, data, train=True)
    loss, _ = model.get_loss(out, data)
    assert np.isfinite(float(loss))

    def loss_fn(params):
        o = model.apply({"params": params}, data, train=True)
        return model.get_loss(o, data)[0]

    grads = jax.grad(loss_fn)(variables["params"])
    gnorm = sum(float(jnp.sum(g.astype(jnp.float32) ** 2)) for g in jax.tree.leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0
    # eval without GT inputs
    ev = model.apply(variables, {"left": data["left"], "right": data["right"]},
                     train=False)
    assert ev["disp_pred"].shape == (1, h, w)
    assert ev["occ_pred"].shape == (1, h, w)


def test_sinkhorn_doubly_stochastic():
    from openstereo_tpu.models.sttr.sttr import optimal_transport

    rng = np.random.RandomState(0)
    attn = jnp.asarray(rng.randn(1, 2, 8, 8), jnp.float32)
    # plan / 2W = exp(sinkhorn): rows/cols (sans dustbin) sum to mu = 1/(2W)
    plan = np.asarray(optimal_transport(attn, jnp.asarray(0.0), iters=50)) / (2 * 8)
    row_sums = plan.sum(-1)[..., :-1]   # [1,2,8]
    np.testing.assert_allclose(row_sums, 1.0 / 16, rtol=1e-3)
    col_sums = plan.sum(-2)[..., :-1]
    np.testing.assert_allclose(col_sums, 1.0 / 16, rtol=1e-2)


def test_resize_align_corners_matches_torch():
    import torch
    import torch.nn.functional as F

    from openstereo_tpu.ops import resize_linear_align_corners

    rng = np.random.RandomState(1)
    x = rng.randn(2, 4, 6, 8, 3).astype(np.float32)  # [B,D,H,W,C]
    got = np.asarray(resize_linear_align_corners(jnp.asarray(x), (8, 12, 16), axes=(1, 2, 3)))
    tx = torch.from_numpy(x.transpose(0, 4, 1, 2, 3))  # NCDHW
    exp = F.interpolate(tx, (8, 12, 16), mode="trilinear", align_corners=True)
    exp = exp.numpy().transpose(0, 2, 3, 4, 1)
    np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-5)


def test_foundationstereo_forward():
    """FoundationStereo: EdgeNeXt+frozen-DAv2 features, AHCF hourglass with
    disparity transformer, selective GRU loop. Input must be /32-divisible
    (the reference pads with InputPadder divis_by=32)."""
    from openstereo_tpu.models.foundationstereo import FoundationStereo

    model = FoundationStereo(max_disp=64, vit_size="vits",
                             train_iters=2, valid_iters=2)
    _check_model(model, _data(b=1, h=64, w=96), aux_key="disp_preds", n_aux=2)


def test_foundationstereo_frozen_vit():
    """FREEZE_VIT must zero every gradient under feature/dino (the reference
    freezes DepthAnything, extractor.py:330)."""
    from openstereo_tpu.models.foundationstereo import FoundationStereo

    model = FoundationStereo(max_disp=64, vit_size="vits",
                             train_iters=1, valid_iters=1)
    data = _data(b=1, h=64, w=96)
    variables = jax.jit(lambda b: model.init(jax.random.key(0), b, train=True))(data)

    def loss_fn(params):
        o, _ = model.apply({"params": params, "batch_stats": variables["batch_stats"]},
                           data, train=True, mutable=["batch_stats"])
        return model.get_loss(o, data)[0]

    grads = jax.jit(jax.grad(loss_fn))(variables["params"])
    dino = sum(float(jnp.sum(jnp.abs(g)))
               for g in jax.tree.leaves(grads["feature"]["dino"]))
    rest = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(grads))
    assert dino == 0.0
    assert rest > 0.0


def test_monster_forward():
    """MonSter: frozen DAv2 mono branch + IGEV-style stereo branch +
    mutual-refinement GRU phase + REMP. H,W must be /32-divisible with
    H/16 integral (the 14/16 ViT resize lands on whole patches)."""
    from openstereo_tpu.models.monster import MonSter

    model = MonSter(max_disp=64, encoder="vits", train_iters=3,
                    valid_iters=3, mix_iters=2)
    # preds: 1 phase-A + 2 mixed × (mono, stereo) = 5
    _check_model(model, _data(b=1, h=96, w=160), aux_key="disp_preds", n_aux=5)


def test_monster_frozen_mono():
    """The DAv2 encoder and depth decoder must receive exactly zero
    gradients (reference monster.py:303-306 requires_grad_(False)); the
    pyramid feat_decoder trains."""
    from openstereo_tpu.models.monster import MonSter

    model = MonSter(max_disp=64, encoder="vits", train_iters=2,
                    valid_iters=2, mix_iters=1)
    data = _data(b=1, h=96, w=160)
    variables = jax.jit(lambda b: model.init(jax.random.key(0), b, train=True))(data)

    def loss_fn(params):
        o, _ = model.apply({"params": params, "batch_stats": variables["batch_stats"]},
                           data, train=True, mutable=["batch_stats"])
        return model.get_loss(o, data)[0]

    grads = jax.jit(jax.grad(loss_fn))(variables["params"])
    total = lambda t: sum(float(jnp.sum(jnp.abs(g)))  # noqa: E731
                          for g in jax.tree.leaves(t))
    assert total(grads["mono"]["mono_encoder"]) == 0.0
    assert total(grads["mono"]["mono_decoder"]) == 0.0
    assert total(grads["mono"]["feat_decoder"]) > 0.0


def test_fastfoundationstereo_forward():
    """FastFoundationStereo: distilled student — EdgeNeXt trunk only (no
    ViT), shared-backbone context, single-scale selective GRU."""
    from openstereo_tpu.models.fastfoundationstereo import FastFoundationStereo

    model = FastFoundationStereo(max_disp=64, train_iters=2, valid_iters=2)
    _check_model(model, _data(b=1, h=64, w=96), aux_key="disp_preds", n_aux=2)


def test_nmrf_forward():
    """NMRF forward/loss/grad on both encoders at tiny shapes. The loss
    needs occ masks + superpixel labels; exercise both the provided-field
    path and the grid-label fallback (reference NMRF.py:211-306)."""
    from openstereo_tpu.models.nmrf import NMRF

    data = _data(h=32, w=64)
    rng = np.random.RandomState(1)
    data["occ_mask"] = jnp.asarray(rng.rand(1, 32, 64) < 0.1)
    data["occ_mask_2"] = jnp.asarray(rng.rand(1, 32, 64) < 0.1)
    data["super_pixel_label"] = jnp.asarray(
        rng.randint(0, 9, size=(1, 32, 64)), jnp.int32)

    model = NMRF(model_type="resnet", max_disp=32, backbone_drop_path=0.0)
    _check_model(model, data)

    # swin encoder + fallback superpixels, forward/loss only (grad covered
    # above; the swin trace is compile-heavy on CPU)
    model = NMRF(model_type="swin", max_disp=32, backbone_drop_path=0.0)
    data2 = _data(h=32, w=64)
    variables = jax.jit(
        lambda b: model.init(jax.random.key(0), b, train=True))(data2)
    out = model.apply(variables, data2, train=True)
    loss, _ = model.get_loss(out, data2)
    assert np.isfinite(float(loss))


def test_iinet_forward():
    """IINet forward/loss/grad at tiny shapes, both loss stages
    (reference iinet.py:88-131; part-1 trains uncertainty only)."""
    from openstereo_tpu.models.iinet import IINet

    data = _data(h=32, w=64)
    model = IINet(max_disp=192)
    _check_model(model, data)

    out, _ = IINet(max_disp=192, uncer_only=True).apply(
        jax.jit(lambda b: model.init(jax.random.key(0), b, train=True))(data),
        data, train=True, mutable=["batch_stats"])
    loss, _ = IINet(max_disp=192, uncer_only=True).get_loss(out, data)
    assert np.isfinite(float(loss))
