"""MixVPR registry surface: EfficientNet/Swin backbones + aggregators.

The reference's MixVPR sub-framework selects backbones and aggregation
heads by name (MixVPR/models/helper.py:6-75); the backbones come from timm
(backbones/efficientnet.py, backbones/swin.py) and the heads from
models/aggregators/{convap,cosplace,gem,mixvpr}.py. Parity strategy is the
repo-standard zero-egress oracle: random-weight ``transformers`` models for
the trunks (the HF redistributions of the same TF-EfficientNet / SwinV2
architectures), inline torch modules for the heads.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

transformers = pytest.importorskip("transformers")
import torch  # noqa: E402


def _nhwc(img):
    return jnp.asarray(img.transpose(0, 2, 3, 1))


# ---------------------------------------------------------------------------
# EfficientNet trunk vs transformers EfficientNetModel
# ---------------------------------------------------------------------------

_EN_STAGES = dict(
    in_channels=(32, 16, 24), out_channels=(16, 24, 40),
    kernel_sizes=(3, 3, 5), strides=(1, 2, 2), expand_ratios=(1, 6, 6),
    num_block_repeats=(1, 2, 2),
)


@pytest.mark.parametrize("width,depth", [(1.0, 1.0), (1.1, 1.2)],
                         ids=["b0-coeffs", "b2-coeffs"])
def test_efficientnet_hf_parity(rng, width, depth):
    """EfficientNetModel == our trunk after convert_hf_efficientnet —
    covers channel/repeat rounding, TF 'same' pads, SE, MBConv residuals."""
    from anyloc_tpu.models.efficientnet import (
        EfficientNet, EfficientNetConfig, convert_hf_efficientnet,
    )

    torch.manual_seed(0)
    cfg = EfficientNetConfig(width_coefficient=width,
                             depth_coefficient=depth, **_EN_STAGES)
    hcfg = transformers.EfficientNetConfig(
        width_coefficient=width, depth_coefficient=depth,
        hidden_dim=cfg.hidden_dim,
        **{k: list(v) for k, v in _EN_STAGES.items()},
    )
    tm = transformers.EfficientNetModel(hcfg).eval()
    params = convert_hf_efficientnet(tm.state_dict(), cfg)

    img = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        expect = tm(torch.from_numpy(img)).last_hidden_state.numpy()
    got = np.asarray(
        EfficientNet(cfg).apply(params, _nhwc(img))
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, expect, atol=2e-4)


def test_efficientnet_out_channels_table():
    """The b0-b4 head widths the MixVPR wrapper hardcodes
    (backbones/efficientnet.py:44-50)."""
    from anyloc_tpu.models.efficientnet import efficientnet_config

    expect = {"b0": 1280, "b1": 1280, "b2": 1408, "b3": 1536, "b4": 1792}
    for variant, out in expect.items():
        assert efficientnet_config(variant).hidden_dim == out


# ---------------------------------------------------------------------------
# SwinV2 trunk vs transformers Swinv2Model
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("pretrained_ws", [0, 3],
                         ids=["cpb-own-window", "cpb-pretrained-window"])
def test_swinv2_hf_parity(rng, pretrained_ws):
    """Swinv2Model == our SwinV2: res-post-norm, cosine attention, CPB MLP,
    shifted-window masks (stage 0 block 1 shifts; stage 1 window shrinks to
    the 4x4 resolution), patch merging, final norm."""
    from anyloc_tpu.models.swin import SwinV2, SwinConfig, convert_hf_swinv2

    torch.manual_seed(1)
    hcfg = transformers.Swinv2Config(
        image_size=32, patch_size=4, embed_dim=16, depths=[2, 2],
        num_heads=[2, 4], window_size=4,
        pretrained_window_sizes=[pretrained_ws, pretrained_ws],
    )
    tm = transformers.Swinv2Model(hcfg, add_pooling_layer=False).eval()
    cfg = SwinConfig(img_size=32, patch_size=4, embed_dim=16, depths=(2, 2),
                     num_heads=(2, 4), window_size=4,
                     pretrained_window_sizes=(pretrained_ws, pretrained_ws))
    params = convert_hf_swinv2(tm.state_dict(), cfg)

    img = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        expect = tm(torch.from_numpy(img)).last_hidden_state.numpy()
    out = SwinV2(cfg).apply(params, _nhwc(img))
    np.testing.assert_allclose(np.asarray(out["tokens"]), expect, atol=1e-4)
    # the MixVPR wrapper's square feature-map reshape (swin.py:51-56)
    assert out["fmap"].shape == (2, 4, 4, 32)


# ---------------------------------------------------------------------------
# Aggregators vs inline torch oracles
# ---------------------------------------------------------------------------

def test_convap_torch_parity(rng):
    """ConvAP (convap.py:6-23): 1x1 conv -> AdaptiveAvgPool2d -> flatten ->
    L2. Odd spatial dims exercise torch's uneven adaptive-pool cells."""
    from anyloc_tpu.training.aggregators import ConvAP

    torch.manual_seed(2)
    conv = torch.nn.Conv2d(12, 6, 1)
    x = torch.from_numpy(rng.standard_normal((2, 12, 7, 5)).astype(np.float32))
    with torch.no_grad():
        y = torch.nn.functional.adaptive_avg_pool2d(conv(x), (2, 2))
        expect = torch.nn.functional.normalize(y.flatten(1), dim=1).numpy()

    params = {"params": {"channel_pool": {
        "kernel": conv.weight.detach().numpy()[:, :, 0, 0].T,
        "bias": conv.bias.detach().numpy(),
    }}}
    got = ConvAP(out_channels=6).apply(
        params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), expect, atol=1e-6)


def test_gem_pool_torch_parity(rng):
    """GeMPool (gem.py:5-18): clamp -> p-mean -> flatten -> L2."""
    from anyloc_tpu.training.aggregators import GeMPool

    x = rng.standard_normal((2, 9, 4)).astype(np.float32)
    p = 2.5
    t = torch.from_numpy(x)
    with torch.no_grad():
        g = t.clamp(min=1e-6).pow(p).mean(dim=1).pow(1.0 / p)
        expect = torch.nn.functional.normalize(g, dim=1).numpy()
    got = GeMPool().apply({"params": {"p": jnp.asarray(p)}}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), expect, atol=1e-6)


# ---------------------------------------------------------------------------
# Registry semantics (helper.py:6-75)
# ---------------------------------------------------------------------------

def test_registry_dispatch_and_validation():
    from anyloc_tpu.models.efficientnet import EfficientNet
    from anyloc_tpu.models.resnet import ResNet
    from anyloc_tpu.models.swin import SwinV2
    from anyloc_tpu.training.mixvpr import get_aggregator, get_backbone

    mod, ch = get_backbone("resnet50", layers_to_crop=(4,))
    assert isinstance(mod, ResNet) and ch == 1024
    mod, ch = get_backbone("resnet50", layers_to_crop=(3, 4))
    assert ch == 512  # helper crop [3,4] halves twice (resnet.py:86-87)
    mod, ch = get_backbone("efficientnet_b2")
    assert isinstance(mod, EfficientNet) and ch == 1408
    # names without '_b' fall back to b0 (helper.py:27-32)
    _, ch = get_backbone("efficientnet")
    assert ch == 1280
    mod, ch = get_backbone("swin")
    assert isinstance(mod, SwinV2) and ch == 1024

    with pytest.raises(ValueError):
        get_backbone("resnet34")
    with pytest.raises(ValueError):
        get_backbone("resnet50", layers_to_crop=(3,))
    # required agg_config keys, as asserted by the reference helper
    with pytest.raises(ValueError):
        get_aggregator("cosplace", {"in_dim": 8})
    with pytest.raises(ValueError):
        get_aggregator("convap", {})
    with pytest.raises(ValueError):
        get_aggregator("nope", {})


def test_vprmodel_agg_combos(rng):
    """VPRModel end-to-end over each aggregator family (resnet50 conv4)."""
    from anyloc_tpu.training.mixvpr import VPRModel

    img = jnp.asarray(
        rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
    key = jax.random.PRNGKey(0)
    combos = {
        ("resnet50", "mixvpr", None): 16,  # legacy knobs below
        ("resnet50", "convap", ("in_channels", 1024, "out_channels", 8)): 32,
        ("resnet50", "cosplace", ("in_dim", 1024, "out_dim", 24)): 24,
        ("efficientnet_b0", "gem", ("p", 3)): 1280,
    }
    for (bb, agg, cfg), dim in combos.items():
        cfg_d = None if cfg is None else dict(zip(cfg[::2], cfg[1::2]))
        m = VPRModel(backbone=bb, agg_arch=agg, agg_config=cfg_d,
                     out_channels=8, out_rows=2, mixer_depth=1)
        out, _ = m.init_with_output(key, img)
        assert out.shape == (2, dim), (bb, agg)
        np.testing.assert_allclose(
            np.asarray(jnp.linalg.norm(out, axis=-1)), 1.0, atol=1e-5)
