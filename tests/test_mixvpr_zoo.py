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


# ---------------------------------------------------------------------------
# Published-checkpoint converters (full e2e oracles on random weights)
# ---------------------------------------------------------------------------

class _TorchMixVPR(torch.nn.Module):
    """Reference MixVPR aggregator semantics (mixvpr.py:28-66) as an
    independent oracle (state-dict layout matches the release)."""

    class _Mixer(torch.nn.Module):
        """FeatureMixerLayer: residual over a `mix` Sequential (the release
        key layout is mix.{i}.mix.{0,1,3})."""

        def __init__(self, hw):
            super().__init__()
            self.mix = torch.nn.Sequential(
                torch.nn.LayerNorm(hw),
                torch.nn.Linear(hw, hw),
                torch.nn.ReLU(),
                torch.nn.Linear(hw, hw),
            )

        def forward(self, x):
            return x + self.mix(x)

    def __init__(self, in_channels, hw, out_channels, mix_depth, out_rows):
        super().__init__()
        self.mix = torch.nn.Sequential(*[
            self._Mixer(hw) for _ in range(mix_depth)
        ])
        self.channel_proj = torch.nn.Linear(in_channels, out_channels)
        self.row_proj = torch.nn.Linear(hw, out_rows)

    def forward(self, x):  # [B, C, H, W]
        x = x.flatten(2)
        x = self.mix(x)
        x = x.permute(0, 2, 1)
        x = self.channel_proj(x)
        x = x.permute(0, 2, 1)
        x = self.row_proj(x)
        return torch.nn.functional.normalize(x.flatten(1), p=2, dim=-1)


def _synthetic_resnet_sd(rng, stage_sizes, bottleneck, n_stages, scale=0.05):
    """Shape-true state dict in torchvision resnet naming (torchvision is
    not installed; the repo-standard synthetic-sd pattern,
    test_torchvision_resnet_conversion)."""
    sd = {}

    def add_bn(name, c):
        sd[f"{name}.weight"] = rng.standard_normal(c).astype(np.float32)
        sd[f"{name}.bias"] = rng.standard_normal(c).astype(np.float32) * 0.1
        sd[f"{name}.running_mean"] = np.zeros(c, np.float32)
        sd[f"{name}.running_var"] = np.ones(c, np.float32)

    def w(*shape):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    sd["conv1.weight"] = w(64, 3, 7, 7)
    add_bn("bn1", 64)
    mult = 4 if bottleneck else 1
    cin = 64
    for stage in range(n_stages):
        f = 64 * 2 ** stage
        for i in range(stage_sizes[stage]):
            pre = f"layer{stage + 1}.{i}"
            c0 = cin if i == 0 else f * mult
            if bottleneck:
                sd[f"{pre}.conv1.weight"] = w(f, c0, 1, 1)
                add_bn(f"{pre}.bn1", f)
                sd[f"{pre}.conv2.weight"] = w(f, f, 3, 3)
                add_bn(f"{pre}.bn2", f)
                sd[f"{pre}.conv3.weight"] = w(f * 4, f, 1, 1)
                add_bn(f"{pre}.bn3", f * 4)
            else:
                sd[f"{pre}.conv1.weight"] = w(f, c0, 3, 3)
                add_bn(f"{pre}.bn1", f)
                sd[f"{pre}.conv2.weight"] = w(f, f, 3, 3)
                add_bn(f"{pre}.bn2", f)
            if i == 0 and (c0 != f * mult or stage > 0):
                sd[f"{pre}.downsample.0.weight"] = w(f * mult, c0, 1, 1)
                add_bn(f"{pre}.downsample.1", f * mult)
        cin = f * mult
    return sd


def test_convert_mixvpr_checkpoint_e2e(rng):
    """Release-layout MixVPR state dict (backbone.model.* + aggregator.*)
    through convert_mixvpr_checkpoint: the converted backbone must drive the
    REAL torch mixer oracle to the same descriptor as our VPRModel."""
    from anyloc_tpu.models.resnet import ResNet, resnet50_config
    from anyloc_tpu.training.mixvpr import VPRModel, convert_mixvpr_checkpoint

    torch.manual_seed(3)
    agg = _TorchMixVPR(1024, 16, out_channels=8, mix_depth=2,
                       out_rows=3).eval()
    bb_sd = _synthetic_resnet_sd(rng, (3, 4, 6), bottleneck=True, n_stages=3)
    sd = {f"backbone.model.{k}": v for k, v in bb_sd.items()}
    sd.update({f"aggregator.{k}": v.detach().numpy()
               for k, v in agg.state_dict().items()})
    params = convert_mixvpr_checkpoint(sd)

    img = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
    # oracle: our (already converter-tested) backbone fmap -> torch mixer
    fmap = ResNet(resnet50_config(truncate="conv4")).apply(
        {"params": params["params"]["backbone"],
         "batch_stats": params["batch_stats"]["backbone"]}, _nhwc(img))
    with torch.no_grad():
        expect = agg(torch.from_numpy(
            np.asarray(fmap).transpose(0, 3, 1, 2))).numpy()

    model = VPRModel(backbone="resnet50", agg_arch="mixvpr",
                     agg_config={"out_channels": 8, "out_rows": 3,
                                 "mix_depth": 2})
    got = np.asarray(model.apply(params, _nhwc(img)))
    np.testing.assert_allclose(got, expect, atol=2e-5)


def test_convert_cosplace_checkpoint_e2e(rng):
    """Release-layout CosPlace state dict (Sequential-renumbered backbone.i.*
    + aggregation.{1.p,3}) through convert_cosplace_checkpoint: converted
    backbone fmap -> REAL torch L2/GeM/fc/L2 oracle == our VPRModel."""
    from anyloc_tpu.models.resnet import ResNet, resnet18_config
    from anyloc_tpu.training.mixvpr import (
        VPRModel, convert_cosplace_checkpoint,
    )

    torch.manual_seed(4)
    p = 2.7
    fc = torch.nn.Linear(512, 16)
    bb_sd = _synthetic_resnet_sd(rng, (2, 2, 2, 2), bottleneck=False,
                                 n_stages=4)
    # CosPlace's Sequential(children[:-2]) renumbering: conv1->0, bn1->1,
    # layer1..4 -> 4..7 (model/network.py:57-77)
    idx = {"conv1": "0", "bn1": "1", "layer1": "4", "layer2": "5",
           "layer3": "6", "layer4": "7"}
    sd = {}
    for k, v in bb_sd.items():
        head, rest = k.split(".", 1)
        sd[f"backbone.{idx[head]}.{rest}"] = v
    sd["aggregation.1.p"] = np.full((1,), p, np.float32)
    sd["aggregation.3.weight"] = fc.weight.detach().numpy()
    sd["aggregation.3.bias"] = fc.bias.detach().numpy()
    params = convert_cosplace_checkpoint(sd, backbone="resnet18")

    img = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
    fmap = ResNet(resnet18_config(truncate="conv5")).apply(
        {"params": params["params"]["backbone"],
         "batch_stats": params["batch_stats"]["backbone"]}, _nhwc(img))
    f = torch.from_numpy(np.asarray(fmap).transpose(0, 3, 1, 2))
    with torch.no_grad():
        f = torch.nn.functional.normalize(f, p=2, dim=1)
        g = torch.nn.functional.avg_pool2d(
            f.clamp(min=1e-6).pow(p), (f.size(-2), f.size(-1))
        ).pow(1.0 / p).flatten(1)
        expect = torch.nn.functional.normalize(fc(g), p=2, dim=1).numpy()

    model = VPRModel(backbone="resnet18", layers_to_crop=(),
                     agg_arch="cosplace",
                     agg_config={"in_dim": 512, "out_dim": 16})
    got = np.asarray(model.apply(params, _nhwc(img)))
    np.testing.assert_allclose(got, expect, atol=2e-5)


def test_swinv2_offsize_input_parity(rng):
    """Window/shift geometry must come from the CONFIG resolution, not the
    runtime one (Swinv2Layer._compute_window_shift runs at __init__): a
    16 px input through a 32 px-config model pads the 2x2 stage-1 map up to
    the trained window instead of shrinking the window."""
    from anyloc_tpu.models.swin import SwinV2, SwinConfig, convert_hf_swinv2

    torch.manual_seed(5)
    hcfg = transformers.Swinv2Config(
        image_size=32, patch_size=4, embed_dim=16, depths=[2, 2],
        num_heads=[2, 4], window_size=4,
    )
    tm = transformers.Swinv2Model(hcfg, add_pooling_layer=False).eval()
    cfg = SwinConfig(img_size=32, patch_size=4, embed_dim=16, depths=(2, 2),
                     num_heads=(2, 4), window_size=4)
    params = convert_hf_swinv2(tm.state_dict(), cfg)

    img = rng.standard_normal((2, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        expect = tm(torch.from_numpy(img)).last_hidden_state.numpy()
    out = SwinV2(cfg).apply(params, _nhwc(img))
    np.testing.assert_allclose(np.asarray(out["tokens"]), expect, atol=1e-4)


def test_swinv2_nonsquare_input_parity(rng):
    """Non-square inputs: runtime window padding + odd-dimension patch
    merging must match HF (24x40 through a 32-px config: 6x10 grid, odd
    merge to 3x5, stage-1 padding to the window)."""
    from anyloc_tpu.models.swin import SwinV2, SwinConfig, convert_hf_swinv2

    torch.manual_seed(9)
    hcfg = transformers.Swinv2Config(
        image_size=32, patch_size=4, embed_dim=16, depths=[2, 2],
        num_heads=[2, 4], window_size=4)
    tm = transformers.Swinv2Model(hcfg, add_pooling_layer=False).eval()
    cfg = SwinConfig(img_size=32, patch_size=4, embed_dim=16, depths=(2, 2),
                     num_heads=(2, 4), window_size=4)
    params = convert_hf_swinv2(tm.state_dict(), cfg)
    img = rng.standard_normal((2, 3, 24, 40)).astype(np.float32)
    with torch.no_grad():
        expect = tm(torch.from_numpy(img)).last_hidden_state.numpy()
    out = SwinV2(cfg).apply(params, _nhwc(img))
    np.testing.assert_allclose(np.asarray(out["tokens"]), expect, atol=1e-4)


def test_efficientnet_odd_input_parity(rng):
    """Odd spatial size exercises the TF asymmetric stride-2 pads."""
    from anyloc_tpu.models.efficientnet import (
        EfficientNet, EfficientNetConfig, convert_hf_efficientnet,
    )

    torch.manual_seed(10)
    cfg = EfficientNetConfig(width_coefficient=1.0, depth_coefficient=1.0,
                             **_EN_STAGES)
    hcfg = transformers.EfficientNetConfig(
        width_coefficient=1.0, depth_coefficient=1.0, hidden_dim=1280,
        **{k: list(v) for k, v in _EN_STAGES.items()})
    tm = transformers.EfficientNetModel(hcfg).eval()
    params = convert_hf_efficientnet(tm.state_dict(), cfg)
    img = rng.standard_normal((1, 3, 57, 45)).astype(np.float32)
    with torch.no_grad():
        expect = tm(torch.from_numpy(img)).last_hidden_state.numpy()
    got = np.asarray(
        EfficientNet(cfg).apply(params, _nhwc(img))).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, expect, atol=2e-4)
