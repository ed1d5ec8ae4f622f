"""ImageBind multimodal surface: every modality embeds into the joint space."""

import numpy as np
import pytest

import jax.numpy as jnp

from anyloc_tpu.models import imagebind as ib


@pytest.fixture(scope="module")
def tiny_model(monkeypatch_module=None):
    m = ib.ImageBindModel.__new__(ib.ImageBindModel)
    import jax

    m.dtype = jnp.float32
    m.seed = 0
    # shrink every trunk for test speed
    m.vision_cfg = ib.imagebind_vision_config(img_size=28)
    m.vision_cfg = m.vision_cfg.__class__(
        **{**m.vision_cfg.__dict__, "embed_dim": 32, "depth": 2, "num_heads": 4}
    )
    from anyloc_tpu.models.vit import ViT

    m.vision = ViT(m.vision_cfg)
    m.text = ib.ImageBindText(vocab=500, context=16, embed_dim=32, depth=2,
                              heads=4, out_dim=16)
    m.audio = ib._PatchTrunk(32, 2, 4, out_dim=16, kernel=16, stride=10,
                             in_hw=(128, 204))
    m.depth = ib._PatchTrunk(32, 2, 4, out_dim=16, kernel=16)
    m.thermal = ib._PatchTrunk(32, 2, 4, out_dim=16, kernel=16)
    m.imu = ib._PatchTrunk(32, 2, 4, out_dim=16, kernel=8, mode="linear1d")
    from anyloc_tpu.models.clip import SimpleTokenizer

    m.tokenizer = SimpleTokenizer(vocab=500)
    m._params, m._fns = {}, {}
    return m


def test_text_modality(tiny_model):
    out = tiny_model({"text": ["a shopping mall", "an aerial view"]})
    emb = np.asarray(out["text"])
    assert emb.shape == (2, 16)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, atol=1e-5)


def test_audio_modality(tiny_model, rng):
    mel = rng.standard_normal((2, 128, 204)).astype(np.float32)
    out = tiny_model({"audio": mel})
    assert out["audio"].shape == (2, 16)


def test_depth_thermal_imu(tiny_model, rng):
    out = tiny_model({
        "depth": rng.standard_normal((1, 64, 64)).astype(np.float32),
        "thermal": rng.standard_normal((1, 64, 64)).astype(np.float32),
        "imu": rng.standard_normal((1, 6, 80)).astype(np.float32),
    })
    for k in ("depth", "thermal", "imu"):
        assert out[k].shape[0] == 1
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(out[k]), axis=1), 1.0, atol=1e-5
        )


def test_log_mel_spectrogram():
    sr = 16000
    t = np.arange(sr, dtype=np.float32) / sr
    wave = np.sin(2 * np.pi * 440 * t)
    mel = ib.log_mel_spectrogram(wave, sr)
    assert mel.shape == (128, 204)
    # a pure 440 Hz tone concentrates energy in the low-frequency mel bins
    assert mel[:20].mean() > mel[100:].mean()


def test_vision_extractor_still_gates_other_modalities(rng):
    cfg = ib.imagebind_vision_config(img_size=28)
    cfg = cfg.__class__(**{**cfg.__dict__, "embed_dim": 32, "depth": 1,
                           "num_heads": 4})
    from anyloc_tpu.models.vit import ViT
    import jax

    v = ib.ImageBindVision.__new__(ib.ImageBindVision)
    v.cfg = cfg
    v.model = ViT(cfg)
    v.params = v.model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 28, 28, 3))
    )
    v._fwd = jax.jit(
        lambda p, im: (
            v.model.apply(p, im)["cls"].astype(jnp.float32),
            v.model.apply(p, im)["tokens"].astype(jnp.float32),
        )
    )
    out = v(np.zeros((1, 28, 28, 3), np.float32))
    assert out["cls"].shape == (1, 32)
    with pytest.raises(NotImplementedError):
        v(np.zeros((1, 28, 28, 3), np.float32), modality="audio")
