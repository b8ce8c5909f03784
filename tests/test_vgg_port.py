"""Golden test for the VGG16 weight porter (tools/port_vgg16.py).

torchvision (and network egress to fetch IMAGENET1K_V1) are unavailable in
this environment, so the test fabricates a torchvision-*format* VGG16
``features[:16]`` in plain torch — the exact Sequential layout torchvision
builds (Conv2d at indices 0,2,5,7,10,12,14 with ReLU/MaxPool between,
/root/reference/vae-gan.py:300-311 slices this trunk) — with random weights,
round-trips its state dict through the converter CLI, and asserts the JAX
perceptual extractor (models/vgg.py) loads the npz and matches the torch
forward. This pins the only path to real perceptual-weight parity end to end
without the real checkpoint.
"""

import subprocess
import sys

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from vae_gan_mark_tpu.models.vgg import (  # noqa: E402
    IMAGENET_MEAN, IMAGENET_STD, load_vgg_params, vgg_features)


def build_features16():
    """torchvision vgg16().features[:16], rebuilt layer-for-layer."""
    import torch.nn as tnn
    torch.manual_seed(16)
    return tnn.Sequential(
        tnn.Conv2d(3, 64, 3, padding=1), tnn.ReLU(inplace=True),
        tnn.Conv2d(64, 64, 3, padding=1), tnn.ReLU(inplace=True),
        tnn.MaxPool2d(2, 2),
        tnn.Conv2d(64, 128, 3, padding=1), tnn.ReLU(inplace=True),
        tnn.Conv2d(128, 128, 3, padding=1), tnn.ReLU(inplace=True),
        tnn.MaxPool2d(2, 2),
        tnn.Conv2d(128, 256, 3, padding=1), tnn.ReLU(inplace=True),
        tnn.Conv2d(256, 256, 3, padding=1), tnn.ReLU(inplace=True),
        tnn.Conv2d(256, 256, 3, padding=1), tnn.ReLU(inplace=True),
    )


def test_port_vgg16_state_dict_to_jax_forward_parity(tmp_path):
    feats = build_features16().eval()
    # Full-model key scheme, exactly what torch.load of a torchvision
    # checkpoint yields for the features trunk.
    sd = {f"features.{k}": v for k, v in feats.state_dict().items()}
    sd_path = tmp_path / "vgg16_fabricated.pth"
    torch.save(sd, sd_path)

    npz_path = tmp_path / "vgg16_features.npz"
    res = subprocess.run(
        [sys.executable, "tools/port_vgg16.py",
         "--state-dict", str(sd_path), "--out", str(npz_path)],
        capture_output=True, text=True)
    assert res.returncode == 0, res.stderr
    assert "wrote 7 conv layers" in res.stdout

    params = load_vgg_params(path=str(npz_path))
    # Loaded weights, not the random init: conv0 kernel must match the
    # fabricated torch weights (HWIO <- OIHW).
    w0 = feats[0].weight.detach().numpy()
    np.testing.assert_array_equal(
        np.asarray(params["conv0"]["kernel"]),
        np.transpose(w0, (2, 3, 1, 0)))

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (2, 32, 64, 3)).astype(np.float32)
    got = np.asarray(vgg_features(params, jnp.asarray(x)))

    # Torch side normalizes outside the trunk (the reference's transform).
    mean = np.asarray(IMAGENET_MEAN, np.float32).reshape(1, 3, 1, 1)
    std = np.asarray(IMAGENET_STD, np.float32).reshape(1, 3, 1, 1)
    x_t = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    with torch.no_grad():
        want = feats((x_t - torch.from_numpy(mean))
                     / torch.from_numpy(std)).numpy()
    want = np.transpose(want, (0, 2, 3, 1))  # NCHW -> NHWC
    assert got.shape == want.shape == (2, 8, 16, 256)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_convert_state_dict_accepts_sliced_keys():
    """model.features[:16].state_dict() keys ('0.weight') work too."""
    sys.path.insert(0, "tools")
    try:
        from port_vgg16 import convert_state_dict
    finally:
        sys.path.pop(0)
    feats = build_features16()
    arrays = convert_state_dict(
        {k: v.detach().numpy() for k, v in feats.state_dict().items()})
    assert sorted(arrays) == sorted(
        [f"conv{i}_{p}" for i in range(7) for p in ("kernel", "bias")])
    assert arrays["conv6_kernel"].shape == (3, 3, 256, 256)
