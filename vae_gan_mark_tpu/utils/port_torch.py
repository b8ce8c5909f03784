"""Convert a reference PyTorch checkpoint (v2/unet naming) into this
framework's parameter trees.

The reference saves ``model_state_dict`` for ``VAEGAN_UNet_SpatialFiLM``
(vae-gan-v2.py:283-327) with submodules ``style_vae_encoder_module`` /
``char_text_encoder_module`` / ``image_vae_decoder_module``. This module maps
that state dict onto ``VAEGANGenerator(cfg)``'s ``params``/``batch_stats``
trees, so pretrained reference checkpoints (e.g. the HF snapshot
``set_model.py`` downloads) can be served or fine-tuned here.

Weight-layout conventions (each verified by golden tests):
  * Conv2d  (out, in, kh, kw)  -> HWIO: transpose(2, 3, 1, 0)
  * ConvTranspose2d (in, out, kh, kw) -> transpose(2, 3, 0, 1) + flip both
    spatial axes (torch's transposed conv correlates with the flipped
    kernel relative to lax.conv_transpose)
  * BatchNorm weight/bias/running_mean/running_var -> scale/bias + stats
  * GRU weight_*_l{k}[_reverse] (3H, in) -> (in, 3H) transpose; gate order
    (r, z, n) is shared.

Use ``port_v2_generator(state_dict, cfg)`` -> (params, batch_stats).
Tested end-to-end in tests/test_torch_parity.py: outputs of a from-spec
torch model and the ported JAX model agree to float tolerance.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _t(x) -> np.ndarray:
    try:
        return x.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(x)


def conv_kernel(w) -> np.ndarray:
    return np.transpose(_t(w), (2, 3, 1, 0))


def tconv_kernel(w) -> np.ndarray:
    return np.transpose(_t(w), (2, 3, 0, 1))[::-1, ::-1].copy()


def _conv_bn_block(sd, prefix, conv_idx, bn_idx):
    params = {
        "Conv_0": {"kernel": conv_kernel(sd[f"{prefix}.{conv_idx}.weight"])},
        "BatchNorm_0": {"scale": _t(sd[f"{prefix}.{bn_idx}.weight"]),
                        "bias": _t(sd[f"{prefix}.{bn_idx}.bias"])},
    }
    if f"{prefix}.{conv_idx}.bias" in sd:
        params["Conv_0"]["bias"] = _t(sd[f"{prefix}.{conv_idx}.bias"])
    stats = {
        "BatchNorm_0": {"mean": _t(sd[f"{prefix}.{bn_idx}.running_mean"]),
                        "var": _t(sd[f"{prefix}.{bn_idx}.running_var"])},
    }
    return params, stats


def _double_conv(sd, prefix):
    p0, s0 = _conv_bn_block(sd, prefix, 0, 1)
    p1, s1 = _conv_bn_block(sd, prefix, 3, 4)
    return ({"ConvBNRelu_0": p0, "ConvBNRelu_1": p1},
            {"ConvBNRelu_0": s0, "ConvBNRelu_1": s1})


def _gru(sd, prefix, num_layers):
    out = {}
    for layer in range(num_layers):
        for name, suffix in ((f"l{layer}_fwd", ""),
                             (f"l{layer}_bwd", "_reverse")):
            out[name] = {
                "w_ih": _t(sd[f"{prefix}.weight_ih_l{layer}{suffix}"]).T,
                "w_hh": _t(sd[f"{prefix}.weight_hh_l{layer}{suffix}"]).T,
                "b_ih": _t(sd[f"{prefix}.bias_ih_l{layer}{suffix}"]),
                "b_hh": _t(sd[f"{prefix}.bias_hh_l{layer}{suffix}"]),
            }
    return out


def port_v2_generator(sd: Dict, cfg) -> Tuple[Dict, Dict]:
    """Reference ``model_state_dict`` (v2/unet naming) -> (params, batch_stats).

    Works for the 4-level "v2"/"unet" topologies (the unet config ignores the
    film entries, which that variant does not have).
    """
    n_levels = cfg.num_levels
    enc_p, enc_s = {}, {}
    enc = "style_vae_encoder_module"
    for i in range(n_levels):
        p, s = _double_conv(sd, f"{enc}.e_conv{i + 1}")
        enc_p[f"DoubleConvBlock_{i}"] = p
        enc_s[f"DoubleConvBlock_{i}"] = s
    p, s = _double_conv(sd, f"{enc}.bottleneck_conv")
    enc_p[f"DoubleConvBlock_{n_levels}"] = p
    enc_s[f"DoubleConvBlock_{n_levels}"] = s
    enc_p["_LatentHeads_0"] = {
        "mu_head": {"kernel": conv_kernel(sd[f"{enc}.mu_head.weight"]),
                    "bias": _t(sd[f"{enc}.mu_head.bias"])},
        "logvar_head": {
            "kernel": conv_kernel(sd[f"{enc}.logvar_head.weight"]),
            "bias": _t(sd[f"{enc}.logvar_head.bias"])},
    }

    txt = "char_text_encoder_module"
    text_p = {"_CharEmbedGRU_0": {
        "Embed_0": {"embedding": _t(sd[f"{txt}.embedding.weight"])},
        "BiGRU_0": _gru(sd, f"{txt}.rnn", cfg.char_rnn_layers),
    }}

    dec = "image_vae_decoder_module"
    dec_p, dec_s = {}, {}
    dec_p["TConvBNRelu_0"] = {
        "TConv_0": {"ConvTranspose_0": {
            "kernel": tconv_kernel(sd[f"{dec}.bottleneck_proc.0.weight"]),
            "bias": _t(sd[f"{dec}.bottleneck_proc.0.bias"])}},
        "BatchNorm_0": {"scale": _t(sd[f"{dec}.bottleneck_proc.1.weight"]),
                        "bias": _t(sd[f"{dec}.bottleneck_proc.1.bias"])},
    }
    dec_s["TConvBNRelu_0"] = {
        "BatchNorm_0": {
            "mean": _t(sd[f"{dec}.bottleneck_proc.1.running_mean"]),
            "var": _t(sd[f"{dec}.bottleneck_proc.1.running_var"])}}
    for i in range(n_levels):
        n = i + 1
        dec_p[f"TConv_{i}"] = {"ConvTranspose_0": {
            "kernel": tconv_kernel(sd[f"{dec}.up_tconv{n}.weight"]),
            "bias": _t(sd[f"{dec}.up_tconv{n}.bias"])}}
        film_prefix = f"{dec}.spatial_film{n}.param_predictor"
        if f"{film_prefix}.0.weight" in sd:
            dec_p[f"film{i}"] = {
                "predict_kernel": conv_kernel(sd[f"{film_prefix}.0.weight"]),
                "bn_scale": _t(sd[f"{film_prefix}.1.weight"]),
                "bn_bias": _t(sd[f"{film_prefix}.1.bias"]),
                "gb_kernel": conv_kernel(sd[f"{film_prefix}.3.weight"]),
                "gb_bias": _t(sd[f"{film_prefix}.3.bias"]),
            }
            dec_s[f"film{i}"] = {
                "bn_mean": _t(sd[f"{film_prefix}.1.running_mean"]),
                "bn_var": _t(sd[f"{film_prefix}.1.running_var"]),
            }
        p, s = _double_conv(sd, f"{dec}.conv_block{n}")
        dec_p[f"DoubleConvBlock_{i}"] = p
        dec_s[f"DoubleConvBlock_{i}"] = s
    dec_p["Conv_0"] = {
        "kernel": conv_kernel(sd[f"{dec}.final_image_conv.weight"]),
        "bias": _t(sd[f"{dec}.final_image_conv.bias"])}

    params = {"encoder": enc_p, "text_encoder": text_p, "decoder": dec_p}
    batch_stats = {"encoder": enc_s, "decoder": dec_s}
    return params, batch_stats
