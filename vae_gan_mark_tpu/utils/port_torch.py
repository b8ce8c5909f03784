"""Convert a reference PyTorch checkpoint (any of the five variants' key
schemes) into this framework's parameter trees.

Key schemes in the reference:
  * v2/unet (vae-gan-v2.py:283-327): submodules
    ``style_vae_encoder_module`` / ``char_text_encoder_module`` /
    ``image_vae_decoder_module`` -> ``port_v2_generator``;
  * oldv (vae-gan-oldv.py:323-368): same submodule names plus
    ``conv1d`` + ``pos_enc`` in the text encoder and
    ``skip_gates.{i}.alpha`` in the decoder — handled by
    ``port_v2_generator`` automatically (keys detected by presence);
  * vanilla/lr_sh (vae-gan.py:47-146): ``encoder.feat`` / ``decoder.decode``
    nn.Sequential indices plus the SBERT projection ``text_encoder.fc``
    -> ``port_vanilla_generator`` (the frozen MiniLM weights under
    ``text_encoder.model.*`` are not ported — only the Linear trains,
    vae-gan.py:110-115; embeddings are precomputed in our input pipeline).

``port_generator(sd, cfg)`` dispatches on ``cfg.generator``. The output maps
onto ``VAEGANGenerator(cfg)``'s ``params``/``batch_stats`` trees, so
pretrained reference checkpoints (e.g. the HF snapshot ``set_model.py``
downloads) can be served or fine-tuned here.

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
    if f"{txt}.conv1d.weight" in sd:
        # oldv extras (vae-gan-oldv.py:105-115): Conv1d (out, in, k) ->
        # flax (k, in, out); pos_enc (1, C, H, W) -> (1, H, W, C).
        text_p["Conv_0"] = {
            "kernel": np.transpose(_t(sd[f"{txt}.conv1d.weight"]), (2, 1, 0)),
            "bias": _t(sd[f"{txt}.conv1d.bias"])}
        text_p["pos_enc"] = np.transpose(
            _t(sd[f"{txt}.pos_enc"]), (0, 2, 3, 1))

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
        if f"{dec}.skip_gates.{i}.alpha" in sd:
            # oldv gated skips (vae-gan-oldv.py:226-246): skip_gates[0] is
            # the deepest — same order as our gate{i}. torch alpha is
            # (1, C, 1, 1); ours is (C,).
            dec_p[f"gate{i}"] = {
                "alpha": _t(sd[f"{dec}.skip_gates.{i}.alpha"]).reshape(-1)}
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


def port_vanilla_generator(sd: Dict, cfg) -> Tuple[Dict, Dict]:
    """Reference ``model_state_dict`` (vanilla/lr_sh naming,
    vae-gan.py:47-146) -> (params, batch_stats).

    ``encoder.feat`` is an nn.Sequential of [Conv, BN, ReLU] x 4
    (indices 0,1 / 3,4 / 6,7 / 9,10); ``decoder.decode`` is
    [ConvTranspose, BN, ReLU] x 5 + Conv + Sigmoid (tconv/bn at
    0,1 / 3,4 / 6,7 / 9,10 / 12,13; final conv at 15). The SBERT MiniLM
    under ``text_encoder.model.*`` is frozen in the reference and is not
    ported; only ``text_encoder.fc`` (the trainable 384->TEXT_CH Linear) is.
    """
    enc_p, enc_s = {}, {}
    for i, (ci, bi) in enumerate([(0, 1), (3, 4), (6, 7), (9, 10)]):
        p, s = _conv_bn_block(sd, "encoder.feat", ci, bi)
        enc_p[f"ConvBNRelu_{i}"] = p
        enc_s[f"ConvBNRelu_{i}"] = s
    enc_p["_LatentHeads_0"] = {
        "mu_head": {"kernel": conv_kernel(sd["encoder.mu_head.weight"]),
                    "bias": _t(sd["encoder.mu_head.bias"])},
        "logvar_head": {
            "kernel": conv_kernel(sd["encoder.logvar_head.weight"]),
            "bias": _t(sd["encoder.logvar_head.bias"])},
    }

    text_p = {"Dense_0": {"kernel": _t(sd["text_encoder.fc.weight"]).T,
                          "bias": _t(sd["text_encoder.fc.bias"])}}

    dec_p, dec_s = {}, {}
    for i, (ti, bi) in enumerate([(0, 1), (3, 4), (6, 7), (9, 10), (12, 13)]):
        dec_p[f"TConvBNRelu_{i}"] = {
            "TConv_0": {"ConvTranspose_0": {
                "kernel": tconv_kernel(sd[f"decoder.decode.{ti}.weight"]),
                "bias": _t(sd[f"decoder.decode.{ti}.bias"])}},
            "BatchNorm_0": {
                "scale": _t(sd[f"decoder.decode.{bi}.weight"]),
                "bias": _t(sd[f"decoder.decode.{bi}.bias"])},
        }
        dec_s[f"TConvBNRelu_{i}"] = {"BatchNorm_0": {
            "mean": _t(sd[f"decoder.decode.{bi}.running_mean"]),
            "var": _t(sd[f"decoder.decode.{bi}.running_var"])}}
    dec_p["Conv_0"] = {
        "kernel": conv_kernel(sd["decoder.decode.15.weight"]),
        "bias": _t(sd["decoder.decode.15.bias"])}

    params = {"encoder": enc_p, "text_encoder": text_p, "decoder": dec_p}
    batch_stats = {"encoder": enc_s, "decoder": dec_s}
    return params, batch_stats


def port_generator(sd: Dict, cfg) -> Tuple[Dict, Dict]:
    """Dispatch on the config's generator family: "plain" -> vanilla/lr_sh
    scheme, everything else -> the v2/unet/oldv scheme."""
    if cfg.generator == "plain":
        return port_vanilla_generator(sd, cfg)
    return port_v2_generator(sd, cfg)


def port_discriminator(sd: Dict) -> Tuple[Dict, Dict]:
    """Reference ``disc_state_dict`` -> (params, spectral) for
    ``PatchDiscriminator``.

    The reference discriminator (vae-gan.py:148-159, attribute ``body``) is
    an nn.Sequential: spectral conv at 0, 2, 5, 8 (each storing
    ``weight_orig`` + power-iteration ``weight_u``), InstanceNorm(affine) at
    3, 6, 9, final plain conv at 11. Porting ``weight_u`` too makes the
    power-iteration state identical, so subsequent steps on both frameworks
    advance sigma through the same sequence.
    """
    prefix = "body" if any(k.startswith("body.") for k in sd) else "net"
    params, spectral = {}, {}
    for i, idx in enumerate((0, 2, 5, 8)):
        params[f"SpectralConv_{i}"] = {
            "kernel": conv_kernel(sd[f"{prefix}.{idx}.weight_orig"]),
            "bias": _t(sd[f"{prefix}.{idx}.bias"]),
        }
        spectral[f"SpectralConv_{i}"] = {
            "u": _t(sd[f"{prefix}.{idx}.weight_u"])}
    for i, idx in enumerate((3, 6, 9)):
        params[f"InstanceNorm_{i}"] = {
            "scale": _t(sd[f"{prefix}.{idx}.weight"]),
            "bias": _t(sd[f"{prefix}.{idx}.bias"])}
    params["Conv_0"] = {
        "kernel": conv_kernel(sd[f"{prefix}.11.weight"]),
        "bias": _t(sd[f"{prefix}.11.bias"])}
    return params, spectral


def port_vgg_head(sd: Dict, prefix: str = "net") -> Dict:
    """torch VGG16 ``features[:16]`` state dict -> ``load_vgg_params`` tree.

    Conv layers sit at Sequential indices 0, 2, 5, 7, 10, 12, 14 (7 convs:
    64,64 | 128,128 | 256,256,256 — vae-gan.py:300-311's torchvision cut).
    Accepts either a bare ``features``-style dict ("0.weight", ...) or one
    under ``prefix``.
    """
    key = (lambda i, leaf: f"{prefix}.{i}.{leaf}") \
        if any(k.startswith(f"{prefix}.") for k in sd) \
        else (lambda i, leaf: f"{i}.{leaf}")
    params = {}
    for ci, idx in enumerate((0, 2, 5, 7, 10, 12, 14)):
        params[f"conv{ci}"] = {
            "kernel": conv_kernel(sd[key(idx, "weight")]),
            "bias": _t(sd[key(idx, "bias")])}
    return params
