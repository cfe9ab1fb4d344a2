"""Reference (PyTorch) checkpoint → Flax variables conversion.

Maps the reference ``FastSpeech2Align.state_dict()`` key space
(``model/fastspeech2_align.py:13-28``; checkpoint layout
``train.py:149-159``) onto this framework's parameter tree.  Input is a
mapping of key → numpy array (call ``{k: v.numpy() for k, v in
state_dict.items()}`` on the torch side), so this module has no torch
dependency.

Layout rules:
- torch ``nn.Linear.weight`` (out, in) → flax ``Dense.kernel`` (in, out): T
- torch ``nn.Conv1d.weight`` (out, in, k) → flax ``Conv.kernel``
  (k, in, out): transpose(2, 1, 0)
- torch ``nn.Embedding.weight`` → flax ``Embed.embedding``: copy
- torch ``LayerNorm/BatchNorm.weight/bias`` → flax ``scale/bias``;
  BatchNorm ``running_mean/var`` → ``batch_stats`` collection
- position-encoding and quantization-bin buffers are skipped (generated
  from config).
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

from ..config import ModelConfig


def _dense(sd, prefix):
    return {"kernel": np.ascontiguousarray(sd[prefix + ".weight"].T),
            "bias": sd[prefix + ".bias"]}


def _conv1d(sd, prefix):
    return {"kernel": np.ascontiguousarray(
        sd[prefix + ".weight"].transpose(2, 1, 0)),
        "bias": sd[prefix + ".bias"]}


def _norm(sd, prefix):
    return {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}


def _attention(sd, prefix):
    return {
        "w_q": _dense(sd, prefix + ".w_qs"),
        "w_k": _dense(sd, prefix + ".w_ks"),
        "w_v": _dense(sd, prefix + ".w_vs"),
        "fc": _dense(sd, prefix + ".fc"),
        "layer_norm": _norm(sd, prefix + ".layer_norm"),
    }


def _ffn(sd, prefix):
    return {
        "w_1": _conv1d(sd, prefix + ".w_1"),
        "w_2": _conv1d(sd, prefix + ".w_2"),
        "layer_norm": _norm(sd, prefix + ".layer_norm"),
    }


def _fft_stack(sd, prefix, n_layers, attn_name):
    out = {}
    for i in range(n_layers):
        lp = f"{prefix}.layer_stack.{i}"
        out[f"layer_{i}"] = {
            "attn": _attention(sd, f"{lp}.{attn_name}"),
            "pos_ffn": _ffn(sd, f"{lp}.pos_ffn"),
        }
    return out


def _variance_predictor(sd, prefix):
    cl = prefix + ".conv_layer"
    return {
        "conv1d_1": _conv1d(sd, cl + ".conv1d_1.conv"),
        "layer_norm_1": _norm(sd, cl + ".layer_norm_1"),
        "conv1d_2": _conv1d(sd, cl + ".conv1d_2.conv"),
        "layer_norm_2": _norm(sd, cl + ".layer_norm_2"),
        "linear_layer": _dense(sd, prefix + ".linear_layer"),
    }


def torch_state_dict_to_variables(sd: Mapping[str, np.ndarray],
                                  cfg: ModelConfig) -> dict[str, Any]:
    """Reference state_dict (numpy values) → {'params': ..., 'batch_stats':
    ...} for ``FastSpeech2Align.apply``."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    t = cfg.transformer

    params: dict[str, Any] = {}
    params["txt_encoder"] = {
        "src_word_emb": {"embedding": sd["txt_encoder.src_word_emb.weight"]},
        **_fft_stack(sd, "txt_encoder", t.encoder_layer, "slf_attn"),
    }
    params["mel_encoder"] = {
        "prenet": {
            "w_1": _dense(sd, "mel_encoder.prenet.w_1"),
            "w_2": _dense(sd, "mel_encoder.prenet.w_2"),
        },
        **_fft_stack(sd, "mel_encoder", t.decoder_layer, "crs_attn"),
    }
    params["mel_decoder"] = _fft_stack(
        sd, "mel_decoder", t.decoder_layer, "slf_attn")

    va = "variance_adaptor"
    params[va] = {
        "duration_predictor": _variance_predictor(
            sd, f"{va}.duration_predictor"),
        "pitch_predictor": _variance_predictor(sd, f"{va}.pitch_predictor"),
        "energy_predictor": _variance_predictor(
            sd, f"{va}.energy_predictor"),
        "pitch_embedding": {
            "embedding": sd[f"{va}.pitch_embedding.weight"]},
        "energy_embedding": {
            "embedding": sd[f"{va}.energy_embedding.weight"]},
    }
    params["mel_linear"] = _dense(sd, "mel_linear")

    postnet: dict[str, Any] = {}
    batch_stats: dict[str, Any] = {"postnet": {}}
    for i in range(5):
        conv = f"postnet.convolutions.{i}.0.conv"
        bn = f"postnet.convolutions.{i}.1"
        postnet[f"conv_{i}"] = _conv1d(sd, conv)
        postnet[f"bn_{i}"] = _norm(sd, bn)
        batch_stats["postnet"][f"bn_{i}"] = {
            "mean": sd[bn + ".running_mean"],
            "var": sd[bn + ".running_var"],
        }
    params["postnet"] = postnet

    if cfg.multi_speaker and "speaker_emb.weight" in sd:
        params["speaker_emb"] = {"embedding": sd["speaker_emb.weight"]}

    return {"params": params, "batch_stats": batch_stats}


def variables_to_torch_state_dict(variables: Mapping[str, Any],
                                  cfg: ModelConfig
                                  ) -> dict[str, np.ndarray]:
    """Inverse mapping (export for reference-side tooling)."""
    params = variables["params"]
    bstats = variables.get("batch_stats", {})
    t = cfg.transformer
    sd: dict[str, np.ndarray] = {}

    def put_dense(prefix, node):
        sd[prefix + ".weight"] = np.ascontiguousarray(
            np.asarray(node["kernel"]).T)
        sd[prefix + ".bias"] = np.asarray(node["bias"])

    def put_conv(prefix, node):
        sd[prefix + ".weight"] = np.ascontiguousarray(
            np.asarray(node["kernel"]).transpose(2, 1, 0))
        sd[prefix + ".bias"] = np.asarray(node["bias"])

    def put_norm(prefix, node):
        sd[prefix + ".weight"] = np.asarray(node["scale"])
        sd[prefix + ".bias"] = np.asarray(node["bias"])

    def put_stack(tree, prefix, n_layers, attn_name):
        for i in range(n_layers):
            node = tree[f"layer_{i}"]
            lp = f"{prefix}.layer_stack.{i}"
            a = node["attn"]
            put_dense(f"{lp}.{attn_name}.w_qs", a["w_q"])
            put_dense(f"{lp}.{attn_name}.w_ks", a["w_k"])
            put_dense(f"{lp}.{attn_name}.w_vs", a["w_v"])
            put_dense(f"{lp}.{attn_name}.fc", a["fc"])
            put_norm(f"{lp}.{attn_name}.layer_norm", a["layer_norm"])
            f = node["pos_ffn"]
            put_conv(f"{lp}.pos_ffn.w_1", f["w_1"])
            put_conv(f"{lp}.pos_ffn.w_2", f["w_2"])
            put_norm(f"{lp}.pos_ffn.layer_norm", f["layer_norm"])

    sd["txt_encoder.src_word_emb.weight"] = np.asarray(
        params["txt_encoder"]["src_word_emb"]["embedding"])
    put_stack(params["txt_encoder"], "txt_encoder", t.encoder_layer,
              "slf_attn")
    put_dense("mel_encoder.prenet.w_1", params["mel_encoder"]["prenet"]["w_1"])
    put_dense("mel_encoder.prenet.w_2", params["mel_encoder"]["prenet"]["w_2"])
    put_stack(params["mel_encoder"], "mel_encoder", t.decoder_layer,
              "crs_attn")
    put_stack(params["mel_decoder"], "mel_decoder", t.decoder_layer,
              "slf_attn")

    for name in ("duration_predictor", "pitch_predictor", "energy_predictor"):
        node = params["variance_adaptor"][name]
        p = f"variance_adaptor.{name}"
        put_conv(f"{p}.conv_layer.conv1d_1.conv", node["conv1d_1"])
        put_norm(f"{p}.conv_layer.layer_norm_1", node["layer_norm_1"])
        put_conv(f"{p}.conv_layer.conv1d_2.conv", node["conv1d_2"])
        put_norm(f"{p}.conv_layer.layer_norm_2", node["layer_norm_2"])
        put_dense(f"{p}.linear_layer", node["linear_layer"])
    for name in ("pitch_embedding", "energy_embedding"):
        sd[f"variance_adaptor.{name}.weight"] = np.asarray(
            params["variance_adaptor"][name]["embedding"])
    put_dense("mel_linear", params["mel_linear"])
    for i in range(5):
        put_conv(f"postnet.convolutions.{i}.0.conv",
                 params["postnet"][f"conv_{i}"])
        put_norm(f"postnet.convolutions.{i}.1", params["postnet"][f"bn_{i}"])
        if bstats:
            sd[f"postnet.convolutions.{i}.1.running_mean"] = np.asarray(
                bstats["postnet"][f"bn_{i}"]["mean"])
            sd[f"postnet.convolutions.{i}.1.running_var"] = np.asarray(
                bstats["postnet"][f"bn_{i}"]["var"])
    return sd
