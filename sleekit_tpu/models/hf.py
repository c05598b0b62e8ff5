"""HuggingFace checkpoint conversion: torch state dicts -> param pytrees.

Covers the reference's evaluation models (OPT-125M/350M, BLOOM-560M -
SURVEY.md §6) plus Llama-class serving targets. Keys are mapped from the
public HF implementations; logit parity with the HF torch forward is
pinned by tests/test_hf_parity.py on tiny random-init models (no network
or weight cache needed).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict

import numpy as np
import jax.numpy as jnp

from sleekit_tpu.models.transformer import TransformerConfig


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a checkpoint directory or file into numpy arrays.

    Supports single/sharded .safetensors and pytorch_model.bin layouts.
    """
    if os.path.isfile(path):
        files = [path]
    else:
        index = os.path.join(path, "model.safetensors.index.json")
        if os.path.exists(index):
            with open(index) as f:
                shards = sorted(set(json.load(f)["weight_map"].values()))
            files = [os.path.join(path, s) for s in shards]
        elif os.path.exists(os.path.join(path, "model.safetensors")):
            files = [os.path.join(path, "model.safetensors")]
        elif os.path.exists(os.path.join(path, "pytorch_model.bin")):
            files = [os.path.join(path, "pytorch_model.bin")]
        else:
            raise FileNotFoundError(f"no checkpoint found under {path}")

    sd: Dict[str, np.ndarray] = {}
    for f in files:
        if f.endswith(".safetensors"):
            from safetensors.numpy import load_file
            sd.update(load_file(f))
        else:
            import torch
            raw = torch.load(f, map_location="cpu", weights_only=True)
            sd.update({k: v.to(torch.float32).numpy() for k, v in raw.items()})
    return {k: np.asarray(v, np.float32) for k, v in sd.items()}


def _lin(sd, prefix, transpose=True):
    p = {"kernel": jnp.asarray(sd[prefix + ".weight"].T if transpose
                               else sd[prefix + ".weight"])}
    if prefix + ".bias" in sd:
        p["bias"] = jnp.asarray(sd[prefix + ".bias"])
    return p


def _norm(sd, prefix):
    p = {"scale": jnp.asarray(sd[prefix + ".weight"])}
    if prefix + ".bias" in sd:
        p["bias"] = jnp.asarray(sd[prefix + ".bias"])
    return p


def convert_opt(cfg: TransformerConfig, sd: Dict[str, np.ndarray]):
    """facebook/opt-* (HF OPTForCausalLM state dict)."""
    pre = "model.decoder."
    params: Dict[str, Any] = {"embed": {
        "tokens": jnp.asarray(sd[pre + "embed_tokens.weight"]),
        "pos": jnp.asarray(sd[pre + "embed_positions.weight"]),
    }}
    if pre + "project_in.weight" in sd:
        params["embed"]["project_in"] = _lin(sd, pre + "project_in")
        params["embed"]["project_out"] = _lin(sd, pre + "project_out")
    layers = []
    for i in range(cfg.n_layers):
        lp = f"{pre}layers.{i}."
        layers.append({
            "ln1": _norm(sd, lp + "self_attn_layer_norm"),
            "ln2": _norm(sd, lp + "final_layer_norm"),
            "attn": {
                "q": _lin(sd, lp + "self_attn.q_proj"),
                "k": _lin(sd, lp + "self_attn.k_proj"),
                "v": _lin(sd, lp + "self_attn.v_proj"),
                "o": _lin(sd, lp + "self_attn.out_proj"),
            },
            "mlp": {
                "fc1": _lin(sd, lp + "fc1"),
                "fc2": _lin(sd, lp + "fc2"),
            },
        })
    params["layers"] = layers
    if cfg.final_ln:
        params["final_ln"] = _norm(sd, pre + "final_layer_norm")
    return params


def convert_bloom(cfg: TransformerConfig, sd: Dict[str, np.ndarray]):
    """bigscience/bloom-* (HF BloomForCausalLM state dict).

    The fused query_key_value weight interleaves q/k/v per head
    ((n_head, 3, head_dim) row blocks); split into our separate q/k/v.
    """
    pre = "transformer."
    d, nh, hd = cfg.d_model, cfg.n_heads, cfg.head_dim
    params: Dict[str, Any] = {"embed": {
        "tokens": jnp.asarray(sd[pre + "word_embeddings.weight"]),
        "ln": _norm(sd, pre + "word_embeddings_layernorm"),
    }}
    layers = []
    for i in range(cfg.n_layers):
        lp = f"{pre}h.{i}."
        qkv_w = sd[lp + "self_attention.query_key_value.weight"]
        qkv_b = sd[lp + "self_attention.query_key_value.bias"]
        w = qkv_w.reshape(nh, 3, hd, d)
        b = qkv_b.reshape(nh, 3, hd)

        def split(j):
            return {"kernel": jnp.asarray(w[:, j].reshape(nh * hd, d).T),
                    "bias": jnp.asarray(b[:, j].reshape(nh * hd))}

        layers.append({
            "ln1": _norm(sd, lp + "input_layernorm"),
            "ln2": _norm(sd, lp + "post_attention_layernorm"),
            "attn": {
                "q": split(0), "k": split(1), "v": split(2),
                "o": _lin(sd, lp + "self_attention.dense"),
            },
            "mlp": {
                "fc1": _lin(sd, lp + "mlp.dense_h_to_4h"),
                "fc2": _lin(sd, lp + "mlp.dense_4h_to_h"),
            },
        })
    params["layers"] = layers
    params["final_ln"] = _norm(sd, pre + "ln_f")
    return params


def convert_llama(cfg: TransformerConfig, sd: Dict[str, np.ndarray]):
    """meta-llama/Llama-* (HF LlamaForCausalLM state dict)."""
    pre = "model."
    params: Dict[str, Any] = {"embed": {
        "tokens": jnp.asarray(sd[pre + "embed_tokens.weight"]),
    }}
    layers = []
    for i in range(cfg.n_layers):
        lp = f"{pre}layers.{i}."
        layers.append({
            "ln1": {"scale": jnp.asarray(sd[lp + "input_layernorm.weight"])},
            "ln2": {"scale": jnp.asarray(sd[lp + "post_attention_layernorm.weight"])},
            "attn": {
                "q": _lin(sd, lp + "self_attn.q_proj"),
                "k": _lin(sd, lp + "self_attn.k_proj"),
                "v": _lin(sd, lp + "self_attn.v_proj"),
                "o": _lin(sd, lp + "self_attn.o_proj"),
            },
            "mlp": {
                "gate": _lin(sd, lp + "mlp.gate_proj"),
                "up": _lin(sd, lp + "mlp.up_proj"),
                "down": _lin(sd, lp + "mlp.down_proj"),
            },
        })
    params["layers"] = layers
    params["final_ln"] = {"scale": jnp.asarray(sd[pre + "norm.weight"])}
    if "lm_head.weight" in sd:
        params["lm_head"] = {"kernel": jnp.asarray(sd["lm_head.weight"].T)}
    return params


_CONVERTERS = {
    "opt": convert_opt,
    "bloom": convert_bloom,
    "llama": convert_llama,
    # Qwen2ForCausalLM uses the llama module naming (model.layers.i.
    # self_attn.q_proj, ...); its q/k/v biases ride through _lin.
    "qwen": convert_llama,
}


def family_of(model_name: str) -> str:
    for fam in _CONVERTERS:
        if fam in model_name.lower():
            return fam
    raise ValueError(f"cannot infer model family from {model_name!r}")


def load_hf_checkpoint(cfg: TransformerConfig, model_name: str, path: str):
    """Convert a local HF checkpoint into our param tree."""
    sd = load_state_dict(path)
    return _CONVERTERS[family_of(model_name)](cfg, sd)
