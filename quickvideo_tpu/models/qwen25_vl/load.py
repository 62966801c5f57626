"""HF checkpoint -> JAX params.

Loads Qwen2.5-VL safetensors (the reference loads the same checkpoints via
`AutoModelForImageTextToText.from_pretrained`, reference lvu/lvu.py:11-16) and
maps them into this package's stacked-by-layer pytrees. Supports both the
modern HF layout (`model.language_model.*` / `model.visual.*`, transformers
>= 4.52) and the legacy layout (`model.*` / `visual.*`).
"""

from __future__ import annotations

import os
from typing import Callable, Dict

import numpy as np
import jax.numpy as jnp

from quickvideo_tpu.models.qwen25_vl.config import ModelConfig


def _normalize_key(k: str) -> str:
    for pre, post in (
        ("model.language_model.", "language."),
        ("model.visual.", "visual."),
        ("model.layers.", "language.layers."),
        ("model.embed_tokens.", "language.embed_tokens."),
        ("model.norm.", "language.norm."),
        ("visual.", "visual."),
        ("lm_head.", "lm_head."),
        ("language_model.", "language."),
    ):
        if k.startswith(pre):
            return post + k[len(pre):]
    return k


def params_from_state_dict(
    state: Dict[str, np.ndarray], cfg: ModelConfig, dtype=jnp.bfloat16
):
    """Convert a flat HF state dict (numpy arrays) into
    {"language": ..., "vision": ...} pytrees (see language.init_language_params
    / vision.init_vision_params for the target structure)."""
    state = {_normalize_key(k): v for k, v in state.items()}
    t = cfg.text
    v = cfg.vision

    def get(name):
        if name not in state:
            raise KeyError(
                f"missing weight {name!r}; have e.g. {sorted(state)[:8]}"
            )
        return np.asarray(state[name])

    def stack(fmt, n, transpose=False):
        mats = [get(fmt.format(i)) for i in range(n)]
        arr = np.stack([m.T if transpose else m for m in mats], axis=0)
        return jnp.asarray(arr, dtype)

    nl = t.num_hidden_layers
    lang = {
        "embed": jnp.asarray(get("language.embed_tokens.weight"), dtype),
        "layers": {
            "ln1": stack("language.layers.{}.input_layernorm.weight", nl),
            "ln2": stack("language.layers.{}.post_attention_layernorm.weight", nl),
            "wq": stack("language.layers.{}.self_attn.q_proj.weight", nl, True),
            "bq": stack("language.layers.{}.self_attn.q_proj.bias", nl),
            "wk": stack("language.layers.{}.self_attn.k_proj.weight", nl, True),
            "bk": stack("language.layers.{}.self_attn.k_proj.bias", nl),
            "wv": stack("language.layers.{}.self_attn.v_proj.weight", nl, True),
            "bv": stack("language.layers.{}.self_attn.v_proj.bias", nl),
            "wo": stack("language.layers.{}.self_attn.o_proj.weight", nl, True),
            "wg": stack("language.layers.{}.mlp.gate_proj.weight", nl, True),
            "wu": stack("language.layers.{}.mlp.up_proj.weight", nl, True),
            "wd": stack("language.layers.{}.mlp.down_proj.weight", nl, True),
        },
        "norm": jnp.asarray(get("language.norm.weight"), dtype),
        "lm_head": jnp.asarray(
            (get("language.embed_tokens.weight") if t.tie_word_embeddings
             else get("lm_head.weight")).T,
            dtype,
        ),
    }

    nv = v.depth
    # HF fuses qkv into one Linear (visual.blocks.i.attn.qkv)
    vision = {
        "patch_embed": jnp.asarray(
            get("visual.patch_embed.proj.weight").reshape(v.hidden_size, -1).T,
            dtype,
        ),
        "blocks": {
            "ln1": stack("visual.blocks.{}.norm1.weight", nv),
            "ln2": stack("visual.blocks.{}.norm2.weight", nv),
            "wqkv": stack("visual.blocks.{}.attn.qkv.weight", nv, True),
            "bqkv": stack("visual.blocks.{}.attn.qkv.bias", nv),
            "wo": stack("visual.blocks.{}.attn.proj.weight", nv, True),
            "bo": stack("visual.blocks.{}.attn.proj.bias", nv),
            "wg": stack("visual.blocks.{}.mlp.gate_proj.weight", nv, True),
            "bg": stack("visual.blocks.{}.mlp.gate_proj.bias", nv),
            "wu": stack("visual.blocks.{}.mlp.up_proj.weight", nv, True),
            "bu": stack("visual.blocks.{}.mlp.up_proj.bias", nv),
            "wd": stack("visual.blocks.{}.mlp.down_proj.weight", nv, True),
            "bd": stack("visual.blocks.{}.mlp.down_proj.bias", nv),
        },
        "merger": {
            "ln_q": jnp.asarray(get("visual.merger.ln_q.weight"), dtype),
            "w1": jnp.asarray(get("visual.merger.mlp.0.weight").T, dtype),
            "b1": jnp.asarray(get("visual.merger.mlp.0.bias"), dtype),
            "w2": jnp.asarray(get("visual.merger.mlp.2.weight").T, dtype),
            "b2": jnp.asarray(get("visual.merger.mlp.2.bias"), dtype),
        },
    }
    return {"language": lang, "vision": vision}


def load_params(model_dir: str, cfg: ModelConfig, dtype=jnp.bfloat16):
    """Read all *.safetensors shards in an HF snapshot directory."""
    from safetensors import safe_open

    state: Dict[str, np.ndarray] = {}
    shards = sorted(
        f for f in os.listdir(model_dir) if f.endswith(".safetensors")
    )
    if not shards:
        raise FileNotFoundError(f"no safetensors in {model_dir}")
    for shard in shards:
        with safe_open(os.path.join(model_dir, shard), framework="np") as f:
            for k in f.keys():
                state[k] = f.get_tensor(k)
    return params_from_state_dict(state, cfg, dtype)


def load_params_sharded(
    model_dir: str, cfg: ModelConfig, mesh, dtype=jnp.bfloat16
):
    """Streaming sharded load for checkpoints larger than host RAM (72B over
    a TP mesh): tensors are read one at a time from the safetensors shards
    and placed directly with their mesh sharding, so peak host memory is one
    stacked layer group, not the model.

    Layer-stacked leaves are assembled per layer with jnp.stack on device;
    everything else is placed whole.
    """
    import jax
    from jax.sharding import NamedSharding

    from safetensors import safe_open

    from quickvideo_tpu.parallel.sharding import param_shardings

    specs = param_shardings(mesh)

    # index: HF tensor name -> shard file
    shards = sorted(
        f for f in os.listdir(model_dir) if f.endswith(".safetensors")
    )
    name_to_file: Dict[str, str] = {}
    handles = {}
    for shard in shards:
        path = os.path.join(model_dir, shard)
        handles[shard] = safe_open(path, framework="np")
        for k in handles[shard].keys():
            name_to_file[_normalize_key(k)] = (shard, k)

    def fetch(norm_name):
        shard, orig = name_to_file[norm_name]
        return handles[shard].get_tensor(orig)

    def place(arr, spec):
        return jax.device_put(
            jnp.asarray(arr, dtype), NamedSharding(mesh, spec)
        )

    t = cfg.text
    nl = t.num_hidden_layers

    def stacked(fmt, spec, transpose=False):
        rows = []
        for i in range(nl):
            m = fetch(fmt.format(i))
            rows.append(m.T if transpose else m)
        return place(np.stack(rows, axis=0), spec)

    ls = specs["language"]["layers"]
    lang = {
        "embed": place(fetch("language.embed_tokens.weight"),
                       specs["language"]["embed"]),
        "layers": {
            "ln1": stacked("language.layers.{}.input_layernorm.weight", ls["ln1"]),
            "ln2": stacked("language.layers.{}.post_attention_layernorm.weight", ls["ln2"]),
            "wq": stacked("language.layers.{}.self_attn.q_proj.weight", ls["wq"], True),
            "bq": stacked("language.layers.{}.self_attn.q_proj.bias", ls["bq"]),
            "wk": stacked("language.layers.{}.self_attn.k_proj.weight", ls["wk"], True),
            "bk": stacked("language.layers.{}.self_attn.k_proj.bias", ls["bk"]),
            "wv": stacked("language.layers.{}.self_attn.v_proj.weight", ls["wv"], True),
            "bv": stacked("language.layers.{}.self_attn.v_proj.bias", ls["bv"]),
            "wo": stacked("language.layers.{}.self_attn.o_proj.weight", ls["wo"], True),
            "wg": stacked("language.layers.{}.mlp.gate_proj.weight", ls["wg"], True),
            "wu": stacked("language.layers.{}.mlp.up_proj.weight", ls["wu"], True),
            "wd": stacked("language.layers.{}.mlp.down_proj.weight", ls["wd"], True),
        },
        "norm": place(fetch("language.norm.weight"), specs["language"]["norm"]),
        "lm_head": place(
            (fetch("language.embed_tokens.weight") if t.tie_word_embeddings
             else fetch("lm_head.weight")).T,
            specs["language"]["lm_head"],
        ),
    }
    # vision tower is small: assemble then place with its (replicated) specs
    vision = _vision_from_fetch(fetch, cfg, dtype)
    vision = jax.tree.map(
        lambda a, sp: jax.device_put(a, NamedSharding(mesh, sp)),
        vision, specs["vision"],
    )
    return {"language": lang, "vision": vision}


def _vision_from_fetch(fetch, cfg: ModelConfig, dtype):
    v = cfg.vision
    nv = v.depth

    def stack(fmt, transpose=False):
        return jnp.asarray(
            np.stack(
                [fetch(fmt.format(i)).T if transpose else fetch(fmt.format(i))
                 for i in range(nv)], axis=0,
            ), dtype,
        )

    return {
        "patch_embed": jnp.asarray(
            fetch("visual.patch_embed.proj.weight").reshape(v.hidden_size, -1).T,
            dtype,
        ),
        "blocks": {
            "ln1": stack("visual.blocks.{}.norm1.weight"),
            "ln2": stack("visual.blocks.{}.norm2.weight"),
            "wqkv": stack("visual.blocks.{}.attn.qkv.weight", True),
            "bqkv": stack("visual.blocks.{}.attn.qkv.bias"),
            "wo": stack("visual.blocks.{}.attn.proj.weight", True),
            "bo": stack("visual.blocks.{}.attn.proj.bias"),
            "wg": stack("visual.blocks.{}.mlp.gate_proj.weight", True),
            "bg": stack("visual.blocks.{}.mlp.gate_proj.bias"),
            "wu": stack("visual.blocks.{}.mlp.up_proj.weight", True),
            "bu": stack("visual.blocks.{}.mlp.up_proj.bias"),
            "wd": stack("visual.blocks.{}.mlp.down_proj.weight", True),
            "bd": stack("visual.blocks.{}.mlp.down_proj.bias"),
        },
        "merger": {
            "ln_q": jnp.asarray(fetch("visual.merger.ln_q.weight"), dtype),
            "w1": jnp.asarray(fetch("visual.merger.mlp.0.weight").T, dtype),
            "b1": jnp.asarray(fetch("visual.merger.mlp.0.bias"), dtype),
            "w2": jnp.asarray(fetch("visual.merger.mlp.2.weight").T, dtype),
            "b2": jnp.asarray(fetch("visual.merger.mlp.2.bias"), dtype),
        },
    }


def params_from_torch_model(torch_model, cfg: ModelConfig, dtype=jnp.bfloat16):
    """Convert a live torch Qwen2_5_VLForConditionalGeneration (test helper —
    parity tests build tiny random torch models and compare numerics)."""
    state = {
        k: v.detach().to("cpu").float().numpy()
        for k, v in torch_model.state_dict().items()
    }
    return params_from_state_dict(state, cfg, dtype)
