"""Reference-checkpoint compatibility.

Maps a torch ``state_dict`` from the reference implementation (e.g. the
released ``burgers_*_.pt`` files loaded with ``torch.load``) onto this
framework's parameter tree, so models trained with the reference can be
served/evaluated/fine-tuned here directly.

Handles the module families of SimpleTransformer / FourierTransformer2D /
FourierTransformer2DLite:
  * attention projections + fc  (torch Linear (out,in) -> flax (in,out))
  * per-head norm ModuleLists   -> stacked (H, d_k) scale/bias
  * encoder LayerNorms, FeedForward
  * SpectralConv fourier weights (real pairs, layout-identical)
  * Pointwise/Spectral regressor stacks, Identity lifts

Unknown keys are reported, never silently dropped.
"""
from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np


def _to_numpy(t):
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def convert_state_dict(state_dict: Dict[str, "np.ndarray"]) -> Tuple[dict, list]:
    """torch state_dict -> nested flax params dict.

    Returns (params, unmatched_keys).
    """
    sd = {k: _to_numpy(v) for k, v in state_dict.items()}
    out: dict = {}
    unmatched = []

    def put(path, value):
        node = out
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    # group per-head norm entries: ...norm_K.0.weight etc.
    norm_groups: dict = {}

    for key, val in sd.items():
        m = re.match(r"encoder_layers\.(\d+)\.(.*)", key)
        if m:
            layer = f"encoder_layer{m.group(1)}"
            rest = m.group(2)
            # attention projections
            m2 = re.match(r"attn\.linears\.([012])\.(weight|bias)", rest)
            if m2:
                nm = ("q_proj", "k_proj", "v_proj")[int(m2.group(1))]
                if m2.group(2) == "weight":
                    put((layer, "attn", nm, "kernel"), val.T)
                else:
                    put((layer, "attn", nm, "bias"), val)
                continue
            m2 = re.match(r"attn\.fc\.(weight|bias)", rest)
            if m2:
                put((layer, "attn", "fc",
                     "kernel" if m2.group(1) == "weight" else "bias"),
                    val.T if m2.group(1) == "weight" else val)
                continue
            m2 = re.match(r"attn\.norm_([KQV])\.(\d+)\.(weight|bias)", rest)
            if m2:
                which, head, wb = m2.group(1), int(m2.group(2)), m2.group(3)
                norm_groups.setdefault((layer, which, wb), {})[head] = val
                continue
            m2 = re.match(r"ff\.lr([12])\.(weight|bias)", rest)
            if m2:
                put((layer, "ff", f"lr{m2.group(1)}",
                     "kernel" if m2.group(2) == "weight" else "bias"),
                    val.T if m2.group(2) == "weight" else val)
                continue
            m2 = re.match(r"layer_norm([12])\.(weight|bias)", rest)
            if m2:
                put((layer, f"layer_norm{m2.group(1)}",
                     "scale" if m2.group(2) == "weight" else "bias"), val)
                continue
            unmatched.append(key)
            continue

        # 2D scalers: Conv2dResBlock's Sequential(conv, dropout) -> conv.0
        m = re.match(r"downscaler\.downsample\.(conv\d)\.conv\.0\.weight", key)
        if m:
            # torch conv (out,in,kh,kw) -> flax (kh,kw,in,out)
            put(("downscaler", "interp", m.group(1), "conv", "kernel"),
                val.transpose(2, 3, 1, 0))
            continue
        m = re.match(r"upscaler\.upsample\.conv\.0\.conv\.0\.weight", key)
        if m:
            put(("upscaler", "interp", "conv", "conv", "kernel"),
                val.transpose(2, 3, 1, 0))
            continue

        # graph feature extractors: GCN / GAT (model.py:376-469)
        m = re.match(
            r"feat_extract\.edge_learner\.(lap_conv[12])\.conv\.0\.weight",
            key)
        if m:
            # torch conv (out,in,kh,kw) -> flax NHWC kernel (kh,kw,in,out)
            put(("feat_extract", "edge_learner", m.group(1), "conv",
                 "kernel"), val.transpose(2, 3, 1, 0))
            continue
        m = re.match(r"feat_extract\.gcn_layer0\.(weight|bias)", key)
        if m:
            # GraphConvolution.weight is already (in, out) — no transpose
            put(("feat_extract", "gcn_layer0", m.group(1)), val)
            continue
        m = re.match(r"feat_extract\.gcn_layers\.(\d+)\.(weight|bias)", key)
        if m:
            # reference ModuleList gcn_layers[i] is layer i+1 here
            put(("feat_extract", f"gcn_layer{int(m.group(1)) + 1}",
                 m.group(2)), val)
            continue
        m = re.match(r"feat_extract\.gat_layer0\.(W|a)", key)
        if m:
            put(("feat_extract", "gat_layer0", m.group(1)), val)
            continue
        m = re.match(r"feat_extract\.gat_layers\.(\d+)\.(W|a)", key)
        if m:
            put(("feat_extract", f"gat_layer{int(m.group(1)) + 1}",
                 m.group(2)), val)
            continue

        # feature extractor (Identity lift)
        m = re.match(r"feat_extract\.id\.(weight|bias)", key)
        if m:
            put(("feat_extract", "id",
                 "kernel" if m.group(1) == "weight" else "bias"),
                val.T if m.group(1) == "weight" else val)
            continue

        # spectral regressor
        m = re.match(r"regressor\.spectral_conv\.(\d+)\.linear\.(weight|bias)",
                     key)
        if m:
            put(("regressor", f"spectral_conv{m.group(1)}", "linear",
                 "kernel" if m.group(2) == "weight" else "bias"),
                val.T if m.group(2) == "weight" else val)
            continue
        m = re.match(r"regressor\.spectral_conv\.(\d+)\.fourier_weight(?:\.(\d+))?",
                     key)
        if m:
            conv = f"spectral_conv{m.group(1)}"
            if m.group(2) is None:  # 1D: single real-pair tensor
                put(("regressor", conv, "fourier_weight"), val)
            else:  # 2D: ParameterList of two corners
                nm = ("fourier_weight_pos", "fourier_weight_neg")[int(m.group(2))]
                put(("regressor", conv, nm), val)
            continue
        m = re.match(r"regressor\.regressor\.([02])\.(weight|bias)", key)
        if m:
            nm = "regressor_fc1" if m.group(1) == "0" else "regressor_fc2"
            put(("regressor", nm,
                 "kernel" if m.group(2) == "weight" else "bias"),
                val.T if m.group(2) == "weight" else val)
            continue
        m = re.match(r"regressor\.fc\.(weight|bias)", key)
        if m:
            put(("regressor", "fc",
                 "kernel" if m.group(1) == "weight" else "bias"),
                val.T if m.group(1) == "weight" else val)
            continue
        # pointwise regressor: ff.N.0 Sequential(Linear, act)
        m = re.match(r"regressor\.ff\.(\d+)\.0\.(weight|bias)", key)
        if m:
            put(("regressor", f"ff{m.group(1)}",
                 "kernel" if m.group(2) == "weight" else "bias"),
                val.T if m.group(2) == "weight" else val)
            continue
        m = re.match(r"regressor\.out\.(weight|bias)", key)
        if m:
            put(("regressor", "out",
                 "kernel" if m.group(1) == "weight" else "bias"),
                val.T if m.group(1) == "weight" else val)
            continue

        unmatched.append(key)

    for (layer, which, wb), heads in norm_groups.items():
        stacked = np.stack([heads[i] for i in range(len(heads))])
        put((layer, "attn",
             f"norm_{which}_{'scale' if wb == 'weight' else 'bias'}"), stacked)

    return out, unmatched


def load_reference_checkpoint(template_params: dict, state_dict: dict,
                              strict: bool = True) -> dict:
    """Overlay a converted reference state_dict onto a params template.

    Shapes are checked leaf-by-leaf; with strict=True any template leaf
    missing from the checkpoint raises.
    """
    converted, unmatched = convert_state_dict(state_dict)
    if strict and unmatched:
        raise ValueError(f"unmapped reference keys: {unmatched}")

    import jax

    flat_t = jax.tree_util.tree_flatten_with_path(template_params)[0]
    out = jax.tree_util.tree_map(lambda x: x, template_params)

    def fetch(node, path):
        for p in path:
            if not isinstance(node, dict) or p not in node:
                return None
            node = node[p]
        return node

    missing = []
    for path, leaf in flat_t:
        keys = tuple(p.key for p in path)
        val = fetch(converted, keys)
        if val is None:
            missing.append("/".join(keys))
            continue
        if tuple(val.shape) != tuple(leaf.shape):
            raise ValueError(f"shape mismatch at {'/'.join(keys)}: "
                             f"ckpt {val.shape} vs model {leaf.shape}")
        node = out
        for k in keys[:-1]:
            node = node[k]
        node[keys[-1]] = np.asarray(val, dtype=np.asarray(leaf).dtype)
    if strict and missing:
        raise ValueError(f"model params missing from checkpoint: {missing}")
    return out
