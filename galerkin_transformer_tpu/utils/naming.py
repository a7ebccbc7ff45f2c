"""Checkpoint / result-file naming convention.

Mirrors reference libs/utils_ft.py:452-490, e.g.
``burgers_2048_4ft_96d_ln_2021-05-26.pt`` -> here ``..._2026-08-16.ckpt``.
"""
from __future__ import annotations

from datetime import date

_ATTN_ABBREV = {
    "fourier": "ft", "integral": "ft", "local": "ft",
    "galerkin": "gt", "global": "gt", "linear": "lt",
    "softmax": "st", "official": "st", "cosine": "ct", "causal": "cs",
}


def get_model_name(model="burgers",
                   num_encoder_layers=4,
                   n_hidden=96,
                   attention_type="fourier",
                   layer_norm=True,
                   grid_size=512,
                   inverse_problem=False,
                   additional_str: str = ""):
    model_name = "_".join(
        [str(p) for p in (
            model + ("_inv" if inverse_problem else ""),
            grid_size,
            f"{num_encoder_layers}{_ATTN_ABBREV.get(attention_type, attention_type[:2])}",
            f"{n_hidden}d",
            "ln" if layer_norm else "qkv",
        )]
    )
    if additional_str:
        model_name += "_" + additional_str
    stamp = date.today().strftime("%Y-%m-%d")
    return f"{model_name}_{stamp}.ckpt", f"{model_name}_{stamp}.pkl"
