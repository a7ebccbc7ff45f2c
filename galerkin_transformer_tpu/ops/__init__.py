from .attention import (
    galerkin_attention,
    fourier_attention,
    softmax_attention,
    cosine_attention,
    causal_linear_attention,
    per_head_layer_norm,
    per_head_instance_norm,
)
from .interp import bilinear_resize, interp_matrix, resolve_interp_size
from .spectral import (spectral_conv_1d, spectral_conv_2d, complex_einsum,
                       spectral_conv_1d_dft, spectral_conv_2d_dft)
from .init import diagonal_dominant_init, scaled_xavier_uniform, scaled_xavier_normal
from .attention import galerkin_attention_pos_blocked
from .sparse import densify_edges, edges_to_bcoo

__all__ = [
    "galerkin_attention", "fourier_attention", "softmax_attention",
    "cosine_attention", "causal_linear_attention",
    "per_head_layer_norm", "per_head_instance_norm",
    "bilinear_resize", "interp_matrix", "resolve_interp_size",
    "spectral_conv_1d", "spectral_conv_2d", "complex_einsum",
    "spectral_conv_1d_dft", "spectral_conv_2d_dft",
    "diagonal_dominant_init", "scaled_xavier_uniform", "scaled_xavier_normal",
    "galerkin_attention_pos_blocked", "densify_edges", "edges_to_bcoo",
]
