# Fused Pallas TPU kernels (populated as kernels land).
