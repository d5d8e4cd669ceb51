"""Pallas TPU kernels — the rebuild's native tier (SURVEY.md §2 "rebuild
native inventory"): the reference has no native code of its own (stock
PyTorch/cuDNN); the idiomatic TPU analogue is hand-fused kernels for the
hot paths."""

from samplernn_pase_tpu.ops.pallas.codec import (  # noqa: F401
    mu_law_encode_fused, mu_law_decode_fused)
from samplernn_pase_tpu.ops.pallas.decode import (  # noqa: F401
    fused_frame_decode)
