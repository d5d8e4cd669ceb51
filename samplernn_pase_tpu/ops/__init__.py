"""Low-level ops: mu-law codec, framing, audio I/O, init/norm helpers.

Inventory mapping (SURVEY.md §2): C1 (mu-law codec), C2 (framing/chunking),
C19 (audio I/O), C20 (weight init).
"""

from samplernn_pase_tpu.ops.mulaw import (  # noqa: F401
    mu_law_encode,
    mu_law_decode,
    linear_quantize,
    linear_dequantize,
    quantize_zero,
    levels_to_float,
)
from samplernn_pase_tpu.ops.framing import (  # noqa: F401
    frame_signal,
    chunk_for_tbptt,
    StreamBatcher,
)
from samplernn_pase_tpu.ops.audio_io import read_wav, write_wav  # noqa: F401
