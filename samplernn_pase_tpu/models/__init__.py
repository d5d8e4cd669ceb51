"""Model families: SampleRNN (frame tiers + sample MLP) and the PASE
waveform encoder (SincNet front-end + conv trunk). SURVEY.md §2 C4-C12.
"""

from samplernn_pase_tpu.models import (  # noqa: F401
    rnn_cells,
    frame_rnn,
    sample_mlp,
    samplernn,
)
