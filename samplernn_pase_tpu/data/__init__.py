"""Data pipeline: corpus loading, TBPTT stream batching (SURVEY.md §2 C2/C3)."""

from samplernn_pase_tpu.data.dataset import (  # noqa: F401
    WavCorpus,
    synthetic_corpus,
)
