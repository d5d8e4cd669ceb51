"""samplernn_pase_tpu — a TPU-native JAX framework for hierarchical
autoregressive neural audio generation (SampleRNN) conditioned on
problem-agnostic speech embeddings (PASE).

Built from scratch for TPU (JAX / XLA / Pallas / jax.sharding); capability
surface mirrors the `AlomdaElmasry/samplernn_pase` reference (see SURVEY.md —
the reference mount was empty, so component provenance is cited against
SURVEY.md's inventory C1..C20 and BASELINE.json's configs 1-5).

Public API verbs (BASELINE.json:4): ``train``, ``extract``, ``generate``.
"""

__version__ = "0.1.0"

from samplernn_pase_tpu import ops, models, data, train, parallel  # noqa: F401
from samplernn_pase_tpu import serve  # noqa: F401
from samplernn_pase_tpu.config import (  # noqa: F401
    SampleRNNConfig,
    PASEConfig,
    TrainConfig,
    GenerateConfig,
)
