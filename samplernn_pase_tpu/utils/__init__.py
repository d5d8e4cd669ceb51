"""Utilities: profiling/tracing and debug checks (SURVEY.md §5)."""

from samplernn_pase_tpu.utils.profiling import (  # noqa: F401
    trace, StepTimer)
from samplernn_pase_tpu.utils.debug import checked  # noqa: F401
