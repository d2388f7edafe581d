"""Post-hoc analysis: run-directory loaders, learning curves, parameter
recovery metrics, tuning-curve distribution comparison.

Reference parity: ``tc_gan/loaders.py`` + ``tc_gan/analyzers/``
(SURVEY.md §1 L6).
"""

from tcgan_tpu.analysis.compare import load_runs  # noqa: F401
from tcgan_tpu.analysis.loaders import (  # noqa: F401
    EnsembleRecord,
    RunRecord,
    load_ensemble,
    load_run,
)
