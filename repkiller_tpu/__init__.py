"""repkiller-tpu: TPU-native repeat-detection engine.

Brand-new framework with the capabilities of estebanpw/repkiller (see
SURVEY.md; the reference mount was empty, so parity targets come from
BASELINE.json). Public API: :func:`repkiller_tpu.api.compare`.
"""

from .config import Config, DEFAULT

__version__ = "0.1.0"

__all__ = ["Config", "DEFAULT", "__version__"]
