"""Dataset reader families — one module per reference dataset
(reference datasets/__init__.py:14-38 registry; real-file formats with
deterministic synthetic fallbacks when the files are absent)."""

from .ett import ETTFamily  # noqa: F401
from .psm import PSMFamily  # noqa: F401
from .msl import MSLFamily  # noqa: F401
from .ecg import ECGMITFamily  # noqa: F401
from .ventilator import VentilatorFamily  # noqa: F401
from .bidmc import BIDMCFamily  # noqa: F401
from .ludb import LUDBFamily  # noqa: F401
from .dreams import DreamsFamily  # noqa: F401
from .synthetic import SyntheticFamily  # noqa: F401
