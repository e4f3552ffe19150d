from .hifigan import HiFiGANGenerator
from .nsf import HiFiGANNSFGenerator, SourceModuleHnNSF
from .sine import SineGenerator

__all__ = [
    "HiFiGANGenerator",
    "HiFiGANNSFGenerator",
    "SourceModuleHnNSF",
    "SineGenerator",
]
