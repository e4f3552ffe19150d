from .hifigan import HiFiGANGenerator
from .mrf import HiFiGANMRFGenerator
from .nsf import HiFiGANNSFGenerator, SourceModuleHnNSF
from .refinegan import RefineGANGenerator
from .sine import CumsumSineGenerator, SineGenerator

__all__ = [
    "CumsumSineGenerator",
    "HiFiGANGenerator",
    "HiFiGANMRFGenerator",
    "HiFiGANNSFGenerator",
    "RefineGANGenerator",
    "SineGenerator",
    "SourceModuleHnNSF",
]
