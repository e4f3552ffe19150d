from .synthesizer import Synthesizer
from .discriminators import MultiPeriodDiscriminator

__all__ = ["Synthesizer", "MultiPeriodDiscriminator"]
