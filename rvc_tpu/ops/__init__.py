from .mel import mel_filterbank
from .stft import (
    stft_magnitude,
    spectrogram,
    spec_to_mel,
    mel_spectrogram,
    MelSpec,
)

__all__ = [
    "mel_filterbank",
    "stft_magnitude",
    "spectrogram",
    "spec_to_mel",
    "mel_spectrogram",
    "MelSpec",
]
