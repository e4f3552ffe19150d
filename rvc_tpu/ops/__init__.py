from .mel import mel_filterbank
from .retrieval import (
    FeatureIndex,
    kmeans,
    knn_search,
    knn_search_tiled,
    retrieve_blend,
)
from .stft import (
    MelSpec,
    mel_spectrogram,
    spec_to_mel,
    spectrogram,
    stft_magnitude,
)

__all__ = [
    "FeatureIndex",
    "MelSpec",
    "kmeans",
    "knn_search",
    "knn_search_tiled",
    "mel_filterbank",
    "mel_spectrogram",
    "retrieve_blend",
    "spec_to_mel",
    "spectrogram",
    "stft_magnitude",
]
