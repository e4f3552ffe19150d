from .config import (
    DataConfig,
    ModelConfig,
    TrainConfig,
    ExperimentConfig,
    get_config,
    SAMPLE_RATES,
)

__all__ = [
    "DataConfig",
    "ModelConfig",
    "TrainConfig",
    "ExperimentConfig",
    "get_config",
    "SAMPLE_RATES",
]
