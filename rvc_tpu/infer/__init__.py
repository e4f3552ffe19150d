from .pipeline import Pipeline, PipelineConfig, autotune_f0, change_rms, coarse_f0

__all__ = ["Pipeline", "PipelineConfig", "autotune_f0", "change_rms", "coarse_f0"]
