"""rvc_tpu — TPU-native retrieval-based voice conversion framework.

A from-scratch JAX/XLA/Pallas rebuild of the RVC/Applio voice-conversion
stack (reference: codename0og/codename-rvc-fork-3). The compute path is
pure-functional JAX (flax.linen modules, optax optimizers, pjit/shard_map
data parallelism over a device mesh); hot kernels (feature-index retrieval,
fused vocoder ops) are Pallas TPU kernels.

Layout:
    rvc_tpu.configs    typed hyperparameter presets (32k/40k/48k)
    rvc_tpu.ops        STFT/mel/resample/DSP ops + Pallas kernels
    rvc_tpu.models     flax model zoo (synthesizer, vocoders, discriminators)
    rvc_tpu.parallel   mesh / sharding utilities
    rvc_tpu.train      GAN training loop, losses, data pipeline, optimizers
    rvc_tpu.infer      voice-conversion inference pipeline + f0 predictors
    rvc_tpu.utils      audio I/O, checkpoints, torch interop
"""

__version__ = "0.1.0"
