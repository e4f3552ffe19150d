from .rmvpe import RMVPE, E2EModel, convert_torch_rmvpe
from .dsp_f0 import yin_f0

__all__ = ["RMVPE", "E2EModel", "convert_torch_rmvpe", "yin_f0"]
