from .crepe import CREPE, convert_torchcrepe
from .dsp_f0 import yin_f0, yin_f0_np
from .f0_extractor import F0Extractor, build_predictors
from .f0_midi import f0_to_midi, read_midi_notes, write_midi
from .fcpe import FCPE, convert_torch_fcpe
from .rmvpe import RMVPE, E2EModel, convert_torch_rmvpe

__all__ = [
    "CREPE",
    "E2EModel",
    "F0Extractor",
    "FCPE",
    "RMVPE",
    "build_predictors",
    "convert_torch_fcpe",
    "convert_torch_rmvpe",
    "convert_torchcrepe",
    "f0_to_midi",
    "read_midi_notes",
    "write_midi",
    "yin_f0",
    "yin_f0_np",
]
