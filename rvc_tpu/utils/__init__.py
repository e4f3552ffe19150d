from .audio_io import load_audio, save_audio, read_wav, write_wav

__all__ = ["load_audio", "save_audio", "read_wav", "write_wav"]
