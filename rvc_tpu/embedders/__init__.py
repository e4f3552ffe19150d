from .hubert import FlaxHubert, HubertConfig, convert_torch_hubert, load_embedder

__all__ = ["FlaxHubert", "HubertConfig", "convert_torch_hubert", "load_embedder"]
