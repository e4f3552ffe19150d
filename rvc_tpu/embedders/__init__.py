from .hubert import (
    EMBEDDER_REGISTRY,
    FlaxHubert,
    HubertConfig,
    convert_torch_hubert,
    load_embedder,
    load_embedder_by_name,
    resolve_embedder_path,
)

__all__ = [
    "EMBEDDER_REGISTRY",
    "FlaxHubert",
    "HubertConfig",
    "convert_torch_hubert",
    "load_embedder",
    "load_embedder_by_name",
    "resolve_embedder_path",
]
