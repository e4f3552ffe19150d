"""Import shims so the reference torch package (/root/reference, read-only)
can be imported in this environment for numerical parity testing.

Missing wheels are stubbed with just enough surface for the code paths the
parity tests exercise:
  - librosa.filters.mel -> the reference's own vendored librosa copy
    (rvc/lib/predictors/torchfcpe/mel_fn_librosa.py), so filterbank parity is
    tested against a genuine librosa implementation, not our own.
  - torchaudio.transforms.Resample -> identity (tests run at the native sr).
  - local_attention.LocalAttention -> unused placeholder (the torchfcpe
    Performer path is never exercised; parity uses conv_only models).

Call install() before importing anything under `rvc.`.
"""

from __future__ import annotations

import importlib.machinery
import importlib.util
import sys
import types

REFERENCE_ROOT = "/root/reference"


def _load_vendored_librosa_mel():
    spec = importlib.util.spec_from_file_location(
        "_vendored_mel_fn_librosa",
        f"{REFERENCE_ROOT}/rvc/lib/predictors/torchfcpe/mel_fn_librosa.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.mel


def install() -> None:
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)

    if "librosa" not in sys.modules:
        mel_fn = _load_vendored_librosa_mel()
        librosa = types.ModuleType("librosa")
        filters = types.ModuleType("librosa.filters")
        filters.mel = mel_fn
        librosa.filters = filters
        # a real ModuleSpec: transformers' availability probe calls
        # importlib.util.find_spec("librosa"), which raises ValueError on
        # modules whose __spec__ is None (breaks test_hubert when this stub
        # was installed first in the same process)
        librosa.__spec__ = importlib.machinery.ModuleSpec("librosa", None)
        filters.__spec__ = importlib.machinery.ModuleSpec(
            "librosa.filters", None
        )
        sys.modules["librosa"] = librosa
        sys.modules["librosa.filters"] = filters

    if "torchaudio" not in sys.modules:
        import torch

        class _IdentityResample(torch.nn.Module):
            def __init__(self, orig_freq: int, new_freq: int, **kw):
                super().__init__()
                if orig_freq != new_freq:
                    raise NotImplementedError(
                        "torchaudio stub: resampling unsupported in tests"
                    )

            def forward(self, x):
                return x

        torchaudio = types.ModuleType("torchaudio")
        torchaudio.__rvc_tpu_stub__ = True
        torchaudio.__spec__ = importlib.machinery.ModuleSpec(
            "torchaudio", None)
        transforms = types.ModuleType("torchaudio.transforms")
        transforms.Resample = _IdentityResample
        transforms.__spec__ = importlib.machinery.ModuleSpec(
            "torchaudio.transforms", None)
        torchaudio.transforms = transforms
        sys.modules["torchaudio"] = torchaudio
        sys.modules["torchaudio.transforms"] = transforms

    # rvc.infer.pipeline imports these at module scope; the parity tests
    # exercise neither (CREPE f0 and real faiss indexes are out of scope)
    for name in ("torchcrepe", "faiss"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
            sys.modules[name] = mod

    if "local_attention" not in sys.modules:
        local_attention = types.ModuleType("local_attention")

        class LocalAttention:  # pragma: no cover - placeholder only
            def __init__(self, *a, **kw):
                raise NotImplementedError("local_attention stub")

        local_attention.LocalAttention = LocalAttention
        sys.modules["local_attention"] = local_attention


class zero_torch_noise:
    """Context manager: make torch.randn_like / torch.rand / torch.randn
    return zeros so the reference's stochastic sites (prior sample, sine
    phase, additive source noise) match our zero_noise flax mode."""

    def __enter__(self):
        import torch

        self._torch = torch
        self._randn_like = torch.randn_like
        self._rand = torch.rand
        self._randn = torch.randn
        torch.randn_like = lambda x, **kw: torch.zeros_like(x)

        def _zeros(*size, **kw):
            kw.pop("generator", None)
            if len(size) == 1 and isinstance(size[0], (tuple, list)):
                size = tuple(size[0])
            # pass as one shape tuple: handles scalar shapes like
            # torch.rand([]) (transformers LayerDrop) where *() would fail
            return torch.zeros(size, **kw)

        torch.rand = _zeros
        torch.randn = _zeros
        return self

    def __exit__(self, *exc):
        self._torch.randn_like = self._randn_like
        self._torch.rand = self._rand
        self._torch.randn = self._randn
        return False
