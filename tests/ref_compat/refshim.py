"""Import the REFERENCE implementation (/root/reference, torch) on this
box's transformers 4.57.

The reference pins transformers 5.0; its Delay slice fails on 4.57 only at
``from transformers import initialization as init``
(moss_tts_delay/modeling_moss_tts.py:35) — a v5 module whose helpers
(``init.normal_`` etc.) are torch.nn.init re-exports with
``_is_hf_initialized`` bookkeeping. For freshly constructed random models
plain torch.nn.init is behaviorally identical, so a shim module unblocks
the import and lets the parity tests execute the reference's OWN
``generate()`` byte-for-byte.

The reference dirs are not installable packages (moss_tts_delay has no
__init__.py), so each slice is loaded as a synthetic package whose
``__path__`` points into /root/reference — relative imports inside the
reference files resolve against the read-only tree untouched.
"""
from __future__ import annotations

import importlib.util
import sys
import types
from pathlib import Path

REF_ROOT = Path("/root/reference")


def install_transformers_init_shim():
    import transformers

    if hasattr(transformers, "initialization"):
        return  # real v5 module present
    import torch.nn.init as tni

    shim = types.ModuleType("transformers.initialization")
    for k in dir(tni):
        if not k.startswith("_"):
            setattr(shim, k, getattr(tni, k))
    sys.modules["transformers.initialization"] = shim
    transformers.initialization = shim


def _load_slice(pkg_name: str, ref_dir: str, module: str):
    """Load ``/root/reference/<ref_dir>/<module>.py`` as
    ``<pkg_name>.<module>`` with working relative imports."""
    full = f"{pkg_name}.{module}"
    if full in sys.modules:
        return sys.modules[full]
    if pkg_name not in sys.modules:
        pkg = types.ModuleType(pkg_name)
        pkg.__path__ = [str(REF_ROOT / ref_dir)]
        sys.modules[pkg_name] = pkg
    spec = importlib.util.spec_from_file_location(
        full, REF_ROOT / ref_dir / f"{module}.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[full] = mod
    spec.loader.exec_module(mod)
    return mod


def import_ref_delay():
    """Reference MossTTSDelay modeling module (executes the real torch
    generate loop, modeling_moss_tts.py:392-525)."""
    install_transformers_init_shim()
    return _load_slice("ref_moss_tts_delay", "moss_tts_delay",
                       "modeling_moss_tts")


def import_ref_local():
    """Reference Local-variant modeling module (CustomMixin._sample,
    moss_tts_local/modeling_moss_tts.py:315-477).

    Its inference_utils does ``import torchaudio`` at module level without
    using it in any sampling function (SURVEY.md 2.8) — torchaudio is not
    installed here, so an empty stub satisfies the import; none of the
    executed paths touch it."""
    install_transformers_init_shim()
    if "torchaudio" not in sys.modules:
        try:
            import torchaudio  # noqa: F401 - real one if present
        except ImportError:
            sys.modules["torchaudio"] = types.ModuleType("torchaudio")
    return _load_slice("ref_moss_tts_local", "moss_tts_local",
                       "modeling_moss_tts")


def import_ref_realtime():
    """Reference Realtime modeling + batch inferencer (the torch frame
    loop under parity test: moss_tts_realtime/inferencer.py:197-298
    ``_generate_from_ids`` + ``generate_local_transformer`` :349-404).

    The inferencer imports ``mossttsrealtime.modeling_mossttsrealtime``
    absolutely, so the package is registered under that exact name; its
    module-level ``import torchaudio`` gets the same unused-stub treatment
    as the Local slice."""
    install_transformers_init_shim()
    if "torchaudio" not in sys.modules:
        try:
            import torchaudio  # noqa: F401 - real one if present
        except ImportError:
            sys.modules["torchaudio"] = types.ModuleType("torchaudio")
    modeling = _load_slice("mossttsrealtime",
                           "moss_tts_realtime/mossttsrealtime",
                           "modeling_mossttsrealtime")
    inferencer = _load_slice("ref_rt_inferencer", "moss_tts_realtime",
                             "inferencer")
    return modeling, inferencer
