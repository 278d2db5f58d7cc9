"""Importing the package must dispatch ZERO eager device ops.

A module-level jnp constant (e.g. ``SENTINEL = jnp.int32(...)``) runs an
eager convert_element_type on the default backend at import time. On this
environment's remote-TPU tunnel, a skewed libtpu then kills ANY process
that merely imports the package — including the driver's multichip dryrun,
which imports __graft_entry__ before the hermetic CPU subprocess can spawn
(the root cause of rounds 1-2's red MULTICHIP artifacts).

The test imports every submodule in a subprocess whose JAX_PLATFORMS names
a platform that cannot initialize; any import-time dispatch raises.
"""
import os
import subprocess
import sys
from pathlib import Path


def test_package_imports_without_a_backend():
    repo = Path(__file__).resolve().parent.parent
    env = {
        k: v
        for k, v in os.environ.items()
        if not (k.startswith("PALLAS_AXON") or k.startswith("TPU_")
                or k.startswith("LIBTPU"))
    }
    # 'axon' exists only when the pool sitecustomize registers it; with the
    # pool vars scrubbed it is an unknown platform, so ANY eager dispatch
    # at import raises RuntimeError while pure-Python imports succeed.
    env["JAX_PLATFORMS"] = "axon"
    env["PALLAS_AXON_POOL_IPS"] = ""
    code = (
        "import importlib, pkgutil, sys\n"
        "import mosstts_tpu\n"
        "bad = []\n"
        "for m in pkgutil.walk_packages(mosstts_tpu.__path__, 'mosstts_tpu.'):\n"
        "    try:\n"
        "        importlib.import_module(m.name)\n"
        "    except RuntimeError as e:\n"
        "        bad.append((m.name, str(e)[:120]))\n"
        "    except ImportError:\n"
        "        pass  # optional deps (gradio) are gated\n"
        "for b in bad:\n"
        "    print('EAGER-AT-IMPORT:', b)\n"
        "sys.exit(1 if bad else 0)\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], env=env, cwd=repo,
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, (
        f"import-time eager dispatch detected:\n{proc.stdout}\n{proc.stderr}"
    )
