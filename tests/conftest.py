"""Test harness: force an 8-device virtual CPU mesh so pjit shardings and
collectives are validated without TPU hardware (SURVEY.md S4.4)."""
import os

# NOTE: the shell env pins JAX_PLATFORMS=axon (TPU tunnel); tests must
# really run on CPU, so force it rather than setdefault.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# belt-and-braces: bench subprocesses spawned by tests must never SIGKILL
# other TPU-claim processes (a live sweep was once killed from inside the
# test suite before the JAX_PLATFORMS guard existed)
os.environ.setdefault("MOSSTTS_BENCH_NO_KILL_STRAY", "1")

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# Parity tests compare fp32 numerics against torch; JAX's DEFAULT matmul
# precision is reduced (bf16 passes) even on CPU. Production code keeps the
# fast default on TPU; tests pin full fp32 accumulation.
jax.config.update("jax_default_matmul_precision", "highest")
