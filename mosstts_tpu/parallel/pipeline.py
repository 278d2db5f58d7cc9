"""GPipe-style pipeline parallelism over a 'stage' mesh axis.

The reference ships only a never-exercised hint stub for pipelining
(``_pp_plan = {"lm_head": ...}``, moss_tts_local/modeling_moss_tts.py:571;
its only multi-GPU story is accelerate's sequential CPU offload). Here
pipelining is a real schedule, built the TPU way:

  * the layer stack (already stacked on a leading L axis for ``lax.scan``)
    is split into S contiguous stages, sharded over a ('stage',) mesh axis —
    each device holds L/S layers;
  * the batch is split into M microbatches; a ``shard_map`` body runs the
    classic GPipe rotation as ONE compiled ``lax.scan`` over M+S-1 ticks:
    every tick each stage runs its layer slice on its current microbatch,
    then ``lax.ppermute`` hands the activations to the next stage over ICI
    (point-to-point neighbour exchange — the cheapest collective there is);
  * stage 0 injects microbatch t at tick t, stage S-1 retires microbatch
    t-(S-1); the usual S-1-tick bubble at each end, amortized by M;
  * the whole schedule is differentiable (scan + ppermute + psum), so the
    same function serves pipelined TRAINING: gradients flow backwards
    through the reversed ring automatically.

RoPE/attention make this legal at layer granularity: every layer applies
rotary embeddings to fresh q/k from the carried hidden state, so a stage
only needs (positions, kv_valid) for the microbatch it currently holds —
no cross-stage attention state.

Composes with the existing ('data','model') sharding story: PP is the
cross-slice axis for training runs where the backbone's layer stack does
not fit one slice; within a stage, GSPMD TP/DP shardings apply unchanged
(the stage body is plain ``qwen3_forward``).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..core.config import Qwen3Config
from ..nn.qwen3 import qwen3_forward
from ..ops.basic import rms_norm


def make_pp_mesh(n_stages: int, model: int = 1, devices=None) -> Mesh:
    """('stage',) mesh — or ('stage','model') with ``model`` > 1: the
    pipeline is manual over 'stage' only, so GSPMD tensor parallelism
    applies unchanged INSIDE each stage body (PP x TP compose)."""
    devices = devices if devices is not None else jax.devices()
    n = n_stages * model
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    if model == 1:
        return Mesh(np.asarray(devices[:n]), ("stage",))
    return Mesh(np.asarray(devices[:n]).reshape(n_stages, model),
                ("stage", "model"))


def split_stages(layer_params, n_stages: int):
    """Reshape stacked layer params (L, ...) -> (S, L/S, ...)."""
    def re(a):
        L = a.shape[0]
        if L % n_stages:
            raise ValueError(f"{L} layers not divisible by {n_stages} stages")
        return a.reshape(n_stages, L // n_stages, *a.shape[1:])

    return jax.tree.map(re, layer_params)


def pipelined_qwen3_forward(
    params,
    cfg: Qwen3Config,
    inputs_embeds: jax.Array,  # (B, T, D)
    *,
    positions: jax.Array,  # (B, T)
    kv_valid: jax.Array,  # (B, T)
    mesh: Mesh,
    n_micro: int,
    use_rope: bool = True,
    remat: bool = False,
) -> jax.Array:
    """Pipelined no-cache forward: equals ``qwen3_forward(...)[0]`` exactly.

    ``params`` is the usual qwen3 pytree; the layer stack is re-split over
    the mesh's 'stage' axis inside. ``n_micro`` microbatches must divide B.
    Returns the post-final-norm hidden states (B, T, D), replicated.
    """
    if "stage" not in mesh.axis_names:
        raise ValueError(f"mesh {mesh.axis_names} has no 'stage' axis")
    S = mesh.shape["stage"]
    B, T, D = inputs_embeds.shape
    if B % n_micro:
        raise ValueError(f"batch {B} not divisible by n_micro={n_micro}")
    Bm = B // n_micro

    stages = split_stages(params["layers"], S)  # (S, L/S, ...)
    x_mb = inputs_embeds.reshape(n_micro, Bm, T, D)
    pos_mb = positions.reshape(n_micro, Bm, T)
    kvv_mb = kv_valid.reshape(n_micro, Bm, T)

    def body(stage_layers, x_mb, pos_mb, kvv_mb):
        # shard_map hands each device its (1, L/S, ...) slice of the stack
        local = jax.tree.map(lambda a: a[0], stage_layers)
        S_ = lax.axis_size("stage")
        sid = lax.axis_index("stage")
        M = x_mb.shape[0]

        def run(h, pos1, kvv1):
            return qwen3_forward(
                {"layers": local}, cfg, h, positions=pos1, kv_valid=kvv1,
                use_rope=use_rope, remat=remat, final_norm=False,
            )[0]

        out0 = jnp.zeros_like(x_mb)
        state0 = jnp.zeros_like(x_mb[0])
        perm = [(i, (i + 1) % S_) for i in range(S_)]

        def tick(carry, t):
            state_in, out = carry
            # stage s holds microbatch t - s at tick t (clipped during the
            # fill/drain bubbles; bubble outputs never reach `out`)
            mb = jnp.clip(t - sid, 0, M - 1)
            h = jnp.where(sid == 0, x_mb[mb], state_in)
            h = run(h, pos_mb[mb], kvv_mb[mb])
            widx = t - (S_ - 1)
            w = jnp.clip(widx, 0, M - 1)
            keep = (sid == S_ - 1) & (widx >= 0)
            upd = jnp.where(keep, h, lax.dynamic_index_in_dim(out, w, 0, keepdims=False))
            out = lax.dynamic_update_index_in_dim(out, upd, w, 0)
            nxt = lax.ppermute(h, "stage", perm)
            return (nxt, out), None

        (_, out), _ = lax.scan(tick, (state0, out0), jnp.arange(M + S_ - 1))
        # only the last stage's buffer is real; psum broadcasts it
        out = lax.psum(jnp.where(sid == S_ - 1, out, jnp.zeros_like(out)), "stage")
        return out

    # manual ONLY over 'stage': any other mesh axes (e.g. 'model') stay
    # auto, so GSPMD tensor-parallel shardings on the layer weights apply
    # unchanged inside the stage body — PP x TP compose without hand-written
    # collectives
    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P("stage"), P(), P(), P()),
        out_specs=P(),
        axis_names=frozenset({"stage"}),
        check_vma=False,
    )
    hidden = fn(stages, x_mb, pos_mb, kvv_mb).reshape(B, T, D)
    return rms_norm(hidden, params["final_norm"], cfg.rms_norm_eps)
