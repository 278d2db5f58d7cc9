"""Greedy token parity of the Realtime frame loop vs the REFERENCE itself.

Runs the reference's actual torch batch inferencer
(moss_tts_realtime/inferencer.py:197-298: prefill -> one text token per
frame -> 16-codebook local-transformer scan, repetition penalty on raw
logits) on a tiny random MossTTSRealtime, converts its state dict through
``utils.checkpoints.realtime_params_from_state_dict``, and asserts
token-for-token greedy equality with ``RealtimeEngine.generate``.

transformers-4.57 compat fixups (constructor plumbing only, not behavior):
the v5 ``rope_parameters`` dict is mirrored to 4.57's ``rope_scaling`` for
the local transformer's linear rope (factor 1.0 == plain rope), and
``tie_word_embeddings=False`` as in the Delay suite. The generate loop
under test runs the reference's own code unmodified; the inferencer's
hard-coded ``channels = 16`` instance attribute is set to the tiny rvq.
"""
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from mosstts_tpu.core.config import RealtimeConfig, RealtimeLocalConfig, tiny_qwen3
from mosstts_tpu.engine.realtime_engine import RealtimeEngine
from mosstts_tpu.processing.realtime_processor import RealtimeProcessor
from mosstts_tpu.processing.tokenizer import ByteFallbackTokenizer
from mosstts_tpu.utils.checkpoints import realtime_params_from_state_dict

from .refshim import import_ref_realtime

RVQ = 4
MAX_NEW = 14  # decode steps; both sides emit MAX_NEW + 1 frames (prefill +1)


@pytest.fixture(scope="module")
def setup():
    modeling, inf_mod = import_ref_realtime()
    cfgmod = sys.modules["mossttsrealtime.configuration_mossttsrealtime"]

    tq = tiny_qwen3()
    lc = dict(
        vocab_size=tq.vocab_size, hidden_size=tq.hidden_size,
        intermediate_size=tq.intermediate_size,
        num_hidden_layers=tq.num_hidden_layers,
        num_attention_heads=tq.num_attention_heads,
        num_key_value_heads=tq.num_key_value_heads,
        head_dim=tq.head_dim, rms_norm_eps=tq.rms_norm_eps,
        rope_theta=tq.rope_theta,
        max_position_embeddings=tq.max_position_embeddings,
        attention_bias=tq.attention_bias, attn_implementation="sdpa",
    )
    loc = dict(hidden_size=tq.hidden_size, intermediate_size=128,
               num_hidden_layers=2, num_attention_heads=2,
               num_key_value_heads=2, head_dim=16,
               max_position_embeddings=RVQ + 1)
    cfg = cfgmod.MossTTSRealtimeConfig(language_config=lc, local_config=loc,
                                       rvq=RVQ, tie_word_embeddings=False)
    # 4.57 reads rope_scaling; the reference carries v5 rope_parameters
    cfg.local_config.rope_scaling = {"rope_type": "linear", "factor": 1.0}
    torch.manual_seed(0)
    model = modeling.MossTTSRealtime(cfg).eval().float()

    ref_inf = inf_mod.MossTTSRealtimeInference(
        model, tokenizer=types.SimpleNamespace(pad_token_id=151643),
        processor=object())
    ref_inf.channels = RVQ  # hard-coded 16 in the inferencer __init__

    our_cfg = RealtimeConfig(
        language_config=tq,
        local_config=RealtimeLocalConfig(
            hidden_size=tq.hidden_size, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=2,
            num_key_value_heads=2, head_dim=16, rvq=RVQ,
            max_position_embeddings=RVQ + 1),
        rvq=RVQ)
    params = realtime_params_from_state_dict(model.state_dict(), our_cfg,
                                             dtype=jnp.float32)
    engine = RealtimeEngine(params, our_cfg, dtype=jnp.float32,
                            cache_len=640, max_length=64, prefill_bucket=16)
    proc = RealtimeProcessor(ByteFallbackTokenizer(), channels=RVQ)
    return ref_inf, engine, proc


def _compare(ref_inf, engine, grids, texts, tag, repetition_penalty=1.1):
    ref_out = ref_inf._generate_from_ids(
        input_ids=[np.asarray(g) for g in grids],
        text_ids=[list(t) for t in texts],
        text_lengths=[len(t) for t in texts],
        max_length=MAX_NEW, temperature=0.0, top_p=0.6, top_k=30,
        do_sample=False, repetition_penalty=repetition_penalty,
        repetition_window=50,  # == models.realtime.REP_WINDOW
        device=torch.device("cpu"))
    ours = engine.generate(
        [np.asarray(g) for g in grids], [list(t) for t in texts],
        max_length=MAX_NEW, temperature=0.0, top_p=0.6, top_k=30,
        do_sample=False, repetition_penalty=repetition_penalty)
    assert len(ref_out) == len(ours)
    for b, (rf, of) in enumerate(zip(ref_out, ours)):
        rf, of = np.asarray(rf), np.asarray(of)
        T = min(len(rf), len(of))
        assert T >= 1, (tag, b, rf.shape, of.shape)
        np.testing.assert_array_equal(
            rf[:T], of[:T],
            err_msg=f"{tag} row {b}: frame mismatch vs reference inferencer")
        assert abs(len(rf) - len(of)) <= 1, (tag, b, rf.shape, of.shape)


def test_realtime_generate_matches_reference(setup):
    """Batch of 2 with different prompt lengths (left padding in the
    reference's prefill batch, bucket padding in ours)."""
    ref_inf, engine, proc = setup
    rng = np.random.default_rng(0)
    grids, texts = [], []
    for i in range(2):
        voice = rng.integers(0, 1024, (5 + 4 * i, RVQ))
        grid = proc.make_ensemble(voice)
        grids.append(grid)
        texts.append([int(t) for t in rng.integers(200, 5000, 10 + 8 * i)])
    _compare(ref_inf, engine, grids, texts, "batch2")


def test_realtime_generate_matches_reference_no_penalty(setup):
    """rp=1.0 disables the repetition-penalty path entirely on both
    sides — isolates backbone + depth-scan parity."""
    ref_inf, engine, proc = setup
    rng = np.random.default_rng(1)
    grid = np.concatenate(
        [proc.make_ensemble(None),
         proc.make_user_prompt("parity", rng.integers(0, 1024, (4, RVQ)))],
        axis=0)
    text = [int(t) for t in rng.integers(200, 5000, 20)]
    _compare(ref_inf, engine, [grid], [text], "solo", repetition_penalty=1.0)
