"""Greedy token parity executing the REFERENCE implementation itself.

Earlier rounds pinned the Delay engine against a from-spec numpy oracle;
this suite retires that caveat by running the reference's actual torch
``MossTTSDelayModel.generate()`` (moss_tts_delay/modeling_moss_tts.py:
392-525) on a tiny random model, converting its state dict through
``utils.checkpoints.delay_params_from_state_dict``, and asserting
token-for-token greedy equality with ``DelayEngine.generate`` across
generation AND continuation modes, including left-padded batches.

transformers-4.57 compat shims (refshim.py + two config fixups below) are
import/constructor plumbing only — the generate loop under test runs the
reference's own code unmodified.
"""
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from mosstts_tpu.core.config import DelayConfig, tiny_qwen3
from mosstts_tpu.engine.delay_engine import DelayEngine
from mosstts_tpu.processing.delay_processor import DelayProcessor
from mosstts_tpu.processing.tokenizer import ByteFallbackTokenizer
from mosstts_tpu.utils.checkpoints import delay_params_from_state_dict

from .refshim import import_ref_delay

N_VQ = 4
MAX_NEW = 24


@pytest.fixture(scope="module")
def setup():
    ref = import_ref_delay()
    refcfg = sys.modules["ref_moss_tts_delay.configuration_moss_tts"]

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
        attention_bias=tq.attention_bias, attn_implementation="eager",
    )
    # 4.57 constructor fixups (not behavior changes): tie_word_embeddings
    # defaults True on PretrainedConfig and 4.57's tie_weights() calls the
    # reference's arg-taking get_input_embeddings override; and
    # PretrainedConfig.__init__ resets pad_token_id to None after the
    # reference config set it (configuration_moss_tts.py:103 runs before
    # super().__init__).
    cfg = refcfg.MossTTSDelayConfig(language_config=lc, n_vq=N_VQ,
                                    tie_word_embeddings=False)
    cfg.pad_token_id = 151643
    torch.manual_seed(0)
    model = ref.MossTTSDelayModel(cfg).eval().float()

    our_cfg = DelayConfig(language_config=tq, n_vq=N_VQ)
    params = delay_params_from_state_dict(model.state_dict(), our_cfg,
                                          dtype=jnp.float32)
    engine = DelayEngine(params, our_cfg, dtype=jnp.float32, cache_bucket=64)
    proc = DelayProcessor(ByteFallbackTokenizer(), None, our_cfg)
    return model, engine, proc


def _compare(model, engine, ids: np.ndarray, mask: np.ndarray, tag: str):
    with torch.no_grad():
        ref_out = model.generate(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask),
            max_new_tokens=MAX_NEW, text_temperature=0.0,
            audio_temperature=0.0, audio_repetition_penalty=1.0)
    ours = engine.generate(ids, mask, max_new_tokens=MAX_NEW,
                           text_temperature=0.0, audio_temperature=0.0)
    assert len(ref_out) == len(ours)
    for b, ((ref_start, ref_toks), (our_start, our_toks)) in enumerate(
            zip(ref_out, ours)):
        ref_toks = ref_toks.numpy()
        our_toks = np.asarray(our_toks)
        assert int(ref_start) == int(our_start), f"{tag} row {b} start_length"
        T = min(len(ref_toks), len(our_toks))
        assert T >= MAX_NEW, (tag, b, ref_toks.shape, our_toks.shape)
        np.testing.assert_array_equal(
            ref_toks[:T], our_toks[:T],
            err_msg=f"{tag} row {b}: token mismatch vs reference generate()")


def test_generation_mode_matches_reference(setup):
    model, engine, proc = setup
    convs = [
        [proc.build_user_message(text="hello parity world")],
        [proc.build_user_message(text="a much longer second row to force "
                                      "left padding in the batch")],
    ]
    batch = proc(convs, mode="generation")
    ids = np.asarray(batch["input_ids"])
    mask = np.asarray(batch["attention_mask"]).astype(bool)
    assert not mask[0].all()  # left padding really present on row 0
    _compare(model, engine, ids, mask, "generation")


def test_continuation_mode_matches_reference(setup):
    model, engine, proc = setup
    rng = np.random.default_rng(0)
    convs = []
    for i, text in enumerate(("continue me", "second continuation row")):
        codes = rng.integers(0, 1024, (5 + 3 * i, N_VQ)).astype(np.int64)
        convs.append([proc.build_user_message(text=text),
                      proc.build_assistant_message([codes])])
    batch = proc(convs, mode="continuation")
    ids = np.asarray(batch["input_ids"])
    mask = np.asarray(batch["attention_mask"]).astype(bool)
    _compare(model, engine, ids, mask, "continuation")
