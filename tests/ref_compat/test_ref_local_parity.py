"""Greedy token parity executing the reference Local variant's own
``CustomMixin._sample`` (moss_tts_local/modeling_moss_tts.py:315-477)
through HF ``generate()`` on a tiny random model, with weights converted by
``utils.checkpoints.local_params_from_state_dict``.

ATTENTION-IMPLEMENTATION NOTE (pinned deviation, PARITY.md): the
reference's depth transformer calls ``eager_attention_forward`` with
``attention_mask=None, is_causal=True``
(moss_tts_local/modeling_moss_tts.py:149-170) — but the eager kernel
ignores ``is_causal`` (only the sdpa backend honors it), so under
``attn_implementation="eager"`` the reference depth transformer is
silently BIDIRECTIONAL. The released apps select FA2/SDPA
(clis/moss_tts_app.py:117-141), where it IS causal; our implementation is
causal, so parity here is pinned against the sdpa configuration.
"""
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from mosstts_tpu.core.config import LocalConfig, tiny_qwen3
from mosstts_tpu.engine.local_engine import LocalEngine
from mosstts_tpu.processing.local_processor import LocalProcessor
from mosstts_tpu.processing.tokenizer import ByteFallbackTokenizer
from mosstts_tpu.utils.checkpoints import local_params_from_state_dict

from .refshim import import_ref_local

N_VQ = 4
MAX_NEW = 20


@pytest.fixture(scope="module")
def setup():
    refmod = import_ref_local()
    refcfg = sys.modules["ref_moss_tts_local.configuration_moss_tts"]
    from transformers import GenerationConfig

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
        attention_bias=tq.attention_bias,
        attn_implementation="sdpa",  # causal depth txf — see module docstring
    )
    cfg = refcfg.MossTTSDelayConfig(
        language_config=lc, n_vq=N_VQ, tie_word_embeddings=False,
        additional_mlp_ffn_hidden_size=32, local_ffn_hidden_size=48,
        local_hidden_size=24, local_num_layers=2)
    # 4.57 constructor fixups (see test_ref_delay_parity.setup), plus
    # DynamicCache sizing itself from top-level config attrs on 4.57
    cfg.pad_token_id = 151643
    for k in ("num_hidden_layers", "num_attention_heads",
              "num_key_value_heads", "head_dim"):
        setattr(cfg, k, lc[k])
    torch.manual_seed(0)
    model = refmod.MossTTSDelayModel(cfg).eval().float()

    our_cfg = LocalConfig(
        language_config=tq, n_vq=N_VQ, additional_mlp_ffn_hidden_size=32,
        local_ffn_hidden_size=48, local_hidden_size=24, local_num_layers=2)
    params = local_params_from_state_dict(model.state_dict(), our_cfg,
                                          dtype=jnp.float32)
    engine = LocalEngine(params, our_cfg, dtype=jnp.float32, cache_bucket=32)
    proc = LocalProcessor(ByteFallbackTokenizer(), None, our_cfg)

    # the README §7 driver's generation-config subclass, greedy settings
    class DelayGenerationConfig(GenerationConfig):
        def __init__(self, **kw):
            super().__init__(**kw)
            self.layers = kw.get("layers", [{} for _ in range(32)])
            self.do_samples = kw.get("do_samples", None)
            self.n_vq_for_inference = 32

    def make_gc(n_vq_infer: int):
        gc = DelayGenerationConfig()
        gc.pad_token_id = 151643
        gc.eos_token_id = 151653
        gc.max_new_tokens = MAX_NEW
        gc.use_cache = True
        gc.do_sample = False
        gc.n_vq_for_inference = n_vq_infer
        gc.do_samples = [False] * our_cfg.channels
        gc.layers = [{} for _ in range(our_cfg.channels)]
        return gc

    return model, engine, proc, make_gc, our_cfg


def _compare(model, engine, gc, ids, mask, n_vq_infer, tag):
    with torch.no_grad():
        ref_out = model.generate(input_ids=torch.tensor(ids),
                                 attention_mask=torch.tensor(mask),
                                 generation_config=gc)
    ours = engine.generate(ids, mask, max_new_tokens=MAX_NEW,
                           do_samples=[False] * (1 + N_VQ),
                           n_vq_for_inference=n_vq_infer)
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
            err_msg=f"{tag} row {b}: token mismatch vs reference _sample")


def test_generation_matches_reference(setup):
    model, engine, proc, make_gc, _ = setup
    batch = proc([
        [proc.build_user_message(text="hello local parity")],
        [proc.build_user_message(text="row two with longer text to pad")],
    ], mode="generation")
    ids = np.asarray(batch["input_ids"])
    mask = np.asarray(batch["attention_mask"]).astype(bool)
    assert not mask.all()  # left padding exercised
    _compare(model, engine, make_gc(N_VQ), ids, mask, N_VQ, "generation")


def test_variable_bitrate_matches_reference(setup):
    """n_vq_for_inference < n_vq: the reference zero-fills channels beyond
    the inference budget (moss_tts_local/modeling_moss_tts.py:425-427)."""
    model, engine, proc, make_gc, _ = setup
    batch = proc([[proc.build_user_message(text="variable bitrate row")]],
                 mode="generation")
    ids = np.asarray(batch["input_ids"])
    mask = np.asarray(batch["attention_mask"]).astype(bool)
    _compare(model, engine, make_gc(3), ids, mask, 3, "n_vq_infer=3")
