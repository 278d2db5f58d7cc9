"""Codec training objective: finite losses, gradient flow, loss decreases."""
import numpy as np
import jax
import jax.numpy as jnp

from mosstts_tpu.codec.losses import codec_loss, codec_train_step, multiscale_stft_loss, stft_mag
from mosstts_tpu.codec.model import init_codec_params
from tests.test_codec import TINY


def test_stft_mag_shapes():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 4096)), jnp.float32)
    m = stft_mag(x, 1024, 256)
    assert m.shape == (2, 13, 513)
    assert float(multiscale_stft_loss(x, x)) < 1e-5


def test_codec_training_step_decreases_loss():
    cfg = TINY
    params = init_codec_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    t = np.arange(cfg.hop * 12) / cfg.sampling_rate
    wav = (0.4 * np.sin(2 * np.pi * 220 * t) + 0.05 * rng.standard_normal(len(t)))
    wav = jnp.asarray(wav[None].repeat(2, 0), jnp.float32)

    step = jax.jit(lambda p, w: codec_train_step(p, cfg, w, num_quantizers=2, lr=3e-4))
    p = params
    losses = []
    for _ in range(8):
        p, loss, aux = step(p, wav)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    assert float(aux["commitment"]) >= 0


def test_trainer_improves_si_snr():
    """Quality gate: a short CodecTrainer run on synthetic audio must improve
    SI-SNR (and not regress mel distance catastrophically) on held-out
    clips — the reconstruction-quality story the reference only publishes as
    a figure (README.md:402-408)."""
    from mosstts_tpu.codec.train import (
        CodecTrainer,
        synthetic_audio_batch,
        synthetic_data_iter,
    )
    from mosstts_tpu.core.config import CodecConfig

    cfg = CodecConfig(
        hidden_size=48, intermediate_size=96,
        num_encoder_layers=1, num_decoder_layers=1,
        num_attention_heads=2, num_key_value_heads=2, head_dim=24,
        n_q=4, codebook_dim=24, causal_context=16,
    )
    trainer = CodecTrainer(cfg, num_quantizers=4, peak_lr=1e-3,
                           warmup_steps=5, total_steps=60)
    eval_wav = synthetic_audio_batch(np.random.default_rng(99), 2, 0.5,
                                     cfg.sampling_rate)
    before = trainer.evaluate(eval_wav)
    hist = trainer.fit(
        synthetic_data_iter(0, 2, 0.5, cfg.sampling_rate), steps=60,
        log_every=1000, log_fn=lambda s: None,
    )
    after = trainer.evaluate(eval_wav)

    assert len(hist) == 60 and np.isfinite([h["loss"] for h in hist]).all()
    assert hist[-1]["loss"] < hist[0]["loss"]
    assert after["si_snr_db"] > before["si_snr_db"], (before, after)
    assert np.isfinite(after["mel_dist"])


def test_si_snr_metric():
    from mosstts_tpu.codec.train import si_snr

    rng = np.random.default_rng(0)
    x = rng.standard_normal(4800).astype(np.float32)
    assert si_snr(x, x) > 60  # identical -> very high
    assert si_snr(2.0 * x, x) > 60  # scale-invariant
    assert si_snr(rng.standard_normal(4800), x) < 1  # unrelated -> ~0 dB


def test_codec_1p6b_preset_scale():
    """The parity-scale preset must actually be ~1.5B+ params (reference Cat
    is 1.6B, README.md:385) — computed analytically, not materialized."""
    import jax
    from mosstts_tpu.codec.model import init_codec_params
    from mosstts_tpu.core.config import codec_1p6b

    cfg = codec_1p6b()
    shapes = jax.eval_shape(
        lambda k: init_codec_params(k, cfg), jax.random.PRNGKey(0))
    n_params = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(shapes))
    assert n_params > 1.4e9, f"{n_params/1e9:.2f}B"


def test_adversarial_training_step():
    """The GAN half (MS-STFT + multi-period discriminators, hinge losses,
    feature matching): one jitted alternating G/D step runs, the D loss
    moves toward discrimination, and the G adversarial terms are live
    (finite, changing) — the piece of the recipe PROFILE.md names as
    required for positive SI-SNR."""
    from mosstts_tpu.codec.train import CodecTrainer, synthetic_data_iter
    from mosstts_tpu.core.config import CodecConfig

    cfg = CodecConfig(
        hidden_size=64, intermediate_size=192,
        num_encoder_layers=2, num_decoder_layers=2,
        num_attention_heads=2, num_key_value_heads=2,
        head_dim=32, n_q=4, codebook_dim=64,
    )
    tr = CodecTrainer(cfg, num_quantizers=4, adversarial=True,
                      disc_channels=8, disc_lr=1e-3,
                      warmup_steps=1, total_steps=12)
    data = synthetic_data_iter(0, 2, 0.5, cfg.sampling_rate)
    hist = [tr.train_step(next(data)) for _ in range(8)]

    for rec in hist:
        for k in ("loss", "adv", "fm", "d_loss"):
            assert np.isfinite(rec[k]), (k, rec)
    # untrained D on hinge loss starts at ~2.0 (both terms ~1); training
    # must move it down (it is learning to separate real from fake)
    assert hist[-1]["d_loss"] < hist[0]["d_loss"]
    # the adversarial + feature-matching terms are not constant (gradients
    # reach both G and D through the discriminator ensemble)
    assert len({round(h["adv"], 6) for h in hist}) > 1
    assert len({round(h["fm"], 4) for h in hist}) > 1


def test_discriminator_shapes_and_losses():
    """disc_forward returns per-sub (logits, features); hinge/FM losses are
    scalar, differentiable, and zero FM for identical inputs."""
    from mosstts_tpu.codec.discriminator import (
        disc_forward, feature_matching_loss, hinge_d_loss, hinge_g_loss,
        init_discriminators,
    )

    rng = np.random.default_rng(3)
    wav = jnp.asarray(rng.standard_normal((2, 12000)), jnp.float32)
    params = init_discriminators(jax.random.PRNGKey(0), channels=4)
    outs = disc_forward(params, wav)
    assert len(outs) >= 6  # >=1 STFT scales + 5 periods
    for logits, feats in outs:
        assert logits.shape[0] == 2 and logits.shape[-1] == 1
        assert len(feats) >= 4

    same = feature_matching_loss(outs, outs)
    assert float(same) == 0.0
    other = disc_forward(params, wav * 0.5 + 0.1)
    assert float(feature_matching_loss(outs, other)) > 0.0
    assert np.isfinite(float(hinge_d_loss(outs, other)))
    assert np.isfinite(float(hinge_g_loss(other)))

    # gradients flow to every discriminator leaf
    g = jax.grad(lambda p: hinge_d_loss(disc_forward(p, wav),
                                        disc_forward(p, wav * 0.3)))(params)
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_synthetic_speech_generator():
    """The no-egress speech generator must be deterministic by seed,
    bounded, and actually speech-shaped: energy concentrated in the
    formant band, harmonic (voiced) structure present, and distinct
    utterances apart under the MCD metric."""
    from mosstts_tpu.codec.speech_synth import (
        mcd_db,
        synthetic_speech_batch,
    )

    sr = 24000
    w = synthetic_speech_batch(np.random.default_rng(7), 4, 1.0, sr)
    assert w.shape == (4, sr) and w.dtype == np.float32
    assert np.isfinite(w).all() and np.abs(w).max() <= 0.99
    rms = np.sqrt((w ** 2).mean(axis=1))
    assert (rms > 0.05).all() and (rms < 0.2).all()
    # spectral mass in the formant band dominates the >8 kHz band
    spec = np.abs(np.fft.rfft(w, axis=1))
    f = np.fft.rfftfreq(sr, 1 / sr)
    lo = spec[:, (f > 100) & (f < 3500)].mean(axis=1)
    hi = spec[:, f > 8000].mean(axis=1)
    assert (lo > 5 * hi).all(), lo / hi
    # deterministic by seed
    w2 = synthetic_speech_batch(np.random.default_rng(7), 4, 1.0, sr)
    np.testing.assert_array_equal(w, w2)
    # the ABX-proxy metric: zero for identity, large across utterances
    assert mcd_db(w[0], w[0], sr) < 1e-4
    assert mcd_db(w[0], w[1], sr) > 5.0
    # works at the codec's actual sampling rate config too
    w3 = synthetic_speech_batch(np.random.default_rng(1), 2, 0.5, 16000)
    assert w3.shape == (2, 8000) and np.isfinite(w3).all()


def test_trainer_evaluate_reports_mcd():
    from mosstts_tpu.codec.speech_synth import synthetic_speech_batch
    from mosstts_tpu.codec.train import CodecTrainer

    trainer = CodecTrainer(TINY, num_quantizers=2, total_steps=10)
    wav = synthetic_speech_batch(np.random.default_rng(0), 2, 2.0,
                                 TINY.sampling_rate)
    m = trainer.evaluate(wav)
    assert set(m) >= {"si_snr_db", "mel_dist", "mcd_db"}
    assert np.isfinite(m["mcd_db"]) and m["mcd_db"] > 0


def test_si_snr_shifted_recovers_constant_delay():
    """A few-ms constant reconstruction delay (typical of causal codec
    stacks) must not read as catastrophic: the shift-tolerant metric finds
    the lag and recovers the score plain SI-SNR destroys."""
    from mosstts_tpu.codec.train import si_snr, si_snr_shifted

    rng = np.random.default_rng(0)
    x = rng.standard_normal(24000)
    k = 72  # 3 ms at 24 kHz
    delayed = np.concatenate([np.zeros(k), x[:-k]])
    assert si_snr(delayed, x) < 0
    best, lag = si_snr_shifted(delayed, x, 24000, max_shift_ms=5.0)
    assert lag == k and best > 40
    best0, lag0 = si_snr_shifted(x, x, 24000)
    assert lag0 == 0 and best0 > 40


def test_lag_align_selects_delay_and_keeps_gradients():
    """lag_align must find a constant per-row delay (waveform losses then
    judge content, not alignment) and stay differentiable through the
    selected slice."""
    import jax
    import jax.numpy as jnp
    from mosstts_tpu.codec.losses import lag_align, si_snr_loss

    rng = np.random.default_rng(0)
    ref = rng.standard_normal((2, 4000)).astype(np.float32)
    est = np.zeros_like(ref)
    est[0, 40:] = ref[0, :-40]   # row 0 delayed 40 samples
    est[1, :-24] = ref[1, 24:]   # row 1 advanced 24 samples
    ref_j, est_j = jnp.asarray(ref), jnp.asarray(est)

    assert float(si_snr_loss(est_j, ref_j)) > 0  # misaligned: terrible
    ea, rc = lag_align(est_j, ref_j, max_shift=48, hop=8)
    assert ea.shape == rc.shape == (2, 4000 - 96)
    assert float(si_snr_loss(ea, rc)) < -40  # aligned: near-perfect

    g = jax.grad(lambda e: si_snr_loss(*lag_align(e, ref_j, max_shift=48,
                                                  hop=8)))(est_j)
    assert float(jnp.abs(g).sum()) > 0  # gradients flow through selection


def test_codec_trainer_lag_tolerance_smoke():
    from mosstts_tpu.codec.train import CodecTrainer, synthetic_audio_batch
    from mosstts_tpu.core.config import CodecConfig

    cfg = CodecConfig(hidden_size=32, intermediate_size=64,
                      num_encoder_layers=1, num_decoder_layers=1,
                      num_attention_heads=2, num_key_value_heads=2,
                      head_dim=16, n_q=4)
    tr = CodecTrainer(cfg, total_steps=10, warmup_steps=2, lag_tolerance=32)
    rng = np.random.default_rng(0)
    wav = synthetic_audio_batch(rng, 2, 0.2)
    first = tr.train_step(wav)
    for _ in range(5):
        last = tr.train_step(wav)
    assert np.isfinite(last["loss"]) and last["loss"] < first["loss"]
