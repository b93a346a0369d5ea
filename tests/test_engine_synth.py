"""Engine synth (hello-other-exps/hello_engine_synth.cpp capability)."""

import numpy as np
import jax
import jax.numpy as jnp

from lsr_tpu.audio.engine_synth import (
    EngineControls, drive_cycle, spectrum_image, synthesize)
from lsr_tpu.io.wav import read_wav, write_wav


def _const_controls(n, rpm, thr=0.5, load=0.5):
    full = lambda v: jnp.full((n,), v, jnp.float32)  # noqa: E731
    return EngineControls(rpm=full(rpm), throttle=full(thr),
                          load=full(load), torque_mul=full(0.8),
                          shift_burst=full(0.0))


def test_fundamental_tracks_rpm():
    """The dominant partial sits at f0 = rpm/60 * cylinders/2 * 0.5
    (hello_engine_synth.cpp:211-213)."""
    rate = 24000
    n = int(1.8 * rate)
    noise = jnp.zeros((n,), jnp.float32)   # deterministic: no jitter/hiss
    for rpm in (1800.0, 3600.0):
        y = np.asarray(synthesize(_const_controls(n, rpm), noise,
                                  sample_rate=rate))
        seg = y[int(1.2 * rate):]          # past the starter crossfade
        mag = np.abs(np.fft.rfft(seg * np.hanning(seg.shape[0])))
        freqs = np.fft.rfftfreq(seg.shape[0], 1.0 / rate)
        f_peak = freqs[np.argmax(mag)]
        f0 = rpm / 60.0 * 8.0 * 0.5
        assert abs(f_peak - f0) < 6.0, (rpm, f_peak, f0)


def test_output_bounded_and_stateful():
    rate = 12000
    controls, noise = drive_cycle(seconds=1.5, sample_rate=rate)
    y = np.asarray(synthesize(controls, noise, sample_rate=rate))
    assert y.shape == (int(1.5 * rate),)
    assert np.all(np.isfinite(y))
    assert np.abs(y).max() <= 1.0 + 1e-5   # softclip bound
    assert np.abs(y[rate:]).max() > 0.01   # audibly non-silent
    # Deterministic under jit (same PRNG stream).
    y2 = np.asarray(synthesize(controls, noise, sample_rate=rate))
    np.testing.assert_array_equal(y, y2)


def test_shift_burst_adds_crack_energy():
    rate = 12000
    n = rate
    noise = jax.random.uniform(jax.random.PRNGKey(1), (n,), jnp.float32,
                               -1.0, 1.0)
    quiet = _const_controls(n, 3000.0)
    burst = EngineControls(
        rpm=quiet.rpm, throttle=quiet.throttle, load=quiet.load,
        torque_mul=quiet.torque_mul,
        shift_burst=jnp.ones((n,), jnp.float32))
    y0 = np.asarray(synthesize(quiet, noise, sample_rate=rate))
    y1 = np.asarray(synthesize(burst, noise, sample_rate=rate))
    tail = slice(int(0.5 * rate), None)
    assert np.sqrt(np.mean(y1[tail] ** 2)) > np.sqrt(
        np.mean(y0[tail] ** 2)) * 1.05


def test_wav_roundtrip(tmp_path):
    rate = 8000
    t = np.arange(rate) / rate
    x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    p = str(tmp_path / "t.wav")
    write_wav(p, x, rate)
    y, r = read_wav(p)
    assert r == rate and y.shape == (rate, 1)
    np.testing.assert_allclose(y[:, 0], x, atol=1.0 / 32000)


def test_spectrum_image_shape():
    rate = 12000
    controls, noise = drive_cycle(seconds=1.0, sample_rate=rate)
    y = synthesize(controls, noise, sample_rate=rate)
    img = spectrum_image(y, rate, width=128, height=64)
    assert img.shape == (64, 128, 3) and img.dtype == np.uint8
    assert img.max() > 32                   # something is lit
