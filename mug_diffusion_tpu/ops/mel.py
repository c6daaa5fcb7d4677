"""Audio frontend: ffmpeg decode -> XLA-compiled log-mel spectrogram.

Replaces the reference's host-side librosa pipeline (ref: mug/util.py:120-157)
with a TPU/XLA-native implementation: framing is a pure reshape+stack (hop
divides n_fft so each frame is a concatenation of 4 hop-blocks), the FFT is a
batched ``jnp.fft.rfft`` and the mel projection is a single [n_bins, n_mels]
matmul that XLA fuses with the magnitude-squared and ``log1p``.

Numerics follow librosa defaults (librosa.feature.melspectrogram with
sr=22050, n_fft=512, hop_length=128): centered frames with constant (zero)
padding, periodic Hann window, power-2 spectrum, HTK=False (Slaney-scale)
mel filterbank with 'slaney' area normalization.

Version caveat: the reference pins no librosa version
(ref: requirements.txt), and librosa changed the melspectrogram default
``pad_mode`` from 'reflect' (<=0.9) to 'constant' (>=0.10). This module
implements the modern 'constant' convention; the two differ only in the
first/last ~2 frames (edge padding of the centered STFT). librosa itself
is not installable in this image, so parity is established against an
independent NumPy reference and torch.stft (tests/test_mel.py) rather
than librosa directly.
"""

from __future__ import annotations

import functools
import os
import subprocess
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def hz_to_mel(frequencies, htk: bool = False):
    """librosa-compatible Hz->mel (Slaney by default)."""
    frequencies = np.asanyarray(frequencies, dtype=np.float64)
    if htk:
        return 2595.0 * np.log10(1.0 + frequencies / 700.0)
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (frequencies - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    log_t = frequencies >= min_log_hz
    mels = np.where(
        log_t,
        min_log_mel + np.log(np.maximum(frequencies, min_log_hz) / min_log_hz) / logstep,
        mels,
    )
    return mels


def mel_to_hz(mels, htk: bool = False):
    mels = np.asanyarray(mels, dtype=np.float64)
    if htk:
        return 700.0 * (10.0 ** (mels / 2595.0) - 1.0)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    log_t = mels >= min_log_mel
    freqs = np.where(
        log_t, min_log_hz * np.exp(logstep * (mels - min_log_mel)), freqs
    )
    return freqs


def mel_filterbank(
    sr: int,
    n_fft: int,
    n_mels: int,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
    htk: bool = False,
    norm: str = "slaney",
) -> np.ndarray:
    """Triangular mel filterbank, shape [n_mels, 1 + n_fft//2].

    Matches librosa.filters.mel defaults (triangles on the Slaney mel scale
    with 2/bandwidth area normalization).
    """
    if fmax is None:
        fmax = float(sr) / 2
    n_bins = 1 + n_fft // 2
    fftfreqs = np.fft.rfftfreq(n=n_fft, d=1.0 / sr)

    mel_min = hz_to_mel(fmin, htk=htk)
    mel_max = hz_to_mel(fmax, htk=htk)
    mel_f = mel_to_hz(np.linspace(mel_min, mel_max, n_mels + 2), htk=htk)

    fdiff = np.diff(mel_f)
    ramps = mel_f.reshape(-1, 1) - fftfreqs.reshape(1, -1)

    lower = -ramps[:-2] / fdiff[:-1].reshape(-1, 1)
    upper = ramps[2:] / fdiff[1:].reshape(-1, 1)
    weights = np.maximum(0, np.minimum(lower, upper))

    if norm == "slaney":
        enorm = 2.0 / (mel_f[2 : n_mels + 2] - mel_f[:n_mels])
        weights *= enorm.reshape(-1, 1)
    elif norm is not None:
        raise ValueError(f"Unsupported mel norm: {norm}")

    return weights.astype(np.float32)


def hann_window(n_fft: int) -> np.ndarray:
    """Periodic (fftbins=True) Hann window, matching scipy/librosa."""
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n_fft) / n_fft)).astype(
        np.float32
    )


@functools.partial(jax.jit, static_argnames=("n_fft", "hop_length", "num_frames"))
def _mel_kernel(y, mel_fb_t, window, n_fft: int, hop_length: int, num_frames: int):
    """[num_frames*hop] padded waveform -> [n_mels, num_frames] log1p-mel.

    Framing trick: hop divides n_fft, so after reshaping the padded signal
    into hop-sized blocks, frame ``i`` is blocks[i : i + n_fft//hop] — built
    with ``n_fft//hop`` shifted views instead of a gather.
    """
    ratio = n_fft // hop_length
    pad = n_fft // 2
    # center padding (constant zeros, librosa>=0.10 default)
    y = jnp.pad(y, (pad, pad + n_fft))
    blocks = y[: (num_frames + ratio) * hop_length].reshape(-1, hop_length)
    frames = jnp.concatenate(
        [blocks[i : i + num_frames] for i in range(ratio)], axis=1
    )  # [num_frames, n_fft]
    spec = jnp.fft.rfft(frames * window[None, :], axis=1)
    power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2  # [frames, bins]
    mel = power @ mel_fb_t  # [frames, n_mels]
    return jnp.log1p(mel).T  # [n_mels, frames]


def melspectrogram_on_device(
    y,
    sr: int = 22050,
    n_mels: int = 128,
    hop_length: int = 128,
    n_fft: int = 512,
    max_frames: Optional[int] = None,
):
    """Waveform -> log1p mel [n_mels, T] as a DEVICE array (float32).

    Same numerics as :func:`melspectrogram` but with no host round-trip —
    use this on the serving path where the mel feeds the wave encoder
    directly.
    """
    assert n_fft % hop_length == 0
    y = jnp.asarray(y, dtype=jnp.float32)
    num_frames = 1 + y.shape[0] // hop_length
    if max_frames is not None:
        num_frames = min(num_frames, max_frames)
    needed = num_frames * hop_length
    if y.shape[0] < needed:
        y = jnp.pad(y, (0, needed - y.shape[0]))
    else:
        y = y[:needed]

    fb_t = jnp.asarray(mel_filterbank(sr, n_fft, n_mels).T)
    win = jnp.asarray(hann_window(n_fft))
    out = _mel_kernel(y, fb_t, win, n_fft, hop_length, num_frames)
    if max_frames is not None and out.shape[1] < max_frames:
        out = jnp.pad(out, ((0, 0), (0, max_frames - out.shape[1])))
    return out


def melspectrogram(
    y: np.ndarray,
    sr: int = 22050,
    n_mels: int = 128,
    hop_length: int = 128,
    n_fft: int = 512,
    max_frames: Optional[int] = None,
) -> np.ndarray:
    """Waveform -> log1p mel spectrogram [n_mels, T] (float16).

    Mirrors ref mug/util.py:133-144 (librosa melspectrogram + log1p + fp16).
    If ``max_frames`` is given the output is truncated/zero-padded to that
    static length so downstream jit sees fixed shapes.
    """
    assert n_fft % hop_length == 0, "hop must divide n_fft for the framing trick"
    y = np.asarray(y, dtype=np.float32)
    num_frames = 1 + len(y) // hop_length
    if max_frames is not None:
        num_frames = min(num_frames, max_frames)
    # pad signal tail so reshape is static
    needed = num_frames * hop_length
    if len(y) < needed:
        y = np.pad(y, (0, needed - len(y)))
    else:
        y = y[:needed]

    # host-side (numpy) transform, numerically identical to _mel_kernel.
    # Data-loader workers call this from threads during training; dispatching
    # the jitted device kernel from there would contend with the training
    # step for the TPU, so the loader path stays on the host CPU.
    ratio = n_fft // hop_length
    pad = n_fft // 2
    yp = np.pad(y, (pad, pad + n_fft))
    blocks = yp[: (num_frames + ratio) * hop_length].reshape(-1, hop_length)
    frames = np.concatenate(
        [blocks[i: i + num_frames] for i in range(ratio)], axis=1
    )  # [num_frames, n_fft]
    spec = np.fft.rfft(frames * hann_window(n_fft)[None, :], axis=1)
    power = spec.real.astype(np.float32) ** 2 + spec.imag.astype(np.float32) ** 2
    mel = power @ mel_filterbank(sr, n_fft, n_mels).T
    out = np.log1p(mel).T.astype(np.float16)
    if max_frames is not None and out.shape[1] < max_frames:
        out = np.pad(out, ((0, 0), (0, max_frames - out.shape[1])))
    return out


def _decode_ffmpeg(audio_path: str, sr: int, max_duration: Optional[float]):
    cmd = ["ffmpeg", "-v", "error", "-i", audio_path]
    if max_duration is not None:
        cmd += ["-t", str(max_duration)]
    cmd += ["-f", "f32le", "-ac", "1", "-ar", str(sr), "-"]
    proc = subprocess.run(cmd, capture_output=True, check=True)
    y = np.frombuffer(proc.stdout, dtype=np.float32)
    if len(y) == 0:
        raise ValueError("empty decode")
    return y


def _decode_wav(audio_path: str, sr: int, max_duration: Optional[float]):
    """Native WAV decode + polyphase resample (no external binaries)."""
    import wave

    with wave.open(audio_path, "rb") as w:
        src_sr = w.getframerate()
        n_ch = w.getnchannels()
        width = w.getsampwidth()
        n = w.getnframes()
        if max_duration is not None:
            n = min(n, int(max_duration * src_sr))
        raw = w.readframes(n)
    if width == 2:
        y = np.frombuffer(raw, dtype=np.int16).astype(np.float32) / 32768.0
    elif width == 4:
        y = np.frombuffer(raw, dtype=np.int32).astype(np.float32) / 2147483648.0
    elif width == 1:
        y = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"Unsupported WAV sample width: {width}")
    if n_ch > 1:
        y = y.reshape(-1, n_ch).mean(axis=1)
    if src_sr != sr:
        from fractions import Fraction

        from scipy.signal import resample_poly

        frac = Fraction(sr, src_sr).limit_denominator(1000)
        y = resample_poly(y, frac.numerator, frac.denominator).astype(np.float32)
    return y


def _resample_to(y: np.ndarray, src_sr: int, sr: int) -> np.ndarray:
    if src_sr == sr:
        return np.asarray(y, dtype=np.float32)
    from fractions import Fraction

    from scipy.signal import resample_poly

    frac = Fraction(sr, src_sr).limit_denominator(1000)
    return resample_poly(
        np.asarray(y, np.float32), frac.numerator, frac.denominator
    ).astype(np.float32)


def _decode_soundfile(audio_path: str, sr: int, max_duration):
    """Optional hop: libsndfile via the soundfile package (wav/flac/ogg),
    matching the reference's second fallback (ref mug/util.py:124-126).
    Raises ImportError when soundfile is not installed."""
    import soundfile as sf  # gated: not part of the baked image

    with sf.SoundFile(audio_path) as f:
        src_sr = f.samplerate
        frames = -1
        if max_duration is not None:
            frames = int(max_duration * src_sr)
        y = f.read(frames=frames, dtype="float32", always_2d=True)
    y = y.mean(axis=1)
    if len(y) == 0:
        raise ValueError("empty decode")
    return _resample_to(y, src_sr, sr)


def _decode_audioread(audio_path: str, sr: int, max_duration):
    """Optional hop: audioread (gstreamer/CoreAudio/mad backends), matching
    the reference's last fallback (ref mug/util.py:127-131). Raises
    ImportError when audioread is not installed."""
    import audioread  # gated: not part of the baked image

    chunks = []
    with audioread.audio_open(audio_path) as f:
        src_sr, n_ch = f.samplerate, f.channels
        need = None
        if max_duration is not None:
            need = int(max_duration * src_sr) * n_ch
        got = 0
        for buf in f:
            chunks.append(np.frombuffer(buf, dtype=np.int16))
            got += len(chunks[-1])
            if need is not None and got >= need:
                break
    if not chunks:
        raise ValueError("empty decode")
    y = np.concatenate(chunks).astype(np.float32) / 32768.0
    if need is not None:
        y = y[:need]
    if n_ch > 1:
        y = y[: len(y) - len(y) % n_ch].reshape(-1, n_ch).mean(axis=1)
    return _resample_to(y, src_sr, sr)


def load_audio_wave(
    audio_path: str, sr: int, max_duration: Optional[float] = None
) -> Tuple[np.ndarray, int]:
    """Decode an audio file to mono float32 PCM at ``sr``.

    Fallback chain mirroring the reference's (ref mug/util.py:120-131):
    ffmpeg subprocess (any format) -> soundfile/libsndfile (wav/flac/ogg,
    if installed) -> audioread (if installed) -> native WAV reader + scipy
    polyphase resampler (no external dependencies at all). On a host with
    neither ffmpeg nor the optional packages, only WAV input decodes —
    the error lists every decoder attempted.
    """
    errors = []
    try:
        return _decode_ffmpeg(audio_path, sr, max_duration), sr
    except FileNotFoundError:
        errors.append("ffmpeg: binary not found on PATH")
    except (subprocess.CalledProcessError, ValueError) as e:
        errors.append(f"ffmpeg: {e}")
    for name, fn in (("soundfile", _decode_soundfile),
                     ("audioread", _decode_audioread)):
        try:
            return fn(audio_path, sr, max_duration), sr
        except ImportError:
            errors.append(f"{name}: package not installed")
        except Exception as e:  # noqa: BLE001 - keep the full fallback report
            errors.append(f"{name}: {e}")
    try:
        return _decode_wav(audio_path, sr, max_duration), sr
    except Exception as e:  # noqa: BLE001 - keep the full fallback report
        errors.append(f"wav: {e}")
    raise ValueError(
        f"Cannot decode audio: {audio_path}, "
        f"exists={os.path.exists(audio_path)}; " + "; ".join(errors)
    )


def load_audio_without_cache(
    audio_path: str,
    n_mels: int,
    audio_hop_length: int,
    n_fft: int,
    sr: int,
    max_duration: float,
    max_frames: Optional[int] = None,
) -> np.ndarray:
    """Decode + mel, uncached (ref: mug/util.py:133-144)."""
    y, sr = load_audio_wave(audio_path, sr, max_duration)
    return melspectrogram(
        y, sr=sr, n_mels=n_mels, hop_length=audio_hop_length, n_fft=n_fft,
        max_frames=max_frames,
    )


def load_audio(
    cache_dir: Optional[str],
    audio_path: str,
    n_mels: int,
    audio_hop_length: int,
    n_fft: int,
    sr: int,
    max_duration: float,
    max_frames: Optional[int] = None,
) -> np.ndarray:
    """Cached mel load, npz keyed by (set dir, file name)
    (ref: mug/util.py:146-157)."""
    audio_path = audio_path.strip()
    if cache_dir is None:
        return load_audio_without_cache(
            audio_path, n_mels, audio_hop_length, n_fft, sr, max_duration,
            max_frames,
        )
    cache_name = (
        f"{os.path.basename(os.path.dirname(audio_path))}-"
        f"{os.path.basename(audio_path)}.npz"
    )
    cache_path = os.path.join(cache_dir, cache_name)
    if os.path.isfile(cache_path):
        return np.load(cache_path)["y"]
    y = load_audio_without_cache(
        audio_path, n_mels, audio_hop_length, n_fft, sr, max_duration, max_frames
    )
    os.makedirs(cache_dir, exist_ok=True)
    # atomic publish: loader worker threads, worker processes, and (under
    # multi-process SPMD) other ranks may share cache_dir — a reader hitting
    # a half-written npz would quarantine a perfectly good chart
    # keep the .npz suffix: np.savez would silently append it otherwise.
    # Unique per WRITER, not just per process: the Loader's default
    # worker_type="thread" can cache-miss the same audio from two threads
    # (one mp3 shared by a set's difficulties) — a pid-only name would
    # truncate a sibling's in-flight write
    import threading
    import uuid

    tmp_path = (
        f"{cache_path[:-4]}.{os.getpid()}-{threading.get_ident()}-"
        f"{uuid.uuid4().hex[:8]}.tmp.npz"
    )
    try:
        np.savez_compressed(tmp_path, y=y)
        os.replace(tmp_path, cache_path)
    finally:
        if os.path.exists(tmp_path):
            try:
                os.remove(tmp_path)
            except OSError:
                pass
    return y
