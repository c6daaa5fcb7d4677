"""End-to-end GenerationPipeline test on a tiny config: synthetic WAV ->
mel -> conditioning -> DDIM CFG sampling -> VAE decode -> .osu/.osz files
(mirrors the reference webui startMapping flow, ref webui.py:277-482)."""

import os
import sys
import wave as wave_mod

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCHEMA = os.path.join(
    os.path.dirname(__file__), "..", "configs", "mug",
    "mania_beatmap_features.yaml",
)
TEMPLATE = os.path.join(
    os.path.dirname(__file__), "..", "assets", "template.osu"
)


def tiny_config():
    return {
        "model": {
            "target": "mug_diffusion_tpu.diffusion.ddpm.DDPM",
            "params": {
                "timesteps": 50, "z_channels": 16, "z_length": 8,
                "parameterization": "eps", "loss_type": "smooth_l1",
                "unet_config": {
                    "target": "mug_diffusion_tpu.models.unet.UNetModel",
                    "params": {
                        "in_channels": 16, "model_channels": 8,
                        "out_channels": 16, "num_res_blocks": 1,
                        "attention_resolutions": [2],
                        "channel_mult": [1, 2], "num_heads": 2,
                        "context_dim": 8, "s4_layer": False,
                        "audio_channels": [8, 8],
                    },
                },
                "first_stage_config": {
                    "target":
                        "mug_diffusion_tpu.models.autoencoder.AutoencoderKL",
                    "params": {
                        "ddconfig": {
                            "x_channels": 16, "middle_channels": 8,
                            "z_channels": 16, "num_groups": 4,
                            "channel_mult": [1, 2, 4, 4],
                            "num_res_blocks": 1,
                        },
                        "kl_weight": 1e-6,
                        "lossconfig": "__is_first_stage__",
                    },
                },
                "cond_stage_config": {
                    "target":
                        "mug_diffusion_tpu.models.feature.BeatmapFeatureEmbedder",
                    "params": {"path_to_yaml": SCHEMA, "embed_dim": 8},
                },
                "wave_stage_config": {
                    "target":
                        "mug_diffusion_tpu.models.wave.MelspectrogramScaleEncoder1D",
                    "params": {
                        "n_freq": 16, "middle_channels": 8,
                        "attention_resolutions": [], "num_res_blocks": 1,
                        "num_heads": 2, "num_groups": 4,
                        "channel_mult": [1, 1, 1, 1, 1, 1, 1, 1],
                        "use_checkpoint": False,
                    },
                },
            },
        },
        "data": {
            "params": {
                "batch_size": 2,
                "common_params": {
                    "sr": 22050, "n_fft": 512, "max_audio_frame": 512,
                    "audio_note_window_ratio": 8, "n_mels": 16,
                },
            }
        },
    }


@pytest.fixture(scope="module")
def wav_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("audio") / "tone.wav"
    sr = 22050
    t = np.arange(sr * 3) / sr
    y = (0.4 * np.sin(2 * np.pi * 330 * t) * 32767).astype(np.int16)
    with wave_mod.open(str(p), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(y.tobytes())
    return str(p)


@pytest.fixture(scope="module")
def pipeline():
    from mug_diffusion_tpu.apps.pipeline import GenerationPipeline

    pipe = GenerationPipeline(tiny_config())
    pipe.z_length_buckets = (8,)
    # Perturb params: at init every ContextualTransformer output projection
    # and the U-Net out-conv are ZERO (ref zero_module convention,
    # models/attention.py), so prompt context provably cannot reach the
    # sampler output — prompt-sensitivity tests would be vacuous. Same
    # treatment as test_precision.py::test_guidance_scale_is_traced_not_baked.
    import jax

    pipe.params = jax.tree_util.tree_map(
        lambda x: x + 0.02 * jax.random.normal(
            jax.random.PRNGKey(1), x.shape
        ).astype(x.dtype)
        if hasattr(x, "shape") and x.ndim >= 1 else x,
        pipe.params,
    )
    return pipe


def test_generate_and_save(pipeline, wav_path, tmp_path):
    decoded, z_length = pipeline.sample_charts(
        wav_path, {"sr": 3.0, "rc": 1}, count=2, steps=5, scale=3.0, seed=7,
    )
    assert z_length == 8
    assert decoded.shape == (2, 16, 64)  # [count, 4K planes, note frames]
    assert np.isfinite(decoded).all()

    save_dir = str(tmp_path / "out")
    paths = pipeline.save_charts(
        decoded, save_dir, wav_path, "Tone", "Tester", TEMPLATE, z_length,
        prompt="sr=3", convert_mp3=False,
    )
    assert len(paths) == 2
    for p in paths:
        with open(p) as f:
            body = f.read()
        assert "[HitObjects]" in body
        assert "Tone" in body
    osz = pipeline.package_osz(save_dir, str(tmp_path / "out.osz"))
    assert os.path.getsize(osz) > 0


def test_generate_inpaint(pipeline, wav_path, tmp_path):
    """Partial regeneration keeps the masked region of an existing chart."""
    # write a chart with notes in the kept window
    chart = tmp_path / "orig.osu"
    lines = [f"64,192,{200 + i * 180},1,0,0:0:0:0:" for i in range(10)]
    chart.write_text(
        "osu file format v14\n\n[General]\nAudioFilename: audio.wav\nMode: 3\n"
        "\n[Metadata]\nVersion:orig\n\n[Difficulty]\nCircleSize: 4\n\n"
        "[HitObjects]\n" + "\n".join(lines) + "\n"
    )
    decoded, z_length = pipeline.sample_charts(
        wav_path, {}, count=1, steps=5, scale=1.0, seed=3,
        inpaint_from=str(chart), inpaint_keep_ms=[(0, 1500)],
    )
    assert decoded.shape == (1, 16, 64)
    assert np.isfinite(decoded).all()


def test_per_chart_prompts(pipeline, wav_path):
    """A sequence of per-chart prompts generates a mapset (one prompt per
    difficulty) in a single fused dispatch. Row independence: chart 0 —
    same seed, same prompt — must be bitwise identical whether chart 1's
    prompt matches or differs; chart 1 must actually respond to its own
    prompt."""
    easy, hard = {"sr": 1.5, "rc": 1}, {"sr": 6.0, "ln": 1}
    base, _ = pipeline.sample_charts(
        wav_path, [easy, easy], count=2, steps=4, scale=3.0, seed=11,
    )
    mixed, _ = pipeline.sample_charts(
        wav_path, [easy, hard], count=2, steps=4, scale=3.0, seed=11,
    )
    assert mixed.shape == (2, 16, 64)
    np.testing.assert_array_equal(base[0], mixed[0])
    assert np.abs(base[1] - mixed[1]).max() > 0

    with pytest.raises(ValueError):
        pipeline.sample_charts(
            wav_path, [easy], count=2, steps=4, scale=3.0, seed=11,
        )


def test_batched_multi_song(pipeline, wav_path, tmp_path):
    """Two different songs, one chart each, sampled in a single batch."""
    import shutil

    wav2 = str(tmp_path / "tone2.wav")
    shutil.copyfile(wav_path, wav2)
    decoded, z_length = pipeline.sample_charts_batched(
        [wav_path, wav2], [{"sr": 2.0}, {"sr": 5.0}], steps=4, scale=2.0,
    )
    assert decoded.shape == (2, 16, z_length * 8)
    assert np.isfinite(decoded).all()


def test_batched_multi_song_multi_chart(pipeline, wav_path, tmp_path):
    """count_per_song>1: K charts per song in ONE dispatch with the wave
    encoder running once per SONG (input_kind='mel_songs')."""
    import shutil

    wav2 = str(tmp_path / "tone2b.wav")
    shutil.copyfile(wav_path, wav2)
    decoded, z_length = pipeline.sample_charts_batched(
        [wav_path, wav2], [{"sr": 2.0}, {"sr": 5.0}], steps=4, scale=2.0,
        count_per_song=2,
    )
    assert decoded.shape == (4, 16, z_length * 8)
    assert np.isfinite(decoded).all()
    # the two charts of one song share conditioning but not noise
    assert np.abs(decoded[0] - decoded[1]).max() > 1e-4
    # per-chart prompt list (song-major) is accepted too
    decoded2, _ = pipeline.sample_charts_batched(
        [wav_path, wav2],
        [{"sr": 2.0}, {"sr": 3.0}, {"sr": 4.0}, {"sr": 5.0}],
        steps=4, scale=2.0, count_per_song=2,
    )
    assert decoded2.shape == (4, 16, z_length * 8)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        pipeline.sample_charts_batched(
            [wav_path, wav2], [{}, {}, {}], steps=4, scale=2.0,
            count_per_song=2,
        )


def test_chart2prompt(tmp_path):
    from mug_diffusion_tpu.apps.invert import chart_to_prompt

    chart = tmp_path / "c.osu"
    lines = [f"{64 + (i % 4) * 128},192,{500 + i * 150},1,0,0:0:0:0:"
             for i in range(60)]
    chart.write_text(
        "osu file format v14\n\n[General]\nMode: 3\n\n[Difficulty]\n"
        "CircleSize: 4\n\n[HitObjects]\n" + "\n".join(lines) + "\n"
    )
    result = dict(chart_to_prompt(str(chart), 1.0))
    assert result["map type"].startswith("Rice")
    assert result["ln ratio"] == 0.0
    try:
        import minacalc  # noqa: F401

        assert "MSD score (Etterna)" in result
        assert result["MSD score (Etterna)"] > 0
    except ImportError:
        pass


def test_mapping_cli_end_to_end(tmp_path):
    """Drive the actual CLI entry (scripts/mapping.py, ref mapping.py:443-520)
    from argv to .osz on disk."""
    import sys
    import wave as wave_mod
    import zipfile

    import yaml

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    import mapping

    cfg = tiny_config()
    cfg_path = str(tmp_path / "model.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    sr = 22050
    t = np.arange(int(2.0 * sr)) / sr
    y = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    wav = str(tmp_path / "song.wav")
    with wave_mod.open(wav, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((y * 32767).astype(np.int16).tobytes())

    template = os.path.join(os.path.dirname(__file__), "..", "assets",
                            "template.osu")
    outdir = str(tmp_path / "out")
    mapping.main([
        "--audio", wav, "--audio_title", "Song", "--audio_artist", "Artist",
        "--model_config", cfg_path, "--ckpt", str(tmp_path / "nonexistent"),
        "--template_beatmap", template, "--outdir", outdir,
        "--ddim_steps", "4", "--n_samples", "2", "--scale", "1.0",
        "--prompt_dir", str(tmp_path),
    ])
    osz = os.path.join(outdir, "Artist - Song.osz")
    assert os.path.isfile(osz)
    names = zipfile.ZipFile(osz).namelist()
    assert sum(n.endswith(".osu") for n in names) == 2


def test_warmup_compiles_fused_executables(pipeline):
    """warmup() precompiles the FUSED serving path per bucket — the same
    cache key sample_charts uses must be populated."""
    pipeline.warmup(buckets=[8], counts=(2,), steps=2, scale=3.0)
    key = (2, 8, True, False, "mel", False, "ddim", 1)
    assert key in pipeline._fused_cache


def test_warmup_mask_covers_uncond_inpainting(pipeline):
    """include_mask warms BOTH inpainting structures — a masked request at
    the slider-minimum scale 1.0 (use_cfg=False) must not compile cold."""
    pipeline._fused_cache.clear()
    pipeline.warmup(buckets=[8], counts=(2,), steps=2, scale=3.0,
                    include_mask=True)
    assert (2, 8, True, True, "mel", False, "ddim", 1) in pipeline._fused_cache
    assert (2, 8, False, True, "mel", False, "ddim", 1) in pipeline._fused_cache


def test_slider_surface_zero_recompiles(pipeline, wav_path):
    """The whole webui slider surface — steps, guidance scale, eta, count —
    must be served by a BOUNDED set of compiled executables: sweeping
    steps/scale/eta reuses ONE XLA executable per (count-bucket, length,
    cfg) structure with zero new compiles (the reference serves any combo
    instantly, ref webui.py:602-608 + ddim.py:56)."""
    pipeline._fused_cache.clear()
    for steps, scale, eta, seed in [
        (2, 3.0, 0.0, 0), (5, 9.5, 0.0, 1), (3, 2.0, 1.0, 2),
    ]:
        decoded, _ = pipeline.sample_charts(
            wav_path, {"sr": 3.0}, count=2, steps=steps, scale=scale,
            eta=eta, seed=seed,
        )
        assert decoded.shape == (2, 16, 64)
        assert np.isfinite(decoded).all()
    # one pipeline-level structure...
    assert set(pipeline._fused_cache) == {(2, 8, True, False, "mel", False, "ddim", 1)}
    # ...backed by exactly ONE compiled XLA executable
    fn = pipeline._fused_cache[(2, 8, True, False, "mel", False, "ddim", 1)]
    assert fn._jitted._cache_size() == 1
    # different counts pad to buckets: 3 -> 4, and reuse thereafter
    for count in (3, 4):
        decoded, _ = pipeline.sample_charts(
            wav_path, {"sr": 3.0}, count=count, steps=2, scale=3.0,
        )
        assert decoded.shape == (count, 16, 64)
    assert (4, 8, True, False, "mel", False, "ddim", 1) in pipeline._fused_cache
    assert len(pipeline._fused_cache) == 2


def test_dynamic_steps_actually_change_output(pipeline, wav_path):
    """Traced steps must reach the sampler: different step counts give
    different charts from the same seed through the SAME executable."""
    a, _ = pipeline.sample_charts(wav_path, {}, count=1, steps=2,
                                  scale=3.0, seed=5)
    b, _ = pipeline.sample_charts(wav_path, {}, count=1, steps=7,
                                  scale=3.0, seed=5)
    assert np.abs(a - b).mean() > 1e-7


def test_dpmpp_solver_through_fused_pipeline(pipeline, wav_path):
    """solver="dpmpp" builds its own fused executable (separate cache key)
    and produces finite charts; steps is traced there too. Beyond the
    reference: a 2nd-order solver needs ~4-5x fewer steps than DDIM."""
    a, z_length = pipeline.sample_charts(
        wav_path, {"sr": 3.0}, count=2, steps=4, scale=3.0, seed=9,
        solver="dpmpp",
    )
    assert z_length == 8 and a.shape == (2, 16, 64)
    assert np.isfinite(a).all()
    assert (2, 8, True, False, "mel", False, "dpmpp", 1) in \
        pipeline._fused_cache
    # traced steps reach the dpm while-loop: step count changes the chart
    b, _ = pipeline.sample_charts(
        wav_path, {"sr": 3.0}, count=2, steps=9, scale=3.0, seed=9,
        solver="dpmpp",
    )
    assert np.abs(a - b).mean() > 1e-7
    # deterministic solver: nonzero eta is rejected at the wrapper
    import pytest

    with pytest.raises(ValueError):
        pipeline.sample_charts(
            wav_path, {}, count=1, steps=4, scale=3.0, eta=0.5,
            solver="dpmpp",
        )
    # log-SNR node spacing is its own executable and a different node grid
    c, _ = pipeline.sample_charts(
        wav_path, {"sr": 3.0}, count=2, steps=4, scale=3.0, seed=9,
        solver="dpmpp-lambda",
    )
    assert np.isfinite(c).all()
    assert np.abs(c - a).mean() > 1e-7
