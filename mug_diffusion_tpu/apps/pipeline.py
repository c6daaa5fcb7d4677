"""End-to-end generation pipeline shared by the CLI and the WebUI.

Mirrors the reference generation flow (ref: webui.py:277-482 startMapping and
scripts/mapping.py:443-520): prompt dict -> embedding ids -> conditioning;
audio -> mel -> wave features (computed once per generation); DDIM/CFG
sampling; VAE decode; symbolic post-processing (jack removal + grid snapping)
and .osu/.osz serialization.

TPU specifics: dynamic length adaptation (ref webui.py:348-357) is kept but
quantized to a small set of precompiled length buckets so each (steps,
z_length) pair compiles once and is reused; the whole sampling loop runs
device-side as one lax.scan.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import zipfile
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from mug_diffusion_tpu.data.convertor import parse_osu_file, save_osu_file
from mug_diffusion_tpu.data.postprocess import (
    gridify,
    remove_intractable_mania_mini_jacks,
)
from mug_diffusion_tpu.diffusion.ddim import DDIMSampler
from mug_diffusion_tpu.ops.mel import load_audio_without_cache
from mug_diffusion_tpu.utils.config import instantiate_from_config
from mug_diffusion_tpu.utils.feature_codec import feature_dict_to_embedding_ids
from mug_diffusion_tpu.utils import checkpoint as ckpt_utils

# z_length quantum: multiples of 32 latent frames (ref webui.py:353); the
# bucket list bounds recompilation while covering ~45 s .. ~6 min songs.
Z_LENGTH_BUCKETS = (128, 192, 256, 320, 384, 448, 512, 640, 768, 1024)

# chart-count padding buckets (webui slider 1-16, ref webui.py:602-608):
# requests are padded up to the nearest bucket and sliced on readback, so
# the whole slider maps to 5 compiled batch shapes instead of 16.
COUNT_BUCKETS = (1, 2, 4, 8, 16)


def _pad_rows(a, n: int):
    """Pad a [count, ...] array to [n, ...] rows by repeating the last row
    (count-bucket padding; the padded rows are sliced away on readback)."""
    a = np.asarray(a)
    if a.ndim and a.shape[0] < n:
        a = np.concatenate(
            [a, np.repeat(a[-1:], n - a.shape[0], axis=0)], axis=0
        )
    return jnp.asarray(a)


class GenerationPipeline:
    z_length_buckets = Z_LENGTH_BUCKETS
    count_buckets = COUNT_BUCKETS

    def __init__(self, config: dict, params=None,
                 ckpt_path: Optional[str] = None, mesh=None):
        """config: full layered config (model + data sections).

        mesh: optional ``jax.sharding.Mesh`` with a 'data' axis — serving
        then shards each request's chart batch across the mesh and
        sequence-shards the wave encoder (apps/serving.py); requests whose
        count doesn't divide the axis fall back to single-device."""
        self.config = config
        self.mesh = mesh
        self.model = instantiate_from_config(config["model"])  # DDPM
        self.sampler = DDIMSampler(self.model)
        self._fused_cache: dict = {}

        dataset = config["data"]["params"]["common_params"]
        self.n_mels = dataset["n_mels"]
        self.n_fft = dataset["n_fft"]
        self.sr = dataset["sr"]
        self.max_audio_frame = dataset["max_audio_frame"]
        self.audio_note_window_ratio = dataset["audio_note_window_ratio"]
        self.audio_hop_length = self.n_fft // 4
        self.audio_frame_duration = self.audio_hop_length / self.sr
        feature_yaml_path = config["model"]["params"]["cond_stage_config"][
            "params"]["path_to_yaml"]
        with open(feature_yaml_path) as f:
            self.feature_yaml = yaml.safe_load(f)

        if params is not None:
            self.params = params
        else:
            rng = jax.random.PRNGKey(0)
            # init on tiny-but-consistent shapes: keep the audio:latent ratio
            # of the config so the wave/U-Net level alignment checks out
            ratio = self.max_audio_frame // self.model.z_length
            z_init = min(self.model.z_length, 16)
            self.params = self.model.init_params(
                rng,
                {
                    "batch": 1,
                    "z_length": z_init,
                    "n_mels": self.n_mels,
                    "mel_length": z_init * ratio,
                },
            )
            if ckpt_path and os.path.exists(ckpt_path):
                self.params = {
                    "params": ckpt_utils.load_with_surgery(
                        ckpt_path, self.params["params"]
                    )
                }

    def _mesh_for(self, count: int):
        """The pipeline mesh when the request batch divides its data axis
        (production callers pad request batches; odd counts fall back to
        single-device rather than erroring)."""
        if self.mesh is not None and count % self.mesh.shape["data"] == 0:
            return self.mesh
        return None

    def _count_bucket(self, count: int) -> int:
        """Pad the requested chart count to the nearest bucket (sliced on
        readback) so any count slider value hits a precompiled batch shape.
        With a mesh, prefer a bucket divisible by its data axis so the
        request shards — idle devices make the padding free."""
        b = next((x for x in self.count_buckets if x >= count), count)
        if self.mesh is not None:
            a = self.mesh.shape["data"]
            if b % a != 0:
                b = next(
                    (x for x in self.count_buckets
                     if x >= count and x % a == 0),
                    b,
                )
        return b

    def _fused(self, count: int, z_length: int, use_cfg: bool = True,
               use_mask: bool = False, input_kind: str = "mel",
               mel_frames: Optional[int] = None, solver: str = "ddim",
               n_songs: int = 1):
        """Cached fused single-dispatch generator per request STRUCTURE.

        Steps, eta and guidance scale are traced arguments of the returned
        callable (``fn(params, mel, feature, uc, rng, scale, steps, eta,
        mask, x0)``) — only the CFG/mask graph structure, the count bucket
        and the length bucket participate in the cache key. The entire
        webui slider surface (steps 10-200 x count 1-16 x scale 1-30) is
        served by this bounded executable set with zero on-demand
        recompiles (ref webui.py:602-608 serves any combo instantly)."""
        from mug_diffusion_tpu.apps.serving import build_fused_generate

        mesh = self._mesh_for(count)
        key = (count, z_length, use_cfg, use_mask, input_kind,
               mesh is not None, solver, n_songs)
        if key not in self._fused_cache:
            ratio = self.max_audio_frame // self.model.z_length
            self._fused_cache[key] = build_fused_generate(
                self.model, steps=None, scale=5.0 if use_cfg else 1.0,
                count=count, z_length=z_length,
                mel_frames=mel_frames or z_length * ratio,
                use_mask=use_mask,
                sr=self.sr, n_mels=self.n_mels, n_fft=self.n_fft,
                input_kind=input_kind,
                n_songs=n_songs,
                mesh=mesh,
                shard_wave_time=mesh is not None
                and input_kind not in ("mel_batch", "mel_songs"),
                solver=solver,
            )
        return self._fused_cache[key]

    # ------------------------------------------------------------ prompts

    def encode_prompt(self, feature_dicts, batch_size: int):
        """Feature dict(s) -> [B, F] bucket ids (ref webui.py:186-193)."""
        if isinstance(feature_dicts, dict):
            feature_dicts = [feature_dicts] * batch_size
        ids = [
            feature_dict_to_embedding_ids(d, self.feature_yaml)
            for d in feature_dicts
        ]
        return jnp.asarray(np.asarray(ids, dtype=np.int32))

    # -------------------------------------------------------------- audio

    def load_mel(self, audio_path: str) -> np.ndarray:
        """Decode + mel, full length (ref webui.py:344-346)."""
        return load_audio_without_cache(
            audio_path, self.n_mels, self.audio_hop_length, self.n_fft,
            self.sr, None,
        ).astype(np.float32)

    def fit_length(self, mel: np.ndarray):
        """Dynamic length adaptation quantized to buckets
        (ref webui.py:348-367): pick the smallest bucket covering the song
        (capped at the largest), pad/trunc mel to bucket * 64 frames."""
        t = mel.shape[1]
        ratio = self.max_audio_frame // self.model.z_length  # 64
        quantum = min(32, self.z_length_buckets[0])
        # ceil like the reference (webui.py:353) — an exact-multiple song
        # must not be bumped to the next bucket (+25% compute for silence)
        needed = max(quantum, int(np.ceil(t / ratio / quantum)) * quantum)
        z_length = next(
            (b for b in self.z_length_buckets if b >= needed),
            self.z_length_buckets[-1],
        )
        audio_frames = z_length * ratio
        if t < audio_frames:
            mel = np.concatenate(
                [mel, np.zeros((self.n_mels, audio_frames - t), np.float32)],
                axis=1,
            )
        else:
            mel = mel[:, :audio_frames]
        return mel, z_length

    # -------------------------------------------------------- inpainting

    def encode_chart_latent(self, chart_path: str, z_length: int, count: int):
        """Encode an existing chart into the latent space for masked
        partial regeneration (the sampler's mask/x0 path,
        ref ddim.py:141-144)."""
        convertor_params = {
            "frame_ms": self.audio_frame_duration
            * self.audio_note_window_ratio * 1000,
            "max_frame": z_length * 8,
        }
        hit_objects, meta = parse_osu_file(chart_path, convertor_params)
        arr, _ = meta.convertor.objects_to_array(hit_objects, meta)
        note = jnp.asarray(arr.T[None])  # [1, T, 16]
        z0 = self.model.encode_first_stage_mode(self.params, note)
        return jnp.broadcast_to(z0, (count,) + z0.shape[1:])

    def make_time_mask(self, z_length: int, keep_ranges_ms, count: int):
        """mask=1 keeps the original latent; ranges are (start_ms, end_ms)."""
        frame_ms = (
            self.audio_frame_duration * self.audio_note_window_ratio
            * 1000 * 8
        )  # one latent frame = 8 note frames
        mask = np.zeros((z_length,), np.float32)
        for start_ms, end_ms in keep_ranges_ms:
            a = max(0, int(start_ms / frame_ms))
            b = min(z_length, int(np.ceil(end_ms / frame_ms)))
            mask[a:b] = 1.0
        return jnp.broadcast_to(
            jnp.asarray(mask)[None, :, None],
            (count, z_length, self.model.z_channels),
        )

    # ----------------------------------------------------------- sampling

    def sample_charts(
        self,
        audio_path: str,
        feature_dict: "dict | Sequence[dict]",
        count: int = 4,
        steps: int = 100,
        scale: float = 5.0,
        seed: int = 0,
        eta: float = 0.0,
        mask=None,
        x0=None,
        inpaint_from: Optional[str] = None,
        inpaint_keep_ms: Optional[Sequence] = None,
        solver: str = "ddim",
    ):
        """Returns (decoded_note_arrays [count, 4K, T] np, z_length).

        ``feature_dict`` may be one dict (all charts share the prompt, the
        reference behavior) or a sequence of ``count`` dicts — one prompt
        per chart, e.g. an easy/normal/hard/insane mapset for one song in a
        SINGLE fused dispatch (beyond the reference, which generates every
        chart of a request from the same prompt, ref webui.py:319-331).

        ``inpaint_from`` + ``inpaint_keep_ms=[(start_ms, end_ms), ...]``
        regenerate everything outside the kept ranges of an existing chart.
        """
        if count < 1:
            raise ValueError(f"count must be >= 1, got {count}")
        mel = self.load_mel(audio_path)
        mel, z_length = self.fit_length(mel)

        use_mask = (
            mask is not None or x0 is not None or inpaint_from is not None
        )
        # every request shape — including eta noise and masked inpainting
        # (ref ddim.py:141-144) — runs the fused single-dispatch executable
        # (apps/serving.py), measured 2.5x faster end-to-end than the
        # modular chain on a remote-TPU host (see docs/PERF.md); the count
        # is padded to a bucket and sliced on readback
        n = self._count_bucket(count)
        if isinstance(feature_dict, dict):
            feature = self.encode_prompt(feature_dict, n)
        else:
            fds = list(feature_dict)
            if len(fds) != count:
                raise ValueError(
                    f"got {len(fds)} per-chart prompts for count={count}"
                )
            # bucket-padded rows reuse the last prompt; sliced on readback
            feature = self.encode_prompt(fds + [fds[-1]] * (n - count), n)
        uc_feature = self.encode_prompt({}, n)

        if inpaint_from is not None:
            x0 = self.encode_chart_latent(inpaint_from, z_length, n)
            mask = self.make_time_mask(z_length, inpaint_keep_ms or [], n)
        elif use_mask:
            mask = None if mask is None else _pad_rows(mask, n)
            x0 = None if x0 is None else _pad_rows(x0, n)

        decoded = self._fused(
            n, z_length, use_cfg=(scale != 1.0), use_mask=use_mask,
            solver=solver,
        )(
            self.params, jnp.asarray(mel), feature, uc_feature,
            jax.random.PRNGKey(seed), scale, steps, eta,
            *( (mask, x0) if use_mask else () ),
        )
        return np.asarray(decoded[:count]).transpose(0, 2, 1), z_length

    def warmup(self, buckets=None, counts=None, steps: int = 100,
               scale: float = 5.0, include_uncond: bool = True,
               include_mask: bool = False, solvers=("ddim",)):
        """Precompile the FUSED serving executables — the path
        sample_charts actually dispatches — so first requests hit the
        in-memory + persistent compile cache. Steps, eta and guidance scale
        are traced arguments, so the compile surface is (length bucket) x
        (count bucket) x (CFG structure): the DEFAULTS warm every count
        bucket and both CFG structures (scale==1.0 builds a different
        graph), making the whole webui slider surface — steps 10-200, CFG
        1-30, count 1-16 — genuinely compile-free afterwards. Pass explicit
        ``counts``/``include_uncond=False`` to warm less (each structure
        costs a cold compile), or ``include_mask=True`` to also warm the
        fused inpainting structure. ``solvers=("ddim", "dpmpp")`` also
        warms the DPM-Solver++ executables when the sampler control is
        exposed (each solver is its own graph per structure). With a mesh, counts pad to a
        mesh-divisible bucket so the warmed executable is the sharded one
        actually served."""
        buckets = buckets or self.z_length_buckets
        counts = counts or self.count_buckets
        ratio = self.max_audio_frame // self.model.z_length
        for z_length in buckets:
            mel = jnp.zeros((self.n_mels, z_length * ratio), jnp.float32)
            warmed = set()
            for count in counts:
                n = self._count_bucket(count)
                feature = self.encode_prompt({}, n)  # depends only on n
                structures = [(True, False)]
                if include_uncond:
                    structures.append((False, False))
                if include_mask:
                    structures.append((True, True))
                    if include_uncond:
                        # scale==1.0 inpainting is its own graph too
                        structures.append((False, True))
                for use_cfg, use_mask in structures:
                    for solver in solvers:
                        if (n, use_cfg, use_mask, solver) in warmed:
                            continue
                        warmed.add((n, use_cfg, use_mask, solver))
                        call_scale = scale if use_cfg else 1.0
                        extra = ()
                        if use_mask:
                            size = (n, z_length, self.model.z_channels)
                            extra = (jnp.zeros(size), jnp.zeros(size))
                        out = self._fused(
                            n, z_length, use_cfg=use_cfg, use_mask=use_mask,
                            solver=solver,
                        )(
                            self.params, mel, feature, feature,
                            jax.random.PRNGKey(0), call_scale, steps, 0.0,
                            *extra,
                        )
                        np.asarray(out)  # force compile + execute

    def sample_charts_batched(
        self,
        audio_paths: Sequence[str],
        feature_dicts: Sequence[dict],
        steps: int = 100,
        scale: float = 5.0,
        seed: int = 0,
        solver: str = "ddim",
        count_per_song: int = 1,
    ):
        """Multi-song batched serving: all songs padded to the same length
        bucket and sampled in a single device batch (the reference serves
        strictly one song at a time, ref webui.py:277).

        ``count_per_song=1`` generates one chart per song (the wave
        encoder runs once per BATCH ROW, input_kind='mel_batch').
        ``count_per_song>1`` generates K charts per song in the same
        single dispatch with the encoder still running once per SONG
        (input_kind='mel_songs'): the production batch shape — e.g. 2
        songs x 16 charts = one executable, two encoder rows.
        ``feature_dicts`` has one dict per song (shared by that song's
        charts) or one per chart, song-major.

        Returns (decoded [n_songs*count_per_song, 4K, T], z_length).
        """
        mels = [self.load_mel(p) for p in audio_paths]
        fitted = [self.fit_length(m) for m in mels]
        z_length = max(z for _, z in fitted)
        frames = z_length * (self.max_audio_frame // self.model.z_length)
        batch = np.stack(
            [
                np.pad(m, ((0, 0), (0, frames - m.shape[1])))[:, :frames]
                for m, _ in fitted
            ],
            axis=0,
        )  # [n, n_mels, frames]
        n = len(audio_paths)
        nb = self._count_bucket(n)  # pad songs to a batch-shape bucket
        k = count_per_song
        fds = list(feature_dicts)
        if k > 1 and len(fds) == n:  # one prompt per song -> per chart
            fds = [d for d in fds for _ in range(k)]
        if len(fds) != n * k:
            raise ValueError(
                f"got {len(fds)} prompts for {n} songs x {k} charts"
            )
        feature = self.encode_prompt(fds + [{}] * ((nb - n) * k), nb * k)
        uc_feature = self.encode_prompt({}, nb * k)

        # fused multi-song path (single dispatch; see apps/serving)
        decoded = self._fused(
            nb * k, z_length, use_cfg=(scale != 1.0),
            input_kind="mel_batch" if k == 1 else "mel_songs",
            mel_frames=frames, solver=solver,
            n_songs=nb if k > 1 else 1,
        )(
            self.params, _pad_rows(batch, nb), feature, uc_feature,
            jax.random.PRNGKey(seed), scale, steps, 0.0,
        )
        return np.asarray(decoded[:n * k]).transpose(0, 2, 1), z_length

    # ------------------------------------------------------ serialization

    def save_charts(
        self,
        decoded: np.ndarray,
        save_dir: str,
        audio_path: str,
        title: str,
        artist: str,
        template_path: str,
        z_length: int,
        prompt: str = "",
        auto_snap: bool = True,
        rm_jack_interval: float = 90,
        creator: str = "MuG Diffusion TPU",
        version_prefix: str = "AI v",
        convert_mp3: bool = True,
    ) -> List[str]:
        """Post-process + write .osu files + audio into save_dir
        (ref webui.py:392-446)."""
        os.makedirs(save_dir, exist_ok=True)
        convertor_params = {
            "frame_ms": self.audio_frame_duration
            * self.audio_note_window_ratio * 1000,
            "max_frame": z_length * 8,
            "from_logits": True,
        }

        def custom_gridify(hit_objects):
            new_hit_objects, bpm, offset = gridify(hit_objects, verbose=False)
            if auto_snap:
                hit_objects = new_hit_objects
            hit_objects = remove_intractable_mania_mini_jacks(
                hit_objects, verbose=False, jack_interval=rm_jack_interval
            )
            return bpm, offset, hit_objects

        output_name = "audio.mp3"
        if convert_mp3:
            try:
                proc = subprocess.run(
                    ["ffmpeg", "-hide_banner", "-loglevel", "error", "-y",
                     "-i", audio_path, "-c:a", "libmp3lame",
                     os.path.join(save_dir, output_name)],
                    capture_output=True,
                )
                failed = proc.returncode != 0
            except FileNotFoundError:  # ffmpeg not installed
                failed = True
            if failed:
                output_name = f"audio{os.path.splitext(audio_path)[-1]}"
                shutil.copyfile(
                    audio_path, os.path.join(save_dir, output_name)
                )
        else:
            output_name = f"audio{os.path.splitext(audio_path)[-1]}"
            shutil.copyfile(audio_path, os.path.join(save_dir, output_name))

        paths = []
        for i, x_sample in enumerate(decoded):
            _, beatmap_meta = parse_osu_file(template_path, convertor_params)
            version = f"{version_prefix}{i + 1}"
            file_name = (
                f"{artist} - {title} ({creator}) [{version}].osu"
            ).replace("/", "")
            file_path = os.path.join(save_dir, file_name)
            save_osu_file(
                beatmap_meta, x_sample, path=file_path,
                override={
                    "Creator": creator,
                    "Version": version,
                    "AudioFilename": output_name,
                    "Title": title,
                    "TitleUnicode": title,
                    "Artist": artist,
                    "ArtistUnicode": artist,
                    "AIMode": creator,
                    "AIPrompt": f"{prompt}, {i}" if prompt else str(i),
                },
                gridify=custom_gridify,
            )
            paths.append(file_path)
        return paths

    @staticmethod
    def package_osz(save_dir: str, output_osz_path: str) -> str:
        """Zip the set directory into a .osz (ref webui.py:462-466)."""
        with zipfile.ZipFile(output_osz_path, "w") as f:
            for p in os.listdir(save_dir):
                f.write(os.path.join(save_dir, p), arcname=p)
        return output_osz_path
