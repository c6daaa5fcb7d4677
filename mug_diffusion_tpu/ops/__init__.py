from mug_diffusion_tpu.ops.mel import (
    load_audio,
    load_audio_without_cache,
    load_audio_wave,
    melspectrogram,
    mel_filterbank,
)
