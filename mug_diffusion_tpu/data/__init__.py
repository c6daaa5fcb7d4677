from mug_diffusion_tpu.data.convertor import (
    BeatmapMeta,
    OsuManiaConvertor,
    parse_osu_file,
    save_osu_file,
)
