from mug_diffusion_tpu.utils.config import (
    instantiate_from_config,
    get_obj_from_str,
    load_config,
    merge_configs,
)
from mug_diffusion_tpu.utils.feature_codec import (
    count_beatmap_features,
    count_beatmap_features_embedding,
    feature_dict_to_embedding_ids,
    load_feature_yaml,
)
