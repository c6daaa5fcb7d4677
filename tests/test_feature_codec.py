"""Golden tests for the feature->embedding-id codec against values derived
from the reference formulas (ref: mug/util.py:51-90 and its __main__ goldens
at mug/util.py:159-178)."""

import os

from mug_diffusion_tpu.utils.feature_codec import (
    count_beatmap_features,
    count_beatmap_features_embedding,
    count_feature_slots,
    feature_dict_to_embedding_ids,
    load_feature_yaml,
)

SCHEMA = os.path.join(
    os.path.dirname(__file__), "..", "configs", "mug", "mania_beatmap_features.yaml"
)


def test_bucket_counts():
    fy = load_feature_yaml(SCHEMA)
    by_name = {x["name"]: x for x in fy}
    # sr: numeric 1..8 step 0.2 -> ceil(7/0.2)+1 = 36
    assert count_beatmap_features_embedding(by_name["sr"]) == 36
    # rank_status: 3 categories + missing = 4
    assert count_beatmap_features_embedding(by_name["rank_status"]) == 4
    # ln_ratio: ceil(1/0.1)+1 = 11
    assert count_beatmap_features_embedding(by_name["ln_ratio"]) == 11
    # bools = 3
    assert count_beatmap_features_embedding(by_name["rc"]) == 3
    # *_ett: ceil(30/1)+1 = 31
    assert count_beatmap_features_embedding(by_name["ett"]) == 31
    # schema has 21 features (3 numerics + 1 category + 10 bools + 7 etts)
    assert count_feature_slots(fy) == 21
    # total vocab: 36+4+11+3*10+31*8 = 329
    assert count_beatmap_features(fy) == 36 + 4 + 11 + 3 * 10 + 31 * 8


def test_embedding_ids_golden():
    """Replicates mug/util.py:159-178 hand-checkable cases."""
    fy = load_feature_yaml(SCHEMA)

    ids = feature_dict_to_embedding_ids({"sr": 6.4, "ln_ratio": 0.0, "rc": True}, fy)
    assert len(ids) == 21
    # sr=6.4 -> int((6.4-1)/0.2)+1 = 27 or 28 (fp: 5.4/0.2=26.999...)
    assert ids[0] == int((6.4 - 1) / 0.2) + 1
    # rank_status missing -> offset 36, local 0
    assert ids[1] == 36
    # ln_ratio = 0.0 -> int(0/0.1)+1 = 1, offset 36+4=40
    assert ids[2] == 41
    # rc=True -> 1+1=2, offset 40+11=51
    assert ids[3] == 53

    # all-missing gives each feature its own offset
    ids_empty = feature_dict_to_embedding_ids({}, fy)
    offsets = []
    acc = 0
    for x in fy:
        offsets.append(acc)
        acc += count_beatmap_features_embedding(x)
    assert ids_empty == offsets


def test_numeric_clamping():
    fy = load_feature_yaml(SCHEMA)
    lo = feature_dict_to_embedding_ids({"sr": -5.0}, fy)[0]
    hi = feature_dict_to_embedding_ids({"sr": 99.0}, fy)[0]
    assert lo == 1  # clamped to min -> bucket 0 -> id 1
    assert hi == int((8 - 1) / 0.2) + 1  # clamped to max


def test_bool_false_distinct_from_missing():
    fy = load_feature_yaml(SCHEMA)
    t = feature_dict_to_embedding_ids({"rc": True}, fy)[3]
    f = feature_dict_to_embedding_ids({"rc": False}, fy)[3]
    m = feature_dict_to_embedding_ids({}, fy)[3]
    assert len({t, f, m}) == 3
    assert t == f + 1
