"""Prompt feature codec: maps beatmap feature dicts to embedding-bucket ids.

Numerics-parity port of the reference bucketizer (ref: mug/util.py:51-90).
The schema YAML (configs/mug/mania_beatmap_features.yaml) declares 23
features (numeric / bool / category); each feature owns a contiguous id
range of size ``count_beatmap_features_embedding(feature)`` where local
index 0 always means "missing" (prompt dropout / unconditional branch).
"""

from __future__ import annotations

import math
from typing import List

import yaml


def load_feature_yaml(path: str) -> list:
    with open(path) as f:
        return yaml.safe_load(f)


def count_beatmap_features_embedding(x: dict) -> int:
    """Bucket count for one feature, incl. the "missing" slot
    (ref: mug/util.py:51-60)."""
    if x["type"] == "numeric":
        return int(math.ceil((x["max"] - x["min"]) / x["interval"])) + 1
    if x["type"] == "category":
        return len(x["category"]) + 1
    if x["type"] == "bool":
        return 3
    raise ValueError(str(x))


def count_beatmap_features(feature_yaml: list) -> int:
    """Total embedding vocabulary size (ref: mug/util.py:86-90)."""
    return sum(
        count_beatmap_features_embedding(x) * x.get("count", 1) for x in feature_yaml
    )


def feature_dict_to_embedding_ids(
    feature_dict: dict, feature_yaml: list
) -> List[int]:
    """Encode a feature dict into per-slot embedding ids
    (ref: mug/util.py:62-84).

    Numeric values clamp to [min, max] then floor-bucket by interval;
    bools pass through as 0/1; categories use list index. All shift by +1
    so that 0 within each feature's range means "missing", then offset by
    the cumulative bucket count of preceding features.
    """
    emb_ids: List[int] = []
    current_emb_count = 0
    for x in feature_yaml:
        value = feature_dict.get(x["name"], None)
        if value is None:
            inter_index = 0  # missing
        else:
            if x["type"] == "numeric":
                value = max(x["min"], min(x["max"], value))
                inter_index = int((value - x["min"]) / x["interval"])
            elif x["type"] == "bool":
                inter_index = int(value)
            else:  # category
                try:
                    inter_index = x["category"].index(value)
                except (IndexError, ValueError):
                    inter_index = -1
            inter_index += 1  # 0 is missing
        for _ in range(x.get("count", 1)):
            emb_ids.append(inter_index + current_emb_count)
            current_emb_count += count_beatmap_features_embedding(x)
    return emb_ids


def count_feature_slots(feature_yaml: list) -> int:
    """Number of embedding slots F (context length for cross-attention)."""
    return sum(x.get("count", 1) for x in feature_yaml)


def feature_names(feature_yaml: list) -> List[str]:
    return [x["name"] for x in feature_yaml]
