"""Prompt embedder: feature bucket ids -> cross-attention context.

Flax port of ref: mug/cond/feature.py BeatmapFeatureEmbedder — one shared
embedding table over the concatenated per-feature bucket vocabulary.
Output layout is [B, F, H] (sequence-of-slots, channels-last) so it feeds
cross-attention without transposes.
"""

from __future__ import annotations

from flax import linen as nn

from mug_diffusion_tpu.utils.feature_codec import (
    count_beatmap_features,
    load_feature_yaml,
)


class BeatmapFeatureEmbedder(nn.Module):
    """ref: mug/cond/feature.py:8-21 (output transposed: we keep [B, F, H])."""

    path_to_yaml: str
    embed_dim: int = 128

    def setup(self):
        self.feature_dicts = load_feature_yaml(self.path_to_yaml)
        self.embedding = nn.Embed(
            num_embeddings=count_beatmap_features(self.feature_dicts),
            features=self.embed_dim,
        )

    def __call__(self, x):
        """x: [B, F] int bucket ids -> [B, F, H]."""
        return self.embedding(x.astype("int32"))
