"""VAE reconstruction loss over the 4 note planes (JAX).

Numerics port of ref: mug/firststage/losses.py ManiaReconstructLoss:
label-smoothed BCE-with-logits on is_start / is_holding, masked MSE on
offset_start / offset_end, plus classification metrics. Note the reference
overrides the valid mask with ones (losses.py:66); we reproduce that.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
import optax


class ManiaReconstructLoss:
    """Callable loss: (inputs, reconstructions, valid_flag) -> (loss, logs).

    inputs / reconstructions: [B, T, 4K] channels-last; valid_flag: [B, T].
    """

    def __init__(
        self,
        weight_start_offset: float = 1.0,
        weight_holding: float = 1.0,
        weight_end_offset: float = 1.0,
        label_smoothing: float = 0.0,
        gamma: float = 2.0,
    ):
        self.weight_start_offset = weight_start_offset
        self.weight_holding = weight_holding
        self.weight_end_offset = weight_end_offset
        self.label_smoothing = label_smoothing
        self.gamma = gamma

    def _bce(self, logits, targets):
        smoothed = targets * (1 - 2 * self.label_smoothing) + self.label_smoothing
        return optax.sigmoid_binary_cross_entropy(logits, smoothed)

    @staticmethod
    def _mse(pred, target):
        return jnp.square(pred - target)

    @staticmethod
    def _masked_mean(loss, valid):
        return jnp.mean(loss * valid) / jnp.mean(valid + 1e-6)

    @staticmethod
    def classification_metrics(inputs, recon, valid, key_count):
        """acc/precision/recall with >=0 logit threshold
        (ref: losses.py:33-47)."""
        predict = (recon >= 0).astype(jnp.float32)
        true = inputs
        tp = (true == predict).astype(jnp.float32)
        tp_valid = tp * valid
        acc = jnp.sum(tp_valid) / (jnp.sum(valid) + 1e-5) / key_count
        precision = jnp.sum(tp_valid * predict) / (
            jnp.sum(predict * valid) + 1e-5
        )
        recall = jnp.sum(tp_valid * true) / (jnp.sum(true * valid) + 1e-5)
        return acc, precision, recall

    def __call__(
        self, inputs, reconstructions, valid_flag
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        # the reference forces a full-length mask (ref: losses.py:66)
        valid_flag = jnp.ones_like(valid_flag)
        key_count = inputs.shape[-1] // 4
        valid = valid_flag[..., None]  # [B, T, 1]

        K = key_count
        is_start = inputs[..., :K]
        holding = inputs[..., 2 * K : 3 * K]
        # is_end: holding frame followed by non-holding (ref: losses.py:71-73)
        holding_next = jnp.pad(holding, ((0, 0), (0, 1), (0, 0)))[:, 1:, :]
        is_end = (holding - holding_next > 0.5).astype(jnp.float32)

        start_loss = self._masked_mean(
            self._bce(reconstructions[..., :K], inputs[..., :K]), valid
        )
        holding_loss = self._masked_mean(
            self._bce(
                reconstructions[..., 2 * K : 3 * K], inputs[..., 2 * K : 3 * K]
            ),
            valid,
        )
        offset_start_loss = self._masked_mean(
            self._mse(reconstructions[..., K : 2 * K], inputs[..., K : 2 * K]),
            valid * is_start,
        )
        offset_end_loss = self._masked_mean(
            self._mse(
                reconstructions[..., 3 * K : 4 * K], inputs[..., 3 * K : 4 * K]
            ),
            valid * is_end,
        )

        acc_r, prec_r, rec_r = self.classification_metrics(
            is_start, reconstructions[..., :K], valid, key_count
        )
        acc_ln, prec_ln, rec_ln = self.classification_metrics(
            holding, reconstructions[..., 2 * K : 3 * K], valid, key_count
        )

        loss = (
            start_loss
            + holding_loss * self.weight_holding
            + offset_start_loss * self.weight_start_offset
            + offset_end_loss * self.weight_end_offset
        )
        return loss, {
            "start_loss": start_loss,
            "holding_loss": holding_loss,
            "offset_start_loss": offset_start_loss,
            "offset_end_loss": offset_end_loss,
            "acc_rice": acc_r,
            "acc_ln": acc_ln,
            "precision_rice": prec_r,
            "precision_ln": prec_ln,
            "recall_rice": rec_r,
            "recall_ln": rec_ln,
        }
