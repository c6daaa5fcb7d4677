"""Checkpointing with partial-load surgery.

Orbax-backed save/restore plus the reference's checkpoint-surgery surface
(ref: mug/diffusion/diffusion.py:191-209 init_from_ckpt,
mug/firststage/autoencoder.py:44-65, diffusion.py:470-495):

* ``ignore_keys``  — drop entries whose dotted path starts with a prefix, or
  contains a substring when the key is written ``#substring``.
* ``remove_prefix`` — strip a prefix, remapping a sub-model checkpoint onto
  a smaller target (e.g. load ``model.first_stage_model.*`` into a bare VAE).
* ``training_keys`` — build an optimizer mask so only matching parameters
  train (the functional form of requires_grad surgery).
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np


def flatten_params(params, sep: str = ".") -> Dict[str, Any]:
    flat = {}

    def walk(node, prefix):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, f"{prefix}{sep}{k}" if prefix else k)
        else:
            flat[prefix] = node

    walk(params, "")
    return flat


def unflatten_params(flat: Dict[str, Any], sep: str = ".") -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for key, value in flat.items():
        node = out
        parts = key.split(sep)
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return out


def hit_parameter(name: str, config_key: str) -> bool:
    """Prefix match, or substring match with a '#' sigil
    (ref: mug/diffusion/diffusion.py:470-475)."""
    if config_key.startswith("#"):
        return config_key[1:] in name
    return name.startswith(config_key)


def apply_surgery(
    flat_sd: Dict[str, Any],
    ignore_keys: Sequence[str] = (),
    remove_prefix: Optional[str] = None,
) -> Dict[str, Any]:
    """Drop ignored keys, then strip a prefix (ref: autoencoder.py:44-59)."""
    sd = dict(flat_sd)
    for k in list(sd.keys()):
        for ik in ignore_keys or ():
            if hit_parameter(k, ik):
                sd.pop(k, None)
                break
    if remove_prefix is not None:
        sd = {
            k[len(remove_prefix):]: v
            for k, v in sd.items()
            if k.startswith(remove_prefix)
        }
    return sd


def merge_partial(
    target_params, loaded_flat: Dict[str, Any], sep: str = "."
) -> Tuple[Any, List[str], List[str]]:
    """Non-strict load: copy matching (same path, same shape) entries into
    the target pytree; report missing/unexpected like torch load_state_dict
    (ref: diffusion.py:201-209)."""
    target_flat = flatten_params(target_params, sep)
    missing = [k for k in target_flat if k not in loaded_flat]
    unexpected = [k for k in loaded_flat if k not in target_flat]
    merged = dict(target_flat)
    for k, v in loaded_flat.items():
        if k in merged:
            tgt = merged[k]
            if hasattr(tgt, "shape") and tuple(tgt.shape) != tuple(
                np.shape(v)
            ):
                unexpected.append(f"{k} (shape mismatch)")
                continue
            merged[k] = jax.numpy.asarray(v, dtype=getattr(tgt, "dtype", None))
    return unflatten_params(merged, sep), missing, unexpected


def trainable_mask(
    params,
    training_keys: Optional[Sequence[str]] = None,
    frozen_prefixes: Sequence[str] = (),
    sep: str = ".",
):
    """Boolean pytree: True where the parameter receives gradients.

    ``training_keys=None`` trains everything except ``frozen_prefixes``
    (the first stage is frozen by default, ref: diffusion.py:32-38);
    otherwise only keys hit by ``training_keys`` train
    (ref: diffusion.py:481-495).
    """
    flat = flatten_params(params, sep)
    mask = {}
    for name in flat:
        if any(hit_parameter(name, f) for f in frozen_prefixes):
            mask[name] = False
        elif training_keys is None:
            mask[name] = True
        else:
            mask[name] = any(hit_parameter(name, k) for k in training_keys)
    return unflatten_params(mask, sep)


def coerce_like(target, restored):
    """Rebuild ``restored`` with ``target``'s tree structure.

    Orbax round-trips tuples, namedtuples (optax states) and lists all as
    lists, so a restored optimizer state no longer tree_maps against the
    freshly initialized one (treedef mismatch). Containers traverse in the
    same order either way (dict keys sorted, sequences positional, None
    subtrees skipped by both), so the restored LEAVES align positionally
    with the target's — unflatten them with the target's treedef. Raises
    ValueError on a leaf-count mismatch (a genuinely changed optimizer
    recipe), which callers treat as "reinitialize".
    """
    import jax

    tgt_leaves, treedef = jax.tree_util.tree_flatten(target)
    src_leaves = jax.tree_util.tree_leaves(restored)
    if len(src_leaves) != len(tgt_leaves):
        raise ValueError(
            f"restored tree has {len(src_leaves)} leaves, expected "
            f"{len(tgt_leaves)}"
        )
    # leaf count alone can't catch a REORDERED optimizer recipe with the
    # same number of leaves — that would silently zip moments into the
    # wrong slots (advisor r4). Require positional shape agreement too.
    for i, (t, s) in enumerate(zip(tgt_leaves, src_leaves)):
        ts = getattr(t, "shape", None)
        ss = getattr(s, "shape", None)
        if ts is not None and ss is not None and tuple(ts) != tuple(ss):
            raise ValueError(
                f"restored leaf {i} has shape {tuple(ss)}, expected "
                f"{tuple(ts)} — optimizer recipe changed; reinitialize"
            )
    import jax.numpy as jnp

    leaves = [
        jnp.asarray(s) if hasattr(t, "shape") else s
        for t, s in zip(tgt_leaves, src_leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, leaves)


# ------------------------------------------------------------------ orbax

def save_checkpoint(path: str, payload: Dict[str, Any],
                    local_only: bool = False):
    """Save a pytree checkpoint (params / opt_state / step / config).

    ``local_only=True`` writes from THIS process alone with no
    cross-process coordination (orbax's directory-creation/finalize
    barriers are restricted to ``active_processes={self}``). This is the
    only safe mode on a background writer thread under multi-process
    SPMD: the default all-rank orbax barriers ride the same gloo/
    coordination channels as the main thread's train-step collectives,
    and two threads issuing collectives concurrently interleave
    differently per rank (observed: rank 0's writer-thread payload
    paired with rank 1's main-thread ``device_put``). The payload must
    already be host numpy (replicated params after ``device_get``).
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    if local_only and jax.process_count() > 1:
        rank = jax.process_index()
        ckptr = ocp.Checkpointer(
            ocp.StandardCheckpointHandler(),
            multiprocessing_options=ocp.options.MultiprocessingOptions(
                primary_host=rank,
                active_processes={rank},
                barrier_sync_key_prefix=f"mug_local_r{rank}",
            ),
        )
        ckptr.save(path, args=ocp.args.StandardSave(payload), force=True)
        return
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()


def load_checkpoint(path: str, target=None) -> Dict[str, Any]:
    """Restore a pytree checkpoint; ``target`` optionally gives structure
    and shardings."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if target is not None:
        return ckptr.restore(path, target=target)
    return ckptr.restore(path)


def load_with_surgery(
    path: str,
    target_params,
    ignore_keys: Sequence[str] = (),
    remove_prefix: Optional[str] = None,
    params_key: str = "params",
    verbose: bool = True,
):
    """Restore + apply_surgery + merge_partial in one call
    (the init_from_ckpt equivalent, ref: diffusion.py:191-209)."""
    restored = load_checkpoint(path)
    sd = restored.get(params_key, restored)
    flat = flatten_params(sd)
    flat = apply_surgery(flat, ignore_keys, remove_prefix)
    merged, missing, unexpected = merge_partial(target_params, flat)
    if verbose:
        print(
            f"Restored from {path} with {len(missing)} missing and "
            f"{len(unexpected)} unexpected keys"
        )
        if missing:
            print(f"Missing Keys: {missing[:20]}{'...' if len(missing) > 20 else ''}")
        if unexpected:
            print(
                f"Unexpected Keys: {unexpected[:20]}"
                f"{'...' if len(unexpected) > 20 else ''}"
            )
    return merged
