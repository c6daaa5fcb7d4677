"""Import reference PyTorch checkpoints into this framework.

Users of the reference (Keytoyze/Mug-Diffusion) have trained torch
checkpoints (``model.ckpt`` state_dicts of the DDPM LightningModule, ref
mug/diffusion/diffusion.py + webui.py:52-105). This module converts such a
state_dict into our flax parameter pytree so those weights run natively on
TPU.

The mapping is generated structurally: both frameworks build the same
topology in the same order, so we simulate the construction loops of each
network (mirroring ref mug/diffusion/unet.py:341-493, firststage/
autoencoder.py:185-354, cond/wave.py:398-448) and pair every torch
parameter path with the deterministic flax scope name it lands in.

Weight layout transforms:
  Linear    [out, in]     -> kernel [in, out]
  Conv1d    [out, in, k]  -> kernel [k, in, out]
  1x1 Conv1d mapped to a Dense: [out, in, 1] -> [in, out]
  GroupNorm/LayerNorm weight -> scale
  S4: complex pairs split into *_re / *_im (see _map_s4)

Verified end-to-end by tests/test_torch_import.py: a randomly initialized
reference torch model and our model produce matching outputs after
conversion.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

# transform names
T_DIRECT = "direct"
T_LINEAR = "linear"     # [out,in] -> [in,out]
T_CONV1 = "conv1d"      # [out,in,k] -> [k,in,out]
T_CONV1X1 = "conv1x1"   # [out,in,1] -> [in,out]
T_CONV2 = "conv2d"      # [out,in,kh,kw] -> [kh,kw,in,out]

Entry = Tuple[str, str, str]  # (torch_key, flax_key, transform)


class _Namer:
    """Reproduces flax's per-scope type counters (Dense_0, Conv_1, ...)."""

    def __init__(self, prefix: str = ""):
        self.prefix = prefix
        self.counts: Dict[str, int] = {}

    def new(self, kind: str) -> str:
        i = self.counts.get(kind, 0)
        self.counts[kind] = i + 1
        name = f"{kind}_{i}"
        return f"{self.prefix}{name}" if self.prefix else name


def _norm(tp: str, fp: str) -> List[Entry]:
    # GroupNorm inside our Normalize wrapper scope
    return [
        (f"{tp}.weight", f"{fp}.GroupNorm_0.scale", T_DIRECT),
        (f"{tp}.bias", f"{fp}.GroupNorm_0.bias", T_DIRECT),
    ]


def _layernorm(tp: str, fp: str) -> List[Entry]:
    return [
        (f"{tp}.weight", f"{fp}.scale", T_DIRECT),
        (f"{tp}.bias", f"{fp}.bias", T_DIRECT),
    ]


def _linear(tp: str, fp: str, bias=True) -> List[Entry]:
    out = [(f"{tp}.weight", f"{fp}.kernel", T_LINEAR)]
    if bias:
        out.append((f"{tp}.bias", f"{fp}.bias", T_DIRECT))
    return out


def _conv(tp: str, fp: str) -> List[Entry]:
    return [
        (f"{tp}.weight", f"{fp}.kernel", T_CONV1),
        (f"{tp}.bias", f"{fp}.bias", T_DIRECT),
    ]


def _conv1x1_as_dense(tp: str, fp: str) -> List[Entry]:
    return [
        (f"{tp}.weight", f"{fp}.kernel", T_CONV1X1),
        (f"{tp}.bias", f"{fp}.bias", T_DIRECT),
    ]


def _map_cross_attention(tp: str, fp: str) -> List[Entry]:
    """ref mug/model/attention.py:67-126."""
    out = []
    out += _linear(f"{tp}.to_q", f"{fp}.to_q", bias=False)
    out += _linear(f"{tp}.to_k", f"{fp}.to_k", bias=False)
    out += _linear(f"{tp}.to_v", f"{fp}.to_v", bias=False)
    out.append((f"{tp}.relative_position_embedding",
                f"{fp}.relative_position_embedding", T_DIRECT))
    out.append((f"{tp}.C_embedding", f"{fp}.C_embedding", T_DIRECT))
    out += _linear(f"{tp}.to_out.0", f"{fp}.to_out")
    return out


def _map_transformer(tp: str, fp: str, depth: int = 1) -> List[Entry]:
    """ContextualTransformer (ref attention.py:154-199)."""
    out = []
    out += _norm(f"{tp}.norm", f"{fp}.Normalize_0")
    out += _conv1x1_as_dense(f"{tp}.proj_in", f"{fp}.Dense_0")
    for d in range(depth):
        btp = f"{tp}.transformer_blocks.{d}"
        bfp = f"{fp}.BasicTransformerBlock_{d}"
        out += _layernorm(f"{btp}.norm1", f"{bfp}.LayerNorm_0")
        out += _map_cross_attention(f"{btp}.attn1", f"{bfp}.CrossAttention_0")
        out += _layernorm(f"{btp}.norm2", f"{bfp}.LayerNorm_1")
        out += _map_cross_attention(f"{btp}.attn2", f"{bfp}.CrossAttention_1")
        out += _layernorm(f"{btp}.norm3", f"{bfp}.LayerNorm_2")
        out += _linear(f"{btp}.ff.net.0.proj",
                       f"{bfp}.FeedForward_0.GEGLU_0.Dense_0")
        out += _linear(f"{btp}.ff.net.2", f"{bfp}.FeedForward_0.Dense_0")
    out += _conv1x1_as_dense(f"{tp}.proj_out", f"{fp}.Dense_1")
    return out


def _map_s4(tp: str, fp: str) -> List[Entry]:
    """S4 module (ref mug/model/s4.py:1357-1469, SSKernelNPLR params).
    Complex _c2r pairs split into re/im; B and P drop their leading
    broadcast dims."""
    return [
        (f"{tp}.D", f"{fp}.D", T_DIRECT),
        (f"{tp}.kernel.kernel.log_dt", f"{fp}.log_dt", T_DIRECT),
        (f"{tp}.kernel.kernel.inv_w_real", f"{fp}.inv_w_real", T_DIRECT),
        (f"{tp}.kernel.kernel.w_imag", f"{fp}.w_imag", T_DIRECT),
        (f"{tp}.kernel.kernel.B", f"{fp}.B_re", "s4_b_re"),
        (f"{tp}.kernel.kernel.B", f"{fp}.B_im", "s4_b_im"),
        (f"{tp}.kernel.kernel.P", f"{fp}.P_re", "s4_p_re"),
        (f"{tp}.kernel.kernel.P", f"{fp}.P_im", "s4_p_im"),
        (f"{tp}.kernel.kernel.C", f"{fp}.C", T_DIRECT),
        (f"{tp}.output_linear.0", f"{fp}.output_linear", "conv1x1_pending"),
    ]


def _map_s4_layer(tp: str, fp: str) -> List[Entry]:
    """S4Layer wrapper (ref unet.py:76-91)."""
    out = _norm(f"{tp}.norm", f"{fp}.Normalize_0")
    out += _map_s4(f"{tp}.s4_model", f"{fp}.S4_0")
    out += _conv(f"{tp}.out_layer", f"{fp}.Conv_0")
    return out


def _map_tres(tp: str, fp: str, ch_in: int, ch_out: int,
              use_conv=False) -> List[Entry]:
    """TimestepResBlock (ref unet.py:121-239)."""
    out = []
    out += _norm(f"{tp}.in_layers.0", f"{fp}.Normalize_0")
    out += _conv(f"{tp}.in_layers.2", f"{fp}.Conv_0")
    out += _linear(f"{tp}.emb_layers.1", f"{fp}.Dense_0")
    out += _norm(f"{tp}.out_layers.0", f"{fp}.Normalize_1")
    out += _conv(f"{tp}.out_layers.3", f"{fp}.Conv_1")
    if ch_in != ch_out:
        if use_conv:
            out += _conv(f"{tp}.skip_connection", f"{fp}.Conv_2")
        else:
            out += _conv1x1_as_dense(f"{tp}.skip_connection", f"{fp}.Dense_1")
    return out


def _map_resblock(tp: str, fp: str, ch_in: int, ch_out: int) -> List[Entry]:
    """ResnetBlock (ref models.py:94-159)."""
    out = []
    out += _norm(f"{tp}.norm1", f"{fp}.Normalize_0")
    out += _conv(f"{tp}.conv1", f"{fp}.Conv_0")
    out += _norm(f"{tp}.norm2", f"{fp}.Normalize_1")
    out += _conv(f"{tp}.conv2", f"{fp}.Conv_1")
    if ch_in != ch_out:
        out += _conv1x1_as_dense(f"{tp}.nin_shortcut", f"{fp}.Dense_0")
    return out


# --------------------------------------------------------------------- UNet

def unet_mappings(cfg: dict, torch_prefix: str = "") -> List[Entry]:
    """Simulate both construction orders of the U-Net
    (ref unet.py:341-493 / models/unet.py __call__)."""
    model_ch = cfg["model_channels"]
    channel_mult = list(cfg["channel_mult"])
    num_res = cfg["num_res_blocks"]
    attn_res = set(cfg["attention_resolutions"])
    s4 = cfg.get("s4_layer", False)
    audio_channels = list(cfg["audio_channels"])
    in_ch = cfg["in_channels"]
    out_ch_cfg = cfg["out_channels"]
    depth = cfg.get("transformer_depth", 1)

    fn = _Namer()
    out: List[Entry] = []
    tp = torch_prefix

    # time embed
    out += _linear(f"{tp}time_embed.0", fn.new("Dense"))
    out += _linear(f"{tp}time_embed.2", fn.new("Dense"))
    # conv_in
    out += _conv(f"{tp}input_blocks.0.0", fn.new("Conv"))

    input_chans = [model_ch]
    ch = model_ch
    ds = 1
    tb = 1  # torch input_blocks index (0 was conv_in)
    for level, mult in enumerate(channel_mult):
        tb += 1  # AudioConcatBlock (paramless, consumes an index)
        ch += audio_channels[level]
        for _ in range(num_res):
            li = 0
            out += _map_tres(f"{tp}input_blocks.{tb}.{li}",
                             fn.new("TimestepResBlock"), ch,
                             mult * model_ch)
            ch = mult * model_ch
            li += 1
            if ds in attn_res:
                out += _map_transformer(f"{tp}input_blocks.{tb}.{li}",
                                        fn.new("ContextualTransformer"),
                                        depth)
                li += 1
            if s4:
                out += _map_s4_layer(f"{tp}input_blocks.{tb}.{li}",
                                     fn.new("S4Layer"))
                li += 1
            input_chans.append(ch)
            tb += 1
        if level != len(channel_mult) - 1:
            out += _conv(f"{tp}input_blocks.{tb}.0.conv",
                         f"{fn.new('Downsample')}.Conv_0")
            input_chans.append(ch)
            tb += 1
            ds *= 2

    # middle
    out += _map_tres(f"{tp}middle_block.0", fn.new("TimestepResBlock"),
                     ch, ch)
    out += _map_transformer(f"{tp}middle_block.1",
                            fn.new("ContextualTransformer"), depth)
    out += _map_tres(f"{tp}middle_block.2", fn.new("TimestepResBlock"),
                     ch, ch)

    # output blocks
    tb = 0
    for level, mult in list(enumerate(channel_mult))[::-1]:
        tb += 1  # AudioConcatBlock
        ch += audio_channels[level]
        for i in range(num_res + 1):
            ich = input_chans.pop()
            li = 0
            out += _map_tres(f"{tp}output_blocks.{tb}.{li}",
                             fn.new("TimestepResBlock"), ch + ich,
                             model_ch * mult)
            ch = model_ch * mult
            li += 1
            if ds in attn_res:
                out += _map_transformer(f"{tp}output_blocks.{tb}.{li}",
                                        fn.new("ContextualTransformer"),
                                        depth)
                li += 1
            if s4 and i != num_res:
                out += _map_s4_layer(f"{tp}output_blocks.{tb}.{li}",
                                     fn.new("S4Layer"))
                li += 1
            if level and i == num_res:
                out += _conv(f"{tp}output_blocks.{tb}.{li}.conv",
                             f"{fn.new('Upsample')}.Conv_0")
                ds //= 2
            tb += 1

    # out head
    out += _norm(f"{tp}out.0", fn.new("Normalize"))
    out += _conv(f"{tp}out.2", fn.new("Conv"))
    _ = (in_ch, out_ch_cfg)
    return out


# ---------------------------------------------------------------------- VAE

def vae_mappings(dd: dict, torch_prefix: str = "") -> List[Entry]:
    """Encoder + Decoder (ref autoencoder.py:185-354)."""
    mid = dd["middle_channels"]
    mult = list(dd["channel_mult"])
    num_res = dd["num_res_blocks"]
    out: List[Entry] = []

    # ---- encoder
    fn = _Namer(prefix="encoder.")
    tp = f"{torch_prefix}encoder."
    out += _conv(f"{tp}conv_in", fn.new("Conv"))
    inmult = (1,) + tuple(mult)
    block_in = mid
    for lvl in range(len(mult)):
        block_in = mid * inmult[lvl]
        block_out = mid * mult[lvl]
        for i in range(num_res):
            out += _map_resblock(f"{tp}down.{lvl}.block.{i}",
                                 fn.new("ResnetBlock"), block_in, block_out)
            block_in = block_out
        if lvl != len(mult) - 1:
            out += _conv(f"{tp}down.{lvl}.downsample.conv",
                         f"{fn.new('Downsample')}.Conv_0")
    out += _map_resblock(f"{tp}mid.block_1", fn.new("ResnetBlock"),
                         block_in, block_in)
    out += _map_resblock(f"{tp}mid.block_2", fn.new("ResnetBlock"),
                         block_in, block_in)
    out += _norm(f"{tp}norm_out", fn.new("Normalize"))
    out += _conv(f"{tp}conv_out", fn.new("Conv"))

    # ---- decoder
    fn = _Namer(prefix="decoder.")
    tp = f"{torch_prefix}decoder."
    block_in = mid * mult[-1]
    out += _conv(f"{tp}conv_in", fn.new("Conv"))
    out += _map_resblock(f"{tp}mid.block_1", fn.new("ResnetBlock"),
                         block_in, block_in)
    out += _map_resblock(f"{tp}mid.block_2", fn.new("ResnetBlock"),
                         block_in, block_in)
    for lvl in reversed(range(len(mult))):
        block_out = mid * mult[lvl]
        for i in range(num_res + 1):
            out += _map_resblock(f"{tp}up.{lvl}.block.{i}",
                                 fn.new("ResnetBlock"), block_in, block_out)
            block_in = block_out
        if lvl != 0:
            out += _conv(f"{tp}up.{lvl}.upsample.conv",
                         f"{fn.new('Upsample')}.Conv_0")
    out += _norm(f"{tp}norm_out", fn.new("Normalize"))
    out += _conv(f"{tp}conv_out", fn.new("Conv"))
    return out


# --------------------------------------------------------------------- wave

def wave_mappings(cfg: dict, torch_prefix: str = "") -> List[Entry]:
    """MelspectrogramScaleEncoder1D (ref wave.py:398-448)."""
    mid = cfg["middle_channels"]
    mult = list(cfg["channel_mult"])
    num_res = cfg["num_res_blocks"]
    attn_res = set(cfg.get("attention_resolutions", ()))
    heads = cfg.get("num_heads", 8)
    out: List[Entry] = []
    fn = _Namer()
    tp = torch_prefix

    out += _conv(f"{tp}conv_in", fn.new("Conv"))
    inmult = (1,) + tuple(mult)
    ds = 1
    for lvl in range(len(mult)):
        block_in = mid * inmult[lvl]
        block_out = mid * mult[lvl]
        if lvl != 0:
            out += _conv(f"{tp}down.{lvl}.downsample.conv",
                         f"{fn.new('Downsample')}.Conv_0")
            ds *= 2
        attn_i = 0
        for i in range(num_res):
            out += _map_resblock(f"{tp}down.{lvl}.block.{i}",
                                 fn.new("ResnetBlock"), block_in, block_out)
            if ds in attn_res:
                out += _map_transformer(f"{tp}down.{lvl}.attn.{attn_i}",
                                        fn.new("ContextualTransformer"), 1)
                attn_i += 1
            block_in = block_out
    _ = heads
    return out


# ----------------------------------------------------------------- embedder

def embedder_mappings(torch_prefix: str = "") -> List[Entry]:
    return [(f"{torch_prefix}embedding.weight",
             "embedding.embedding", T_DIRECT)]


# ------------------------------------------------------------ application

def _apply_transform(name: str, w: np.ndarray) -> np.ndarray:
    if name == T_DIRECT:
        return w
    if name == T_LINEAR:
        return w.T
    if name == T_CONV1:
        return w.transpose(2, 1, 0)
    if name == T_CONV1X1:
        return w[:, :, 0].T
    if name == T_CONV2:
        return w.transpose(2, 3, 1, 0)
    if name == "s4_b_re":
        return w[0, ..., 0]  # (1,H,N,2) -> (H,N) real
    if name == "s4_b_im":
        return w[0, ..., 1]
    if name == "s4_p_re":
        return w[0, ..., 0]  # (R=1,H,N,2)
    if name == "s4_p_im":
        return w[0, ..., 1]
    raise KeyError(name)


def apply_mappings(
    state_dict: Dict[str, np.ndarray],
    mappings: List[Entry],
    target_flat: Dict[str, np.ndarray],
) -> Tuple[Dict[str, np.ndarray], List[str]]:
    """Fill a flat flax tree from the torch state dict; returns (tree,
    list of problems)."""
    problems = []
    out = dict(target_flat)
    pending_glu: Dict[str, str] = {}
    for torch_key, flax_key, tform in mappings:
        if tform == "conv1x1_pending":
            # output_linear of S4: conv weight + bias map to kernel + bias
            pending_glu[f"{torch_key}.weight"] = (f"{flax_key}.kernel",
                                                  T_CONV1X1)
            pending_glu[f"{torch_key}.bias"] = (f"{flax_key}.bias", T_DIRECT)
            continue
        if torch_key not in state_dict:
            problems.append(f"missing torch key: {torch_key}")
            continue
        if flax_key not in out:
            problems.append(f"missing flax key: {flax_key}")
            continue
        w = _apply_transform(tform, np.asarray(state_dict[torch_key]))
        if tuple(w.shape) != tuple(out[flax_key].shape):
            problems.append(
                f"shape mismatch {torch_key} {w.shape} -> "
                f"{flax_key} {out[flax_key].shape}"
            )
            continue
        out[flax_key] = w.astype(np.float32)
    for torch_key, (flax_key, tform) in pending_glu.items():
        if torch_key not in state_dict:
            problems.append(f"missing torch key: {torch_key}")
            continue
        if flax_key not in out:
            problems.append(f"missing flax key: {flax_key}")
            continue
        w = _apply_transform(tform, np.asarray(state_dict[torch_key]))
        if tuple(w.shape) != tuple(out[flax_key].shape):
            problems.append(
                f"shape mismatch {torch_key} {w.shape} -> "
                f"{flax_key} {out[flax_key].shape}"
            )
            continue
        out[flax_key] = w.astype(np.float32)
    return out, problems


def convert_reference_checkpoint(
    state_dict: Dict[str, np.ndarray],
    model_config: dict,
    target_params: dict,
    strict: bool = False,
):
    """Convert a reference DDPM checkpoint state_dict (keys like
    ``model.unet_model.input_blocks...``) into our DDPM variables pytree.

    ``model_config`` is our model config dict (the 'model' section);
    ``target_params`` our initialized ``{'params': ...}`` pytree providing
    structure/shapes.
    """
    from mug_diffusion_tpu.utils.checkpoint import (
        flatten_params,
        unflatten_params,
    )

    p = model_config["params"]
    mappings: List[Entry] = []
    mappings += [
        (tk, f"unet_model.{fk}", tf)
        for tk, fk, tf in unet_mappings(
            dict(p["unet_config"]["params"]), "model.unet_model."
        )
    ]
    mappings += [
        (tk, f"first_stage_model.{fk}", tf)
        for tk, fk, tf in vae_mappings(
            dict(p["first_stage_config"]["params"]["ddconfig"]),
            "model.first_stage_model.",
        )
    ]
    mappings += [
        (tk, f"wave_model.{fk}", tf)
        for tk, fk, tf in wave_mappings(
            dict(p["wave_stage_config"]["params"]), "model.wave_model."
        )
    ]
    mappings += [
        (tk, f"cond_stage_model.{fk}", tf)
        for tk, fk, tf in embedder_mappings("model.cond_stage_model.")
    ]

    flat = flatten_params(target_params["params"])
    merged, problems = apply_mappings(state_dict, mappings, flat)
    if problems:
        msg = f"{len(problems)} conversion problems; first: {problems[:10]}"
        if strict:
            raise ValueError(msg)
        print(msg)
    return {"params": unflatten_params(merged)}


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Read a torch .ckpt/.pt into numpy arrays (no torch tensors leak)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.detach().numpy() for k, v in sd.items()
            if hasattr(v, "detach")}
