"""Pallas kernel tests (interpret mode on the CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np

from mug_diffusion_tpu.ops.attention_pallas import fused_relpos_attention


def reference_attention(q, k, v, bias, c, scale):
    sim = np.einsum("bhqd,bhkd->bhqk", q, k)
    sim = (sim + bias[None]) * scale
    sim = sim - sim.max(-1, keepdims=True)
    p = np.exp(sim)
    p = p / p.sum(-1, keepdims=True)
    p = p * c[None]
    return np.einsum("bhqk,bhkd->bhqd", p, v)


def test_fused_relpos_attention_matches_reference():
    B, H, L, D = 2, 3, 16, 8
    rng = np.random.default_rng(0)
    q = rng.standard_normal((B, H, L, D)).astype(np.float32)
    k = rng.standard_normal((B, H, L, D)).astype(np.float32)
    v = rng.standard_normal((B, H, L, D)).astype(np.float32)
    bias = (rng.standard_normal((H, L, L)) * 0.3).astype(np.float32)
    c = (1 + 0.1 * rng.standard_normal((H, L, L))).astype(np.float32)
    scale = D ** -0.5

    out = fused_relpos_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(bias),
        jnp.asarray(c), scale, interpret=True,
    )
    want = reference_attention(q, k, v, bias, c, scale)
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-5, rtol=1e-4)


def test_fused_relpos_attention_bf16_native():
    """bf16 q/k/v stay bf16 into the kernel (no fp32 HBM copies); output is
    bf16 and tracks the fp32 reference within bf16 tolerance."""
    B, H, L, D = 2, 3, 16, 8
    rng = np.random.default_rng(1)
    q = rng.standard_normal((B, H, L, D)).astype(np.float32)
    k = rng.standard_normal((B, H, L, D)).astype(np.float32)
    v = rng.standard_normal((B, H, L, D)).astype(np.float32)
    bias = (rng.standard_normal((H, L, L)) * 0.3).astype(np.float32)
    c = (1 + 0.1 * rng.standard_normal((H, L, L))).astype(np.float32)
    scale = D ** -0.5

    out = fused_relpos_attention(
        jnp.asarray(q, jnp.bfloat16), jnp.asarray(k, jnp.bfloat16),
        jnp.asarray(v, jnp.bfloat16), jnp.asarray(bias), jnp.asarray(c),
        scale, interpret=True,
    )
    assert out.dtype == jnp.bfloat16
    want = reference_attention(q, k, v, bias, c, scale)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), want, atol=0.12, rtol=0.05)


def test_cross_attention_pallas_path_matches_jnp_path():
    """CrossAttention(use_pallas=True) must equal the jnp path for
    self-attention."""
    from mug_diffusion_tpu.models.attention import CrossAttention

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 16, 32))

    ref_mod = CrossAttention(query_dim=32, heads=4, dim_head=8)
    params = ref_mod.init(key, x)
    want = ref_mod.apply(params, x)

    import mug_diffusion_tpu.ops.attention_pallas as ap
    orig = ap.fused_relpos_attention

    def interp(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    ap.fused_relpos_attention = interp
    try:
        pallas_mod = CrossAttention(query_dim=32, heads=4, dim_head=8,
                                    use_pallas=True)
        got = pallas_mod.apply(params, x)
    finally:
        ap.fused_relpos_attention = orig
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4,
                               rtol=1e-4)
