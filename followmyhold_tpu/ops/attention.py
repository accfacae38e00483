"""Attention: Pallas TPU flash-attention kernel + XLA fallback.

Every hot backbone in the stack is a transformer (HaMeR ViT-H 192 tokens,
DINOv2-L <=3600 tokens for MoGe, Hunyuan3D-2 DiT latent sets + cross
attention). The reference runs torch SDPA/xformers on CUDA; here the fused
path is a Pallas online-softmax kernel tiled for the MXU, with a plain-XLA
fallback used off-TPU (CPU tests) and for tiny sequence lengths where the
kernel launch overhead dominates.

Layout: [B, H, N, D] with D <= 128 (all our models: 64 or 80).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp

try:  # pallas is available on TPU builds of jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def attention_xla(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Reference attention in plain XLA (fp32 softmax, bf16-friendly matmuls)."""
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if mask is not None:
        logits = jnp.where(mask, logits, -1e30)
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", weights.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, kv_len: int, kv_pad: int,
                  block_k: int, scale: float):
    q = q_ref[0].astype(jnp.float32) * scale          # [block_q, D]
    m = jnp.full((q.shape[0], 1), -1e30, jnp.float32)
    l = jnp.zeros((q.shape[0], 1), jnp.float32)
    acc = jnp.zeros((q.shape[0], q_ref.shape[-1]), jnp.float32)

    num_kv = kv_pad // block_k

    def body(i, carry):
        m, l, acc = carry
        k_blk = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32)  # [bq, bk]
        # mask padded keys in the ragged tail block
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + i * block_k
        s = jnp.where(col < kv_len, s, -1e30)
        m_new = jnp.maximum(m, s.max(axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + p.sum(axis=-1, keepdims=True)
        acc_new = acc * alpha + jnp.dot(p, v_blk, preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    m, l, acc = jax.lax.fori_loop(0, num_kv, body, (m, l, acc))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _flash_attention_pallas(q, k, v, kv_len, scale, block_q=256, block_k=256):
    B, H, N, D = q.shape
    _, _, M, _ = k.shape  # M = padded kv length (multiple of block_k)
    block_q = min(block_q, N)
    block_k = min(block_k, M)

    grid = (B * H, N // block_q)
    qr = q.reshape(B * H, N, D)
    kr = k.reshape(B * H, M, D)
    vr = v.reshape(B * H, M, D)

    out = pl.pallas_call(
        functools.partial(_flash_kernel, kv_len=kv_len, kv_pad=M,
                          block_k=block_k, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, N, D), q.dtype),
    )(qr, kr, vr)
    return out.reshape(B, H, N, D)


def _pad_to(x, n, axis):
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    cfg = [(0, 0)] * x.ndim
    cfg[axis] = (0, pad)
    return jnp.pad(x, cfg)


def _on_tpu() -> bool:
    try:
        d = jax.devices()[0]
        # the sandbox TPU tunnel reports platform "axon" with TPU device kind
        return d.platform == "tpu" or "tpu" in d.device_kind.lower()
    except Exception:  # pragma: no cover
        return False


def multi_head_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    force_xla: bool = False,
) -> jnp.ndarray:
    """Dispatching entry point: Pallas flash kernel on TPU for long unmasked
    sequences; XLA fallback otherwise. Shapes [B,H,N,D] / [B,H,M,D]."""
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])

    import os

    B, H, N, D = q.shape
    M = k.shape[2]
    use_pallas = (
        _HAS_PALLAS
        and not force_xla
        and not os.environ.get("FOHO_TPU_FORCE_XLA_ATTN")
        and mask is None
        and _on_tpu()
        and N >= 256
        and D <= 128
    )
    if not use_pallas:
        return attention_xla(q, k, v, mask=mask, scale=scale)

    return _flash_mha(q, k, v, scale)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash_mha(q, k, v, scale):
    """Pallas flash forward with a recomputation backward (the kernel itself
    is not auto-differentiable; the guidance loop differentiates through the
    VAE attention, so the bwd re-derives softmax weights with XLA matmuls)."""
    N = q.shape[2]
    M = k.shape[2]
    bq, bk = 256, 256
    Np = ((N + bq - 1) // bq) * bq
    Mp = ((M + bk - 1) // bk) * bk
    qp = _pad_to(q, Np, 2)
    kp = _pad_to(k, Mp, 2)
    vp = _pad_to(v, Mp, 2)
    out = _flash_attention_pallas(qp, kp, vp, M, scale, bq, bk)
    return out[:, :, :N]


def _flash_mha_fwd(q, k, v, scale):
    return _flash_mha(q, k, v, scale), (q, k, v)


def _flash_mha_bwd(scale, res, g):
    q, k, v = res
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    s = jnp.einsum("bhqd,bhkd->bhqk", qf, kf,
                   preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    dv = jnp.einsum("bhqk,bhqd->bhkd", p, gf,
                    preferred_element_type=jnp.float32)
    dp = jnp.einsum("bhqd,bhkd->bhqk", gf, vf,
                    preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds, kf,
                    preferred_element_type=jnp.float32) * scale
    dk = jnp.einsum("bhqk,bhqd->bhkd", ds, qf,
                    preferred_element_type=jnp.float32) * scale
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


_flash_mha.defvjp(_flash_mha_fwd, _flash_mha_bwd)
