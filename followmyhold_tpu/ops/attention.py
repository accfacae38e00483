"""Attention: Pallas TPU flash-attention (fwd + bwd kernels) + XLA fallback.

Every hot backbone in the stack is a transformer (HaMeR ViT-H 192 tokens,
DINOv2-L <=3600 tokens for MoGe, Hunyuan3D-2 DiT latent sets + cross
attention). The reference runs torch SDPA/xformers on CUDA; here the fused
path is a Pallas online-softmax kernel tiled for the MXU, with a plain-XLA
fallback used off-TPU (CPU tests) and for tiny sequence lengths where the
kernel launch overhead dominates.

The BACKWARD is also Pallas (flash-style recompute from the forward's
logsumexp): the guidance loop differentiates through the ShapeVAE's self- and
cross-attention on every optimizer step, and the r1 XLA backward materialized
the full [B,H,N,M] softmax in fp32 — ~1.6 GB of HBM traffic per 8k-query
geo-decoder chunk, which dominated the 2.1 s obj/joint iteration.

Layout: [B, H, N, D] with D <= 128 (all our models: 64 or 80).
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

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


# --------------------------------------------------------------------------- #
# forward kernel: online softmax; also emits the per-row logsumexp L for the
# flash backward
# --------------------------------------------------------------------------- #

def _flash_kernel(q_ref, k_ref, v_ref, o_ref, l_ref, *, kv_len: int,
                  kv_pad: int, block_k: int, scale: float):
    # matmul inputs stay in their storage dtype (bf16 runs the MXU at full
    # rate; upcasting first would quarter it) with f32 accumulation; softmax
    # statistics are f32 throughout
    q = q_ref[0]                                      # [block_q, D]
    m = jnp.full((q.shape[0], 1), -1e30, jnp.float32)
    l = jnp.zeros((q.shape[0], 1), jnp.float32)
    acc = jnp.zeros((q.shape[0], q_ref.shape[-1]), jnp.float32)

    num_kv = kv_pad // block_k

    def body(i, carry):
        m, l, acc = carry
        k_blk = k_ref[0, pl.ds(i * block_k, block_k), :]
        v_blk = v_ref[0, pl.ds(i * block_k, block_k), :]
        s = jnp.dot(q, k_blk.T,
                    preferred_element_type=jnp.float32) * scale  # [bq, bk]
        if kv_len < kv_pad:  # static: mask padded keys in the ragged tail
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + i * block_k
            s = jnp.where(col < kv_len, s, -1e30)
        m_new = jnp.maximum(m, s.max(axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + p.sum(axis=-1, keepdims=True)
        acc_new = acc * alpha + jnp.dot(p.astype(v_blk.dtype), v_blk,
                                        preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    m, l, acc = jax.lax.fori_loop(0, num_kv, body, (m, l, acc))
    l_safe = jnp.maximum(l, 1e-30)
    o_ref[0] = (acc / l_safe).astype(o_ref.dtype)
    l_ref[0, 0] = (m + jnp.log(l_safe))[:, 0]         # logsumexp per row


def _flash_attention_pallas(q, k, v, kv_len, scale, block_q=256, block_k=256):
    """Returns (out [B,H,N,D], logsumexp [B,H,N]); inputs pre-padded."""
    B, H, N, D = q.shape
    _, _, M, _ = k.shape  # M = padded kv length (multiple of block_k)
    block_q = min(block_q, N)
    block_k = min(block_k, M)

    grid = (B * H, N // block_q)
    qr = q.reshape(B * H, N, D)
    kr = k.reshape(B * H, M, D)
    vr = v.reshape(B * H, M, D)

    out, lse = pl.pallas_call(
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
        out_specs=(
            pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B * H, N, D), q.dtype),
            jax.ShapeDtypeStruct((B * H, 1, N), jnp.float32),
        ),
    )(qr, kr, vr)
    return out.reshape(B, H, N, D), lse.reshape(B, H, N)


# --------------------------------------------------------------------------- #
# backward kernel: FUSED single-pass flash backward. Probabilities are
# recomputed from the forward logsumexp: p = exp(s*scale - L). One kernel
# walks kv blocks (grid), emits dk/dv per block, and accumulates dq into a
# f32 output whose index map ignores the kv-grid dim — the block stays
# resident in VMEM across the kv sweep (standard Pallas revisited-output
# accumulation). vs the classic two-pass backward this computes s and
# p = exp(...) ONCE instead of twice: the [bq,bk] exp is the VPU-bound part
# of the backward, and fusing measured 1.3x on the geo-decoder hot shape
# ([1,16,8192,64] x 3072 kv: bwd 4.55 -> 3.49 ms, tools/exp_attn_bwd.py).
# No [N,M] matrix ever leaves VMEM.
# --------------------------------------------------------------------------- #

def _flash_bwd_fused_kernel(k_ref, v_ref, q_ref, do_ref, lse_ref, dsum_ref,
                            dk_ref, dv_ref, dq_ref, *, kv_len: int,
                            kv_pad: int, block_k: int, q_pad: int,
                            block_q: int, scale: float):
    # padded q rows carry do=0 and dsum=0, so they contribute nothing to
    # dk/dv (p finite, ds = p*(0-0) = 0, p^T @ 0 = 0) and their dq rows are
    # sliced off by the caller. Padded kv columns DO need masking: they feed
    # the dq accumulation.
    j = pl.program_id(1)
    k_blk = k_ref[0]                                  # [bk, D] storage dtype
    v_blk = v_ref[0]

    @pl.when(j == 0)
    def _init():
        dq_ref[0] = jnp.zeros_like(dq_ref[0])

    dk = jnp.zeros(k_blk.shape, jnp.float32)
    dv = jnp.zeros(v_blk.shape, jnp.float32)

    def body(i, carry):
        dk, dv = carry
        q = q_ref[0, pl.ds(i * block_q, block_q), :]
        do = do_ref[0, pl.ds(i * block_q, block_q), :]
        lse = lse_ref[0, 0, pl.ds(i * block_q, block_q)][:, None]
        dsum = dsum_ref[0, 0, pl.ds(i * block_q, block_q)][:, None]
        s = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32) * scale
        if kv_len < kv_pad:  # static: zero padded-key columns (they feed dq)
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block_k
            p = jnp.where(col < kv_len, jnp.exp(s - lse), 0.0)  # [bq, bk]
        else:
            p = jnp.exp(s - lse)
        dv = dv + jnp.dot(p.T.astype(do.dtype), do,
                          preferred_element_type=jnp.float32)
        dp = jnp.dot(do, v_blk.T, preferred_element_type=jnp.float32)
        ds = p * (dp - dsum)
        dk = dk + jnp.dot(ds.T.astype(q.dtype), q,
                          preferred_element_type=jnp.float32)
        dq_blk = jnp.dot(ds.astype(k_blk.dtype), k_blk,
                         preferred_element_type=jnp.float32) * scale
        dq_ref[0, pl.ds(i * block_q, block_q), :] += dq_blk
        return dk, dv

    dk, dv = jax.lax.fori_loop(0, q_pad // block_q, body, (dk, dv))
    dk_ref[0] = (dk * scale).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _flash_backward_pallas(q, k, v, do, lse, dsum, kv_len, scale,
                           block_q=256, block_k=256):
    """Inputs pre-padded: q/do/lse/dsum to Np, k/v to Mp (multiples of the
    forward's block sizes, which the smaller backward blocks always divide).

    The fused kernel keeps full q/do plus the f32 dq accumulator resident in
    VMEM, which busts Mosaic's default 16 MB scoped-vmem budget at the
    geo-decoder shapes (17.5 MB -> compile-time OOM). v5e/v5p cores have
    128 MB of VMEM; raise the kernel's budget instead of shrinking blocks
    (smaller blocks cost inner-loop iterations at identical FLOPs)."""
    B, H, N, D = q.shape
    M = k.shape[2]
    block_q = min(block_q, N)
    block_k = min(block_k, M)

    qr = q.reshape(B * H, N, D)
    kr = k.reshape(B * H, M, D)
    vr = v.reshape(B * H, M, D)
    dor = do.reshape(B * H, N, D)
    lser = lse.reshape(B * H, 1, N)
    dsr = dsum.reshape(B * H, 1, N)

    dk, dv, dq = pl.pallas_call(
        functools.partial(_flash_bwd_fused_kernel, kv_len=kv_len, kv_pad=M,
                          block_k=block_k, q_pad=N, block_q=block_q,
                          scale=scale),
        grid=(B * H, M // block_k),
        in_specs=[
            pl.BlockSpec((1, block_k, D), lambda b, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, D), lambda b, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, D), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, D), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_k, D), lambda b, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, D), lambda b, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            # index map ignores j: the dq block is revisited (and kept in
            # VMEM) across the whole kv sweep for one b, then flushed
            pl.BlockSpec((1, N, D), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B * H, M, D), k.dtype),
            jax.ShapeDtypeStruct((B * H, M, D), v.dtype),
            jax.ShapeDtypeStruct((B * H, N, D), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(kr, vr, qr, dor, lser, dsr)

    return (dq.reshape(B, H, N, D), dk.reshape(B, H, M, D),
            dv.reshape(B, H, M, D))


# --------------------------------------------------------------------------- #
# dispatch + custom VJP
# --------------------------------------------------------------------------- #

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


def _block_sizes(N: int, M: int) -> Tuple[int, int]:
    """(block_q, block_k) for the sequence lengths, chosen from a TPU sweep:
    512-row query blocks; kv in ONE block when the whole (padded) kv set is
    <= 3072 rows — the geo-decoder's exact shape — which drops the online
    rescale iterations entirely (65^3 grid decode fwd 232 -> 179 ms, grad
    435 -> 405 ms). This config crashed the remote-TPU compiler when the
    backward was two pallas_calls; the fused single-call backward fits.
    Longer kv (DiT's ~4.6k tokens) blocks at 1024: padding to a 3072
    multiple would waste 37% of the sweep on a masked tail."""
    bq = 512 if N >= 512 else 256
    Mp = ((M + 255) // 256) * 256
    bk = Mp if Mp <= 3072 else 1024
    return bq, bk


def _padded(q, k, v, bq, bk):
    N, M = q.shape[2], k.shape[2]
    Np = ((N + bq - 1) // bq) * bq
    Mp = ((M + bk - 1) // bk) * bk
    return _pad_to(q, Np, 2), _pad_to(k, Mp, 2), _pad_to(v, Mp, 2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash_mha(q, k, v, scale):
    """Pallas flash forward; backward is the Pallas flash backward (recompute
    from logsumexp — no [N,M] softmax matrix in HBM)."""
    N, M = q.shape[2], k.shape[2]
    bq, bk = _block_sizes(N, M)
    qp, kp, vp = _padded(q, k, v, bq, bk)
    out, _ = _flash_attention_pallas(qp, kp, vp, M, scale, bq, bk)
    return out[:, :, :N]


def _flash_mha_fwd(q, k, v, scale):
    N, M = q.shape[2], k.shape[2]
    bq, bk = _block_sizes(N, M)
    qp, kp, vp = _padded(q, k, v, bq, bk)
    out, lse = _flash_attention_pallas(qp, kp, vp, M, scale, bq, bk)
    return out[:, :, :N], (q, k, v, out, lse)


def _flash_mha_bwd(scale, res, g):
    q, k, v, out_p, lse_p = res
    N, M = q.shape[2], k.shape[2]
    bq, bk = _block_sizes(N, M)  # deterministic from shapes == fwd's choice
    qp, kp, vp = _padded(q, k, v, bq, bk)
    gp = _pad_to(g, qp.shape[2], 2)
    # rowsum(do * o) per query row; padded rows are zero by construction
    dsum = jnp.sum(gp.astype(jnp.float32) * out_p.astype(jnp.float32), axis=-1)
    dq, dk, dv = _flash_backward_pallas(qp, kp, vp, gp, lse_p, dsum, M, scale,
                                        bq, bk)
    return (dq[:, :, :N].astype(q.dtype), dk[:, :, :M].astype(k.dtype),
            dv[:, :, :M].astype(v.dtype))


_flash_mha.defvjp(_flash_mha_fwd, _flash_mha_bwd)
