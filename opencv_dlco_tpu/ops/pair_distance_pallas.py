"""Fused Pallas kernel for the stage-3 ring distances.

The XLA path (ops/pair_distance.py) materialises both truncated pooled
descriptors (B, 40960, 8) in HBM between the pooling GEMM and the
difference/reduction epilogue. This kernel keeps the whole per-tile
computation in VMEM with a K-pipelined matmul:

    acc1 += F_tile_k @ PT1_tile_k ; acc2 += F_tile_k @ PT2_tile_k   (MXU)
    at the last k: e = (min(acc2,1) - min(acc1,1))^2                 (VPU)
                   out[pair, ring] = sum over 8 channels x 8 offsets

Tiles: 1024 filters (= 128 rings, the output lane width) x 16 pairs
(16 x 8 channels = 128 lanes) x 512-pixel contraction steps — grid
(n_filters/1024, B/16, n_pixels/512), accumulators resident in VMEM
scratch, intermediates never touch HBM. bf16 inputs ride the MXU at rate
with f32 accumulation.

reference: src/comp-fulldists.cpp:294-356 (the per-pair GEMM + epilogue
this fuses); SURVEY.md §7 hard-part 2.

STATUS — hardware-validated (TPU v5e, this round; Mosaic compile is now
~0.7 s through the tunnel, round-1's >10-min stall is gone):

    XLA f32 (HIGHEST)   4,442 pairs/s   reference numerics
    fused (f32 inputs) 10,354 pairs/s   2.3x — in-kernel dots run at
                                        bf16-pass precision (med rel err
                                        1.3e-3 vs XLA f32)
    fused (bf16=True)  13,237 pairs/s   parity with XLA-bf16 (12,897)
    fused w/ HIGHEST    4,808 pairs/s   true-f32 dots buy back only ~8%

The bf16-grade numerics are end-metric safe: bench_precision_fpr95
measured dFPR95 = 0.0 / dAUC = 0.0 over 50k realistic pairs with the full
bank (bench_details.json). Production guidance: fused default for
throughput, XLA HIGHEST for bit-level reference parity runs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_SYM = 8       # symmetric offsets per ring
N_CH = 8        # angle channels
TF = 1024       # filters per tile -> TF / N_SYM = 128 rings (lane width)
TP = 16         # pairs per tile (TP * N_CH = 128 lanes)
TK = 512        # contraction (pixel) step


def _ring_dist_kernel(f_ref, pt1_ref, pt2_ref, out_ref, acc1, acc2):
    """Grid step (i filters, j pairs, k pixels); k innermost."""
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        acc1[...] = jnp.zeros_like(acc1)
        acc2[...] = jnp.zeros_like(acc2)

    acc1[...] += jnp.dot(f_ref[...], pt1_ref[...],
                         preferred_element_type=jnp.float32)
    acc2[...] += jnp.dot(f_ref[...], pt2_ref[...],
                         preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        e = (jnp.minimum(acc2[...], 1.0)
             - jnp.minimum(acc1[...], 1.0)) ** 2          # (TF, TP*NCH)
        # Mosaic cannot reshape across the lane dim; both grouped
        # reductions run as tiny 0/1-matrix matmuls instead.
        # channel sum: groups of N_CH adjacent lanes -> (TF, TP)
        rl = jax.lax.broadcasted_iota(jnp.int32, (TP * N_CH, TP), 0)
        rc = jax.lax.broadcasted_iota(jnp.int32, (TP * N_CH, TP), 1)
        red_ch = (rl // N_CH == rc).astype(jnp.float32)
        per_filter = jnp.dot(e, red_ch,
                             preferred_element_type=jnp.float32)
        # offset sum: groups of N_SYM adjacent sublanes -> (TF/NSYM, TP)
        sr = jax.lax.broadcasted_iota(jnp.int32, (TF // N_SYM, TF), 0)
        sc = jax.lax.broadcasted_iota(jnp.int32, (TF // N_SYM, TF), 1)
        red_sym = (sc // N_SYM == sr).astype(jnp.float32)
        per_ring = jnp.dot(red_sym, per_filter,
                           preferred_element_type=jnp.float32)
        out_ref[...] = per_ring.T                          # (TP, TF/NSYM)


@functools.partial(jax.jit, static_argnames=("interpret", "bf16"))
def ring_distances_fused(filters: jax.Array, pt1: jax.Array,
                         pt2: jax.Array, *, interpret: bool = False,
                         bf16: bool = False) -> jax.Array:
    """Drop-in fused equivalent of ops.pair_distance.ring_distances.

    filters: (n_filters, n_pixels) with n_filters % 1024 == 0 and
    n_pixels % 512 == 0; pt1/pt2: (B, n_pixels, 8).
    Returns (B, n_filters // 8) float32.
    """
    nf, npix = filters.shape
    b = pt1.shape[0]
    if nf % TF:
        raise ValueError(f"n_filters {nf} not a multiple of {TF}")
    if npix % TK:
        raise ValueError(f"n_pixels {npix} not a multiple of {TK}")
    pad = (-b) % TP
    if pad:
        z = jnp.zeros((pad,) + pt1.shape[1:], pt1.dtype)
        pt1 = jnp.concatenate([pt1, z])
        pt2 = jnp.concatenate([pt2, z])
    bp = pt1.shape[0]
    # (B, npix, ch) -> (npix, B * ch), pair-major lanes
    p1r = pt1.transpose(1, 0, 2).reshape(npix, bp * N_CH)
    p2r = pt2.transpose(1, 0, 2).reshape(npix, bp * N_CH)
    if bf16:
        filters = filters.astype(jnp.bfloat16)
        p1r = p1r.astype(jnp.bfloat16)
        p2r = p2r.astype(jnp.bfloat16)

    grid = (nf // TF, bp // TP, npix // TK)
    out = pl.pallas_call(
        _ring_dist_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TF, TK), lambda i, j, k: (i, k)),
            pl.BlockSpec((TK, TP * N_CH), lambda i, j, k: (k, j)),
            pl.BlockSpec((TK, TP * N_CH), lambda i, j, k: (k, j)),
        ],
        out_specs=pl.BlockSpec((TP, TF // N_SYM), lambda i, j, k: (j, i)),
        out_shape=jax.ShapeDtypeStruct((bp, nf // N_SYM), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((TF, TP * N_CH), jnp.float32),
            pltpu.VMEM((TF, TP * N_CH), jnp.float32),
        ],
        interpret=interpret,
    )(filters, p1r, p2r)
    return out[:b]
