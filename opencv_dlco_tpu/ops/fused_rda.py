"""Fused Pallas kernel for the PR-RDA block-sampling step.

The XLA path (models/pr_rda._pr_step, sampling="block") materialises the
(B, F) FeatDiff between the slice and the two matmuls:

    read pos block (BF) + read neg block (BF) + write fd (BF)
    + read fd for f = fd @ w.T (BF) + read fd for g = viol.T @ fd (BF)
    = 5 BF of HBM traffic per step,

~4x off the 2 BF speed-of-light (STATUS r1 item 4; the step is
bandwidth-bound at F=5120). This kernel streams tile_b-row tiles of pos
and neg through VMEM once and computes everything in-core:

    fd   = pos_tile - neg_tile            (VPU, in VMEM)
    f    = fd @ w.T                       (MXU, (tile_b, S))
    viol = f > -1                         (VPU)
    g   += viol.T @ fd                    (MXU, accumulated over the grid)

exactly 2 BF of HBM reads — the hinge-violator subgradient of
src/pr-learn.cpp:319-325 computed at memory speed-of-light. The random
block offsets arrive as scalar-prefetch arguments (block-granular: offsets
are multiples of tile_b, a uniform without-replacement sample over
tile-aligned windows of the pre-shuffled rows — same distribution class as
sampling="block", coarser offset granularity).

S (the sweep axis) must be small for the exact-f32 kernels below (w, g
and df all live in VMEM as f32). For WIDE sweeps (S up to ~384 at
F=5120) use fused_block_train_wide: df stays f32-resident, w is held at
the input dtype (bf16 on the tuned path — the same numerics class as the
DEFAULT-precision matmuls it replaces), g is folded directly into df so
no third (S, F) buffer exists, and each step reads the sampled blocks
from HBM exactly once — 1x(2BF) traffic instead of the XLA sweep step's
5BF, which is what bounded the round-2 sweep at ~17-19% MFU
(VERDICT r2 next #5: the (B,F)x(F,S) matmuls are MXU-friendly; the fd
materialisation traffic was the roofline).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fused_kernel(ip_ref, in_ref_s, pos_ref, neg_ref, w_ref, g_ref):
    """Grid step i: one (tile_b, F) tile of the sampled block."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        g_ref[...] = jnp.zeros_like(g_ref)

    fd = pos_ref[...] - neg_ref[...]                       # (tile_b, F)
    f = jnp.dot(fd, w_ref[...].T,
                preferred_element_type=jnp.float32)        # (tile_b, S)
    # viol is exactly 0/1 so the input dtype (f32 or bf16) is lossless;
    # keeping both dot operands in one dtype lets bf16 ride the MXU at
    # double rate with f32 accumulation
    viol = (f > -1.0).astype(fd.dtype)
    g_ref[...] += jnp.dot(viol.T, fd,
                          preferred_element_type=jnp.float32)


@functools.partial(jax.jit,
                   static_argnames=("batch", "tile_b", "interpret"))
def fused_block_grad(pos: jax.Array, neg: jax.Array, w: jax.Array,
                     ip0_blk: jax.Array, in0_blk: jax.Array, *,
                     batch: int, tile_b: int = 128,
                     interpret: bool = False) -> jax.Array:
    """Hinge-violator subgradient over one sampled block, fused.

    Args:
      pos, neg: (N, F) resident training splits (rows pre-shuffled).
      w: (S, F) iterate, S small (<= 8 recommended).
      ip0_blk, in0_blk: scalar int32 start offsets in units of tile_b rows.
      batch: rows sampled per side (multiple of tile_b).

    Returns g: (S, F) = sum over violating samples of FeatDiff.
    """
    if batch % tile_b:
        raise ValueError(f"batch {batch} not a multiple of tile_b {tile_b}")
    n_tiles = batch // tile_b
    f_dim = pos.shape[1]
    s = w.shape[0]
    w = w.astype(pos.dtype)  # one-dtype kernel; g accumulates f32 either way

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile_b, f_dim), lambda i, ip, inn: (ip[0] + i, 0)),
            pl.BlockSpec((tile_b, f_dim), lambda i, ip, inn: (inn[0] + i, 0)),
            pl.BlockSpec((s, f_dim), lambda i, ip, inn: (0, 0)),
        ],
        out_specs=pl.BlockSpec((s, f_dim), lambda i, ip, inn: (0, 0)),
    )
    return pl.pallas_call(
        _fused_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((s, f_dim), jnp.float32),
        interpret=interpret,
    )(ip0_blk.reshape(1).astype(jnp.int32),
      in0_blk.reshape(1).astype(jnp.int32), pos, neg, w)


def reference_block_grad(pos, neg, w, ip0_blk, in0_blk, *, batch,
                         tile_b: int = 128):
    """Unfused float32 reference of fused_block_grad (test oracle)."""
    ip0 = ip0_blk * tile_b
    in0 = in0_blk * tile_b
    fd = (jax.lax.dynamic_slice(pos, (ip0, 0), (batch, pos.shape[1]))
          - jax.lax.dynamic_slice(neg, (in0, 0), (batch, neg.shape[1])))
    f = jnp.matmul(fd, w.T, precision=jax.lax.Precision.HIGHEST)
    viol = (f > -1.0).astype(jnp.float32)
    return jnp.matmul(viol.T, fd, precision=jax.lax.Precision.HIGHEST)


# -- whole-chunk fusion: n_steps RDA iterations in ONE kernel launch -------

def _fused_train_kernel(offs_ref, scal_ref, pos_ref, neg_ref,
                        w_init_ref, df_init_ref, mu_ref, gamma_ref,
                        w_out_ref, df_out_ref, w_s, df_s, g_s):
    """Grid (n_steps, n_tiles): tiles stream one sampled block per step;
    the RDA update runs in VMEM at each step's last tile. The iterate
    (w, df_avg) never touches HBM between steps — the per-step dispatch
    and state round-trips of the scan path are gone entirely.

    scal_ref[0] = t0 (samples already consumed), scal_ref[1] = batch.
    """
    step = pl.program_id(0)
    tile = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    n_steps = pl.num_programs(0)

    @pl.when((step == 0) & (tile == 0))
    def _():
        w_s[...] = w_init_ref[...]
        df_s[...] = df_init_ref[...]

    @pl.when(tile == 0)
    def _():
        g_s[...] = jnp.zeros_like(g_s)

    fd = pos_ref[...] - neg_ref[...]
    f = jnp.dot(fd, w_s[...].astype(fd.dtype).T,
                preferred_element_type=jnp.float32)
    viol = (f > -1.0).astype(fd.dtype)
    g_s[...] += jnp.dot(viol.T, fd, preferred_element_type=jnp.float32)

    @pl.when(tile == n_tiles - 1)
    def _():
        t0 = scal_ref[0].astype(jnp.float32)
        batch_f = scal_ref[1].astype(jnp.float32)
        tf = t0 + step.astype(jnp.float32) * batch_f
        tnf = tf + batch_f
        df_new = (tf * df_s[...] + g_s[...]) / tnf
        df_s[...] = df_new
        w_s[...] = jnp.maximum(
            0.0,
            -jnp.sqrt(tnf) / gamma_ref[...] * (df_new + mu_ref[...]))

    @pl.when((step == n_steps - 1) & (tile == n_tiles - 1))
    def _():
        w_out_ref[...] = w_s[...]
        df_out_ref[...] = df_s[...]


@functools.partial(jax.jit,
                   static_argnames=("batch", "n_steps", "tile_b",
                                    "interpret"))
def fused_block_train(pos: jax.Array, neg: jax.Array,
                      w: jax.Array, df_avg: jax.Array, t: jax.Array,
                      mu: jax.Array, gamma: jax.Array, key: jax.Array, *,
                      batch: int, n_steps: int, tile_b: int = 128,
                      interpret: bool = False):
    """n_steps fused RDA block steps; returns (w, df_avg, t_new).

    Semantically identical to scanning the single-step path with the same
    tile-aligned offsets; offsets for every step are drawn here from
    ``key`` exactly like _pr_step's block mode (one split per step)."""
    if batch % tile_b:
        raise ValueError(f"batch {batch} not a multiple of tile_b {tile_b}")
    n_tiles = batch // tile_b
    f_dim = pos.shape[1]
    s = w.shape[0]
    n_pos, n_neg = pos.shape[0], neg.shape[0]

    keys = jax.random.split(key, n_steps)

    def draw(k):
        kp, kn = jax.random.split(k)
        ip = jax.random.randint(kp, (), 0, (n_pos - batch) // tile_b + 1)
        ineg = jax.random.randint(kn, (), 0, (n_neg - batch) // tile_b + 1)
        return jnp.stack([ip, ineg]).astype(jnp.int32)

    offs = jax.vmap(draw)(keys)                            # (n_steps, 2)
    scal = jnp.asarray([t, jnp.int32(batch)], jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_steps, n_tiles),
        in_specs=[
            pl.BlockSpec((tile_b, f_dim),
                         lambda s_, i, offs, sc: (offs[s_, 0] + i, 0)),
            pl.BlockSpec((tile_b, f_dim),
                         lambda s_, i, offs, sc: (offs[s_, 1] + i, 0)),
            pl.BlockSpec((s, f_dim), lambda s_, i, offs, sc: (0, 0)),
            pl.BlockSpec((s, f_dim), lambda s_, i, offs, sc: (0, 0)),
            pl.BlockSpec((s, 1), lambda s_, i, offs, sc: (0, 0)),
            pl.BlockSpec((s, 1), lambda s_, i, offs, sc: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((s, f_dim), lambda s_, i, offs, sc: (0, 0)),
            pl.BlockSpec((s, f_dim), lambda s_, i, offs, sc: (0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((s, f_dim), jnp.float32),
            pltpu.VMEM((s, f_dim), jnp.float32),
            pltpu.VMEM((s, f_dim), jnp.float32),
        ],
    )
    w_out, df_out = pl.pallas_call(
        _fused_train_kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((s, f_dim), jnp.float32),
                   jax.ShapeDtypeStruct((s, f_dim), jnp.float32)],
        interpret=interpret,
    )(offs, scal, pos, neg, w, df_avg,
      mu.reshape(s, 1), gamma.reshape(s, 1))
    return w_out, df_out, t + jnp.int32(batch * n_steps)


# -- wide-S whole-chunk fusion: the full hyperparameter grid in one kernel --

#: VMEM budget the wide kernel plans against (16 MB/core minus margin for
#: Mosaic's own buffers). Round-3 used an opaque 12 MB bound that silently
#: excluded the Brown grid size (S=256, F=5120, bf16) — the bench's
#: "fused wide" rows were actually the XLA fallback.
WIDE_KERNEL_VMEM_LIMIT = int(14.6 * 2 ** 20)


def _wide_f_chunk(f_dim: int) -> int:
    f_chunk = f_dim
    while f_chunk > 1536 and f_chunk % 2 == 0:
        f_chunk //= 2
    return f_chunk


def wide_kernel_vmem_bytes(s_axis: int, f_dim: int, tile_b: int,
                           itemsize: int) -> int:
    """Planned VMEM footprint of fused_block_train_wide (must stay under
    WIDE_KERNEL_VMEM_LIMIT): the two (S, F) scratch residents, the
    double-buffered pos/neg tiles, and the chunked-accumulate
    intermediates. The (S, F) state itself stays in HBM (DMAd in/out)."""
    resident = s_axis * f_dim * (itemsize + 4)
    tiles = 4 * tile_b * f_dim * itemsize
    inter = s_axis * _wide_f_chunk(f_dim) * 4 + 2 * tile_b * s_axis * 4
    return resident + tiles + inter


def _fused_train_wide_kernel(offs_ref, scal_ref, pos_ref, neg_ref,
                             w_init_hbm, df_init_hbm, mu_ref, gamma_ref,
                             df_out_hbm, w_s, df_s, sem_w, sem_df):
    """Grid (n_steps, n_tiles). Differences from _fused_train_kernel that
    buy the VMEM room for S in the hundreds (S=256, F=5120 = the full
    Brown grid; round 3's version kept the (S, F) state as resident
    input AND output blocks on top of the scratch — ~31 MB of VMEM — so
    it never compiled at that size and the caller silently fell back to
    the XLA path):

      * the (S, F) state lives in HBM (`ANY` blocks), DMAd into the two
        VMEM scratch residents at the first grid step; only df returns
        (one DMA out at the last step) — w is a pure elementwise
        function of df and the caller recomputes it in f32;
      * no g scratch — the subgradient folds straight into df via
        df <- df * t/(t+B) at tile 0, then df += (viol.T @ fd)/(t+B)
        in (S, f_chunk) slices (a whole-width dot would materialise a
        second (S, F) f32 intermediate);
      * the resident w is kept at the INPUT dtype (bf16 on the tuned
        path) — it only feeds the hinge threshold through the f matmul,
        the same bf16-grade decision the DEFAULT-precision XLA sweep
        makes.
    """
    step = pl.program_id(0)
    tile = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    n_steps = pl.num_programs(0)
    f_dim = w_s.shape[1]
    f_chunk = _wide_f_chunk(f_dim)

    @pl.when((step == 0) & (tile == 0))
    def _():
        w_in = pltpu.make_async_copy(w_init_hbm, w_s, sem_w)
        df_in = pltpu.make_async_copy(df_init_hbm, df_s, sem_df)
        w_in.start()
        df_in.start()
        w_in.wait()
        df_in.wait()

    t0 = scal_ref[0].astype(jnp.float32)
    batch_f = scal_ref[1].astype(jnp.float32)
    tf = t0 + step.astype(jnp.float32) * batch_f
    tnf = tf + batch_f

    @pl.when(tile == 0)
    def _():
        df_s[...] = df_s[...] * (tf / tnf)

    fd = pos_ref[...] - neg_ref[...]
    f = jnp.dot(fd, w_s[...].T, preferred_element_type=jnp.float32)
    viol = (f > -1.0).astype(fd.dtype)
    for c0 in range(0, f_dim, f_chunk):
        df_s[:, c0:c0 + f_chunk] += jnp.dot(
            viol.T, fd[:, c0:c0 + f_chunk],
            preferred_element_type=jnp.float32) / tnf

    @pl.when(tile == n_tiles - 1)
    def _():
        # chunked like the accumulate: the elementwise expression would
        # otherwise materialise an (S, F) f32 temporary
        for c0 in range(0, f_dim, f_chunk):
            w_new = jnp.maximum(
                0.0, -jnp.sqrt(tnf) / gamma_ref[...]
                * (df_s[:, c0:c0 + f_chunk] + mu_ref[...]))
            w_s[:, c0:c0 + f_chunk] = w_new.astype(w_s.dtype)

    @pl.when((step == n_steps - 1) & (tile == n_tiles - 1))
    def _():
        df_out = pltpu.make_async_copy(df_s, df_out_hbm, sem_w)
        df_out.start()
        df_out.wait()


def _fused_train_wide_pipelined_kernel(offs_ref, scal_ref, pos_hbm,
                                       neg_hbm, w_init_hbm, df_init_hbm,
                                       mu_ref, gamma_ref, df_out_hbm,
                                       pos_buf, neg_buf, w_s, df_s,
                                       sem_pos, sem_neg, sem_state,
                                       *, n_steps, n_tiles, tile_b):
    """The wide kernel as ONE program with a manually double-buffered DMA
    loop (VERDICT r4 next #3).

    The grid version pays a fixed per-program cost on every (step, tile)
    — measured ~6-7 us against a 3.2 us tile DMA and 3.4 us of MXU work,
    which is exactly the S-independent 4x-over-floor overhead round 4
    decomposed but did not remove. Here the (n_steps x n_tiles) iteration
    runs inside a single program as a fori_loop with explicit async
    copies: tile i+1's pos/neg DMAs are issued before tile i's compute,
    so the program pays the dispatch cost once and the DMA/MXU overlap is
    under our control instead of the grid pipeliner's.
    """
    f_dim = w_s.shape[1]
    f_chunk = _wide_f_chunk(f_dim)
    total = n_steps * n_tiles
    batch_f = scal_ref[1].astype(jnp.float32)
    t0 = scal_ref[0].astype(jnp.float32)

    w_in = pltpu.make_async_copy(w_init_hbm, w_s, sem_state)
    w_in.start()
    df_in = pltpu.make_async_copy(df_init_hbm, df_s, sem_state)

    def tile_dma(slot, i):
        step = i // n_tiles
        tile = i % n_tiles
        rp = (offs_ref[step, 0] + tile) * tile_b
        rn = (offs_ref[step, 1] + tile) * tile_b
        return (pltpu.make_async_copy(
                    pos_hbm.at[pl.ds(rp, tile_b), :], pos_buf.at[slot],
                    sem_pos.at[slot]),
                pltpu.make_async_copy(
                    neg_hbm.at[pl.ds(rn, tile_b), :], neg_buf.at[slot],
                    sem_neg.at[slot]))

    for d in tile_dma(0, 0):
        d.start()
    w_in.wait()
    df_in.start()
    df_in.wait()

    def body(i, _):
        step = i // n_tiles
        tile = i % n_tiles
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < total)
        def _():
            for d in tile_dma(jax.lax.rem(i + 1, 2), i + 1):
                d.start()

        for d in tile_dma(slot, i):
            d.wait()

        tf = t0 + step.astype(jnp.float32) * batch_f
        tnf = tf + batch_f

        @pl.when(tile == 0)
        def _():
            df_s[...] = df_s[...] * (tf / tnf)

        fd = pos_buf[slot] - neg_buf[slot]
        f = jnp.dot(fd, w_s[...].T, preferred_element_type=jnp.float32)
        viol = (f > -1.0).astype(fd.dtype)
        for c0 in range(0, f_dim, f_chunk):
            df_s[:, c0:c0 + f_chunk] += jnp.dot(
                viol.T, fd[:, c0:c0 + f_chunk],
                preferred_element_type=jnp.float32) / tnf

        @pl.when(tile == n_tiles - 1)
        def _():
            for c0 in range(0, f_dim, f_chunk):
                w_new = jnp.maximum(
                    0.0, -jnp.sqrt(tnf) / gamma_ref[...]
                    * (df_s[:, c0:c0 + f_chunk] + mu_ref[...]))
                w_s[:, c0:c0 + f_chunk] = w_new.astype(w_s.dtype)
        return 0

    jax.lax.fori_loop(0, total, body, 0)
    df_out = pltpu.make_async_copy(df_s, df_out_hbm, sem_state)
    df_out.start()
    df_out.wait()


@functools.partial(jax.jit,
                   static_argnames=("batch", "n_steps", "tile_b",
                                    "interpret"))
def fused_block_train_wide_pipelined(
        pos: jax.Array, neg: jax.Array,
        w: jax.Array, df_avg: jax.Array, t: jax.Array,
        mu: jax.Array, gamma: jax.Array,
        key: jax.Array, *, batch: int, n_steps: int,
        tile_b: int = 128, interpret: bool = False):
    """fused_block_train_wide through the single-program pipelined kernel.

    Identical sampling distribution and update math (same draw() stream
    given the same key); per-tile program-dispatch overhead removed.
    Returns (w, df_avg, t_new).
    """
    if batch % tile_b:
        raise ValueError(f"batch {batch} not a multiple of tile_b {tile_b}")
    n_tiles = batch // tile_b
    f_dim = pos.shape[1]
    s = w.shape[0]
    n_pos, n_neg = pos.shape[0], neg.shape[0]

    keys = jax.random.split(key, n_steps)

    def draw(k):
        kp, kn = jax.random.split(k)
        ip = jax.random.randint(kp, (), 0, (n_pos - batch) // tile_b + 1)
        ineg = jax.random.randint(kn, (), 0, (n_neg - batch) // tile_b + 1)
        return jnp.stack([ip, ineg]).astype(jnp.int32)

    offs = jax.vmap(draw)(keys)                            # (n_steps, 2)
    scal = jnp.asarray([t, jnp.int32(batch)], jnp.int32)

    kernel = functools.partial(
        _fused_train_wide_pipelined_kernel,
        n_steps=n_steps, n_tiles=n_tiles, tile_b=tile_b)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),             # pos (HBM)
            pl.BlockSpec(memory_space=pl.ANY),             # neg (HBM)
            pl.BlockSpec(memory_space=pl.ANY),             # w init
            pl.BlockSpec(memory_space=pl.ANY),             # df init
            pl.BlockSpec((s, 1), lambda g, offs, sc: (0, 0)),
            pl.BlockSpec((s, 1), lambda g, offs, sc: (0, 0)),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, tile_b, f_dim), pos.dtype),     # pos tiles
            pltpu.VMEM((2, tile_b, f_dim), pos.dtype),     # neg tiles
            pltpu.VMEM((s, f_dim), pos.dtype),             # resident w
            pltpu.VMEM((s, f_dim), jnp.float32),           # resident df
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    df_out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((s, f_dim), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=4 * batch * f_dim * s * n_steps,
            bytes_accessed=2 * batch * f_dim * pos.dtype.itemsize * n_steps,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(offs, scal, pos, neg, w.astype(pos.dtype), df_avg,
      mu.reshape(s, 1), gamma.reshape(s, 1))
    t_new = t + jnp.int32(batch * n_steps)
    tnf = t_new.astype(jnp.float32)
    w_out = jnp.maximum(
        0.0, -jnp.sqrt(tnf) / gamma[:, None] * (df_out + mu[:, None]))
    return w_out, df_out, t_new


@functools.partial(jax.jit,
                   static_argnames=("batch", "n_steps", "tile_b",
                                    "interpret"))
def fused_block_train_wide(pos: jax.Array, neg: jax.Array,
                           w: jax.Array, df_avg: jax.Array, t: jax.Array,
                           mu: jax.Array, gamma: jax.Array,
                           key: jax.Array, *, batch: int, n_steps: int,
                           tile_b: int = 256, interpret: bool = False):
    """fused_block_train for wide sweep axes; returns (w, df_avg, t_new).

    The resident iterate w rides at pos.dtype (bf16 recommended); df_avg
    stays exact f32. Same tile-aligned block sampling as the narrow
    kernel.
    """
    if batch % tile_b:
        raise ValueError(f"batch {batch} not a multiple of tile_b {tile_b}")
    n_tiles = batch // tile_b
    f_dim = pos.shape[1]
    s = w.shape[0]
    n_pos, n_neg = pos.shape[0], neg.shape[0]

    keys = jax.random.split(key, n_steps)

    def draw(k):
        kp, kn = jax.random.split(k)
        ip = jax.random.randint(kp, (), 0, (n_pos - batch) // tile_b + 1)
        ineg = jax.random.randint(kn, (), 0, (n_neg - batch) // tile_b + 1)
        return jnp.stack([ip, ineg]).astype(jnp.int32)

    offs = jax.vmap(draw)(keys)                            # (n_steps, 2)
    scal = jnp.asarray([t, jnp.int32(batch)], jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_steps, n_tiles),
        in_specs=[
            pl.BlockSpec((tile_b, f_dim),
                         lambda s_, i, offs, sc: (offs[s_, 0] + i, 0)),
            pl.BlockSpec((tile_b, f_dim),
                         lambda s_, i, offs, sc: (offs[s_, 1] + i, 0)),
            # the (S, F) state stays in HBM — the kernel DMAs it into
            # its VMEM scratch residents once (resident input/output
            # BLOCKS of this size are what kept the kernel from ever
            # compiling at the Brown grid size)
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((s, 1), lambda s_, i, offs, sc: (0, 0)),
            pl.BlockSpec((s, 1), lambda s_, i, offs, sc: (0, 0)),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((s, f_dim), pos.dtype),             # resident w
            pltpu.VMEM((s, f_dim), jnp.float32),           # resident df
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    df_out = pl.pallas_call(
        _fused_train_wide_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((s, f_dim), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=4 * batch * f_dim * s * n_steps,
            bytes_accessed=2 * batch * f_dim * pos.dtype.itemsize * n_steps,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(offs, scal, pos, neg, w.astype(pos.dtype), df_avg,
      mu.reshape(s, 1), gamma.reshape(s, 1))
    # w is a pure elementwise function of the f32 df — recomputed here in
    # f32 (the in-kernel resident w is input-dtype and only feeds the
    # hinge threshold)
    t_new = t + jnp.int32(batch * n_steps)
    tnf = t_new.astype(jnp.float32)
    w_out = jnp.maximum(
        0.0, -jnp.sqrt(tnf) / gamma[:, None] * (df_out + mu[:, None]))
    return w_out, df_out, t_new
