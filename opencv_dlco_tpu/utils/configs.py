"""Typed configuration for every pipeline stage.

The reference scatters hyperparameters across per-binary argv parsers and
bash sweep grids (reference: src/pr-learn.cpp:96-172, workspace/04-prlearn.sh:8-14).
Here every stage has one frozen dataclass; sweep grids are first-class values
so the sweep engine can vmap over them.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple


@dataclasses.dataclass(frozen=True)
class DescriptorConfig:
    """Patch -> oriented-gradient feature transform (reference: src/vgg-desc.cpp:41-152)."""

    patch_size: int = 64
    n_angle_bins: int = 8
    init_sigma: float = 1.4
    norm: bool = True
    norm_quantile: float = 0.8
    # MXU precision for the pooling/distance matmuls: "highest" = true
    # float32 (6-pass emulation, reference-numerics parity), "default" =
    # bf16 multiplies with f32 accumulation (~3x faster stage-3; distance
    # error ~1e-3 relative — see tests/test_precision.py before relying on
    # it for FPR95-critical runs).
    matmul_precision: str = "highest"

    @property
    def precision(self):
        import jax

        return (jax.lax.Precision.HIGHEST
                if self.matmul_precision == "highest"
                else jax.lax.Precision.DEFAULT)

    @property
    def n_pixels(self) -> int:
        return self.patch_size * self.patch_size


@dataclasses.dataclass(frozen=True)
class PoolRegionConfig:
    """Candidate pooling-region bank (reference: src/gen-poolregion.cpp:87-91,163-170)."""

    patch_size: int = 64
    nr: int = 32
    nphi: int = 5
    nsigma: int = 32
    n_symmetries: int = 8  # 8-fold symmetric offsets per ring

    @property
    def n_rings(self) -> int:
        return self.nr * self.nphi * self.nsigma

    @property
    def n_filters(self) -> int:
        return self.n_rings * self.n_symmetries


@dataclasses.dataclass(frozen=True)
class PRLearnConfig:
    """Pooling-region learner: L1-regularised hinge RDA (reference: src/pr-learn.cpp:76-84).

    ``batch`` is TPU-native minibatching of the reference's per-sample loop:
    the RDA running average commutes over a batch, so ``n_iter`` counts
    *samples* (reference iterations), not optimizer steps.
    """

    mu: float = 0.025
    gamma: float = 0.10
    max_dim: int = 640
    n_iter: int = 5_000_000
    log_step: int = 100_000
    batch: int = 4096
    train_frac: float = 0.80
    seed: int = 2215
    n_angle_bins: int = 8
    # "block": random contiguous blocks of the pre-shuffled rows (sequential
    # HBM reads, ~2.5x faster); "gather": i.i.d. with replacement
    # (reference semantics); "block_fused": block mode through the fused
    # Pallas step (ops/fused_rda.py, S<=8 only — sweeps fall back to
    # "block"). Convergence-equivalent (tests/test_pr_sampling,
    # tests/test_fused_rda).
    sampling: str = "block"
    # "highest": true-f32 step matmuls (reference numerics); "default":
    # bf16 multiplies + f32 accumulation (selection-metric-equivalent,
    # tests/test_sweep.py precision study; ~25% faster sweeps).
    matmul_precision: str = "highest"
    # "f32" | "bf16": dtype of the device-resident training splits. bf16
    # halves HBM residency (Brown scale 8.2 -> 4.1 GiB) and feeds the MXU
    # at double rate; quality gated in tests/test_fused_rda.py.
    split_dtype: str = "f32"

    @property
    def precision(self):
        import jax

        return (jax.lax.Precision.HIGHEST
                if self.matmul_precision == "highest"
                else jax.lax.Precision.DEFAULT)


@dataclasses.dataclass(frozen=True)
class PJLearnConfig:
    """Projection learner: trace-norm hinge RDA + PSD projection (reference: src/pj-learn.cpp:88-96)."""

    mu: float = 0.001
    gamma: float = 0.500
    n_iter: int = 50_000
    log_step: int = 100
    batch: int = 200
    train_frac: float = 0.80
    seed: int = 2215
    # "exact"    -> full eigh every step (reference semantics);
    # "subspace" -> warm-started orthogonal iteration (TPU-fast, approximate);
    # "psd_ns"   -> Newton-Schulz PSD projection in the hot loop (pure MXU
    #               matmuls, zero in-loop factorisations) with one exact
    #               eigh per log period rebuilding W from df_avg — the
    #               fast path that keeps full-rank reference semantics at
    #               every observable point (models/pj_rda.py).
    eigh_mode: str = "exact"
    subspace_steps: int = 4
    ns_iters: int = 24
    # With eigh_mode="subspace": track only the top-K eigenpairs (F x K
    # basis, W becomes K x F). The trace-norm regulariser keeps the true
    # rank far below F (shipped reference models: 49-168 rows), so a cap
    # of ~2x the expected rank loses nothing; turns the O(F^3) eigh into
    # O(F^2 K) MXU work. None -> full basis.
    rank_cap: Optional[int] = None


@dataclasses.dataclass(frozen=True)
class PRSweepGrid:
    """Reference PR grid: 16 mu x 16 gamma (workspace/04-prlearn.sh:8-14)."""

    mus: Tuple[float, ...] = (
        0.001, 0.002, 0.003, 0.004, 0.005, 0.010, 0.015, 0.020,
        0.025, 0.030, 0.035, 0.040, 0.045, 0.050, 0.055, 0.060,
    )
    gammas: Tuple[float, ...] = (
        0.005, 0.010, 0.015, 0.020, 0.025, 0.030, 0.040, 0.050,
        0.075, 0.100, 0.125, 0.150, 0.175, 0.200, 0.225, 0.250,
    )

    def combos(self) -> Sequence[Tuple[float, float]]:
        return [(m, g) for m in self.mus for g in self.gammas]


@dataclasses.dataclass(frozen=True)
class PJSweepGrid:
    """Reference PJ grid: 5 mu x 9 gamma (workspace/08-pjlearn.sh:10-14)."""

    mus: Tuple[float, ...] = (0.0001, 0.0005, 0.0010, 0.0020, 0.0030)
    gammas: Tuple[float, ...] = (
        0.025, 0.050, 0.100, 0.150, 0.200, 0.250, 0.500, 0.750, 1.000,
    )

    def combos(self) -> Sequence[Tuple[float, float]]:
        return [(m, g) for m in self.mus for g in self.gammas]
