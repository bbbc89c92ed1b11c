"""Gate on the committed multi-seed SLAM study artifact (VERDICT r4 next
#2): `slam_seed_study.json` is produced on the chip by
tools/slam_study.py over scenes 48/192/512 x seeds 2215/7/99 at DEFAULT
config. Round-5 loop-closure robustness work (merged endpoint depth
maps, weak-vote edges under a strong-revisit margin, conditional
velocity prior on the scale chain) moved the grid from 3/9 cells under
the 0.105x-span bar — with four cells closing ZERO loops, worst cell
0.222 — to 5/9 under the bar, EVERY cell closing at least one loop,
worst cell 0.137. The VERDICT target (every cell <= 0.105) is not fully
reached: the long-scene seed-7/99 cells are bound by chip-side odometry
noise the study isolates (ate_odo 0.17-0.23 on those cells; the
front-end estimates themselves diverge chip-vs-CPU). These gates pin
what is demonstrated — the flagship 48-frame row seed-robust under the
bar, a grid median at the bar, loops closing everywhere, and a hard
worst-cell ceiling — so any regression from the committed level fails
the suite. Skips only if the study has never been captured; the live
worst-seed re-check on hardware lives in tests/test_tpu_smoke.py.
"""

import json
import os

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCENES = (48, 192, 512)
SEEDS = (2215, 7, 99)


@pytest.fixture(scope="module")
def study():
    path = os.path.join(ROOT, "slam_seed_study.json")
    if not os.path.exists(path):
        pytest.skip("multi-seed slam study not captured yet")
    with open(path) as f:
        rows = json.load(f)
    return {(r["scene"], r["seed"]): r for r in rows}


def test_study_covers_grid(study):
    for scene in SCENES:
        for seed in SEEDS:
            assert (scene, seed) in study, f"missing ({scene}, {seed})"
            assert not study[(scene, seed)].get("overrides"), \
                "committed rows must be DEFAULT config"


def test_flagship_scene_meets_bar_every_seed(study):
    """BASELINE config 5's flagship 48-frame row, seed-robust."""
    for seed in SEEDS:
        r = study[(48, seed)]
        assert r["ate_ref"] <= 0.105, (seed, r["ate_ref"])


def test_grid_median_and_worst_cell(study):
    ates = [study[(sc, sd)]["ate_ref"] for sc in SCENES for sd in SEEDS]
    assert float(np.median(ates)) <= 0.105, sorted(ates)
    assert max(ates) <= 0.14, sorted(ates)   # committed worst: 0.1373


def test_loops_detected_every_seed(study):
    """Pre-fix, 4 of 9 cells closed ZERO loops — the failure mode the
    round-5 vote machinery removed. No cell may regress to loopless."""
    for (scene, seed), r in study.items():
        assert r["n_loops"] >= 1, (scene, seed)
