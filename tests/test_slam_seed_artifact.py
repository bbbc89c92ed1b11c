"""Gate on the committed multi-seed SLAM study artifact (VERDICT r4 next
#2): every committed row of slam_seed_study.json — produced on the chip
by tools/slam_study.py — must meet the 0.10x-span refined-ATE bar at
DEFAULT config for every (scene, seed), with the worst seed the binding
one. Skips only if the study has never been captured; the live worst-seed
re-check on hardware lives in tests/test_tpu_smoke.py.
"""

import json
import os

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


def test_refined_ate_bar_every_seed(study):
    """BASELINE config 5's ATE bound is not seed-conditional."""
    for (scene, seed), r in study.items():
        assert r["ate_ref"] <= 0.105, (scene, seed, r["ate_ref"])


def test_loops_detected_every_seed(study):
    for (scene, seed), r in study.items():
        assert r["n_loops"] >= 1, (scene, seed)
