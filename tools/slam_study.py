"""Multi-seed SLAM robustness study (VERDICT r4 next #2).

Runs the bench scenes (render_blob_sequence at 48/192/512 frames) across
PRNG seeds and config overrides on whatever backend is active, printing
one JSON row per (scene, seed) with odometry/refined ATE-over-span, loop
counts, and the per-gate loop-rejection counters from
detect_loop_closures — the instrument for diagnosing why a seed misses
its loop closure.

Usage (chip):
    python tools/slam_study.py --scenes 48,192 --seeds 2215,7,99
    python tools/slam_study.py --set loop_top_k=4 --set loop_mutual=0

Writes/updates a JSON artifact with --out (merged by (scene, seed) key).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_override(kv: str):
    k, v = kv.split("=", 1)
    try:
        val = int(v)
    except ValueError:
        try:
            val = float(v)
        except ValueError:
            val = v
    return k, val


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", default="48,192,512")
    ap.add_argument("--seeds", default="2215,7,99")
    ap.add_argument("--set", action="append", default=[],
                    help="SlamConfig override key=val (repeatable)")
    ap.add_argument("--out", default=None, help="merge JSON rows here")
    ap.add_argument("--header",
                    default="/root/reference/workspace/opencv/"
                            "vgg_generated_64.i")
    ap.add_argument("--platform", default=None,
                    help="force a JAX platform (e.g. cpu). The session "
                         "site hook pre-registers the axon TPU backend "
                         "and overrides JAX_PLATFORMS, so a plain env "
                         "var silently runs this tool ON the tunnel — "
                         "jax.config.update is the only reliable "
                         "override (same pattern as cli.py).")
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from opencv_dlco_tpu.data.synthetic import render_blob_sequence
    from opencv_dlco_tpu.models.vgg import VGGDescriptor
    from opencv_dlco_tpu.pipeline.slam import (SlamConfig, ate_rmse,
                                               compute_features,
                                               run_back_end, run_odometry)

    with open(args.header) as fh:
        model = VGGDescriptor.from_header(fh.read())
    overrides = dict(parse_override(kv) for kv in args.set)
    # int-typed bool fields arrive as ints; SlamConfig handles truthiness
    cfg = SlamConfig(n_keypoints=256, kf_min_translation=2.5,
                     kf_min_rotation=0.05, loop_gap=10, **overrides)

    rows = []
    for n_frames in (int(s) for s in args.scenes.split(",")):
        for seed in (int(s) for s in args.seeds.split(",")):
            rng = np.random.default_rng(seed)
            frames, centers_gt, intr = render_blob_sequence(
                rng, n_frames, size=256)
            t0 = time.perf_counter()
            feats = compute_features(frames, model, cfg)
            odo = run_odometry(frames, intr, model, cfg, feats=feats)
            loop_stats = {}
            refined = run_back_end(odo, feats, intr, cfg,
                                   loop_stats=loop_stats)
            span = float(np.linalg.norm(centers_gt.max(0)
                                        - centers_gt.min(0)))
            row = dict(
                scene=n_frames, seed=seed,
                ate_odo=round(float(ate_rmse(odo.translations,
                                             centers_gt)) / span, 4),
                ate_ref=round(float(ate_rmse(refined.translations,
                                             centers_gt)) / span, 4),
                n_loops=len(refined.loop_edges),
                n_keyframes=len(refined.keyframes),
                wall=round(time.perf_counter() - t0, 1),
                overrides=overrides,
                **{f"loop_{k}": v for k, v in loop_stats.items()})
            print(json.dumps(row), flush=True)
            rows.append(row)

    if args.out:
        merged = {}
        if os.path.exists(args.out):
            with open(args.out) as fh:
                merged = {(r["scene"], r["seed"]): r
                          for r in json.load(fh)}
        for r in rows:
            merged[(r["scene"], r["seed"])] = r
        with open(args.out, "w") as fh:
            json.dump([merged[k] for k in sorted(merged)], fh, indent=1)


if __name__ == "__main__":
    main()
