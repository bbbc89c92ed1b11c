"""Descriptor evaluation protocols vs hand-computed values."""

import numpy as np

from conftest import REFERENCE, requires_reference

from opencv_dlco_tpu.pipeline.eval import (
    evaluate_descriptor,
    matching_map,
    retrieval_map,
    verification,
)


def test_matching_map_exact():
    train = np.eye(4, dtype=np.float32) * 2
    # queries: 0 matches train 0 exactly; 1 is closest to 2; 2 has no gt
    query = np.stack([train[0] + 0.01, train[2] + 0.02, train[3]])
    gt = np.array([0, 1, -1], np.int32)  # query1's gt (1) ranks 2nd
    out = matching_map(query, train, gt, k=4)
    # q0: rank 1 -> ap 1.0 ; q1: true partner 1 is 2nd-nearest? all other
    # train rows equidistant; partner 1 at distance ~ sqrt(8); nearest is 2.
    assert out["n_queries"] == 2
    assert 0.5 <= out["map"] <= 1.0
    assert out["precision_at_1"] == 0.5


def test_retrieval_map_perfect_and_random(rng):
    # perfect: queries identical to their gallery class centroids
    centroids = rng.normal(size=(5, 8)).astype(np.float32) * 5
    gallery = np.repeat(centroids, 3, axis=0) + rng.normal(
        0, 0.01, (15, 8)).astype(np.float32)
    g_labels = np.repeat(np.arange(5), 3)
    out = retrieval_map(centroids, gallery, np.arange(5), g_labels)
    assert out["map"] > 0.99
    # labels shuffled -> mAP far lower
    out2 = retrieval_map(centroids, gallery, np.arange(5),
                         rng.permutation(g_labels))
    assert out2["map"] < 0.8


def test_verification_separable(rng):
    pos = rng.normal(0, 0.1, (200, 16)).astype(np.float32)
    a = rng.normal(size=(400, 16)).astype(np.float32)
    b = np.concatenate([a[:200] + pos * 0.01, rng.normal(size=(200, 16))
                        ]).astype(np.float32)
    labels = np.concatenate([np.ones(200), np.zeros(200)]).astype(np.uint8)
    out = verification(a, b, labels)
    assert out["auc"] > 0.95
    assert out["fpr95"] < 0.3


@requires_reference
def test_published_model_verification(rng):
    """The published 64-D descriptor must separate warped synthetic pairs."""
    from opencv_dlco_tpu.data.synthetic import synth_patch_pairs
    from opencv_dlco_tpu.models.vgg import VGGDescriptor

    with open(f"{REFERENCE}/workspace/opencv/vgg_generated_64.i") as fh:
        model = VGGDescriptor.from_header(fh.read())
    p1, p2, labels = synth_patch_pairs(rng, n_pairs=128, noise=0.04)
    out = evaluate_descriptor(model, (p1, p2), labels)
    assert out["auc"] > 0.95
    assert out["fpr95"] < 0.2
