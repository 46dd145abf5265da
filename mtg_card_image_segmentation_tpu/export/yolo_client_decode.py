"""Reference client-side decode for the exported YOLO12n-pose ONNX model.

STANDALONE FILE — numpy only, no package imports. export_yolo.py copies it
verbatim into the deployment directory, because the naive decode the raw
graph suggests ("each keypoint at its argmax kconf column") regresses to
the corner-identity-swap failure mode: on ~2% of (rotated) cards a corner
channel double-picks another corner's peak. This file mirrors the in-repo
joint decode (models/yolo12_pose.py top1_detection — joint top-2 decode
with collision penalty + canonical corner reordering) that produces the
shipped accuracy numbers (98.9% acc@5px); keep the two in sync
(tests/test_yolo.py::test_client_decode_matches_top1_detection).

Usage:
    out = session.run(None, {"input": x})[0]      # (1, 17, A)
    box, score, corners = decode(out)
    # corners: (4, 3) [x, y, conf] in input pixels, TL TR BR BL order
"""

from __future__ import annotations

import numpy as np

KPT_COLLISION_PX = 24.0


def decode(output0: np.ndarray, num_keypoints: int = 4):
    """(1, 4+nc+3K, A) raw model output -> (box(4,), score, corners(K, 3)).

    max_det=1 (one card per image): box from the best detection anchor;
    keypoints from a joint assignment over each corner channel's top-2
    confidence peaks with a collision penalty, then re-sorted into
    canonical image order (TL, TR, BR, BL).
    """
    out = np.asarray(output0)[0]  # (rows, A)
    k = num_keypoints
    boxes = out[:4]  # (4, A)
    scores = out[4:-3 * k]  # (nc, A)
    kpts = out[-3 * k:].reshape(k, 3, -1)  # (K, 3, A)

    conf = scores.max(axis=0)  # (A,)
    best_a = int(conf.argmax())
    box = boxes[:, best_a]
    score = float(conf[best_a])

    # top-2 peaks per corner channel
    kconf = kpts[:, 2, :]  # (K, A)
    i2 = np.argsort(kconf, axis=1)[:, -2:][:, ::-1]  # (K, 2) best first
    cand = np.stack(
        [kpts[np.arange(k), :, i2[:, r]] for r in (0, 1)], axis=1
    )  # (K, 2, 3) [x, y, conf]

    # enumerate all 2^K rank assignments; penalize coincident corners
    best_score, best_pick = -np.inf, None
    for c in range(2 ** k):
        ranks = [(c >> j) & 1 for j in range(k)]
        pick = cand[np.arange(k), ranks]  # (K, 3)
        d2 = np.sum(
            (pick[None, :, :2] - pick[:, None, :2]) ** 2, axis=-1
        )
        collide = (d2 < KPT_COLLISION_PX ** 2) & ~np.eye(k, dtype=bool)
        s = pick[:, 2].sum() - 10.0 * collide.sum()
        if s > best_score:
            best_score, best_pick = s, pick
    kp = best_pick  # (K, 3)

    # canonical reorder: sort by angle around the centroid, start at the
    # point with the smallest x+y (top-left), i.e. TL TR BR BL
    ctr = kp[:, :2].mean(axis=0)
    ang = np.arctan2(kp[:, 1] - ctr[1], kp[:, 0] - ctr[0])
    kp = kp[np.argsort(ang)]
    start = int(np.argmin(kp[:, 0] + kp[:, 1]))
    kp = np.roll(kp, -start, axis=0)
    return box, score, kp
