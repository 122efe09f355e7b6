"""Plain-numpy oracle implementations of every L0 op.

Each oracle is a direct, loop-level transcription of the semantics described
in SURVEY.md §2.1 (citing the reference CUDA kernels), kept deliberately
naive so correctness is obvious by inspection.
"""

import numpy as np


def fps_oracle(pts, m, skip_origin=True):
    """sampling_gpu.cu:74-234 semantics: idx[0]=0, greedy max-min, 1e10 init,
    origin-skip (variant A)."""
    n = pts.shape[0]
    valid = np.sum(pts * pts, axis=-1) > 1e-3 if skip_origin else np.ones(n, bool)
    dist = np.full(n, 1e10, np.float32)
    idxs = np.zeros(m, np.int32)
    last = 0
    for j in range(1, m):
        d = np.sum((pts - pts[last]) ** 2, axis=-1).astype(np.float32)
        dist = np.minimum(dist, d)
        cand = np.where(valid, dist, -1.0)
        last = int(np.argmax(cand))
        idxs[j] = last
    return idxs


def ball_query_oracle(pts, centers, radius, nsample):
    """ball_query_gpu.cu:9-54: first nsample hits in index order; slots past
    the count hold the first hit; zero hits -> all zeros."""
    m = centers.shape[0]
    idx = np.zeros((m, nsample), np.int32)
    r2 = radius * radius
    for j in range(m):
        cnt = 0
        for k in range(pts.shape[0]):
            d2 = np.sum((centers[j] - pts[k]) ** 2)
            if d2 < r2:
                if cnt == 0:
                    idx[j, :] = k
                idx[j, cnt] = k
                cnt += 1
                if cnt >= nsample:
                    break
    return idx


def cylinder_query_oracle(pts, centers, rot, radius, hmin, hmax, nsample):
    """cylinder_query_gpu.cu:20-101: p' = R^T (p - c), hit iff
    y'^2+z'^2 < r^2 and hmin < x' < hmax; same padding as ball query."""
    m = centers.shape[0]
    idx = np.zeros((m, nsample), np.int32)
    r2 = radius * radius
    for j in range(m):
        cnt = 0
        R = rot[j]
        for k in range(pts.shape[0]):
            d = pts[k] - centers[j]
            p = R.T @ d
            if (p[1] ** 2 + p[2] ** 2) < r2 and hmin < p[0] < hmax:
                if cnt == 0:
                    idx[j, :] = k
                idx[j, cnt] = k
                cnt += 1
                if cnt >= nsample:
                    break
    return idx


def knn_oracle(ref, query, k):
    """Brute-force k-NN, nearest first, ties to lower index."""
    d2 = np.sum((query[:, None, :] - ref[None, :, :]) ** 2, axis=-1)
    idx = np.argsort(d2, axis=-1, kind="stable")[:, :k]
    dist = np.sqrt(np.take_along_axis(d2, idx, axis=-1))
    return dist, idx.astype(np.int32)


def three_interpolate_oracle(feats, idx, weight):
    """interpolate_gpu.cu:77-159: out = sum_i w_i * f[idx_i]."""
    n = idx.shape[0]
    out = np.zeros((n, feats.shape[1]), feats.dtype)
    for i in range(n):
        for j in range(3):
            out[i] += weight[i, j] * feats[idx[i, j]]
    return out
