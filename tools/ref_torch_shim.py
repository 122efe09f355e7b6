"""Pure-torch CPU implementations of the reference's native extension ops.

The reference model (TrainModel/graspbalance.py) calls two CUDA extension
surfaces that cannot exist in this image:

  * ``pointnet2._ext``  — PointNet/pointnet2_utils.py wrappers
    (furthest_point_sampling, gather_points, group_points, ball_query,
    cylinder_query, three_nn, three_interpolate)
  * ``pointnet2_batch_cuda`` — ModifiedNetTools/{group,subsample}.py wrappers
    (in-place *_wrapper functions used by the DRP backbone)

``install()`` fills the module stubs registered by tests/ref_harness.py with
vectorized pure-torch equivalents matching the CUDA kernels' semantics
(first-k-by-index neighbor selection with first-hit padding per
PointNet/_ext_src/src/cylinder_query_gpu.cu:57-78 and ball_query_gpu.cu;
FPS seeds index 0 with 1e10 init per sampling_gpu.cu:74-234 — the _ext
variant additionally skips near-origin points, SURVEY §2.1 N1/N2).

This makes the reference's OWN model code runnable end-to-end on CPU — used
for (a) full-forward parity vs our jax model with ported weights and (b) the
measured torch↔jax baseline cross-calibration (tools/baseline_calibration.py).
Nothing here ships in graspbalance_tpu/; it is test/benchmark harness code.
"""

from __future__ import annotations

import sys

import torch


def _first_k_pad_first(hit: torch.Tensor, nsample: int) -> torch.Tensor:
    """(B, S, N) bool hit mask -> (B, S, nsample) int32 indices: first
    nsample hits in index order; empty slots repeat the first hit; all-zero
    rows stay 0 (the CUDA kernels' exact padding rule)."""
    b, s, n = hit.shape
    arange = torch.arange(n, dtype=torch.int64)
    # non-hits get index n so a stable ascending sort puts hits (by index)
    # first — the reference's own pure-torch trick (pointnet2_util.py:49-56)
    group_idx = torch.where(hit, arange.view(1, 1, n), torch.full((), n, dtype=torch.int64))
    group_idx = group_idx.sort(dim=-1)[0][:, :, :nsample]
    first = group_idx[:, :, 0:1].expand(-1, -1, nsample)
    group_idx = torch.where(group_idx == n, first, group_idx)
    return torch.where(group_idx == n, torch.zeros_like(group_idx), group_idx).to(torch.int32)


def _fps(xyz: torch.Tensor, npoint: int, skip_origin: bool) -> torch.Tensor:
    """sampling_gpu.cu semantics: idx[0]=0, greedy max-min, 1e10 init,
    optional near-origin skip (squared norm <= 1e-3 never selected)."""
    b, n, _ = xyz.shape
    out = torch.zeros(b, npoint, dtype=torch.int32)
    dist = torch.full((b, n), 1e10)
    if skip_origin:
        valid = (xyz * xyz).sum(-1) > 1e-3
    farthest = torch.zeros(b, dtype=torch.int64)
    bi = torch.arange(b)
    for i in range(npoint):
        out[:, i] = farthest.to(torch.int32)
        centroid = xyz[bi, farthest].unsqueeze(1)  # (B, 1, 3)
        d = ((xyz - centroid) ** 2).sum(-1)
        dist = torch.minimum(dist, d)
        cand = torch.where(valid, dist, torch.full((), -1.0)) if skip_origin else dist
        farthest = cand.argmax(-1)
    return out


def _sqdist(a: torch.Tensor, b: torch.Tensor) -> torch.Tensor:
    return ((a[:, :, None, :] - b[:, None, :, :]) ** 2).sum(-1)


class _Ext:
    """pointnet2._ext (PointNet/_ext_src) — forward surface."""

    @staticmethod
    def furthest_point_sampling(xyz, npoint):
        # variant A: near-origin points are never selected (SURVEY §2.1 N1)
        return _fps(xyz.contiguous(), npoint, skip_origin=True)

    @staticmethod
    def gather_points(features, idx):  # (B,C,N),(B,S) -> (B,C,S)
        return torch.gather(
            features, 2, idx.long().unsqueeze(1).expand(-1, features.shape[1], -1)
        ).contiguous()

    @staticmethod
    def group_points(features, idx):  # (B,C,N),(B,S,K) -> (B,C,S,K)
        b, c, n = features.shape
        _, s, k = idx.shape
        flat = torch.gather(
            features, 2, idx.long().view(b, 1, s * k).expand(-1, c, -1)
        )
        return flat.view(b, c, s, k).contiguous()

    @staticmethod
    def ball_query(new_xyz, xyz, radius, nsample):
        hit = _sqdist(new_xyz, xyz) < radius * radius
        return _first_k_pad_first(hit, nsample)

    @staticmethod
    def cylinder_query(new_xyz, xyz, rot, radius, hmin, hmax, nsample):
        # rot: (B, S, 9) row-major gripper->world; x_rot = R^T (p - c)
        b, s, _ = new_xyz.shape
        r = rot.view(b, s, 3, 3)
        d = xyz[:, None, :, :] - new_xyz[:, :, None, :]  # (B, S, N, 3)
        loc = torch.einsum("bsnk,bskj->bsnj", d, r)  # columns of rot
        x_rot = loc[..., 0]
        d2 = loc[..., 1] ** 2 + loc[..., 2] ** 2
        hit = (d2 < radius * radius) & (x_rot > hmin) & (x_rot < hmax)
        return _first_k_pad_first(hit, nsample)

    @staticmethod
    def three_nn(unknown, known):  # (B,n,3),(B,m,3) -> dist2 (B,n,3), idx
        d2 = _sqdist(unknown, known)
        dist2, idx = torch.topk(d2, 3, dim=-1, largest=False, sorted=True)
        return dist2, idx.to(torch.int32)

    @staticmethod
    def three_interpolate(features, idx, weight):  # (B,c,m),(B,n,3),(B,n,3)
        b, c, m = features.shape
        n = idx.shape[1]
        g = torch.gather(
            features, 2, idx.long().view(b, 1, n * 3).expand(-1, c, -1)
        ).view(b, c, n, 3)
        return (g * weight.view(b, 1, n, 3)).sum(-1).contiguous()

    # ---- backward surface (interpolate_gpu.cu / group_points_gpu.cu /
    # sampling_gpu.cu grad kernels, as scatter-adds) — needed for the full
    # TRAIN step (tools/baseline_train_calibration.py): the reference's
    # autograd Functions call these in backward (pointnet2_utils.py:72,
    # :109, :132).

    @staticmethod
    def gather_points_grad(grad_out, idx, n):  # (B,C,S),(B,S),N -> (B,C,N)
        b, c, s = grad_out.shape
        out = torch.zeros(b, c, n, dtype=grad_out.dtype)
        out.scatter_add_(
            2, idx.long().unsqueeze(1).expand(-1, c, -1), grad_out
        )
        return out

    @staticmethod
    def group_points_grad(grad_out, idx, n):  # (B,C,S,K),(B,S,K),N
        b, c, s, k = grad_out.shape
        out = torch.zeros(b, c, n, dtype=grad_out.dtype)
        out.scatter_add_(
            2,
            idx.long().view(b, 1, s * k).expand(-1, c, -1),
            grad_out.reshape(b, c, s * k),
        )
        return out

    @staticmethod
    def three_interpolate_grad(grad_out, idx, weight, m):
        # (B,c,n),(B,n,3),(B,n,3),m -> (B,c,m)
        b, c, n = grad_out.shape
        w = grad_out.unsqueeze(-1) * weight.view(b, 1, n, 3)  # (B,c,n,3)
        out = torch.zeros(b, c, m, dtype=grad_out.dtype)
        out.scatter_add_(
            2,
            idx.long().view(b, 1, n * 3).expand(-1, c, -1),
            w.reshape(b, c, n * 3),
        )
        return out


class _BatchCuda:
    """pointnet2_batch_cuda — in-place *_wrapper surface (forward only)."""

    @staticmethod
    def furthest_point_sampling_wrapper(b, n, npoint, xyz, temp, output):
        output.copy_(_fps(xyz.contiguous(), npoint, skip_origin=False))
        return 1

    @staticmethod
    def gather_points_wrapper(b, c, n, npoint, features, idx, output):
        output.copy_(_Ext.gather_points(features, idx))
        return 1

    @staticmethod
    def group_points_wrapper(b, c, n, nfeatures, nsample, features, idx, output):
        output.copy_(_Ext.group_points(features, idx))
        return 1

    @staticmethod
    def ball_query_wrapper(b, n, npoint, radius, nsample, new_xyz, xyz, idx):
        idx.copy_(_Ext.ball_query(new_xyz, xyz, radius, nsample))
        return 1

    # backward wrappers (group_points_gpu.cu:86 etc. as scatter-adds) —
    # needed for the full TRAIN step under the shim

    @staticmethod
    def group_points_grad_wrapper(b, c, n, npoint, nsample, grad_out, idx,
                                  grad_features):
        grad_features.copy_(_Ext.group_points_grad(grad_out, idx, n))
        return 1

    @staticmethod
    def gather_points_grad_wrapper(b, c, n, npoint, grad_out, idx,
                                   grad_features):
        grad_features.copy_(_Ext.gather_points_grad(grad_out, idx, n))
        return 1

    @staticmethod
    def three_interpolate_grad_wrapper(b, c, n, m, grad_out, idx, weight,
                                       grad_features):
        grad_features.copy_(
            _Ext.three_interpolate_grad(grad_out, idx, weight, m)
        )
        return 1


def install() -> None:
    """Populate the ref_harness extension stubs with working torch ops and
    make torch.cuda.*Tensor allocate CPU tensors (the reference wrappers
    allocate outputs via torch.cuda.IntTensor/FloatTensor)."""
    ext = sys.modules.get("pointnet2._ext")
    if ext is None:
        raise RuntimeError("call tests.ref_harness.load_reference_model() first")
    for name in (
        "furthest_point_sampling", "gather_points", "group_points",
        "ball_query", "cylinder_query", "three_nn", "three_interpolate",
        "gather_points_grad", "group_points_grad", "three_interpolate_grad",
    ):
        setattr(ext, name, getattr(_Ext, name))
    bc = sys.modules["pointnet2_batch_cuda"]
    for name in (
        "furthest_point_sampling_wrapper", "gather_points_wrapper",
        "group_points_wrapper", "ball_query_wrapper",
        "group_points_grad_wrapper", "gather_points_grad_wrapper",
        "three_interpolate_grad_wrapper",
    ):
        setattr(bc, name, getattr(_BatchCuda, name))

    def _int_tensor(*shape, device=None, **_kw):
        return torch.zeros(shape, dtype=torch.int32)

    def _float_tensor(*shape, device=None, **_kw):
        return torch.zeros(shape, dtype=torch.float32)

    torch.cuda.IntTensor = _int_tensor
    torch.cuda.FloatTensor = _float_tensor
