"""Tolerance-label generation CLI (reference generate_tolerance_label.py
driver, vectorized: one pass per object instead of one process per point)."""

import argparse
import os
import sys
from concurrent.futures import ProcessPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_object(args):
    root, out_dir, obj, pos_ratio, mu = args
    import numpy as np

    from graspbalance_tpu.data.generators import tolerance_for_object

    path = os.path.join(root, "grasp_label", f"{obj:03d}_labels.npz")
    if not os.path.exists(path):
        return obj, "missing"
    lbl = np.load(path)
    tol = tolerance_for_object(
        lbl["points"].astype(np.float32),
        lbl["scores"].astype(np.float32),
        pos_ratio_thresh=pos_ratio,
        mu_thresh=mu,
    )
    np.save(os.path.join(out_dir, f"{obj:03d}_tolerance.npy"), tol)
    return obj, "ok"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset_root", required=True)
    p.add_argument("--out_dir", default="tolerance")
    p.add_argument("--pos_ratio_thresh", type=float, default=0.8)
    p.add_argument("--mu_thresh", type=float, default=0.55)
    p.add_argument("--num_workers", type=int, default=8)
    a = p.parse_args()
    os.makedirs(a.out_dir, exist_ok=True)
    jobs = [
        (a.dataset_root, a.out_dir, i, a.pos_ratio_thresh, a.mu_thresh)
        for i in range(88)
    ]
    with ProcessPoolExecutor(a.num_workers) as pool:
        for obj, status in pool.map(run_object, jobs):
            print(f"object {obj:03d}: {status}")


if __name__ == "__main__":
    main()
