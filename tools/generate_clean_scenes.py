"""Clean-scene generation CLI (reference generate_clean_data.py driver).

Projects CAD models + a synthetic table into each frame's camera, crops to
the observed cloud, writes clean_scenes/<scene>/<camera>/{points,seg}/*.npy.
Parallel over frames with a process pool.
"""

import argparse
import os
import sys
from concurrent.futures import ProcessPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_frame(args):
    root, scene, frame, camera = args
    from graspbalance_tpu.data.generators import generate_clean_scene_frame

    generate_clean_scene_frame(root, scene, frame, camera, model_cache={})
    return scene, frame


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset_root", required=True)
    p.add_argument("--camera", default="kinect")
    p.add_argument("--scene_start", type=int, default=0)
    p.add_argument("--scene_end", type=int, default=190)
    p.add_argument("--num_workers", type=int, default=30)
    a = p.parse_args()

    jobs = []
    for s in range(a.scene_start, a.scene_end):
        scene = f"scene_{s:04d}"
        if not os.path.isdir(os.path.join(a.dataset_root, "scenes", scene)):
            continue
        for f in range(256):
            jobs.append((a.dataset_root, scene, f, a.camera))
    with ProcessPoolExecutor(a.num_workers) as pool:
        for i, done in enumerate(pool.map(run_frame, jobs, chunksize=4)):
            if i % 100 == 0:
                print(f"{i}/{len(jobs)}", done)


if __name__ == "__main__":
    main()
