"""Inference CLI: scenes -> decoded grasp arrays (+ optional graspnetAPI
dump for AP evaluation).

The reference repo has no committed eval/demo driver (SURVEY.md §0); this is
that driver. With --dataset_root it runs over GraspNet-1B test scenes and
writes per-frame (G, 17) npy files in the layout graspnetAPI's GraspNetEval
consumes (dump_folder/scene_xxxx/<camera>/xxxx.npy); without it, it runs a
synthetic smoke scene.
"""

import argparse

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint_dir", default="", help="orbax checkpoint dir")
    p.add_argument("--best", action="store_true",
                   help="restore the best-loss checkpoint instead of latest")
    p.add_argument("--dataset_root", default="")
    p.add_argument("--camera", default="realsense")
    p.add_argument("--split", default="test_seen")
    p.add_argument("--dump_dir", default="logs/dump")
    p.add_argument("--num_point", type=int, default=20000)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--obs", action="store_true", help="object-balanced sampling (needs DSN ckpt)")
    p.add_argument("--collision_thresh", type=float, default=0.05)
    p.add_argument("--max_scenes", type=int, default=0)
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp

    from graspbalance_tpu.train.config import Config, DataConfig
    from graspbalance_tpu.train.train_step import build_model
    from graspbalance_tpu.eval.pipeline import GraspInference

    cfg = Config(data=DataConfig(num_points=args.num_point))
    if args.checkpoint_dir:
        # rebuild the exact trained model from the config the trainer saved
        # next to the checkpoints (architecture is not stored in the weights)
        from graspbalance_tpu.train.checkpoints import load_config

        saved = load_config(args.checkpoint_dir)
        if saved is not None:
            import dataclasses

            cfg = dataclasses.replace(saved, data=cfg.data)
    from graspbalance_tpu.train.train_step import apply_trace_knobs

    apply_trace_knobs(cfg)  # restore the checkpoint's numerics knobs
    model = build_model(cfg)

    if args.checkpoint_dir:
        from graspbalance_tpu.train.checkpoints import load_inference_variables

        variables, step = load_inference_variables(
            args.checkpoint_dir, best=args.best
        )
        print(f"restored checkpoint step {step}")
    else:
        rng = np.random.default_rng(0)
        sample_cloud = jnp.asarray(
            rng.random((1, args.num_point, 3), dtype=np.float32) - 0.5
        )
        variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
            jax.random.PRNGKey(0), {"point_clouds": sample_cloud}
        )

    infer = GraspInference(model, variables, collision_thresh=args.collision_thresh)

    if not args.dataset_root:
        from graspbalance_tpu.data.synthetic import SceneConfig, make_batch

        batch = make_batch(0, args.batch_size, SceneConfig(num_points=args.num_point))
        grasps, keep = infer(jnp.asarray(batch["point_clouds"]))
        print(f"synthetic smoke: {keep.sum()} grasps kept of {keep.size}")
        return

    from graspbalance_tpu.data.dataset import GraspNetDataset
    from graspbalance_tpu.eval.pipeline import dump_dataset

    ds = GraspNetDataset(
        args.dataset_root, [], {}, camera=args.camera, split=args.split,
        num_points=args.num_point, load_label=False,
    )
    dump_dataset(
        infer, ds, args.dump_dir, args.camera, batch_size=args.batch_size,
        max_frames=args.max_scenes * 256 if args.max_scenes else 0,
    )
    print(
        "done. evaluate with graspnetAPI:\n"
        "  from graspnetAPI import GraspNetEval\n"
        f"  ge = GraspNetEval(root='{args.dataset_root}', camera='{args.camera}', split='{args.split}')\n"
        f"  ge.eval_seen('{args.dump_dir}', proc=24)"
    )


if __name__ == "__main__":
    main()
