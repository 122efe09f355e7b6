"""One-command GraspNet-1B AP evaluation (VERDICT r2 item 7).

checkpoint (orbax dir or ported-torch pickle) -> scene loop -> GraspGroup-
layout dumps -> graspnetAPI GraspNetEval, guarded by availability: the
moment the dataset + graspnetAPI package exist, AP is

    python eval_ap.py --dataset_root /data/graspnet --checkpoint_dir logs/...

The reference has no committed equivalent (SURVEY.md §0: its README
describes calling graspnetAPI by hand, /root/reference/README.md:299-304);
this driver also accepts weights ported straight from a reference
checkpoint.tar (tools/port_torch_ckpt.py) for cross-implementation AP
parity runs.
"""

import argparse
import json
import os
import pickle


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    src = p.add_mutually_exclusive_group()
    src.add_argument("--checkpoint_dir", default="", help="orbax checkpoint dir (trained here)")
    src.add_argument("--ported_pkl", default="",
                     help="{'params','batch_stats'} pickle from tools/port_torch_ckpt.py")
    p.add_argument("--best", action="store_true", help="best-loss checkpoint instead of latest")
    p.add_argument("--dataset_root", required=True)
    p.add_argument("--camera", default="realsense", choices=["realsense", "kinect"])
    p.add_argument("--split", default="test_seen",
                   choices=["test_seen", "test_similar", "test_novel", "test", "all"])
    p.add_argument("--dump_dir", default="logs/dump_ap")
    p.add_argument("--num_point", type=int, default=20000)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--collision_thresh", type=float, default=0.05)
    p.add_argument("--max_frames", type=int, default=0, help="cap frames (0 = all)")
    p.add_argument("--proc", type=int, default=24, help="graspnetAPI eval workers")
    p.add_argument("--skip_dump", action="store_true",
                   help="evaluate an existing --dump_dir without re-running inference")
    return p.parse_args(argv)


def _load_variables(args, cfg):
    """-> (variables, cfg) — cfg possibly replaced by the checkpoint's."""
    if args.ported_pkl:
        with open(args.ported_pkl, "rb") as f:
            return pickle.load(f), cfg
    if args.checkpoint_dir:
        import dataclasses

        from graspbalance_tpu.train.checkpoints import (
            load_config,
            load_inference_variables,
        )

        saved = load_config(args.checkpoint_dir)
        if saved is not None:
            cfg = dataclasses.replace(saved, data=cfg.data)
        variables, step = load_inference_variables(args.checkpoint_dir, best=args.best)
        print(f"restored checkpoint step {step}")
        return variables, cfg
    raise SystemExit("need --checkpoint_dir or --ported_pkl (or --skip_dump)")


def evaluate_dump(args):
    """graspnetAPI stage; returns the AP dict or None when unavailable."""
    try:
        from graspnetAPI import GraspNetEval  # noqa: F401  (not vendored here)
    except ImportError:
        print(
            "graspnetAPI not installed — dump is ready for offline eval:\n"
            "  from graspnetAPI import GraspNetEval\n"
            f"  ge = GraspNetEval(root='{args.dataset_root}', camera='{args.camera}', split='{args.split}')\n"
            f"  ge.{_EVAL_METHOD.get(args.split, 'eval_all')}('{args.dump_dir}', proc={args.proc})"
        )
        return None
    ge = GraspNetEval(root=args.dataset_root, camera=args.camera, split=args.split)
    method = getattr(ge, _EVAL_METHOD.get(args.split, "eval_all"))
    res, ap = method(args.dump_dir, proc=args.proc)
    out = {"split": args.split, "camera": args.camera, "AP": float(ap)}
    with open(os.path.join(args.dump_dir, "ap_result.json"), "w") as f:
        json.dump(out, f)
    import numpy as np

    np.save(os.path.join(args.dump_dir, "ap_accuracy.npy"), res)
    print(json.dumps(out))
    return out


_EVAL_METHOD = {
    "test_seen": "eval_seen",
    "test_similar": "eval_similar",
    "test_novel": "eval_novel",
    "test": "eval_all",
    "all": "eval_all",
}


def main(argv=None):
    args = parse_args(argv)
    if not args.skip_dump:
        from graspbalance_tpu.data.dataset import GraspNetDataset
        from graspbalance_tpu.eval.pipeline import GraspInference, dump_dataset
        from graspbalance_tpu.train.config import Config, DataConfig
        from graspbalance_tpu.train.train_step import build_model

        cfg = Config(data=DataConfig(num_points=args.num_point))
        variables, cfg = _load_variables(args, cfg)
        # apply trace-time numerics knobs unconditionally on the FINAL cfg
        # (advisor r4: the checkpoint branch used to apply them mid-load and
        # the ported/no-checkpoint paths not at all), with the eval-side
        # data-shard count (single-host inference: 1) so a checkpoint
        # trained on a sharded mesh doesn't impose its wider query chunking
        from graspbalance_tpu.train.train_step import apply_trace_knobs

        apply_trace_knobs(cfg, n_data_shards=1)
        model = build_model(cfg)
        infer = GraspInference(
            model, variables, collision_thresh=args.collision_thresh
        )
        ds = GraspNetDataset(
            args.dataset_root, [], {}, camera=args.camera, split=args.split,
            num_points=args.num_point, load_label=False,
        )
        n = dump_dataset(
            infer, ds, args.dump_dir, args.camera,
            batch_size=args.batch_size, max_frames=args.max_frames,
        )
        print(f"dumped {n} frames to {args.dump_dir}")
    evaluate_dump(args)


if __name__ == "__main__":
    main()
