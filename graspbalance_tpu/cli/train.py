"""Training CLI (the reference train.py equivalent).

Same flag surface where it makes sense (train.py:21-38); data comes from the
GraspNet-1B loader when --dataset_root is given, otherwise from the
synthetic scene generator (smoke runs, benchmarks).
"""

import argparse


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset_root", default="", help="GraspNet-1B root (empty = synthetic data)")
    p.add_argument("--camera", default="realsense", choices=["realsense", "kinect"])
    p.add_argument("--log_dir", default="logs/graspbalance_tpu")
    p.add_argument("--num_point", type=int, default=20000)
    p.add_argument("--num_view", type=int, default=300)
    p.add_argument("--max_epoch", type=int, default=18)
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--learning_rate", type=float, default=1e-3)
    p.add_argument("--weight_decay", type=float, default=0.0)
    p.add_argument("--bn_decay_step", type=int, default=2)
    p.add_argument("--bn_decay_rate", type=float, default=0.5)
    p.add_argument("--num_workers", type=int, default=2)
    p.add_argument("--ncm", action="store_true", default=True, help="noisy-clean mix")
    p.add_argument("--no-ncm", dest="ncm", action="store_false")
    p.add_argument("--backbone", default="drp", choices=["drp", "pointnet2"])
    p.add_argument(
        "--dtype", default="float32", choices=["float32", "bfloat16"],
        help="model compute dtype (params/BN stats stay f32). bfloat16 cuts "
        "the v5e train step ~23%% with an equivalent loss curve "
        "(docs/NOTES.md); default f32 for reference parity",
    )
    p.add_argument(
        "--width_mlp_dtype", default=None, choices=[None, "bfloat16"],
        help="compute dtype of the stage-2 scale MLPs only; bfloat16 cuts "
        "the train step ~17%% on v5e (non-parity speed knob, docs/NOTES.md)",
    )
    p.add_argument("--synthetic_steps", type=int, default=50,
                   help="steps/epoch when running on synthetic data")
    p.add_argument(
        "--synthetic_analytic", action="store_true",
        help="synthetic labels are an analytic function of scene geometry "
        "(labels/analytic.py) expanded on device — the learnable target "
        "behind the closed-loop quality gate (tools/quality_gate.py)",
    )
    p.add_argument(
        "--synthetic_varied_labels", action="store_true",
        help="draw per-scene synthetic label tensors (slower host datagen); "
        "default shares one base tensor across scenes (static_labels)",
    )
    return p.parse_args()


def main():
    args = parse_args()
    from graspbalance_tpu.train.config import (
        Config, DataConfig, ModelConfig, TrainConfig,
    )

    cfg = Config(
        model=ModelConfig(
            num_view=args.num_view, backbone=args.backbone, dtype=args.dtype,
            width_mlp_dtype=args.width_mlp_dtype,
        ),
        data=DataConfig(
            dataset_root=args.dataset_root,
            camera=args.camera,
            num_points=args.num_point,
            batch_size=args.batch_size,
            num_workers=args.num_workers,
            ncm=args.ncm,
            analytic_labels=args.synthetic_analytic and not args.dataset_root,
        ),
        train=TrainConfig(
            max_epoch=args.max_epoch,
            learning_rate=args.learning_rate,
            weight_decay=args.weight_decay,
            bn_decay_step=args.bn_decay_step,
            bn_decay_rate=args.bn_decay_rate,
            log_dir=args.log_dir,
        ),
    )

    from graspbalance_tpu.train.loop import train

    if args.dataset_root:
        from graspbalance_tpu.data.dataset import make_dataloaders

        train_batches, eval_batches, steps = make_dataloaders(cfg)
        train(cfg, train_batches, eval_batches, steps_per_epoch=steps)
    else:
        from graspbalance_tpu.data.synthetic import SceneConfig, make_batch

        scene = SceneConfig(
            num_points=args.num_point,
            num_views=args.num_view,
            static_labels=not args.synthetic_varied_labels,
            analytic_labels=args.synthetic_analytic,
            emit_label_tensors=not args.synthetic_analytic,
        )
        steps = args.synthetic_steps

        def train_batches(epoch):
            for i in range(steps):
                yield make_batch(epoch * steps + i, args.batch_size, scene)

        train(cfg, train_batches, steps_per_epoch=steps)


if __name__ == "__main__":
    main()
