"""DSN instance-segmentation training CLI.

The reference's DSN cannot even be constructed upstream (its point
transformer module is missing, SURVEY.md §0); this driver trains our DSN
(models/dsn.py) with the weighted seg losses on GraspNet-1B (or synthetic
scenes), producing the checkpoint the OBS inference path consumes.
"""

import argparse


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset_root", default="")
    p.add_argument("--camera", default="realsense")
    p.add_argument("--log_dir", default="logs/dsn")
    p.add_argument("--num_point", type=int, default=20000)
    p.add_argument("--max_epoch", type=int, default=10)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--learning_rate", type=float, default=1e-3)
    p.add_argument("--max_objects", type=int, default=16)
    p.add_argument("--synthetic_steps", type=int, default=50)
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from graspbalance_tpu.labels.seg_losses import get_seg_loss
    from graspbalance_tpu.models.dsn import DSN, compute_center_offset_labels
    from graspbalance_tpu.parallel.mesh import make_mesh, shard_batch
    from graspbalance_tpu.train.checkpoints import CheckpointManager
    from graspbalance_tpu.train.metrics import MetricAggregator, MetricLogger

    n_cls = args.max_objects + 1
    model = DSN()

    if args.dataset_root:
        from graspbalance_tpu.train.config import Config, DataConfig

        cfg = Config(
            data=DataConfig(
                dataset_root=args.dataset_root, camera=args.camera,
                num_points=args.num_point, batch_size=args.batch_size,
                max_objects=args.max_objects,
            )
        )
        from graspbalance_tpu.data.dataset import make_dataloaders

        train_batches, _, steps = make_dataloaders(cfg)
    else:
        from graspbalance_tpu.data.synthetic import SceneConfig, make_batch

        scene = SceneConfig(num_points=args.num_point)
        steps = args.synthetic_steps

        def train_batches(epoch):
            for i in range(steps):
                yield make_batch(epoch * steps + i, args.batch_size, scene)

    sample = next(iter(train_batches(0)))
    cloud = jnp.asarray(sample["point_clouds"][..., :3])
    variables = model.init(jax.random.PRNGKey(0), cloud, train=True)
    tx = optax.adam(
        optax.cosine_onecycle_schedule(
            args.max_epoch * steps, args.learning_rate, pct_start=0.3
        )
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = tx.init(params)

    @jax.jit
    def step(params, batch_stats, opt_state, batch):
        cloud = batch["point_clouds"][..., :3]
        instance = batch["instance_label"].astype(jnp.int32)

        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": batch_stats},
                cloud, train=True, mutable=["batch_stats"],
            )
            ep = {
                **out,
                "foreground_label": (instance > 0).astype(jnp.int32),
                "instance_label": instance,
                "center_offset_label": compute_center_offset_labels(
                    cloud, instance, args.max_objects
                ),
            }
            loss, metrics = get_seg_loss(ep, n_cls)
            return loss, (metrics, mut["batch_stats"])

        (loss, (metrics, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_stats, new_opt, metrics

    mesh = make_mesh()
    logger = MetricLogger(args.log_dir, "train")
    ckpt = CheckpointManager(args.log_dir + "/checkpoints")
    with mesh:
        global_step = 0
        for epoch in range(args.max_epoch):
            agg = MetricAggregator()
            for batch in train_batches(epoch):
                batch = shard_batch(
                    {k: np.asarray(v) for k, v in batch.items()
                     if k in ("point_clouds", "instance_label")},
                    mesh,
                )
                params, batch_stats, opt_state, metrics = step(
                    params, batch_stats, opt_state, batch
                )
                agg.update(metrics)
                global_step += 1
                if global_step % 10 == 0:
                    logger.log(global_step, agg.flush())
            from graspbalance_tpu.train.train_step import TrainState

            ckpt.save(
                global_step,
                TrainState(
                    step=jnp.int32(global_step), params=params,
                    batch_stats=batch_stats, opt_state=opt_state, tx=tx,
                ),
                extra={"epoch": epoch + 1},
            )
    ckpt.close()
    logger.close()


if __name__ == "__main__":
    main()
