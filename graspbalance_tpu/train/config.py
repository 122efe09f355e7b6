"""One dataclass config tree (replaces the reference's argparse-only flags,
train.py:21-38, and its hard-coded architecture constants)."""

from __future__ import annotations

import dataclasses
from typing import Sequence


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    num_view: int = 300
    num_angle: int = 12
    num_depth: int = 4
    cylinder_radius: float = 0.08
    hmin: float = -0.02
    hmax_list: Sequence[float] = (0.01, 0.02, 0.03, 0.04)
    backbone: str = "drp"  # 'drp' | 'pointnet2'
    backbone_stages: tuple | None = None  # None = full-size stage table
    num_seed: int = 1024
    query_order: str = "index"  # 'index' (reference parity) | 'nearest'
    dtype: str = "float32"  # compute dtype: 'float32' | 'bfloat16'
    # stage-2 scale-MLP compute dtype (None = follow `dtype`): bf16 is a
    # measured 1.8x on these MLPs on v5e while leaving the rest f32
    width_mlp_dtype: str | None = None
    # label pipeline: 'full' (reference layout in end_points; default — the
    # one-hot einsum path measured equal-or-faster) | 'reduced' (bit-exact
    # through the loss, skips the view-permuted (B,Ns,V,A,D)
    # materializations; ~1.4 GB/step less live memory at bs=8 but
    # perf-neutral at bs=8 and -4% at bs=2, docs/NOTES.md).
    # GB_LABEL_IMPL env overrides for A/B.
    label_impl: str = "full"
    # --- trace-time numerics knobs (VERDICT r3 #7) ---
    # These bake into the jaxpr via module-level setters (ops/query.py,
    # ops/gather.py); as config fields they are captured by config_to_dict,
    # stored with every checkpoint (CheckpointManager.save_config), and
    # re-applied on restore (apply_trace_knobs) — so a checkpoint fully
    # records the numerics-affecting state it was trained under. The
    # matching GB_* envs remain one-off A/B overrides.
    # gather/group_points backward: 'xla' | 'sorted' | 'onehot' | 'pallas'
    # (all measured, docs/NOTES.md; 'xla' is the fastest-overall default)
    gather_vjp: str = "xla"
    # query batch-vmap chunk; None = 4 * n_data_shards (the v5e
    # reduce-fusion fast-path shape scaled to span whole mesh shards)
    query_batch_chunk: int | None = None
    # _tile_count as MXU matvec (measured neutral on v5e; A/B knob)
    count_matmul: bool = False
    # slot-tile extraction matmul grouping (1 = per-combo, the measured
    # e2e optimum; >1 only for A/B — docs/NOTES.md round-3 negative)
    query_extract_group: int = 1


@dataclasses.dataclass(frozen=True)
class DataConfig:
    dataset_root: str = ""
    camera: str = "realsense"  # 'realsense' | 'kinect'
    num_points: int = 20000
    max_objects: int = 16
    max_grasp_points: int = 4096
    batch_size: int = 2
    num_workers: int = 2
    ncm: bool = True  # noisy-clean per-object mix augmentation
    augment: bool = True
    precompute_fps: bool = True  # host-side FPS indices in the loader
    # synthetic analytic labels (labels/analytic.py): the training step
    # expands the (B, P, V, A, D) label tensors on device from the small
    # geometry arrays (obj_sizes/grasp_pt_obj) when the batch doesn't carry
    # them — the host never builds or uploads ~1.4 GB/step of tensors
    analytic_labels: bool = False


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    max_epoch: int = 18
    learning_rate: float = 1e-3
    weight_decay: float = 0.0
    # run the optimizer on one flat vector instead of ~490 per-tensor update
    # ops (optax.flatten; same elementwise math, -7% step time on v5e).
    # Changes the opt_state checkpoint layout — flip only between runs.
    opt_flatten: bool = True
    bn_momentum_init: float = 0.5
    bn_decay_rate: float = 0.5
    bn_decay_step: int = 2
    bn_momentum_floor: float = 0.001
    log_dir: str = "logs/graspbalance_tpu"
    log_every: int = 10
    checkpoint_every_epochs: int = 1
    seed: int = 0
    n_data_shards: int | None = None  # None = all devices
    # stop the epoch loop after this many epochs WITHOUT changing max_epoch
    # (so the OneCycle schedule total is unchanged) — simulates preemption
    # at an epoch boundary for resume-continuity validation. A first
    # harness that lowered max_epoch instead produced a different LR
    # schedule for the pre-kill steps and params could never match.
    stop_after_epochs: int | None = None
    profile_steps: int = 0  # >0: jax.profiler trace that many steps
    # (starting at step `profile_start` of the first epoch, after warmup)
    profile_start: int = 10


@dataclasses.dataclass(frozen=True)
class Config:
    model: ModelConfig = ModelConfig()
    data: DataConfig = DataConfig()
    train: TrainConfig = TrainConfig()


def config_to_dict(cfg: Config) -> dict:
    """JSON-serializable dict (tuples become lists; from_dict restores them)."""
    return dataclasses.asdict(cfg)


def config_from_dict(d: dict) -> Config:
    """Inverse of config_to_dict; ignores unknown keys (forward compat) so a
    checkpoint written by a newer build still restores."""

    def tuplify(v):
        # JSON has no tuple; every sequence-valued config field is a tuple
        # (hmax_list, backbone_stages incl. nested stage rows)
        if isinstance(v, list):
            return tuple(tuplify(x) for x in v)
        return v

    def build(cls, sub: dict):
        names = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: tuplify(v) for k, v in sub.items() if k in names})

    return Config(
        model=build(ModelConfig, d.get("model", {})),
        data=build(DataConfig, d.get("data", {})),
        train=build(TrainConfig, d.get("train", {})),
    )
