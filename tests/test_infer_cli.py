"""Integration: the inference dump path over a fabricated dataset
(load_label=False loader -> pipeline -> graspnetAPI dump layout), plus a
one-batch overfit check (SURVEY.md §4 level 3)."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from graspbalance_tpu.data.dataset import GraspNetDataset, collate
from graspbalance_tpu.data.synthetic import make_batch
from graspbalance_tpu.eval.pipeline import GraspInference, to_grasp_group_array
from graspbalance_tpu.models.graspbalance import GraspBalance
from graspbalance_tpu.train.config import Config, ModelConfig, TrainConfig
from graspbalance_tpu.train import train_step as ts
from tests.test_data import fabricate_dataset
from tests.tiny import TINY_NUM_SEED, TINY_NUM_VIEW, TINY_SCENE, TINY_STAGES


def test_dataset_inference_dump(tmp_path):
    root = str(tmp_path / "gn")
    fabricate_dataset(root)
    ds = GraspNetDataset(
        root, [], {}, camera="realsense", split="all", num_points=256,
        load_label=False, remove_outlier=False,
    )
    assert len(ds) == 2
    batch = collate([ds[0], ds[1]])
    assert batch["point_clouds"].shape == (2, 256, 3)

    model = GraspBalance(
        num_view=TINY_NUM_VIEW, backbone_stages=TINY_STAGES, num_seed=TINY_NUM_SEED
    )
    cloud = jnp.asarray(batch["point_clouds"])
    v = model.init(jax.random.PRNGKey(0), {"point_clouds": cloud[:1]}, train=False)
    infer = GraspInference(model, v)
    grasps, keep = infer(cloud)

    # graspnetAPI dump layout: dump/scene_xxxx/<camera>/xxxx.npy
    dump = str(tmp_path / "dump")
    for j in range(2):
        scene, frame = ds.samples[j]
        out_dir = os.path.join(dump, scene, "realsense")
        os.makedirs(out_dir, exist_ok=True)
        arr = to_grasp_group_array(grasps[j], keep[j])
        np.save(os.path.join(out_dir, f"{frame:04d}.npy"), arr)
    loaded = np.load(os.path.join(dump, "scene_0000", "realsense", "0000.npy"))
    assert loaded.ndim == 2 and loaded.shape[1] == 17


def test_cli_checkpoint_restore_paths(tmp_path, monkeypatch, capsys):
    """Round-1 regression lock: drive infer.main()'s --checkpoint_dir and
    --best CLI paths (not just load_inference_variables) end-to-end against
    a real saved checkpoint + config.json."""
    import sys

    import infer
    from graspbalance_tpu.train.checkpoints import CheckpointManager
    from tests.test_train import tiny_setup

    cfg, model, state, batch = tiny_setup(2, tmp_path)
    step_fn = ts.make_train_step(model, cfg)
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    state, _ = step_fn(state, jbatch, jnp.int32(0))
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save_config(cfg)
    mgr.save(1, state, metrics={"loss": 1.0})  # also mirrors into best/
    mgr.close()

    base = [
        "infer.py", "--checkpoint_dir", str(tmp_path / "ckpt"),
        "--num_point", "256", "--batch_size", "2",
    ]
    monkeypatch.setattr(sys, "argv", base)
    infer.main()
    out = capsys.readouterr().out
    assert "restored checkpoint step 1" in out
    assert "synthetic smoke" in out

    monkeypatch.setattr(sys, "argv", base + ["--best"])
    infer.main()
    out = capsys.readouterr().out
    assert "restored checkpoint step 1" in out


def test_eval_ap_cli_end_to_end(tmp_path, monkeypatch, capsys):
    """eval_ap.py: checkpoint -> scene dump -> graspnetAPI call, with the
    (absent) package stubbed so the invocation path itself is exercised."""
    import sys
    import types

    import eval_ap
    from graspbalance_tpu.train.checkpoints import CheckpointManager
    from tests.test_train import tiny_setup

    root = str(tmp_path / "gn")
    fabricate_dataset(root)
    cfg, model, state, batch = tiny_setup(2, tmp_path)
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save_config(cfg)
    mgr.save(1, state)
    mgr.close()

    calls = {}

    class FakeEval:
        def __init__(self, root, camera, split):
            calls["init"] = (root, camera, split)

        def eval_all(self, dump_dir, proc):
            calls["eval"] = (dump_dir, proc)
            return np.zeros((1, 2, 6)), 0.125

    monkeypatch.setitem(
        sys.modules, "graspnetAPI", types.SimpleNamespace(GraspNetEval=FakeEval)
    )
    dump = str(tmp_path / "dump")
    eval_ap.main([
        "--dataset_root", root, "--checkpoint_dir", str(tmp_path / "ckpt"),
        "--split", "all", "--num_point", "256", "--batch_size", "2",
        "--dump_dir", dump, "--proc", "2",
    ])
    out = capsys.readouterr().out
    assert "restored checkpoint step" in out  # state.step is 0: untrained
    assert '"AP": 0.125' in out
    assert calls["init"] == (root, "realsense", "all")
    assert calls["eval"] == (dump, 2)
    assert os.path.exists(os.path.join(dump, "scene_0000", "realsense", "0000.npy"))
    assert os.path.exists(os.path.join(dump, "ap_result.json"))

    # --skip_dump path re-evaluates the existing dump without a model
    eval_ap.main([
        "--dataset_root", root, "--split", "all", "--dump_dir", dump,
        "--skip_dump", "--proc", "2",
    ])
    assert '"AP": 0.125' in capsys.readouterr().out

    # without graspnetAPI: prints offline instructions instead of failing
    monkeypatch.delitem(sys.modules, "graspnetAPI")
    import builtins

    real_import = builtins.__import__

    def no_gnapi(name, *a, **k):
        if name == "graspnetAPI":
            raise ImportError(name)
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_gnapi)
    eval_ap.main([
        "--dataset_root", root, "--split", "all", "--dump_dir", dump,
        "--skip_dump",
    ])
    assert "graspnetAPI not installed" in capsys.readouterr().out


def test_config_json_roundtrip(tmp_path):
    import json

    from graspbalance_tpu.train.config import (
        Config, ModelConfig, config_from_dict, config_to_dict,
    )

    cfg = Config(model=ModelConfig(
        num_view=TINY_NUM_VIEW, num_seed=TINY_NUM_SEED,
        backbone_stages=TINY_STAGES,
    ))
    restored = config_from_dict(json.loads(json.dumps(config_to_dict(cfg))))
    assert restored == cfg  # tuples (incl. nested stage rows) survive JSON
    # unknown keys from a newer build are ignored, not fatal
    d = config_to_dict(cfg)
    d["model"]["future_flag"] = 7
    assert config_from_dict(d) == cfg


def test_one_batch_overfit_improves_metrics():
    cfg = Config(
        model=ModelConfig(
            num_view=TINY_NUM_VIEW, num_seed=TINY_NUM_SEED,
            backbone_stages=TINY_STAGES,
        ),
        train=TrainConfig(learning_rate=3e-3),
    )
    batch_np = make_batch(21, 2, TINY_SCENE)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    model = ts.build_model(cfg)
    variables = model.init(jax.random.PRNGKey(0), batch, train=True)
    tx = ts.make_optimizer(cfg, steps_per_epoch=100)
    state = ts.TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        tx=tx,
    )
    step_fn = ts.make_train_step(model, cfg)
    first = last = None
    for i in range(25):
        state, metrics = step_fn(state, batch, jnp.int32(0))
        if i == 0:
            first = {k: float(v) for k, v in metrics.items()}
        last = {k: float(v) for k, v in metrics.items()}
    # overfit on the fixed batch (synthetic labels are random, so the view
    # MSE keeps a high irreducible floor; 25 warmup-lr steps reliably cut
    # the total by >15%)
    assert last["loss/overall_loss"] < 0.85 * first["loss/overall_loss"], (
        first["loss/overall_loss"], last["loss/overall_loss"],
    )
    assert last["loss/stage1_view_loss"] < first["loss/stage1_view_loss"]
    assert last["stage1_graspable_acc"] >= first["stage1_graspable_acc"]
