"""Closed-loop quality gate tests (VERDICT r3 #1) at CPU scale.

The production-scale version (full model, 20k points, TPU) is
tools/quality_gate.py; these tests pin the pieces that make it valid:
host/device label parity, the scorer's discrimination, the graspability
gate invariant that calibration showed is easy to silently break, and a
tiny end-to-end trained-beats-untrained run.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from graspbalance_tpu.data.synthetic import make_batch
from graspbalance_tpu.labels import analytic as an
from graspbalance_tpu.labels.geometry import THRESH_BAD
from tests.tiny import (
    TINY_NUM_SEED,
    TINY_NUM_VIEW,
    TINY_QUALITY_SCENE,
    TINY_SCENE,
    TINY_STAGES,
)


class TestAnalyticLabels:
    def test_host_and_device_expansion_agree(self):
        """The numpy tensors the host generator materializes and the jnp
        tensors the training step expands on device must agree — the
        device path is what production training consumes."""
        sc = dataclasses.replace(TINY_SCENE, analytic_labels=True)
        b = make_batch(0, 2, sc)
        eb = an.expand_batch_labels(
            {k: jnp.asarray(b[k]) for k in
             ("obj_sizes", "grasp_pt_obj", "grasp_pt_mask")},
            sc.num_views, sc.num_angles, sc.num_depths,
        )
        for k in ("grasp_labels", "grasp_widths", "grasp_tolerance"):
            np.testing.assert_allclose(
                np.asarray(eb[k]), b[k], rtol=0, atol=2e-7
            )

    def test_graspable_gate_invariant(self):
        """>10 template views must clear THRESH_BAD after the log-rescale at
        BOTH view counts (24 tiny / 300 production) — the _graspable_label
        gate (labels/losses.py:81). Round-4 calibration broke this twice:
        with too few good views the model CORRECTLY learns every seed as
        non-graspable and the gate starves."""
        for v in (TINY_NUM_VIEW, 300):
            align, _, u = an._view_grids(v, 12, 4, np)
            per_view = np.log(an.U_MAX / u).max(axis=(1, 2))  # best (a,d)
            assert (per_view > THRESH_BAD).sum() > 10, v

    def test_u_max_anchor_saturates(self):
        """Some graspable (align > ALIGN_MIN) cell must sit exactly at
        U_MAX so the batch-global u_max rescale has no batch-dependent
        shift (see ALIGN_MIN comment in labels/analytic.py)."""
        for v in (TINY_NUM_VIEW, 300):
            align, _, u = an._view_grids(v, 12, 4, np)
            graspable_views = align > an.ALIGN_MIN
            assert np.any(u[graspable_views] == an.U_MAX), v

    def test_graspable_label_equals_objectness_at_tiny_scale(self):
        """With the analytic rule, the robust graspable label reduces to
        seed objectness (every object point has >10 good views)."""
        from graspbalance_tpu.labels.label_gen import process_grasp_labels
        from graspbalance_tpu.labels.losses import _graspable_label

        sc = dataclasses.replace(TINY_SCENE, analytic_labels=True)
        b = make_batch(3, 2, sc)
        jb = {k: jnp.asarray(v) for k, v in b.items()}
        seed_xyz = jb["point_clouds"][:, :32, :]
        gl = process_grasp_labels(seed_xyz, jb)
        seed_obj = jb["objectness_label"][:, :32].astype(jnp.int32)
        g = _graspable_label(gl["batch_grasp_view_label"], seed_obj)
        np.testing.assert_array_equal(np.asarray(g), np.asarray(seed_obj))


class TestClosedLoop:
    def test_gate_machinery_runs_and_model_learns(self):
        """CPU-scale closed-loop coverage: the full gate machinery (train
        on device-expanded analytic labels -> GraspInference decode -> NMS
        -> collision -> analytic scoring) runs end-to-end at tiny scale,
        the training metrics show the analytic labels are genuinely being
        learned (graspable recall), and the evaluator returns finite
        metrics for trained and untrained params.

        The quantitative trained >> untrained assertion on DECODED grasps
        lives in tools/quality_gate.py at production scale (measured 133x
        at 300 steps, 180x at 1500 — docs/NOTES.md round 4): at tiny scale
        the eval-mode objectness gate is at the mercy of small-batch BN
        running-stat variance (B=2, deep stages with ~16 rows/batch;
        train-BN keeps survivors, eval-BN drops them — round-4
        calibration), so asserting decode survivorship here would pin the
        test to BN noise, not to grasp quality."""
        import dataclasses

        from graspbalance_tpu.eval.quality import evaluate_quality
        from graspbalance_tpu.train.config import (
            Config, DataConfig, ModelConfig, TrainConfig,
        )
        from graspbalance_tpu.train import train_step as ts

        # production-proportioned radii: TINY_STAGES radii were tuned for
        # the 0.3-extent legacy scene; on the compact quality scene they
        # swallow whole objects at stage 0 (round-4 calibration)
        radii = (0.04, 0.10, 0.20, 0.30)
        stages = tuple(
            (n, radii[i], k, m, b, 2 * radii[i], k2)
            for i, (n, r, k, m, b, r2, k2) in enumerate(TINY_STAGES)
        )
        cfg = Config(
            model=ModelConfig(
                num_view=TINY_NUM_VIEW, num_seed=TINY_NUM_SEED,
                backbone_stages=stages,
            ),
            data=DataConfig(analytic_labels=True),
            train=TrainConfig(max_epoch=1),
        )
        scene = TINY_QUALITY_SCENE
        batch0 = make_batch(0, 2, scene)
        model, state = ts.create_train_state(cfg, 100, batch0)
        untrained = {
            "params": state.params, "batch_stats": state.batch_stats
        }
        q0 = evaluate_quality(model, untrained, scene, num_batches=1,
                              batch_size=2)
        for v in q0.values():
            assert np.isfinite(v)

        step_fn = ts.make_train_step(model, cfg)
        pool = [
            {k: jnp.asarray(v) for k, v in make_batch(1 + i, 2, scene).items()}
            for i in range(2)
        ]
        # held-out batch for the quantitative gate below (seed far outside
        # the training stream)
        held = {
            k: jnp.asarray(v) for k, v in make_batch(500, 2, scene).items()
        }
        # probe on a COPY: step_fn donates the state buffers, so scoring
        # the current params on the held-out batch must not consume them
        def probe(state_):
            _, m = step_fn(jax.tree.map(jnp.copy, state_), held, jnp.int32(0))
            return m

        acc_untrained = float(probe(state)["stage1_graspable_acc"])

        recalls = []
        for i in range(100):
            state, metrics = step_fn(state, pool[i % 2], jnp.int32(0))
            recalls.append(float(metrics["stage1_graspable_recall"]))
        assert np.isfinite(float(metrics["loss/overall_loss"]))
        # the analytic labels are learnable: the graspable classifier must
        # find positives (max recall over the run — per-step recall is
        # noisy at tiny scale)
        assert max(recalls) > 0.2, recalls[-10:]

        # quantitative HELD-OUT gate (VERDICT r4 #3a): the graspable head
        # must classify seeds on unseen scenes far better trained than
        # untrained. Scored through the train-step metrics path (batch-BN
        # forward) because eval-mode BN running stats are pure noise at
        # B=2/60 steps (docstring above); the head's held-out skill is the
        # regression signal for "training stopped learning grasps".
        m_held1 = probe(state)
        acc_trained = float(m_held1["stage1_graspable_acc"])
        recall_trained = float(m_held1["stage1_graspable_recall"])
        assert acc_trained > 0.7, (acc_untrained, acc_trained)
        assert acc_trained > acc_untrained + 0.1, (acc_untrained, acc_trained)
        assert recall_trained > 0.3, recall_trained

        trained = {"params": state.params, "batch_stats": state.batch_stats}
        q1 = evaluate_quality(model, trained, scene, num_batches=1,
                              batch_size=2)
        for v in q1.values():
            assert np.isfinite(v)


class TestDSNClosedLoop:
    def test_dsn_gate_tiny_trained_beats_untrained(self):
        """CPU-scale closed-loop gate for the SECOND model family (the
        DSN->mean-shift balance mechanism, TrainModel/dsn.py:68-113): runs
        the same tools/dsn_quality_gate.run_dsn_gate the production TPU
        gate uses, at tiny shapes, and asserts the trained DSN separates
        foreground and objects far better than the untrained one.

        Deterministic (fixed scene seeds + PRNGKeys, CPU): measured
        trained fg_iou 0.796 / purity 0.972 vs untrained 0.546 / 0.880.
        The untrained fg_iou floor (~0.55) is the scene's foreground
        fraction — an untrained net that predicts everything foreground
        lands there, which is why the margin assertion matters.
        cluster_count_err is NOT asserted: at 512 points the mean-shift
        fragments objects into sub-clusters (purity stays high — the
        fragments are pure), a tiny-scale artifact the production gate
        does not show."""
        from tools.dsn_quality_gate import run_dsn_gate

        res = run_dsn_gate(
            steps=300, bs=2, num_points=512, eval_batches=2,
            max_objects=4, num_objects=3,
            pt_stages=((128, 0.1, 8, 32, 1), (64, 0.2, 8, 64, 1)),
            log=lambda *_: None,
        )
        tr, un = res["trained"], res["untrained"]
        assert tr["fg_iou"] > 0.7, res
        assert tr["fg_iou"] > un["fg_iou"] + 0.15, res
        assert tr["purity"] > 0.93, res
        assert tr["purity"] > un["purity"], res


class TestQualityScorer:
    def _scene(self):
        b = make_batch(0, 2, dataclasses.replace(
            TINY_SCENE, analytic_labels=True, emit_label_tensors=False
        ))
        return b, b["object_poses"][:, :, :, 3]

    def _grasps_at(self, centers_row, rot, width, depth, g=4):
        grasps = np.zeros((g, 17), np.float32)
        grasps[:, 4:13] = rot.reshape(-1)
        grasps[:, 13:16] = centers_row
        grasps[:, 1] = width
        grasps[:, 3] = depth
        return grasps

    def test_perfect_beats_garbage(self):
        b, centers = self._scene()
        # vertical approach (+z), closing +y, right-handed z = x cross y
        rot = np.array([[0, 0, -1], [0, 1, 0], [1, 0, 0]], np.float32)
        good = np.stack([
            self._grasps_at(centers[i, 0], rot, width=0.1, depth=0.01)
            for i in range(2)
        ])
        keep = np.ones((2, 4), bool)
        qg = an.analytic_grasp_quality(
            good, keep, centers, b["obj_sizes"], b["obj_mask"]
        )
        assert qg["quality_mean"] > 0.7
        assert qg["good_frac"] == 1.0
        assert qg["on_object_frac"] == 1.0

        bad = np.zeros((2, 4, 17), np.float32)
        bad[..., 4:13] = np.eye(3, dtype=np.float32).reshape(-1)
        bad[..., 13:16] = 5.0  # far off every object
        qb = an.analytic_grasp_quality(
            bad, keep, centers, b["obj_sizes"], b["obj_mask"]
        )
        assert qb["quality_mean"] == 0.0
        assert qb["on_object_frac"] == 0.0

    def test_zero_width_fails(self):
        """An untrained-style grasp (right place, zero opening) scores 0:
        the gripper cannot admit the object."""
        b, centers = self._scene()
        rot = np.array([[0, 0, -1], [0, 1, 0], [1, 0, 0]], np.float32)
        g = np.stack([
            self._grasps_at(centers[i, 0], rot, width=0.0, depth=0.01)
            for i in range(2)
        ])
        q = an.analytic_grasp_quality(
            np.asarray(g), np.ones((2, 4), bool), centers,
            b["obj_sizes"], b["obj_mask"]
        )
        assert q["on_object_frac"] == 1.0
        assert q["quality_mean"] == 0.0

    def test_sideways_approach_scores_low(self):
        b, centers = self._scene()
        # approach +x (horizontal): align = 0 -> not graspable
        rot = np.eye(3, dtype=np.float32)
        g = np.stack([
            self._grasps_at(centers[i, 0], rot, width=0.1, depth=0.01)
            for i in range(2)
        ])
        q = an.analytic_grasp_quality(
            g, np.ones((2, 4), bool), centers,
            b["obj_sizes"], b["obj_mask"]
        )
        assert q["quality_mean"] == 0.0

    def test_analytic_ap_ranking(self):
        """graspnetAPI-style analytic AP: all-good top-50 scores ~1, empty
        scores 0, and ranking matters — good grasps ranked ABOVE bad ones
        (by decode score, column 0) must beat the reverse ordering."""
        b, centers = self._scene()
        rot_good = np.array([[0, 0, -1], [0, 1, 0], [1, 0, 0]], np.float32)

        def scene_grasps(order_good_first):
            g = np.zeros((8, 17), np.float32)
            for j in range(8):
                good = j < 4 if order_good_first else j >= 4
                g[j, 4:13] = (rot_good if good else np.eye(3, dtype=np.float32)).reshape(-1)
                g[j, 13:16] = centers[0, 0] if good else 5.0
                g[j, 1] = 0.1
                g[j, 3] = 0.01
                # decode score column drives the AP ranking
                g[j, 0] = 1.0 - j * 0.1
            return g

        keep = np.ones((1, 8), bool)
        args = (centers[:1], b["obj_sizes"][:1], b["obj_mask"][:1])
        ap_good_first = an.analytic_average_precision(
            scene_grasps(True)[None], keep, *args
        )
        ap_bad_first = an.analytic_average_precision(
            scene_grasps(False)[None], keep, *args
        )
        assert ap_good_first > ap_bad_first > 0.0

        # all-good, more grasps than AP_TOP_K is capped and scores 1 at
        # every threshold the qualities clear
        g_all = np.stack([scene_grasps(True)[0]] * 60)
        g_all[:, 0] = 1.0
        g_all[:, 4:13] = rot_good.reshape(-1)
        g_all[:, 13:16] = centers[0, 0]
        ap_full = an.analytic_average_precision(
            g_all[None], np.ones((1, 60), bool), *args
        )
        assert ap_full > 0.9
        ap_empty = an.analytic_average_precision(
            g_all[None], np.zeros((1, 60), bool), *args
        )
        assert ap_empty == 0.0

    def test_keep_mask_weighting(self):
        b, centers = self._scene()
        rot = np.array([[0, 0, -1], [0, 1, 0], [1, 0, 0]], np.float32)
        g = np.stack([
            self._grasps_at(centers[i, 0], rot, width=0.1, depth=0.01)
            for i in range(2)
        ])
        keep = np.zeros((2, 4), bool)
        q = an.analytic_grasp_quality(
            g, keep, centers, b["obj_sizes"], b["obj_mask"]
        )
        assert q["kept"] == 0.0
        assert q["quality_mean"] == 0.0  # no survivors -> 0, not NaN
