"""Trainer resume, gradient accumulation, and viz tests."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest


def test_gradient_accumulation_matches_big_batch():
    """optax.MultiSteps(k=2) over two half-batches == one full batch step."""
    from regtr_tpu.models import create_model, init_model_params
    from regtr_tpu.presets import tiny_config
    from regtr_tpu.train.optim import make_optimizer
    from regtr_tpu.train.steps import TrainState, make_train_step

    rng = np.random.RandomState(0)
    n0 = 96

    def batch(n_pairs, seed):
        r = np.random.RandomState(seed)
        return {
            "points": jnp.asarray(r.rand(2 * n_pairs, n0, 3).astype(np.float32) - 0.5),
            "mask": jnp.ones((2 * n_pairs, n0), bool),
            "pose": jnp.broadcast_to(jnp.eye(3, 4), (n_pairs, 3, 4)),
            "overlap0": jnp.ones((2 * n_pairs, n0), jnp.float32),
        }

    cfg = tiny_config(base_lr=1e-3, scheduler="none", grad_accum_steps=2)
    model = create_model(cfg, n0)
    variables = init_model_params(model, jax.random.PRNGKey(0))
    tx = make_optimizer(cfg)
    state = TrainState.create(apply_fn=model.apply,
                              params=variables["params"], tx=tx)
    step = make_train_step(model, donate=False)
    p0 = jax.tree_util.tree_leaves(state.params)[0].copy()
    state, _ = step(state, batch(1, 1))
    # after 1 of 2 accumulation micro-steps params must be unchanged
    p1 = jax.tree_util.tree_leaves(state.params)[0]
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    state, _ = step(state, batch(1, 2))
    p2 = jax.tree_util.tree_leaves(state.params)[0]
    assert not np.array_equal(np.asarray(p0), np.asarray(p2))


def test_checkpoint_manager_best_retention(tmp_path):
    from regtr_tpu.train.checkpoints import CheckpointManager

    mgr = CheckpointManager(tmp_path / "ck", max_to_keep=2)
    state = {"w": jnp.arange(4.0), "step": jnp.asarray(0)}
    mgr.save(1, {**state, "step": jnp.asarray(1)}, score=0.5)
    mgr.save(2, {**state, "step": jnp.asarray(2)}, score=0.9)
    mgr.save(3, {**state, "step": jnp.asarray(3)}, score=0.7)
    assert mgr.best_record()["step"] == 2
    restored, step = mgr.restore(state)
    assert step == 3  # latest
    assert int(restored["step"]) == 3
    mgr.close()


def test_trainer_restore_from_foreign_run_dir(tmp_path):
    """`--resume <old run dir>` with a fresh --logdir restores the OLD run's
    checkpoint (reference directory-resume, torch_helpers.py:195-242) —
    regression test: fit() used to restore from the new run's empty ckpt/."""
    from regtr_tpu.presets import tiny_config
    from regtr_tpu.train.checkpoints import CheckpointManager
    from regtr_tpu.train.trainer import Trainer

    old_run = tmp_path / "old_run"
    src = CheckpointManager(old_run / "ckpt")
    state = {"w": jnp.arange(4.0) * 3, "step": jnp.asarray(0)}
    src.save(7, {**state, "step": jnp.asarray(7)}, score=0.5)
    src.close()

    trainer = Trainer(tiny_config(), tmp_path / "new_run")
    # run-dir form: <run>/ckpt resolved automatically
    restored, step = trainer.restore_from(old_run, state)
    assert step == 7 and int(restored["step"]) == 7
    # explicit ckpt-dir form
    restored, step = trainer.restore_from(old_run / "ckpt", state)
    assert step == 7
    np.testing.assert_array_equal(np.asarray(restored["w"]),
                                  np.arange(4.0) * 3)
    # own ckpt dir falls back to the existing saver
    trainer.saver.save(2, {**state, "step": jnp.asarray(2)})
    restored, step = trainer.restore_from(trainer.saver.directory, state)
    assert step == 2
    trainer.saver.close()


def test_viz_outputs(tmp_path):
    from regtr_tpu.utils.viz import visualize_registration
    from regtr_tpu.core import se3_np

    rng = np.random.RandomState(1)
    src = rng.rand(200, 3).astype(np.float32)
    pose = se3_np.se3_init(se3_np.sample_uniform_rotation(rng),
                           rng.randn(3).astype(np.float32) * 0.1)
    tgt = se3_np.se3_transform(pose, src)
    out = visualize_registration(
        src, tgt, pose, tmp_path, pose_gt=pose,
        overlap_conf=rng.rand(200).astype(np.float32),
    )
    assert (tmp_path / "reg_1_input.ply").exists()
    assert (tmp_path / "reg_2_pred.ply").exists()
    assert (tmp_path / "reg_3_gt.ply").exists()
    assert (tmp_path / "reg_4_overlap.ply").exists()
    assert (tmp_path / "reg.png").exists()
    # PLY roundtrip sanity
    from regtr_tpu.utils.ply import read_ply_xyz

    pts = read_ply_xyz(tmp_path / "reg_2_pred.ply")
    assert pts.shape == (400, 3)


def test_multi_bucket_training_flow():
    """Batches arriving in different buckets recompile once per bucket and
    keep training (the jit cache handles shape polymorphism)."""
    from regtr_tpu.models import create_model, init_model_params
    from regtr_tpu.presets import tiny_config
    from regtr_tpu.train.optim import make_optimizer
    from regtr_tpu.train.steps import TrainState, make_train_step

    cfg = tiny_config(base_lr=1e-3, scheduler="none")
    model = create_model(cfg, 128)  # spec sized for the max bucket
    variables = init_model_params(model, jax.random.PRNGKey(0))
    tx = make_optimizer(cfg)
    state = TrainState.create(apply_fn=model.apply,
                              params=variables["params"], tx=tx)
    step = make_train_step(model, donate=False)

    def batch(n0, seed):
        r = np.random.RandomState(seed)
        return {
            "points": jnp.asarray(r.rand(2, n0, 3).astype(np.float32) - 0.5),
            "mask": jnp.ones((2, n0), bool),
            "pose": jnp.broadcast_to(jnp.eye(3, 4), (1, 3, 4)),
            "overlap0": jnp.ones((2, n0), jnp.float32),
        }

    for n0, seed in [(64, 0), (128, 1), (64, 2), (128, 3)]:
        state, metrics = step(state, batch(n0, seed))
        assert np.isfinite(float(metrics["total"])), n0


def test_nan_batch_skips_update_in_graph():
    """A batch producing a non-finite loss must leave params AND opt state
    unchanged (reference trainer.py:129-132 skips before stepping), and the
    step must report update_skipped=1."""
    from regtr_tpu.models import create_model, init_model_params
    from regtr_tpu.presets import tiny_config
    from regtr_tpu.train.optim import make_optimizer
    from regtr_tpu.train.steps import TrainState, make_train_step

    n0 = 96
    r = np.random.RandomState(3)
    good = {
        "points": jnp.asarray(r.rand(2, n0, 3).astype(np.float32) - 0.5),
        "mask": jnp.ones((2, n0), bool),
        "pose": jnp.broadcast_to(jnp.eye(3, 4), (1, 3, 4)),
        "overlap0": jnp.ones((2, n0), jnp.float32),
    }
    bad = dict(good)
    pts = np.asarray(good["points"]).copy()
    pts[0, 5] = np.nan
    bad["points"] = jnp.asarray(pts)

    cfg = tiny_config(base_lr=1e-3, scheduler="none")
    model = create_model(cfg, n0)
    variables = init_model_params(model, jax.random.PRNGKey(0))
    state = TrainState.create(apply_fn=model.apply,
                              params=variables["params"],
                              tx=make_optimizer(cfg))
    step = make_train_step(model, donate=False)

    state1, m_bad = step(state, bad)
    assert float(m_bad["update_skipped"]) == 1.0
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(state1.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(state1.step) == int(state.step)

    state2, m_good = step(state1, good)
    assert float(m_good["update_skipped"]) == 0.0
    assert int(state2.step) == int(state1.step) + 1
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(state1.params),
                        jax.tree_util.tree_leaves(state2.params))
    )
    assert changed


def test_combine_process_sums():
    """Cross-process metric reduction equals pooling all samples directly."""
    from regtr_tpu.train.logging_utils import combine_process_sums

    rng = np.random.RandomState(0)
    # 3 processes, 2 metrics, uneven per-process sample counts
    samples = [[rng.rand(n) for n in (5, 3)],
               [rng.rand(n) for n in (2, 7)],
               [rng.rand(n) for n in (4, 1)]]
    gathered = np.array([
        [[s.sum(), len(s)] for s in proc] for proc in samples
    ])
    got = combine_process_sums(gathered)
    for k in range(2):
        pooled = np.concatenate([samples[p][k] for p in range(3)])
        np.testing.assert_allclose(got[k], pooled.mean())
    # zero-count metric stays finite
    empty = combine_process_sums(np.zeros((2, 1, 2)))
    assert empty[0] == 0.0


def test_merge_est_log_dirs(tmp_path):
    from regtr_tpu.evaluation import merge_est_log_dirs

    for rank, scenes in [(0, {"sceneA": "a0\n", "sceneB": "b0\n"}),
                         (1, {"sceneA": "a1\n"})]:
        for scene, text in scenes.items():
            d = tmp_path / f"est_rank{rank}" / "3DMatch" / scene
            d.mkdir(parents=True)
            (d / "est.log").write_text(text)

    merged = tmp_path / "3DMatch"
    merge_est_log_dirs(
        [tmp_path / "est_rank0" / "3DMatch", tmp_path / "est_rank1" / "3DMatch"],
        merged,
    )
    assert (merged / "sceneA" / "est.log").read_text() == "a0\na1\n"
    assert (merged / "sceneB" / "est.log").read_text() == "b0\n"


def test_eval_step_per_pair_histograms(tmp_path):
    """Eval step returns per-pair 'hist/' errors; MetricsWriter emits
    quantile summaries (reference generic_reg_model.py:119-123)."""
    import json

    from regtr_tpu.models import create_model, init_model_params
    from regtr_tpu.presets import tiny_config
    from regtr_tpu.train.logging_utils import MetricsWriter
    from regtr_tpu.train.steps import make_eval_step

    n0, pairs = 96, 2
    cfg = tiny_config()
    model = create_model(cfg, n0)
    variables = init_model_params(model, jax.random.PRNGKey(0))
    r = np.random.RandomState(0)
    batch = {
        "points": jnp.asarray(r.rand(2 * pairs, n0, 3).astype(np.float32)),
        "mask": jnp.ones((2 * pairs, n0), bool),
        "pose": jnp.broadcast_to(jnp.eye(3, 4), (pairs, 3, 4)),
        "overlap0": jnp.ones((2 * pairs, n0), jnp.float32),
    }
    metrics = make_eval_step(model)(variables["params"], batch)
    assert metrics["hist/rot_err_deg"].shape == (pairs,)
    assert metrics["hist/trans_err"].shape == (pairs,)

    w = MetricsWriter(tmp_path, "val")
    w.write_histogram(7, "hist/rot_err_deg",
                      np.asarray(metrics["hist/rot_err_deg"]))
    w.close()
    recs = [json.loads(line) for line in
            open(tmp_path / "metrics_val.jsonl")]
    assert recs[-1]["tag"] == "hist/rot_err_deg"
    assert recs[-1]["count"] == pairs
    assert np.isfinite(recs[-1]["p90"])


def test_trainer_survives_bad_batches(tmp_path):
    """A raising batch is skipped and logged (reference trainer.py:137-141);
    persistent failure still raises."""
    from regtr_tpu.presets import tiny_config
    from regtr_tpu.train.trainer import Trainer

    n0 = 64
    cfg = tiny_config(base_lr=1e-3, scheduler="none", niter=6,
                      train_batch_size=1)

    class FlakyLoader:
        def __init__(self, fail_at=(2,)):
            self.fail_at = set(fail_at)
            self._epoch = 0

        def set_epoch(self, e):
            self._epoch = e

        def __len__(self):
            return 4

        def __iter__(self):
            r = np.random.RandomState(self._epoch)
            for i in range(len(self)):
                if i in self.fail_at and self._epoch == 0:
                    yield "not-a-batch", {}   # _put/step will raise
                    continue
                yield {
                    "points": r.rand(2, n0, 3).astype(np.float32),
                    "mask": np.ones((2, n0), bool),
                    "pose": np.broadcast_to(
                        np.eye(3, 4, dtype=np.float32), (1, 3, 4)),
                    "overlap0": np.ones((2, n0), np.float32),
                }, {}

    from regtr_tpu.models import create_model

    trainer = Trainer(cfg, tmp_path, summary_every=100,
                      validate_every=-1, nb_sanity_val_steps=0)
    model = create_model(cfg, n0)
    state, step = trainer.fit(model, FlakyLoader(), None, niter=6)
    assert step == 6  # the bad batch was skipped, training completed
