"""End-to-end 3DMatch pipeline test on a synthesized data root.

No 3DMatch training data ships in this environment, so this test fabricates
a miniature dataset in the EXACT on-disk formats (per-fragment .pth files,
{phase}_info.pkl pair metadata, Redwood gt.log/gt.info) and drives the whole
path: dataset -> augmentations -> bucketed collate -> train step ->
test protocol (est.log writing) -> Predator benchmark scoring.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from regtr_tpu.core import se3_np

from .synth_threedmatch import SCENE, build_root, tiny_cfg


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    """Fabricate fragments of one synthetic 'room' + pair metadata + GT."""
    return build_root(tmp_path_factory.mktemp("threedmatch"))


def _cfg(root):
    return tiny_cfg(root)


def test_dataset_and_augmentation(data_root):
    from regtr_tpu.data.threedmatch import ThreeDMatchDataset

    cfg = _cfg(data_root)
    # construct directly with the fabricated metadata dir
    from regtr_tpu.data import transforms as T

    aug = T.Compose([
        T.RigidPerturb("small"), T.Jitter(0.005),
        T.ShufflePoints(), T.RandomSwap(),
    ])
    ds = ThreeDMatchDataset(cfg, "train", transforms=aug,
                            metadata_dir=str(data_root / "meta"))
    assert len(ds) == 3
    s = ds[0]
    assert s["src_xyz"].shape[1] == 3
    assert s["src_overlap"].dtype == bool
    # overlap labels nontrivial: fragments genuinely overlap
    assert 0.05 < s["src_overlap"].mean() <= 1.0
    # pose consistency: GT-transformed src overlap points near tgt cloud
    warped = se3_np.se3_transform(s["pose"], s["src_xyz"][s["src_overlap"]])
    from scipy.spatial import cKDTree

    d, _ = cKDTree(s["tgt_xyz"]).query(warped[:200], k=1)
    assert np.median(d) < 0.1


def test_train_step_on_3dmatch_batch(data_root):
    from regtr_tpu.data.collate import collate_pairs
    from regtr_tpu.data.threedmatch import ThreeDMatchDataset
    from regtr_tpu.models import create_model, init_model_params
    from regtr_tpu.train.optim import make_optimizer
    from regtr_tpu.train.steps import TrainState, make_train_step

    cfg = _cfg(data_root)
    ds = ThreeDMatchDataset(cfg, "train", transforms=None,
                            metadata_dir=str(data_root / "meta"))
    batch, meta = collate_pairs([ds[0], ds[1]], cfg["buckets"])
    model = create_model(cfg, max(cfg["buckets"]))
    variables = init_model_params(model, jax.random.PRNGKey(0))
    tx = make_optimizer(cfg)
    state = TrainState.create(apply_fn=model.apply,
                              params=variables["params"], tx=tx)
    step = make_train_step(model, donate=False)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["total"]))


def test_full_eval_protocol(data_root, tmp_path):
    """Untrained model through the complete 3DMatch test protocol: est.log
    per scene + Predator benchmark scoring against the fabricated GT."""
    from regtr_tpu.data.collate import collate_pairs
    from regtr_tpu.data.prefetch import DataLoader
    from regtr_tpu.data.threedmatch import ThreeDMatchDataset
    from regtr_tpu.evaluation import run_test
    from regtr_tpu.models import create_model, init_model_params
    from functools import partial

    cfg = _cfg(data_root)
    cfg["benchmark"] = "3DMatch"
    ds = ThreeDMatchDataset(cfg, "test", transforms=None,
                            metadata_dir=str(data_root / "meta"))
    loader = DataLoader(ds, batch_size=2,
                        collate_fn=partial(collate_pairs,
                                           buckets=cfg["buckets"]),
                        num_workers=0)
    model = create_model(cfg, max(cfg["buckets"]))
    variables = init_model_params(model, jax.random.PRNGKey(0))
    results = run_test(
        cfg, model, variables["params"], loader, tmp_path,
        gt_benchmark_dir=str(data_root / "benchmarks"),
    )
    est = tmp_path / "3DMatch" / SCENE / "est.log"
    assert est.exists()
    from regtr_tpu.benchmark.predator import read_trajectory

    pairs, traj = read_trajectory(est)
    assert len(pairs) == 3
    assert "registration_recall" in results  # scored against fabricated GT
    assert 0.0 <= results["registration_recall"] <= 1.0
