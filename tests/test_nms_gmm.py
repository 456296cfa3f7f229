"""Parity for the NMS helpers (utils/metrics.py:143-314) and the GMM ego
sampler (scripts/traj_clustering.py:190-295) against the reference.

NMS: identical pinned inputs through the reference torch functions and the
repo's JAX ports; selected trajectories, scores, and original-mode indices
must match exactly (scores are drawn without ties so sort order is unique).

GMM sampler: randomness is pinned out — one dominating mixture logit makes
the categorical draw deterministic on both sides, and a ~0 covariance
(1e-9, torch Normal requires scale > 0) collapses the Gaussian to its mean —
then token ids must match exactly and contour trajectories to 1e-5.
"""

import sys
import types

import numpy as np
import pytest
import torch

from infgen_tpu.metrics import nms as jnms
from infgen_tpu.ops.sampling import sample_next_gmm_traj
from tests.ref_oracle import import_reference


def _import_ref_metrics():
    import_reference()
    if "torch_scatter" not in sys.modules:
        ts = types.ModuleType("torch_scatter")
        ts.gather_csr = lambda *a, **k: None
        ts.segment_csr = lambda *a, **k: None
        sys.modules["torch_scatter"] = ts
    if "torchmetrics" not in sys.modules:
        tm = types.ModuleType("torchmetrics")

        class Metric:
            def __init__(self, **kwargs):
                pass

            def add_state(self, name, default=None, dist_reduce_fx=None):
                setattr(self, name, default)

        tm.Metric = Metric
        sys.modules["torchmetrics"] = tm
    from infgen.utils import metrics as ref_metrics
    return ref_metrics


def _import_ref_clustering():
    import_reference()
    if "omegaconf" not in sys.modules:
        try:
            import omegaconf  # noqa: F401
        except ImportError:
            oc = types.ModuleType("omegaconf")
            oc.DictConfig = dict
            sys.modules["omegaconf"] = oc
    from scripts import traj_clustering as ref_tc
    return ref_tc


@pytest.fixture(scope="module")
def ref_metrics():
    return _import_ref_metrics()


def _rand_trajs(rng, B=2, M=16, T=8, F=7, spread=12.0):
    trajs = rng.normal(size=(B, M, T, F)) * 2.0
    # spread the goals so pairwise distances are generic (no cover ties)
    trajs[:, :, -1, 0:2] = rng.uniform(-spread, spread, size=(B, M, 2))
    return trajs


def test_new_batch_nms_parity(ref_metrics):
    rng = np.random.default_rng(0)
    # goals laid out so density scores are all distinct: cluster sizes
    # 1, 2, 3, ... placed far apart (cluster k has k modes within 1 m)
    B, T, F = 2, 6, 7
    goals = []
    for b in range(B):
        pts = []
        for k, size in enumerate([1, 2, 3, 4, 6]):
            center = np.array([40.0 * k, 100.0 * b])
            for i in range(size):
                pts.append(center + [0.1 * i, 0.05 * i])
        goals.append(pts)
    goals = np.asarray(goals)                           # [B, 16, 2]
    M = goals.shape[1]
    trajs = rng.normal(size=(B, M, T, F))
    trajs[:, :, -1, 0:2] = goals

    rt, rs, ri = ref_metrics.new_batch_nms(
        torch.tensor(trajs, dtype=torch.float64), dist_thresh=2.5,
        num_ret_modes=6)
    jt, js, ji = jnms.new_batch_nms(np.asarray(trajs), 2.5, 6)
    np.testing.assert_array_equal(ri.numpy(), np.asarray(ji))
    np.testing.assert_allclose(rs.numpy(), np.asarray(js), atol=1e-12)
    np.testing.assert_allclose(rt.numpy(), np.asarray(jt), atol=1e-12)


@pytest.mark.parametrize("mode", ["static", "speed"])
def test_batch_nms_parity(ref_metrics, mode):
    rng = np.random.default_rng(1)
    trajs = _rand_trajs(rng)
    scores = rng.normal(size=trajs.shape[:2])

    rt, rs, ri = ref_metrics.batch_nms(
        torch.tensor(trajs, dtype=torch.float64),
        torch.tensor(scores, dtype=torch.float64),
        dist_thresh=8.0, num_ret_modes=6, mode=mode)
    jt, js, ji = jnms.batch_nms(np.asarray(trajs), np.asarray(scores),
                                8.0, 6, mode=mode)
    np.testing.assert_array_equal(ri.numpy(), np.asarray(ji))
    np.testing.assert_allclose(rs.numpy(), np.asarray(js), atol=1e-12)
    np.testing.assert_allclose(rt.numpy(), np.asarray(jt), atol=1e-12)


@pytest.mark.parametrize("mode", ["static", "nearby"])
def test_batch_nms_token_parity(ref_metrics, mode):
    rng = np.random.default_rng(2)
    B, M, F = 2, 16, 7
    goals = rng.normal(size=(B, M, F)) * 2.0
    goals[..., 0:2] = rng.uniform(-12.0, 12.0, size=(B, M, 2))
    scores = rng.normal(size=(B, M))

    rt, rs, ri = ref_metrics.batch_nms_token(
        torch.tensor(goals, dtype=torch.float64),
        torch.tensor(scores, dtype=torch.float64),
        dist_thresh=8.0, num_ret_modes=6, mode=mode)
    jt, js, ji = jnms.batch_nms_token(np.asarray(goals), np.asarray(scores),
                                      8.0, 6, mode=mode)
    np.testing.assert_array_equal(ri.numpy(), np.asarray(ji))
    np.testing.assert_allclose(rs.numpy(), np.asarray(js), atol=1e-12)
    np.testing.assert_allclose(rt.numpy(), np.asarray(jt), atol=1e-12)


# --------------------------------------------------------------------- #
# GMM ego sampler
# --------------------------------------------------------------------- #

class _Scheme:
    def __init__(self, criterium, num_k, temp_mode=1.0, temp_cov=1.0):
        self.criterium = criterium
        self.num_k = num_k
        self.temp_mode = temp_mode
        self.temp_cov = temp_cov


@pytest.mark.parametrize("criterium",
                         ["topk_prob", "topk_prob_sampled_with_dist"])
def test_sample_next_gmm_traj_parity(criterium):
    ref_tc = _import_ref_clustering()
    rng = np.random.default_rng(3)
    A, V, K_gmm, num_k = 6, 32, 12, 5
    n_batch = 2
    ego_rows = np.array([1, 4])

    token_traj_all = rng.normal(size=(A, V, 6, 4, 2)) * 3.0
    token_traj = token_traj_all[:, :, -1]
    pos_now = rng.normal(size=(A, 2)) * 10.0
    head_now = rng.uniform(-np.pi, np.pi, size=(A,))
    pos_next_gt = pos_now + rng.normal(size=(A, 2))
    head_next_gt = head_now + rng.normal(size=(A,)) * 0.2
    valid_next_gt = rng.uniform(size=(A,)) > 0.3
    shape = rng.uniform(0.5, 4.0, size=(A, 2))
    next_token_idx = rng.integers(0, V, size=(A,))

    logits = rng.normal(size=(n_batch, K_gmm))
    # one dominating component -> categorical draw is deterministic
    win = rng.integers(0, K_gmm, size=(n_batch,))
    logits[np.arange(n_batch), win] += 1e6
    poses = rng.normal(size=(n_batch, K_gmm, 3)) * 2.0
    cov = np.array([1e-9, 1e-9])

    # temp_mode 1e-6 makes the categorical draw an argmax on both sides even
    # where the criterium replaces logits with -contour_dist (O(1) gaps)
    scheme = _Scheme(criterium, num_k, temp_mode=1e-6)
    ego_mask = np.zeros(A, bool)
    ego_mask[ego_rows] = True
    r_idx, r_traj = ref_tc.sample_next_gmm_traj(
        torch.tensor(token_traj, dtype=torch.float32),
        torch.tensor(token_traj_all, dtype=torch.float32),
        scheme,
        torch.tensor(ego_mask),
        torch.tensor(logits, dtype=torch.float32),
        torch.tensor(poses, dtype=torch.float32),
        torch.tensor(cov, dtype=torch.float32),
        torch.tensor(pos_now, dtype=torch.float32),
        torch.tensor(head_now, dtype=torch.float32),
        torch.tensor(pos_next_gt, dtype=torch.float32),
        torch.tensor(head_next_gt, dtype=torch.float32),
        torch.tensor(valid_next_gt),
        torch.tensor(shape, dtype=torch.float32),
        torch.tensor(next_token_idx),
    )

    import jax
    j_idx, j_traj = sample_next_gmm_traj(
        jax.random.PRNGKey(0), token_traj.astype(np.float32),
        token_traj_all.astype(np.float32), ego_rows,
        logits.astype(np.float32), poses.astype(np.float32),
        cov.astype(np.float32), pos_now.astype(np.float32),
        head_now.astype(np.float32), pos_next_gt.astype(np.float32),
        head_next_gt.astype(np.float32), valid_next_gt,
        shape.astype(np.float32), next_token_idx,
        criterium=criterium, num_k=num_k, temp_mode=1e-6)

    np.testing.assert_array_equal(r_idx.numpy(), np.asarray(j_idx))
    np.testing.assert_allclose(r_traj.numpy(), np.asarray(j_traj), atol=1e-4)
