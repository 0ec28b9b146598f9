"""Regression test: the self-supervised trainer actually LEARNS.

The reference's core capability is that its self-supervised losses converge
to useful disparity (reference model/worker.py:366-374 + paper tables).
This test overfits DIS-SF on a 4-sample fixture for a few dozen steps with
fixed batches and asserts large, monotonic-ish improvements in both the
photometric census loss and the disparity accuracy vs GT — the CPU-scale
twin of scripts/overfit_sf.py (which runs the same experiment at 512x432
on the TPU dataset).

Measured margins (64x56 fixture, 20 steps): dist2 2.61 -> 0.43 (-84%),
photometric 0.248 -> 0.075 (-70%), o(1) 1.00 -> 0.10.  The assertions
use ~half those margins so the test is robust to RNG/backend drift while
still failing hard on any learning-breaking regression (dead gradients,
optimizer miswiring, loss-sign errors, warp/census breakage).
"""
import numpy as np
import jax
import jax.numpy as jnp
import optax

from depthinspace_tpu.data import TrackDataset, load_settings, generate_dataset
from depthinspace_tpu.data.dataset import collate
from depthinspace_tpu.data.wire import encode_batch, decode_disp_np
from depthinspace_tpu.models import DispNet
from depthinspace_tpu.parallel import put_batch
from depthinspace_tpu.train.objective import make_loss_context
from depthinspace_tpu.train.steps import build_steps
from depthinspace_tpu.train.state import TrainState


def test_sf_overfit_loss_and_accuracy_drop(tmp_path):
    d = tmp_path / "ds"
    generate_dataset(d, n_samples=4, imsize=(64, 56), seed=3)
    settings = load_settings(d / "settings.pkl")
    paths = sorted(str(p) for p in d.glob("0*"))
    dset = TrackDataset(settings, paths, train=False, data_aug=False,
                        load_flow=False)

    batch = collate([dset[i] for i in range(4)])
    gt = batch.disp_gt.copy()
    dev = put_batch(encode_batch(batch), None)

    model = DispNet(max_disp=128.0)
    ctx = make_loss_context(settings, track_length=4, flow_source="rigid",
                            augment=False)
    optimizer = optax.adam(1e-4)
    train_step, eval_step = build_steps(model, ctx, optimizer, "single_frame")

    H, W = settings.imsize
    params = model.init(jax.random.key(42), jnp.zeros((1, H, W, 2)))
    state = TrainState.create(params, optimizer, jax.random.key(42))
    epoch = jnp.asarray(0.0, jnp.float32)

    def accuracy(params):
        disp_u16, comps = eval_step(params, dev, epoch)
        es = decode_disp_np(np.asarray(disp_u16))
        err = np.abs(es - gt)[gt > 0]
        return float(np.mean(err)), float(np.asarray(comps)[0])

    dist0, ph0 = accuracy(state.params)
    for _ in range(20):
        state, comps = train_step(state, dev, epoch)
    dist1, ph1 = accuracy(state.params)

    # photometric census loss must collapse and disparity accuracy follow
    assert ph1 < 0.7 * ph0, f"photometric did not drop: {ph0} -> {ph1}"
    assert dist1 < 0.5 * dist0, f"disparity error did not drop: {dist0} -> {dist1}"
