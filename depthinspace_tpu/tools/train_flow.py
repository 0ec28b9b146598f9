"""Train the in-repo FlowNet on renderer output with exact rigid-flow labels.

  python -m depthinspace_tpu.tools.train_flow --steps 2000 \\
      --out output/flownet.msgpack

Replaces the reference's externally-trained LiteFlowNet checkpoint
(reference data/presave_optical_flow_data.py:40-43): on synthetic data the
static-scene rigid flow from ground-truth depth + camera poses IS the true
optical flow, so the renderer provides unlimited exact supervision. The
trained parameters feed ``presave_flow --provider learned`` for datasets
without ground truth (real captures).

Reports the validation mean endpoint error (EPE), alongside the Farneback
EPE on the same pairs for comparison.
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path

import numpy as np
import h5py

from ..config import load_paths
from ..data import load_settings
from .presave_flow import rigid_flow, farneback_flow


def _sample_dirs(data_root: Path):
    return sorted(p for p in data_root.iterdir()
                  if p.is_dir() and (p / "frames.hdf5").exists())


def load_pair(sample: Path, K, baseline, focal, rng: np.random.RandomState):
    """Random ordered frame pair (amb_i, amb_j, rigid flow i->j HWC)."""
    with h5py.File(sample / "frames.hdf5", "r") as f:
        tl = f["im"].shape[0]
        i, j = rng.choice(tl, size=2, replace=False)
        amb_i = np.asarray(f["ambient"][i, 0], np.float32)
        amb_j = np.asarray(f["ambient"][j, 0], np.float32)
        disp = np.asarray(f["disp"][i, 0], np.float32)
        R = np.asarray(f["R"], np.float32)
        t = np.asarray(f["t"], np.float32)
    depth = baseline * focal / np.maximum(disp, 1e-6)
    fl = rigid_flow(depth, K, R[i], t[i], R[j], t[j])     # (2, H, W)
    return amb_i, amb_j, np.moveaxis(fl, 0, -1)


def make_batch(samples, K, baseline, focal, rng, batch_size, crop=None):
    """Training batch, wire-encoded for the slow host->device tunnel:
    images as uint16 fixed point ([0,1] x 65535), flow labels as int16
    (1/256 px) — half the f32 bytes; decoded inside the jitted step.

    crop=(ch, cw): random crop applied after computing the full-res rigid
    flow (flow values are per-pixel displacements, unchanged by cropping).
    """
    idx = rng.choice(len(samples), size=batch_size, replace=True)
    im1, im2, gt = [], [], []
    for k in idx:
        a, b, fl = load_pair(samples[k], K, baseline, focal, rng)
        if crop is not None:
            ch, cw = crop
            y = rng.randint(0, a.shape[0] - ch + 1)
            x = rng.randint(0, a.shape[1] - cw + 1)
            a = a[y:y + ch, x:x + cw]
            b = b[y:y + ch, x:x + cw]
            fl = fl[y:y + ch, x:x + cw]
        im1.append(a)
        im2.append(b)
        gt.append(fl)
    enc_im = lambda v: np.clip(np.stack(v) * 65535.0 + 0.5,
                               0, 65535).astype(np.uint16)
    gt = np.clip(np.rint(np.stack(gt) * 256.0), -32768, 32767).astype(np.int16)
    return enc_im(im1)[..., None], enc_im(im2)[..., None], gt


def save_params(params, path: Path):
    from flax import serialization
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(serialization.to_bytes(params))


def load_flow_params(path: Path, imsize=(64, 64)):
    """Restore FlowNet params saved by this tool."""
    import jax
    import jax.numpy as jnp
    from flax import serialization
    from ..models.flownet import FlowNet
    net = FlowNet()
    H, W = imsize
    tpl = net.init(jax.random.key(0), jnp.zeros((1, H, W, 1)),
                   jnp.zeros((1, H, W, 1)))
    return serialization.from_bytes(tpl, Path(path).read_bytes())


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", default=None)
    ap.add_argument("--out", default=None,
                    help="output params path (default OUTPUT_DIR/flownet.msgpack)")
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--val_samples", type=int, default=16)
    ap.add_argument("--crop", type=int, nargs=2, default=(256, 224),
                    metavar=("H", "W"),
                    help="random training crop (divisible by 16; cuts "
                    "host->device bytes ~4x vs full res); pass 0 0 for "
                    "full-resolution training")
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--report_every", type=int, default=100)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax
    from ..utils.jaxcfg import enable_compilation_cache
    from ..models.flownet import FlowNet, multiscale_epe_loss, epe

    enable_compilation_cache()

    paths = load_paths()
    data_root = Path(args.data_dir or paths["DATA_DIR"])
    out_path = Path(args.out or (Path(paths["OUTPUT_DIR"]) / "flownet.msgpack"))
    settings = load_settings(data_root / "settings.pkl")
    K, baseline, focal = settings.K, settings.baseline, settings.focal_length

    samples = _sample_dirs(data_root)
    assert len(samples) >= 2, f"no samples under {data_root}"
    val = samples[:args.val_samples]
    train = samples[args.val_samples:] or samples

    crop = tuple(args.crop) if args.crop and args.crop[0] > 0 else None
    rng = np.random.RandomState(args.seed)
    net = FlowNet()
    im1, im2, gt = make_batch(train, K, baseline, focal, rng,
                              args.batch_size, crop)
    params = net.init(jax.random.key(args.seed),
                      jnp.zeros(im1.shape, jnp.float32),
                      jnp.zeros(im2.shape, jnp.float32))
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, im1, im2, gt):
        # in-graph wire decode (see make_batch)
        im1 = im1.astype(jnp.float32) * (1.0 / 65535.0)
        im2 = im2.astype(jnp.float32) * (1.0 / 65535.0)
        gt = gt.astype(jnp.float32) * (1.0 / 256.0)

        def loss_fn(p):
            flows = net.apply(p, im1, im2)
            return multiscale_epe_loss(flows, gt), epe(flows[-1], gt)
        (loss, train_epe), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, train_epe

    @jax.jit
    def infer(params, im1, im2):
        return net.apply(params, im1, im2)[-1]

    t0 = time.time()
    for it in range(args.steps):
        im1, im2, gt = make_batch(train, K, baseline, focal, rng,
                                  args.batch_size, crop)
        params, opt_state, loss, train_epe = step(
            params, opt_state, jnp.asarray(im1), jnp.asarray(im2),
            jnp.asarray(gt))
        if it % args.report_every == 0 or it == args.steps - 1:
            print(f"step {it:5d}  loss {float(loss):.4f}  "
                  f"epe {float(train_epe):.3f}px  "
                  f"({time.time() - t0:.0f}s)", flush=True)

    # validation: learned vs Farneback vs the ZERO-FLOW no-skill baseline.
    # The zero row is the honesty control (VERDICT r3): any provider that
    # does not beat "predict no motion" by a wide margin is adding noise,
    # not signal, to the MF geometric loss.
    vrng = np.random.RandomState(12345)
    learned_epes, farneback_epes, zero_epes = [], [], []
    for sample in val:
        a, b, fl_gt = load_pair(sample, K, baseline, focal, vrng)
        pred = np.asarray(infer(params, jnp.asarray(a[None, ..., None]),
                                jnp.asarray(b[None, ..., None])))[0]
        learned_epes.append(
            float(np.mean(np.linalg.norm(pred - fl_gt, axis=-1))))
        fb = np.moveaxis(farneback_flow(a, b), 0, -1)
        farneback_epes.append(
            float(np.mean(np.linalg.norm(fb - fl_gt, axis=-1))))
        zero_epes.append(float(np.mean(np.linalg.norm(fl_gt, axis=-1))))
    print(f"val EPE  learned {np.mean(learned_epes):.3f}px  "
          f"farneback {np.mean(farneback_epes):.3f}px  "
          f"zero-flow {np.mean(zero_epes):.3f}px  "
          f"({len(val)} held-out samples)")

    save_params(params, out_path)
    print(f"saved {out_path}")


if __name__ == "__main__":
    main()
