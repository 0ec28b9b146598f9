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


def load_pair(sample: Path, K, baseline, focal, rng: np.random.RandomState,
              in_channels: int = 2):
    """Random ordered frame pair -> (x_i, x_j, rigid flow i->j HWC).

    ``in_channels=2`` stacks [ambient, IR] per frame: the synthetic ambient
    render is nearly textureless smooth shading (flow is ill-posed from it
    away from edges) while the IR dot texture carries a dense cue — the
    dots move with the *disparity-difference* field, not the scene flow
    (the projector travels with the rig), so the net must learn to combine
    both channels; giving it only one was the round-3 12.5 px ceiling."""
    with h5py.File(sample / "frames.hdf5", "r") as f:
        tl = f["im"].shape[0]
        i, j = rng.choice(tl, size=2, replace=False)
        amb_i = np.asarray(f["ambient"][i, 0], np.float32)
        amb_j = np.asarray(f["ambient"][j, 0], np.float32)
        if in_channels == 2:
            im_i = np.asarray(f["im"][i, 0], np.float32)
            im_j = np.asarray(f["im"][j, 0], np.float32)
        disp = np.asarray(f["disp"][i, 0], np.float32)
        R = np.asarray(f["R"], np.float32)
        t = np.asarray(f["t"], np.float32)
    depth = baseline * focal / np.maximum(disp, 1e-6)
    fl = rigid_flow(depth, K, R[i], t[i], R[j], t[j])     # (2, H, W)
    if in_channels == 2:
        a = np.stack([amb_i, im_i], axis=-1)
        b = np.stack([amb_j, im_j], axis=-1)
    else:
        a, b = amb_i[..., None], amb_j[..., None]
    return a, b, np.moveaxis(fl, 0, -1)


class PairPool:
    """In-RAM pool of wire-encoded training pairs.

    The 1-core host cannot keep up with per-step HDF5 reads + rigid-flow
    label computation (~2 s per batch of 8).  The pool front-loads that
    cost once — sourcing images from the wire cache memmaps when present —
    and batches become pure array slicing (+ random crops).
    """

    def __init__(self, data_root: Path, samples, K, baseline, focal,
                 pool_size: int, rng, in_channels: int = 2):
        from ..data.cache import CachedTrackDataset

        n = min(pool_size, len(samples) * 12)
        cached = None
        try:
            names = [p.name for p in samples]
            cached = CachedTrackDataset(data_root, names, train=False)
        except FileNotFoundError:
            pass
        self.a, self.b, self.gt = [], [], []
        for p in range(n):
            si = rng.randint(len(samples))
            i, j = rng.choice(4, size=2, replace=False)
            if cached is not None:
                gi = cached.indices[si]
                amb = cached.fields["ambient"]
                im = cached.fields["im"]
                disp = (np.asarray(cached.fields["disp"][gi, i], np.float32)
                        * (1.0 / 256.0))
                R = np.asarray(cached.fields["R"][gi])
                t = np.asarray(cached.fields["t"][gi])
                u16 = lambda arr, k: np.asarray(arr[gi, k])
                chans_a = ([u16(amb, i), u16(im, i)] if in_channels == 2
                           else [u16(amb, i)])
                chans_b = ([u16(amb, j), u16(im, j)] if in_channels == 2
                           else [u16(amb, j)])
                a = np.stack(chans_a, axis=-1)
                b = np.stack(chans_b, axis=-1)
            else:
                with h5py.File(samples[si] / "frames.hdf5", "r") as f:
                    load = lambda k, fi: np.asarray(f[k][fi, 0], np.float32)
                    chans_a = ([load("ambient", i), load("im", i)]
                               if in_channels == 2 else [load("ambient", i)])
                    chans_b = ([load("ambient", j), load("im", j)]
                               if in_channels == 2 else [load("ambient", j)])
                    disp = load("disp", i)
                    R = np.asarray(f["R"], np.float32)
                    t = np.asarray(f["t"], np.float32)
                enc = lambda v: np.clip(v * 65535.0 + 0.5, 0,
                                        65535).astype(np.uint16)
                a = np.stack([enc(c) for c in chans_a], axis=-1)
                b = np.stack([enc(c) for c in chans_b], axis=-1)
            depth = baseline * focal / np.maximum(disp, 1e-6)
            fl = np.moveaxis(rigid_flow(depth, K, R[i], t[i], R[j], t[j]),
                             0, -1)
            self.a.append(a)
            self.b.append(b)
            self.gt.append(np.clip(np.rint(fl * 256.0), -32768,
                                   32767).astype(np.int16))
            if p % 128 == 0:
                print(f"pair pool: {p}/{n}", flush=True)
        self.a = np.stack(self.a)
        self.b = np.stack(self.b)
        self.gt = np.stack(self.gt)
        print(f"pair pool ready: {n} pairs, "
              f"{(self.a.nbytes + self.b.nbytes + self.gt.nbytes)/1e9:.2f} GB",
              flush=True)

    def batch(self, rng, batch_size, crop=None):
        idx = rng.randint(0, len(self.a), batch_size)
        a, b, gt = self.a[idx], self.b[idx], self.gt[idx]
        if crop is not None:
            ch, cw = crop
            H, W = a.shape[1:3]
            ys = rng.randint(0, H - ch + 1, batch_size)
            xs = rng.randint(0, W - cw + 1, batch_size)
            a = np.stack([a[k, y:y + ch, x:x + cw]
                          for k, (y, x) in enumerate(zip(ys, xs))])
            b = np.stack([b[k, y:y + ch, x:x + cw]
                          for k, (y, x) in enumerate(zip(ys, xs))])
            gt = np.stack([gt[k, y:y + ch, x:x + cw]
                           for k, (y, x) in enumerate(zip(ys, xs))])
        return a, b, gt


def save_params(params, path: Path):
    from flax import serialization
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(serialization.to_bytes(params))


def load_flow_params(path: Path, imsize=(64, 64), in_channels: int = None):
    """Restore FlowNet params saved by this tool -> (params, in_channels).

    ``in_channels=None`` auto-detects from the serialized first encoder
    kernel's input width (1-channel round-3 nets and 2-channel nets both
    restore; flax from_bytes does not validate leaf shapes, so detection
    must read the stored shape, not catch an exception)."""
    import jax
    import jax.numpy as jnp
    from flax import serialization
    from ..models.flownet import FlowNet
    data = Path(path).read_bytes()
    if in_channels is None:
        raw = serialization.msgpack_restore(data)
        in_channels = int(raw["params"]["encoder"]["down0"]["kernel"].shape[2])
    net = FlowNet()
    H, W = imsize
    tpl = net.init(jax.random.key(0),
                   jnp.zeros((1, H, W, in_channels)),
                   jnp.zeros((1, H, W, in_channels)))
    return serialization.from_bytes(tpl, data), in_channels


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", default=None)
    ap.add_argument("--out", default=None,
                    help="output params path (default OUTPUT_DIR/flownet.msgpack)")
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--lr", type=float, default=2e-4,
                    help="peak lr (200-step warmup, cosine decay to lr/20)")
    ap.add_argument("--val_samples", type=int, default=16)
    ap.add_argument("--crop", type=int, nargs=2, default=(256, 224),
                    metavar=("H", "W"),
                    help="random training crop (divisible by 16; cuts "
                    "host->device bytes ~4x vs full res); pass 0 0 for "
                    "full-resolution training")
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--report_every", type=int, default=100)
    ap.add_argument("--val_every", type=int, default=2000,
                    help="mid-training learned-EPE checks (0 = end only)")
    ap.add_argument("--in_channels", type=int, default=2, choices=[1, 2],
                    help="2 = [ambient, IR] (see load_pair docstring)")
    ap.add_argument("--pool_cache", default="",
                    help="npz path: load the pair pool from it if present, "
                         "else build then save — lets the CPU-bound pool "
                         "build run ahead of (and decoupled from) the TPU "
                         "training pass on the 1-core host")
    ap.add_argument("--pool_size", type=int, default=1024,
                    help="in-RAM wire-encoded training-pair pool (the "
                         "1-core host cannot read+label pairs per step)")
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
    cache_p = Path(args.pool_cache) if args.pool_cache else None
    if cache_p is not None and cache_p.exists():
        z = np.load(cache_p)
        pool = PairPool.__new__(PairPool)
        pool.a, pool.b, pool.gt = z["a"], z["b"], z["gt"]
        print(f"pair pool loaded from {cache_p}: {len(pool.a)} pairs",
              flush=True)
    else:
        pool = PairPool(data_root, train, K, baseline, focal, args.pool_size,
                        rng, args.in_channels)
        if cache_p is not None:
            np.savez(cache_p, a=pool.a, b=pool.b, gt=pool.gt)
            print(f"pair pool saved to {cache_p}", flush=True)
    im1, im2, gt = pool.batch(rng, args.batch_size, crop)
    params = net.init(jax.random.key(args.seed),
                      jnp.zeros(im1.shape, jnp.float32),
                      jnp.zeros(im2.shape, jnp.float32))
    sched = optax.warmup_cosine_decay_schedule(
        init_value=args.lr * 0.05, peak_value=args.lr,
        warmup_steps=min(200, args.steps // 10 + 1),
        decay_steps=args.steps, end_value=args.lr / 20.0)
    opt = optax.adam(sched)
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

    # validation: learned vs Farneback vs the ZERO-FLOW no-skill baseline.
    # The zero row is the honesty control (VERDICT r3): any provider that
    # does not beat "predict no motion" by a wide margin is adding noise,
    # not signal, to the MF geometric loss.
    val_pairs = []           # fixed held-out pairs (deterministic RNG)
    vrng = np.random.RandomState(12345)
    for sample in val:
        val_pairs.append(load_pair(sample, K, baseline, focal, vrng,
                                   args.in_channels))

    def validate(params, with_baselines=False):
        learned_epes, farneback_epes, zero_epes = [], [], []
        for a, b, fl_gt in val_pairs:
            pred = np.asarray(infer(params, jnp.asarray(a[None]),
                                    jnp.asarray(b[None])))[0]
            learned_epes.append(
                float(np.mean(np.linalg.norm(pred - fl_gt, axis=-1))))
            if with_baselines:
                fb = np.moveaxis(farneback_flow(a[..., 0], b[..., 0]), 0, -1)
                farneback_epes.append(
                    float(np.mean(np.linalg.norm(fb - fl_gt, axis=-1))))
                zero_epes.append(
                    float(np.mean(np.linalg.norm(fl_gt, axis=-1))))
        line = f"val EPE  learned {np.mean(learned_epes):.3f}px"
        if with_baselines:
            line += (f"  farneback {np.mean(farneback_epes):.3f}px"
                     f"  zero-flow {np.mean(zero_epes):.3f}px"
                     f"  ({len(val_pairs)} held-out samples)")
        print(line, flush=True)
        return float(np.mean(learned_epes))

    t0 = time.time()
    for it in range(args.steps):
        im1, im2, gt = pool.batch(rng, args.batch_size, crop)
        params, opt_state, loss, train_epe = step(
            params, opt_state, jnp.asarray(im1), jnp.asarray(im2),
            jnp.asarray(gt))
        if it % args.report_every == 0 or it == args.steps - 1:
            print(f"step {it:5d}  loss {float(loss):.4f}  "
                  f"epe {float(train_epe):.3f}px  "
                  f"({time.time() - t0:.0f}s)", flush=True)
        if args.val_every and it and it % args.val_every == 0:
            validate(params)

    validate(params, with_baselines=True)

    save_params(params, out_path)
    print(f"saved {out_path}")


if __name__ == "__main__":
    main()
