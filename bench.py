#!/usr/bin/env python
"""Benchmark the driver's target configs (BASELINE.json) on one TPU chip.

Headline metric (BASELINE.json "metric"): DIS-MF 4-frame fusion training
steps/sec at the reference batch config — bs=4, 512x432, pre-saved flow
(reference README.md:91 trains this on a 24 GB GPU). Submetrics carried in
the same JSON line:
  - DIS-SF self-supervised training steps/sec (bs=8, full loss stack,
    reference README.md:74);
  - DIS-SF inference disparity maps/sec/chip (512x432);
  - measured step FLOPs (XLA cost analysis) and MFU vs the v5e bf16 peak.

All timings hard-sync via a device->host copy (np.asarray): on this
backend jax.block_until_ready can return before execution completes.

vs_baseline: the reference publishes no throughput numbers (BASELINE.md).
The denominator is DERIVED (BASELINE.md "Derived A100 baseline"): step
FLOPs from XLA cost analysis of this model (MF 5.75 TFLOP/step bs=4, SF
2.85 TFLOP/step bs=8; MF x1.3 for the reference's activation-checkpoint
recompute), an A100 at an assumed 10% achieved TF32 utilization for the
reference's eager PyTorch op mix (generous — measured eager ResNet-50 is
~13-15% on ideal large convs; DIS-MF is small convs + 12 grid_samples +
unfold/topk), and the driver's north star "v5e-8 >= 4x A100" allocated
per chip:
  MF: 7.5e12 / 15.6e12 -> 2.08 steps/s (A100) -> x4 / 8 chips = 1.04/chip
  SF: 2.85e12 / 15.6e12 -> 5.47 steps/s (A100) -> x4 / 8 chips = 2.74/chip
vs_baseline = measured per-chip steps/s over that per-chip target; the MFU
figure is the directly hardware-anchored number.
"""
import json
import time

import numpy as np

BASELINE_MF_STEPS_PER_SEC = 1.04  # derived per-chip target (BASELINE.md)
BASELINE_SF_STEPS_PER_SEC = 2.74  # derived per-chip target (BASELINE.md)
V5E_BF16_PEAK_FLOPS = 197e12
# the REFERENCE model's MF step FLOPs (XLA cost analysis of the unpacked
# frame-major model, bs=4 — BASELINE.md); the packed block-diagonal convs
# execute ~3x this in structurally-zero MXU work
MF_REFERENCE_MODEL_TFLOPS = 5.75

H, W = 512, 432
TL = 4


def _sync(x):
    np.asarray(x)


def _settings():
    from depthinspace_tpu.data.settings import Settings
    from depthinspace_tpu.data.fixture import make_dot_pattern
    K = np.array([[435.2, 0, 216.0], [0, 435.2, 256.0], [0, 0, 1]],
                 np.float32)
    return Settings(imsize=(H, W), pattern=make_dot_pattern(H, W),
                    baseline=0.025, K=K), K


def _smooth_disp(rng, shape):
    """Scene-like disparity: smooth low-frequency field in ~[10, 80] px.

    The Pallas warp kernels' band-sparsity grids are DATA-dependent (they
    skip (dy, dx) enumeration chunks outside each band's flow range,
    ops/pallas/warp_kernel.py::_warp2d_ranges), so white-noise disparity
    (whose rigid flow spans the full +-max_shift window everywhere) benches
    the worst case and tiny random flow benches an unrealistic best case
    (the round-4 bench's +-2 px flow). A smooth field reproduces real-scene
    locality."""
    import cv2
    coarse = rng.uniform(10.0, 80.0, shape[:-2] + (8, 8)).astype(np.float32)
    flat = coarse.reshape(-1, 8, 8)
    up = np.stack([cv2.resize(c, (shape[-1], shape[-2]),
                              interpolation=cv2.INTER_CUBIC) for c in flat])
    return np.clip(up.reshape(shape), 5.0, 100.0).astype(np.float32)


def _real_batch(bs, with_primary, with_pseudo=False, with_sgm=False):
    """Benchmark batch from ACTUAL dataset samples (test split) with exact
    rigid flow — the flow-range distribution the warp kernels' band
    sparsity sees in training. Returns None when no dataset is present."""
    import pathlib
    import h5py
    from depthinspace_tpu.data.dataset import Batch
    from depthinspace_tpu.data import load_settings
    from depthinspace_tpu.tools.presave_flow import rigid_flow

    root = pathlib.Path("dataset")
    if not (root / "settings.pkl").exists():
        return None
    dirs = sorted(p for p in root.glob("0*") if (p / "frames.hdf5").exists())
    dirs = dirs[512:512 + bs]                      # test-split prefix
    if len(dirs) < bs:
        return None
    settings = load_settings(root / "settings.pkl")
    if tuple(settings.imsize) != (H, W):
        return None
    fields = {k: [] for k in ("im", "ambient", "disp", "R", "t", "prim")}
    for d in dirs:
        with h5py.File(d / "frames.hdf5", "r") as f:
            for k in ("im", "ambient", "disp", "R", "t"):
                fields[k].append(np.asarray(f[k][:TL], np.float32))
        pp = d / "single_frame_disp.hdf5"
        if pp.exists():
            with h5py.File(pp, "r") as f:
                fields["prim"].append(np.asarray(f["disp"][:TL, 0],
                                                 np.float32))
        else:
            fields["prim"].append(fields["disp"][-1][:, 0])
    stack = lambda k, sq: np.stack(
        [a[:, 0] if sq else a for a in fields[k]], axis=1)
    im, amb = stack("im", True), stack("ambient", True)
    disp = stack("disp", True)
    R, t = stack("R", False), stack("t", False)
    prim = np.stack(fields["prim"], axis=1)
    K, bl, fo = settings.K, settings.baseline, settings.focal_length
    flow = np.zeros((TL, TL, bs, H, W, 2), np.float32)
    for i in range(TL):
        for j in range(TL):
            if i == j:
                continue
            for b in range(bs):
                depth = bl * fo / np.maximum(disp[i, b], 1e-6)
                fl = rigid_flow(depth, K, R[i, b], t[i, b], R[j, b], t[j, b])
                flow[i, j, b] = np.moveaxis(fl, 0, -1)
    return Batch(im=im, ambient=amb, disp_gt=disp, R=R, t=t, flow=flow,
                 primary_disp=prim if with_primary else None,
                 pseudo_gt=prim if with_pseudo else None,
                 sgm_disp=disp if with_sgm else None)


def _batch(bs, with_primary, with_pseudo=False, with_sgm=False):
    from depthinspace_tpu.data.dataset import Batch
    real = _real_batch(bs, with_primary, with_pseudo, with_sgm)
    if real is not None:
        return real
    rng = np.random.RandomState(0)
    disp = _smooth_disp(rng, (TL, bs, H, W))
    # rigid-geometry flow magnitudes at these disparities/poses are a few
    # px with smooth spatial variation — the regime the worker sees
    settings, _ = _settings()
    t = rng.uniform(-0.05, 0.05, (TL, bs, 3)).astype(np.float32)
    depth = settings.baseline * settings.focal_length / disp
    f = settings.focal_length
    flow = np.empty((TL, TL, bs, H, W, 2), np.float32)
    for i in range(TL):
        for j in range(TL):
            dz = depth[i] + (t[j, :, 2] - t[i, :, 2])[:, None, None]
            flow[i, j, ..., 0] = f * (t[j, :, 0] - t[i, :, 0])[:, None, None] / dz
            flow[i, j, ..., 1] = f * (t[j, :, 1] - t[i, :, 1])[:, None, None] / dz
    return Batch(
        im=rng.rand(TL, bs, H, W).astype(np.float32),
        ambient=rng.rand(TL, bs, H, W).astype(np.float32),
        disp_gt=disp,
        R=np.broadcast_to(np.eye(3, dtype=np.float32),
                          (TL, bs, 3, 3)).copy(),
        t=t,
        flow=flow,
        primary_disp=(_smooth_disp(rng, (TL, bs, H, W))
                      if with_primary else None),
        pseudo_gt=(_smooth_disp(rng, (TL, bs, H, W))
                   if with_pseudo else None),
        sgm_disp=(_smooth_disp(rng, (TL, bs, H, W))
                  if with_sgm else None),
    )


def _flops_of(jitfn, *args):
    """Step FLOPs from XLA cost analysis (cache-hit recompile)."""
    try:
        cost = jitfn.lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", 0.0)) or None
    except Exception:
        return None


def bench_train(architecture, bs, n_steps, use_pseudo_gt=False,
                data_type="synthetic", accum_steps=1, flow_source="file",
                augment=False):
    import jax
    import jax.numpy as jnp
    import optax
    from depthinspace_tpu.models import DispNet, FuseNet
    from depthinspace_tpu.train import (TrainState, make_loss_context,
                                        build_steps)

    settings, K = _settings()
    ctx = make_loss_context(settings, track_length=TL,
                            use_pseudo_gt=use_pseudo_gt, data_type=data_type,
                            flow_source=flow_source, augment=augment)
    opt = optax.adam(1e-4)
    zeros = jnp.zeros

    if architecture == "single_frame":
        model = DispNet(max_disp=128.0)
        params = model.init(jax.random.key(0), zeros((1, H, W, 2)))
        batch = _batch(bs, with_primary=False, with_pseudo=use_pseudo_gt,
                       with_sgm=(data_type == "real"))
    else:
        model = FuseNet(imsize=(H, W), K=tuple(map(tuple, K.tolist())),
                        track_length=TL, max_disp=128.0,
                        compute_dtype=jnp.bfloat16, use_remat=False)
        params = model.init(
            jax.random.key(0),
            zeros((TL, 1, H, W, 2)), zeros((TL, 1, H, W, 1)),
            zeros((TL, 1, H, W, 1)), jnp.ones((TL, 1, H, W, 1)),
            jnp.broadcast_to(jnp.eye(3), (TL, 1, 3, 3)),
            zeros((TL, 1, 3)), zeros((TL, TL, 1, H, W, 2)))
        batch = _batch(bs, with_primary=True)

    state = TrainState.create(params, opt, jax.random.key(1))
    train_step, _ = build_steps(model, ctx, opt, architecture, mesh=None,
                                accum_steps=accum_steps)
    if flow_source == "pred":
        batch = batch._replace(flow=None)
    batch = jax.device_put(batch)
    epoch = jnp.asarray(0.0)

    for _ in range(3):
        state, comps = train_step(state, batch, epoch)
    _sync(comps)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, comps = train_step(state, batch, epoch)
    _sync(comps)
    dt = time.perf_counter() - t0
    flops = _flops_of(train_step._jit, state, batch, epoch,
                      train_step._consts)
    return n_steps / dt, flops


def bench_sf_e2e(n_steps=12, n_samples=64):
    """End-to-end CLI-path SF training steps/sec: real dataset dirs through
    the threaded DataLoader feeding the jitted train step — the number a
    user sees, including all host pipeline cost.  Uses the wire-cache
    memmap fast path when present (the CLI worker's default loader,
    train/worker.py::cached_dataset); falls back to the HDF5 path (read +
    collate + wire-encode on producer threads) otherwise.  Skipped
    (returns None) when no generated dataset is present."""
    import pathlib
    data_dir = pathlib.Path("dataset")
    if not (data_dir / "settings.pkl").exists():
        return None
    sample_paths = sorted(str(p) for p in data_dir.glob("0*/"))[:n_samples]
    if len(sample_paths) < 16:
        return None

    import jax
    import jax.numpy as jnp
    import optax
    from depthinspace_tpu.data import TrackDataset, DataLoader, load_settings
    from depthinspace_tpu.data.cache import CachedTrackDataset, has_wire_cache
    from depthinspace_tpu.data.wire import encode_batch
    from depthinspace_tpu.models import DispNet
    from depthinspace_tpu.parallel import put_batch
    from depthinspace_tpu.train import (TrainState, make_loss_context,
                                        build_steps)

    settings = load_settings(data_dir / "settings.pkl")
    ctx = make_loss_context(settings, track_length=TL, flow_source="rigid")
    model = DispNet(max_disp=128.0)
    opt = optax.adam(1e-4)
    h, w = settings.imsize
    params = model.init(jax.random.key(0), jnp.zeros((1, h, w, 2)))
    state = TrainState.create(params, opt, jax.random.key(1))
    train_step, _ = build_steps(model, ctx, opt, "single_frame", mesh=None)
    epoch = jnp.asarray(0.0)

    if has_wire_cache(data_dir):
        names = [pathlib.Path(p).name for p in sample_paths]
        dset = CachedTrackDataset(data_dir, names, train=True)
    else:
        dset = TrackDataset(settings, sample_paths, train=True)
    transform = lambda b: put_batch(encode_batch(b), None)

    def run(n):
        loader = DataLoader(dset, 8, shuffle=True, num_workers=4,
                            drop_last=True, transform=transform)
        nonlocal state
        done = 0
        for batch in loader:
            state, comps = train_step(state, batch, epoch)
            done += 1
            if done >= n:
                break
        _sync(comps)
        return done

    run(4)                              # warmup: compile + page cache
    t0 = time.perf_counter()
    done = run(n_steps)
    dt = time.perf_counter() - t0
    return done / dt


def bench_sf_inference(bs=32, n_iters=20):
    """Disparity maps/sec/chip: LCN preprocess + DispNet forward, finest
    scale output (the presave_disp / retest path)."""
    import jax
    import jax.numpy as jnp
    from depthinspace_tpu.models import DispNet
    from depthinspace_tpu.ops import lcn

    model = DispNet(max_disp=128.0)
    params = model.init(jax.random.key(0), jnp.zeros((1, H, W, 2)))

    @jax.jit
    def infer(params, im):
        im_lcn, _ = lcn(im, 5, 0.05)
        net_in = jnp.stack([im_lcn, im], axis=-1)
        return model.apply(params, net_in)[0][..., 0]

    rng = np.random.RandomState(0)
    im = jax.device_put(rng.rand(bs, H, W).astype(np.float32))
    for _ in range(3):
        out = infer(params, im)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = infer(params, im)
    _sync(out)
    dt = time.perf_counter() - t0
    return bs * n_iters / dt, infer, params, im


def main():
    import os

    from depthinspace_tpu.utils.jaxcfg import enable_compilation_cache
    enable_compilation_cache()
    # reuse compiled executables across bench processes (utils/execache.py;
    # skips only COMPILE time — execution is bit-identical, so measured
    # steps/s are unaffected)
    os.environ.setdefault("DIS_EXEC_CACHE", "output/execache")

    sub = {}

    # headline: the reference-parity MF config (presaved/file flow, bs=4,
    # BASELINE.json configs[2]) on REAL dataset samples with exact rigid
    # flow — the warp kernels' band-sparsity work is flow-data-dependent,
    # so synthetic white-noise or tiny-flow batches misreport it (round 4's
    # 0.897 was measured on +-2 px random flow; see _smooth_disp)
    mf_sps, mf_flops = bench_train("multi_frame", bs=4, n_steps=10)
    # the GT-free worker configuration that trains in the pipeline:
    # in-graph pred flow + device augmentation + auto accum=2
    mf_worker_sps, _ = bench_train("multi_frame", bs=4, n_steps=10,
                                   flow_source="pred", augment=True,
                                   accum_steps=2)
    sub["mf_worker_pred_accum2_steps_per_sec"] = round(mf_worker_sps, 4)
    sf_sps, sf_flops = bench_train("single_frame", bs=8, n_steps=20)
    sub["sf_train_steps_per_sec"] = round(sf_sps, 4)
    sub["sf_train_vs_baseline"] = round(sf_sps / BASELINE_SF_STEPS_PER_SEC, 3)

    # remaining driver configs (BASELINE.md): DIS-FTSF fine-tuning bs=8 and
    # real-data training (SGM warmup terms active)
    ftsf_sps, _ = bench_train("single_frame", bs=8, n_steps=10,
                              use_pseudo_gt=True)
    sub["ftsf_train_steps_per_sec"] = round(ftsf_sps, 4)
    real_sps, _ = bench_train("single_frame", bs=8, n_steps=10,
                              data_type="real")
    sub["sf_real_train_steps_per_sec"] = round(real_sps, 4)
    if mf_flops:
        # two MFU figures: XLA's cost analysis counts the frame-packed
        # block-diagonal conv FLOPs (3/4 structural zeros the MXU does for
        # free — models/packed.py), inflating the step ~3x over the
        # reference model's work; the honest headline utilization is
        # REFERENCE-model FLOPs (5.75 TFLOP/step, BASELINE.md) x steps/s
        # over peak, reported as mf_mfu_reference_model_flops
        sub["mf_step_tflops_xla_counted"] = round(mf_flops / 1e12, 3)
        sub["mf_step_tflops_reference_model"] = MF_REFERENCE_MODEL_TFLOPS
        sub["mf_mfu_reference_model_flops"] = round(
            MF_REFERENCE_MODEL_TFLOPS * 1e12 * mf_sps / V5E_BF16_PEAK_FLOPS,
            4)
        sub["mf_mfu_xla_counted_flops"] = round(
            mf_flops * mf_sps / V5E_BF16_PEAK_FLOPS, 4)
    if sf_flops:
        sub["sf_step_tflops"] = round(sf_flops / 1e12, 3)
        sub["sf_mfu_vs_v5e_bf16_peak"] = round(
            sf_flops * sf_sps / V5E_BF16_PEAK_FLOPS, 4)

    maps_ps, *_ = bench_sf_inference()
    sub["sf_infer_maps_per_sec_per_chip"] = round(maps_ps, 2)

    try:
        e2e_sps = bench_sf_e2e()
    except Exception:
        e2e_sps = None          # never let the e2e path sink the headline
    if e2e_sps is not None:
        # includes HDF5 read + wire encode + H2D on the producer thread
        sub["sf_train_e2e_steps_per_sec"] = round(e2e_sps, 4)

    print(json.dumps({
        "metric": "DIS-MF train steps/sec (512x432, bs 4 tracks x 4 frames, "
                  "bf16 FuseNet, full loss stack)",
        "value": round(mf_sps, 4),
        "unit": "steps/sec",
        "vs_baseline": round(mf_sps / BASELINE_MF_STEPS_PER_SEC, 3),
        "submetrics": sub,
    }))


if __name__ == "__main__":
    main()
