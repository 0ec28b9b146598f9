"""Training runtime: experiment setup, epoch loops, checkpointing, metrics.

Redesign of the reference worker layer (reference model/worker.py:130-653,
model/single_frame_worker.py, model/multi_frame_worker.py) around jitted
steps and async dispatch:

- one jitted train step per architecture (forward + all losses + backward +
  Adam fused); the host loop only feeds batches and logs;
- steps are dispatched asynchronously; the loop blocks on device values only
  at logging boundaries (the reference synchronized around every phase);
- data parallelism over a device mesh is transparent (put_batch shards the
  batch, gradients all-reduce inside the step);
- same experiment contract: OUTPUT_DIR/<architecture>/ with train.log,
  metrics.json, rolling full state, best-per-test-set state, per-epoch
  net_%04d.params, and the same dataset splits
  (synthetic: train=samples[1024:], test=[512:1024], valid=[:512];
  real: every 8th offset 4 is test — reference model/worker.py:169-176).
"""

from __future__ import annotations

import datetime
import itertools
import os
import json
import logging
import random
import socket
import time
from pathlib import Path
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..config import RunConfig
from ..data import TrackDataset, DataLoader, load_settings
from ..models import DispNet, FuseNet
from ..parallel import (make_mesh, put_batch, pad_batch, replicated,
                        replicate_pytree)
from ..data.wire import encode_batch, decode_batch_np, decode_disp_np
from ..utils import metric as metric_lib
from ..utils.gtimer import PhaseTimer, Progress
from ..utils.jaxcfg import enable_compilation_cache
from .objective import make_loss_context
from .steps import build_steps
from .state import TrainState
from .checkpoint import (StateCheckpointer, save_net_params, load_net_params,
                         net_params_path)


class TestSet:
    def __init__(self, name, dset, test_frequency=1):
        self.name = name
        self.dset = dset
        self.test_frequency = test_frequency


class _Loaded(NamedTuple):
    """One pipeline item: the wire-encoded batch already ON DEVICE (the
    transfer happens on the loader's producer thread so H2D rides under the
    previous step's compute), plus the bits of host-side state the epoch
    loops need (eval keeps the host copy for GT/debug images; train carries
    the sampled out-of-range-flow counts)."""
    batch: Batch
    host: Optional[Batch]
    n_valid: int
    oor: Optional[np.ndarray]


def flow_oor_fraction(flow, max_shift: int) -> tuple[float, float]:
    """Fraction of *in-image* flow vectors whose components exceed the
    flow-warp kernels' +-max_shift enumeration window (those sample as
    zeros inside the geometric loss — ops/pallas/warp_kernel.py:19-24 — and
    survive only if the fb/vc masks reject the pixel).

    ``flow``: (tl, tl, bs, H, W, 2), f32 pixels or int16 x256 wire encoding.
    Returns (oor_count, in_image_count) so callers can accumulate exactly.
    The tl diagonal (zero self-flow) is excluded.
    """
    flow = np.asarray(flow)
    if flow.dtype == np.int16:
        flow = flow.astype(np.float32) * (1.0 / 256.0)
    tl, _, bs, H, W, _ = flow.shape
    off_diag = ~np.eye(tl, dtype=bool)
    f = flow[off_diag]                      # (tl*(tl-1), bs, H, W, 2)
    u, v = f[..., 0], f[..., 1]
    tx = u + np.arange(W, dtype=np.float32)
    ty = v + np.arange(H, dtype=np.float32)[:, None]
    in_img = (tx >= 0) & (tx <= W - 1) & (ty >= 0) & (ty <= H - 1)
    oor = in_img & ((np.abs(u) > max_shift) | (np.abs(v) > max_shift))
    return float(np.count_nonzero(oor)), float(np.count_nonzero(in_img))


class Worker:
    """Base training runtime; architecture subclasses fill in the model and
    dataset flags."""

    architecture = "single_frame"

    def __init__(self, cfg: RunConfig):
        self.cfg = cfg
        enable_compilation_cache()

        self.settings = load_settings(Path(cfg.data_dir) / "settings.pkl")
        self.imsize = self.settings.imsize

        sample_paths = sorted(str(p) for p in Path(cfg.data_dir).glob("0*/"))
        if cfg.data_type == "synthetic":
            self.train_paths = sample_paths[2 ** 10:]
            self.test_paths = sample_paths[2 ** 9:2 ** 10]
            self.valid_paths = sample_paths[:2 ** 9]
            if not self.train_paths:      # micro datasets (fixtures)
                n = len(sample_paths)
                cut = max(1, n // 4)
                self.test_paths = sample_paths[:cut]
                self.train_paths = sample_paths[cut:] or sample_paths
                self.valid_paths = []
        else:
            self.test_paths = sample_paths[4::8]
            self.train_paths = [p for p in sample_paths
                                if p not in self.test_paths]
            self.valid_paths = []
        if cfg.test_samples > 0:
            # deterministic prefix: trajectories stay comparable per epoch
            self.test_paths = self.test_paths[:cfg.test_samples]
            self.valid_paths = self.valid_paths[:cfg.test_samples]

        self.exp_dir = Path(cfg.output_dir) / cfg.architecture
        self.exp_dir.mkdir(parents=True, exist_ok=True)
        self._setup_logging()
        self._load_metrics()
        self._init_seed(cfg.seed)

        n_dev = len(jax.devices())
        # mesh size adapts to the train batch size (a sharded axis must
        # divide the device count); eval batches are padded to the mesh
        # multiple in test_epoch
        self.mesh = (make_mesh(batch_size=cfg.train_batch_size)
                     if (cfg.use_mesh and n_dev > 1) else None)
        self.mesh_size = self.mesh.devices.size if self.mesh is not None else 1
        logging.info(f"devices: {jax.devices()}  mesh: {self.mesh}")

        self.model = self.make_model()
        flow_params, flow_ch = None, 2
        if cfg.flow_source == "net":
            from ..tools.train_flow import load_flow_params
            fp_path = Path(cfg.flow_params or
                           (Path(cfg.output_dir) / "flownet.msgpack"))
            flow_params, flow_ch = load_flow_params(fp_path, self.imsize)
            logging.info(f"in-graph FlowNet provider: {fp_path} "
                         f"({flow_ch}-channel)")
        self.ctx = make_loss_context(
            self.settings, track_length=cfg.track_length,
            data_type=cfg.data_type, warmup_epochs=cfg.warmup_epochs,
            use_pseudo_gt=cfg.use_pseudo_gt, lcn_radius=cfg.lcn_radius,
            augment=cfg.device_augment, flow_source=cfg.flow_source,
            geo_max_shift=cfg.geo_max_shift,
            photometric_pyramid=cfg.photometric_pyramid,
            flow_params=flow_params, flow_in_channels=flow_ch)
        if cfg.flow_source == "rigid":
            assert cfg.data_type == "synthetic", \
                "--flow_source rigid needs GT disparity (synthetic data)"
        self.optimizer = optax.adam(cfg.learning_rate)
        self.accum_steps = self._resolve_accum()
        if self.accum_steps > 1:
            logging.info(f"gradient accumulation: {self.accum_steps} "
                         "microbatches per optimizer step")
        self.train_step, self.eval_step = build_steps(
            self.model, self.ctx, self.optimizer, self.architecture,
            self.mesh, accum_steps=self.accum_steps)
        self.ckpt = StateCheckpointer(self.exp_dir)
        self.current_epoch = 0

    # ------------------------------------------------------------- setup
    def _resolve_accum(self) -> int:
        """0 = auto: the un-rematerialized full-res DIS-MF graph's bs-4
        activations are ~15.9 GiB (scripts/aot_compile_mf.py) — right at
        the 16 GiB v5e HBM — so split it in 2 exact microbatches per
        device; every other config fits in one."""
        if self.cfg.accum_steps > 0:
            return self.cfg.accum_steps
        per_dev_bs = self.cfg.train_batch_size // self.mesh_size
        H, W = self.imsize
        if (self.architecture == "multi_frame" and not self.cfg.mf_remat
                and per_dev_bs >= 4 and H * W >= 512 * 432
                and per_dev_bs % 2 == 0):
            return 2
        return 1

    def _setup_logging(self):
        if logging.root:
            del logging.root.handlers[:]
        logging.basicConfig(
            level=logging.INFO,
            handlers=[logging.FileHandler(str(self.exp_dir / "train.log")),
                      logging.StreamHandler()],
            format="%(relativeCreated)d:%(levelname)s:%(process)d: %(message)s")
        logging.info("=" * 80)
        logging.info(f"Experiment: {self.cfg.architecture} on "
                     f"{socket.gethostname()}")
        logging.info(datetime.datetime.now().strftime("%Y-%m-%d %H:%M:%S"))
        logging.info("=" * 80)

    def _load_metrics(self):
        self.metric_path = self.exp_dir / "metrics.json"
        if self.metric_path.exists():
            with open(self.metric_path) as fp:
                self.metric_data = json.load(fp)
        else:
            self.metric_data = {}

    def metric_add_train(self, epoch, key, val):
        d = self.metric_data.setdefault(str(epoch), {}).setdefault("train", {})
        d[str(key)] = val

    def metric_add_test(self, epoch, set_idx, key, val):
        d = (self.metric_data.setdefault(str(epoch), {})
             .setdefault("test", {}).setdefault(str(set_idx), {}))
        d[str(key)] = val

    def metric_save(self):
        with open(self.metric_path, "w") as fp:
            json.dump(self.metric_data, fp, indent=2)

    def _init_seed(self, seed):
        logging.info(f"Set seed to {seed}")
        np.random.seed(seed)
        random.seed(seed)
        self._jax_seed = seed

    # ------------------------------------------------- architecture hooks
    def make_model(self):
        raise NotImplementedError

    def make_train_set(self) -> TrackDataset:
        raise NotImplementedError

    def make_test_sets(self) -> list[TestSet]:
        raise NotImplementedError

    def init_params(self):
        raise NotImplementedError

    # ------------------------------------------------------------ driver
    def do(self, cmd: str, epoch: int = -1):
        if cmd == "retrain":
            self.train(resume=False)
        elif cmd == "resume":
            self.train(resume=True)
        elif cmd == "retest":
            self.retest(epoch=epoch)
        elif cmd == "test_init":
            params = self.init_params()
            self.test(-1, params, self.make_test_sets())
        else:
            raise ValueError(f"invalid cmd {cmd!r}")

    def init_state(self) -> TrainState:
        params = self.init_params()
        state = TrainState.create(params, self.optimizer,
                                  jax.random.key(self._jax_seed))
        if self.mesh is not None:
            state = replicate_pytree(state, self.mesh)
        return state

    def cached_dataset(self, paths, train: bool, load_primary: bool = False,
                       load_pseudo_gt: bool = False):
        """Wire-cache fast path (data/cache.py) when the config allows it
        and the cache holds every required field; None -> caller falls back
        to the HDF5 TrackDataset."""
        from ..data.cache import (CachedTrackDataset, has_wire_cache,
                                  BASE_FIELDS)
        if not self.cfg.wire_cache or self.cfg.flow_source == "file":
            return None            # file flow is not cached (too large)
        if train and not self.cfg.device_augment:
            return None            # host augmentation needs the HDF5 path
        load_sgm = self.cfg.data_type == "real"
        fields = list(BASE_FIELDS)
        fields += ["primary_disp"] if load_primary else []
        fields += ["pseudo_gt"] if load_pseudo_gt else []
        fields += ["sgm_disp"] if load_sgm else []
        if not has_wire_cache(self.cfg.data_dir, fields):
            return None
        names = [Path(p).name for p in paths]
        try:
            dset = CachedTrackDataset(
                self.cfg.data_dir, names, track_length=self.cfg.track_length,
                train=train, load_primary=load_primary,
                load_pseudo_gt=load_pseudo_gt, load_sgm=load_sgm)
        except FileNotFoundError as e:
            logging.info(f"wire cache unusable ({e}); using HDF5 loader")
            return None
        logging.info(f"using wire cache for {'train' if train else 'test'} "
                     f"split ({len(dset)} samples)")
        return dset

    # ---------------------------------------------------- host pipeline
    def _host_transform(self, for_eval: bool = False):
        """Per-batch producer-thread pipeline: wire-encode, (eval) pad the
        ragged tail to the mesh multiple, and device_put — so quantization
        AND the H2D transfer overlap the previous step's device compute
        (the transfer used to run synchronously on the consumer thread,
        serializing with compute)."""
        counter = itertools.count()

        def transform(b: Batch) -> _Loaded:
            enc = encode_batch(b)
            oor = None
            if (not for_eval and enc.flow is not None
                    and next(counter) % 16 == 0):
                # out-of-range-flow accounting (file-provided flow only;
                # in-graph rigid flow never reaches the host)
                oor = np.asarray(flow_oor_fraction(enc.flow,
                                                   self.ctx.geo_max_shift))
            n_valid = enc.im.shape[1]
            if for_eval:
                enc, n_valid = pad_batch(enc, self.mesh_size)
            # DIS_SYNC_PUT=1: leave the batch on the host; the consumer
            # transfers it synchronously (escape hatch if overlapping
            # device_put with step execution misbehaves on a backend)
            dev = (enc if os.environ.get("DIS_SYNC_PUT") == "1"
                   else put_batch(enc, self.mesh))
            return _Loaded(dev, enc if for_eval else None, n_valid, oor)

        return transform

    # ------------------------------------------------------------- train
    def train(self, resume=True):
        logging.info("=" * 80)
        logging.info("Start training")

        train_set = self.make_train_set()
        test_sets = self.make_test_sets()

        state = self.init_state()
        epoch0 = 0
        min_err = {ts.name: 1e9 for ts in test_sets}

        if resume:
            restored = self.ckpt.restore(state)
            if restored is not None:
                state, saved_epoch, saved_min = restored
                epoch0 = saved_epoch + 1
                min_err.update(saved_min)
                logging.info(f"Resumed from epoch {saved_epoch}")

        try:
            for epoch in range(epoch0, self.cfg.epochs):
                if (self.cfg.deadline_ts
                        and time.time() > self.cfg.deadline_ts):
                    logging.info(f"deadline reached before epoch {epoch}; "
                                 "stopping cleanly")
                    break
                self.current_epoch = epoch
                state = self.train_epoch(epoch, state, train_set)
                errs = self.test(epoch, state.params, test_sets)

                if (epoch + 1) % self.cfg.save_frequency == 0:
                    self.ckpt.save(epoch, state, min_err)
                    for name, err_list in errs.items():
                        err = sum(err_list)
                        if err < min_err[name]:
                            min_err[name] = err
                            best = StateCheckpointer(
                                self.exp_dir, name=f"state_set_{name}_best",
                                max_to_keep=1)
                            best.save(epoch, state, min_err)
                            best.close()
                            logging.info(
                                f"new best for test set {name}: {err:.5f}")
                    path = save_net_params(self.exp_dir, epoch, state.params)
                    logging.info(f"saved network to {path}")
        finally:
            # the last async save must land even on an abnormal exit —
            # orbax surfaces background-save errors only at the next
            # save/wait, so skipping this would silently drop them
            self.ckpt.flush()
        logging.info("Finished training")
        return state

    def train_epoch(self, epoch, state: TrainState, dset: TrackDataset):
        sw = PhaseTimer()
        logging.info("=" * 80)
        logging.info(f"Train epoch {epoch}")
        dset.current_epoch = epoch
        loader = DataLoader(dset, self.cfg.train_batch_size, shuffle=True,
                            num_workers=self.cfg.num_workers, drop_last=True,
                            transform=self._host_transform())
        n_batches = len(loader)
        bar = Progress(n_batches)
        epoch_arr = jnp.asarray(epoch, jnp.float32)

        comps_acc = None
        n_done = 0
        oor_acc = np.zeros(2)        # (oor count, in-image count), sampled
        sw.begin("total")
        sw.begin("data")
        for batch_idx, loaded in enumerate(loader):
            if 0 < self.cfg.max_train_iter <= batch_idx:
                break
            if loaded.oor is not None:
                oor_acc += loaded.oor
            batch = loaded.batch     # encoded + device_put on loader thread
            if isinstance(batch.im, np.ndarray):      # DIS_SYNC_PUT path
                batch = put_batch(batch, self.mesh)
            sw.end("data")
            sw.begin("step")
            state, comps = self.train_step(state, batch, epoch_arr)
            comps_acc = comps if comps_acc is None else comps_acc + comps
            n_done += 1
            sw.end("step")

            bar.step()
            if (epoch <= 1 and batch_idx < 128) or batch_idx % 16 == 0:
                cvals = np.asarray(comps)    # blocks: logging boundary only
                err_str = f"{cvals.sum():0.4f}=" + "+".join(
                    f"{c:0.4f}" for c in cvals)
                logging.info(
                    f"train e{epoch}: {batch_idx + 1}/{n_batches}: "
                    f"loss={err_str} | {bar.elapsed_str()} / "
                    f"{bar.remaining_str()}")
                self.callback_train_batch(epoch, batch_idx, state, batch)
            sw.begin("data")
        sw.end("total")
        logging.info(f"timings: {sw}")

        if comps_acc is None:
            raise RuntimeError(
                f"train epoch produced 0 batches: {len(dset)} samples with "
                f"batch_size={self.cfg.train_batch_size} and drop_last — "
                "reduce --train_batch_size or add data")
        mean_loss = [float(c) / max(n_done, 1) for c in np.asarray(comps_acc)]
        self.metric_add_train(epoch, "loss", mean_loss)
        if oor_acc[1] > 0:
            oor_frac = float(oor_acc[0] / oor_acc[1])
            self.metric_add_train(epoch, "geo_oor_frac", oor_frac)
            if oor_frac > 0.01:
                logging.warning(
                    f"{oor_frac:.2%} of in-image flow vectors exceed "
                    f"geo_max_shift={self.ctx.geo_max_shift}px — those "
                    f"sample as zeros in the geometric loss; consider "
                    f"raising --geo_max_shift")
        self.metric_save()
        logging.info(f"avg train_loss={sum(mean_loss):0.4f}")
        return state

    def callback_train_batch(self, epoch, batch_idx, state, batch):
        """Debug-image hook; every 256 batches like the reference."""
        if self.cfg.write_debug_images and batch_idx % 256 == 0:
            try:
                disp0, _ = self.eval_step(state.params, batch,
                                          jnp.asarray(epoch, jnp.float32))
                self.write_debug_image(
                    self.exp_dir / f"train_{epoch:03d}_{batch_idx:04d}.png",
                    decode_disp_np(disp0), batch)
            except Exception as e:      # debug images must never kill a run
                logging.warning(f"debug image failed: {e}")

    # -------------------------------------------------------------- test
    def test(self, epoch, params, test_sets):
        errs = {}
        for set_idx, ts in enumerate(test_sets):
            if (epoch + 1) % ts.test_frequency == 0:
                logging.info("=" * 80)
                logging.info(f"testing set {ts.name}")
                errs[ts.name] = self.test_epoch(epoch, set_idx, params,
                                                ts.dset)
        return errs

    def test_epoch(self, epoch, set_idx, params, dset):
        dset.current_epoch = epoch
        loader = DataLoader(dset, self.cfg.test_batch_size, shuffle=False,
                            num_workers=self.cfg.num_workers, drop_last=False,
                            transform=self._host_transform(for_eval=True))
        bar = Progress(len(loader))
        epoch_arr = jnp.asarray(epoch, jnp.float32)

        # metric backend: the exact host path buffers every per-pixel
        # distance and pulls ~28 MB of disparities per batch over the
        # tunnel — fine for small sets, prohibitive for a 512-sample
        # split; the device path streams the same statistics on device
        # (metric_lib.StreamingEvalMetric — exact at wire resolution)
        mode = self.cfg.eval_metrics
        on_device = (mode == "device" or (mode == "auto" and len(dset) > 64))
        if on_device:
            met = metric_lib.StreamingEvalMetric()
        else:
            met = metric_lib.MultipleMetric(
                metric_lib.DistanceMetric(vec_length=1),
                metric_lib.OutlierFractionMetric(
                    vec_length=1, thresholds=[0.1, 0.5, 1, 2, 5]))

        loss_acc = None
        n = 0
        for batch_idx, loaded in enumerate(loader):
            batch, host_batch, n_valid = (loaded.batch, loaded.host,
                                          loaded.n_valid)
            if isinstance(batch.im, np.ndarray):      # DIS_SYNC_PUT path
                batch = put_batch(batch, self.mesh)
            disp0, comps = self.eval_step(params, batch, epoch_arr)

            if on_device:
                met.add(disp0, batch.disp_gt, n_valid)
            else:
                es = decode_disp_np(disp0)[:, :n_valid]
                gt = decode_batch_np(host_batch).disp_gt[:, :n_valid]
                es = es * (gt > 0)
                met.add(es.reshape(-1, 1), gt.reshape(-1, 1))

            loss_acc = comps if loss_acc is None else loss_acc + comps
            n += 1
            bar.step()
            if batch_idx % 25 == 0:
                cvals = np.asarray(comps)   # logging boundary: sync here
                logging.info(
                    f"test e{epoch}: {batch_idx + 1}/{len(loader)}: "
                    f"loss={cvals.sum():0.4f} | {bar.elapsed_str()}"
                    f" / {bar.remaining_str()}")
            if self.cfg.write_debug_images and batch_idx % 8 == 0:
                try:
                    es = decode_disp_np(disp0)[:, :n_valid]
                    gt = decode_batch_np(host_batch).disp_gt[:, :n_valid]
                    self.write_debug_image(
                        self.exp_dir / f"test_{epoch:03d}_{batch_idx:04d}.png",
                        es * (gt > 0), host_batch)
                except Exception as e:
                    logging.warning(f"debug image failed: {e}")

        mean_loss = [float(c) / max(n, 1) for c in np.asarray(loss_acc)]
        logging.info(f"{met}")
        for k, v in met.items():
            self.metric_add_test(epoch, set_idx, k, v)
        self.metric_add_test(epoch, set_idx, "loss", mean_loss)
        self.metric_save()
        try:                       # plots must never kill a run
            self.write_err_img()
        except Exception as e:
            logging.warning(f"errs.png failed: {e}")
        logging.info(f"test epoch {epoch}: avg test_loss={sum(mean_loss):0.4f}")
        return mean_loss

    def write_err_img(self):
        """Per-epoch train/test loss curves -> errs.png (the reference's
        training-progress plot, model/worker.py:312-322 — there per batch
        from errs_list; here per epoch from metrics.json, which is what
        this worker records)."""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        epochs = sorted(int(e) for e in self.metric_data)
        series = {}                      # label -> (xs, ys)
        for ep in epochs:
            d = self.metric_data[str(ep)]
            tr = d.get("train", {}).get("loss")
            if tr is not None:
                series.setdefault("train", ([], []))
                series["train"][0].append(ep)
                series["train"][1].append(sum(tr))
            for set_idx, td in d.get("test", {}).items():
                te = td.get("loss")
                if te is not None:
                    lbl = f"test{set_idx}"
                    series.setdefault(lbl, ([], []))
                    series[lbl][0].append(ep)
                    series[lbl][1].append(sum(te))
        if not series:
            return
        fig = plt.figure(figsize=(8, 6))
        for lbl, (xs, ys) in sorted(series.items()):
            plt.plot(xs, ys, marker=".", label=lbl)
        plt.xlabel("epoch")
        plt.ylabel("total loss")
        plt.legend()
        plt.tight_layout()
        fig.savefig(str(self.exp_dir / "errs.png"))
        plt.close(fig)

    def retest(self, epoch=-1):
        test_sets = self.make_test_sets()
        # an explicit retest always evaluates: the per-epoch test_frequency
        # cadence (reference data/base_dataset.py:29-37) only rate-limits
        # the in-training eval loop — inheriting it here silently skipped
        # retests of epochs where (epoch+1) % frequency != 0
        for ts in test_sets:
            ts.test_frequency = 1
        epochs = range(self.cfg.epochs) if epoch < 0 else [epoch]
        template = self.init_params()
        for ep in epochs:
            path = net_params_path(self.exp_dir, ep)
            if path.exists():
                params = load_net_params(path, template)
                if self.mesh is not None:
                    params = replicate_pytree(params, self.mesh)
                self.test(ep, params, test_sets)

    # ------------------------------------------------------- debug images
    def write_debug_image(self, out_path, es, host_batch):
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from ..utils import cmap

        host_batch = decode_batch_np(host_batch)   # 16-bit wire -> f32
        gt = host_batch.disp_gt.astype(np.float32)
        im = host_batch.im
        amb = host_batch.ambient
        es0, gt0 = es[0, 0], gt[0, 0]
        diff = np.abs(es0 - gt0)
        vmax = max(float(np.nanmax(gt0)) * 1.2, 16.0)

        fig, axes = plt.subplots(2, 3, figsize=(12, 8))
        panels = [
            (im[0, 0], "IR input", "gray", {}),
            (amb[0, 0], "Ambient", "gray", {}),
            (cmap.color_depth_map(gt0, scale=vmax)[..., ::-1], "Disp GT", None, {}),
            (cmap.color_depth_map(es0, scale=vmax)[..., ::-1],
             f"Disp est {es0.min():.2f}/{es0.max():.2f}", None, {}),
            (cmap.color_error_image(diff, BGR=False),
             f"err {diff.mean():.4f}", None, {}),
            (diff, "abs err", "viridis", {}),
        ]
        for ax, (img, title, cm, kw) in zip(axes.flat, panels):
            ax.imshow(img, cmap=cm, **kw)
            ax.set_title(title)
            ax.axis("off")
        fig.tight_layout()
        fig.savefig(str(out_path))
        plt.close(fig)
        logging.info(f"wrote debug image {out_path}")
