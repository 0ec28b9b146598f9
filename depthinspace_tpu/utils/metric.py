"""Streaming evaluation metrics (numpy, host side).

Same metric suite and semantics as the reference (reference co/metric.py:
40-154): functional mse/rmse/mae/outlier_fraction plus streaming
DistanceMetric (L_p norm over Nx1 vectors -> mean/std/median/q10/q90/min/
max) and OutlierFractionMetric (of{t} fractions).  Estimates are masked by
gt>0 and flattened Nx1 by the workers (reference
single_frame_worker.py:176,237-243).

A device-side accumulator (`DeviceDistanceAccumulator`) is also provided:
it keeps a histogram + moment sums on device so per-batch D2H transfers are
avoided during training-time eval; quantiles are then histogram
approximations. The host-side classes remain the exact-parity path used by
`retest`.
"""

from __future__ import annotations

import numpy as np


def mse(estimate, target, mask=None):
    estimate, target, mask = _process(estimate, target, mask)
    return np.sum((estimate[mask] - target[mask]) ** 2) / mask.sum()


def rmse(estimate, target, mask=None):
    return np.sqrt(mse(estimate, target, mask))


def mae(estimate, target, mask=None):
    estimate, target, mask = _process(estimate, target, mask)
    return np.abs(estimate[mask] - target[mask]).sum() / mask.sum()


def outlier_fraction(estimate, target, mask=None, threshold=0):
    estimate, target, mask = _process(estimate, target, mask)
    diff = np.abs(estimate[mask] - target[mask])
    return (diff > threshold).sum() / mask.sum()


def _process(estimate, target, mask):
    if estimate.shape != target.shape:
        raise ValueError("estimate and target must have the same shape")
    if mask is None:
        mask = np.ones(estimate.shape, dtype=bool)
    else:
        mask = mask != 0
    if estimate.shape != mask.shape:
        raise ValueError("mask must match estimate shape")
    return estimate, target, mask


class Metric:
    def __init__(self, str_prefix=""):
        self.str_prefix = str_prefix
        self.reset()

    def reset(self):
        pass

    def add(self, es, ta, ma=None):
        pass

    def get(self) -> dict:
        return {}

    def items(self):
        return self.get().items()

    def __str__(self):
        return ", ".join(f"{self.str_prefix}{k}={v:.5f}"
                         for k, v in self.get().items())


class MultipleMetric(Metric):
    def __init__(self, *metrics, **kwargs):
        self.metrics = list(metrics)
        super().__init__(**kwargs)

    def reset(self):
        for m in self.metrics:
            m.reset()

    def add(self, es, ta, ma=None):
        for m in self.metrics:
            m.add(es, ta, ma)

    def get(self):
        out = {}
        for m in self.metrics:
            out.update(m.get())
        return out

    def __str__(self):
        return "\n".join(str(m) for m in self.metrics)


class DistanceMetric(Metric):
    """L_p distance over (N, vec_length) arrays with summary statistics."""

    def __init__(self, vec_length=1, p=2, **kwargs):
        self.vec_length = vec_length
        self.p = p
        super().__init__(**kwargs)

    def reset(self):
        self.dists = []

    def add(self, es, ta, ma=None):
        if es.shape != ta.shape or es.ndim != 2 or es.shape[1] != self.vec_length:
            raise ValueError(f"expected Nx{self.vec_length}, got {es.shape}")
        if ma is not None:
            es = es[ma != 0]
            ta = ta[ma != 0]
        self.dists.append(np.linalg.norm(es - ta, ord=self.p, axis=1))

    def get(self):
        d = np.hstack(self.dists)
        n = self.p
        return {
            f"dist{n}_mean": float(np.mean(d)),
            f"dist{n}_std": float(np.std(d)),
            f"dist{n}_median": float(np.median(d)),
            f"dist{n}_q10": float(np.percentile(d, 10)),
            f"dist{n}_q90": float(np.percentile(d, 90)),
            f"dist{n}_min": float(np.min(d)),
            f"dist{n}_max": float(np.max(d)),
        }


class OutlierFractionMetric(DistanceMetric):
    """of{t} = fraction of distances above each threshold t."""

    def __init__(self, thresholds, *args, **kwargs):
        self.thresholds = list(thresholds)
        super().__init__(*args, **kwargs)

    def get(self):
        d = np.hstack(self.dists)
        return {f"of{t}": float((d > t).sum() / d.size)
                for t in self.thresholds}


class RelativeDistanceMetric(Metric):
    """L_p distance normalized by the target norm (reference
    co/metric.py:156-170)."""

    def __init__(self, vec_length, p=2, **kwargs):
        self.vec_length = vec_length
        self.p = p
        super().__init__(**kwargs)

    def reset(self):
        self.dists = []

    def add(self, es, ta, ma=None):
        if es.shape != ta.shape or es.ndim != 2 or es.shape[1] != self.vec_length:
            raise ValueError(f"expected Nx{self.vec_length}, got {es.shape}")
        dist = np.linalg.norm(es - ta, ord=self.p, axis=1)
        denom = np.linalg.norm(ta, ord=self.p, axis=1)
        dist = dist / denom
        if ma is not None:
            dist = dist[ma != 0]
        self.dists.append(dist)

    def get(self):
        d = np.hstack(self.dists)
        n = f"rel{self.p}"
        return {f"dist{n}_mean": float(np.mean(d)),
                f"dist{n}_std": float(np.std(d)),
                f"dist{n}_median": float(np.median(d))}


class RotmDistanceMetric(Metric):
    """Rotation-matrix distance (identity / geodesic), reference
    co/metric.py:172-188."""

    def __init__(self, type="identity", **kwargs):
        self.type = type
        super().__init__(**kwargs)

    def reset(self):
        self.dists = []

    def add(self, es, ta, ma=None):
        from . import geometry3d
        if es.shape != ta.shape or es.ndim != 3 or es.shape[1:] != (3, 3):
            raise ValueError(f"expected Nx3x3, got {es.shape}")
        if self.type == "identity":
            self.dists.append(geometry3d.rotm_distance_identity(es, ta))
        elif self.type == "geodesic":
            self.dists.append(geometry3d.rotm_distance_geodesic(es, ta))
        else:
            raise ValueError(self.type)

    def get(self):
        d = np.hstack(self.dists)
        return {f"rotm_{self.type}_mean": float(np.mean(d)),
                f"rotm_{self.type}_median": float(np.median(d))}


class QuaternionDistanceMetric(Metric):
    """Quaternion distance (angle / mineucl / normdiff), reference
    co/metric.py:190-208."""

    def __init__(self, type="angle", **kwargs):
        self.type = type
        super().__init__(**kwargs)

    def reset(self):
        self.dists = []

    def add(self, es, ta, ma=None):
        from . import geometry3d
        if es.shape != ta.shape or es.ndim != 2 or es.shape[1] != 4:
            raise ValueError(f"expected Nx4, got {es.shape}")
        fn = {"angle": geometry3d.quat_distance_angle,
              "mineucl": geometry3d.quat_distance_mineucl,
              "normdiff": geometry3d.quat_distance_normdiff}[self.type]
        self.dists.append(fn(es, ta))

    def get(self):
        d = np.hstack(self.dists)
        return {f"quat_{self.type}_mean": float(np.mean(d)),
                f"quat_{self.type}_median": float(np.median(d))}


class BinaryAccuracyMetric(Metric):
    """Threshold-swept binary classification metrics: ROC-AUC, PR-AUC, AP,
    accuracies (reference co/metric.py:211-273)."""

    def __init__(self, thresholds=None, **kwargs):
        self.thresholds = (np.linspace(0, 1, 101)[:-1] if thresholds is None
                           else np.asarray(thresholds))
        super().__init__(**kwargs)

    def reset(self):
        n = len(self.thresholds)
        self.tps = np.zeros(n)
        self.fps = np.zeros(n)
        self.fns = np.zeros(n)
        self.tns = np.zeros(n)

    def add(self, es, ta, ma=None):
        es = np.ravel(es)
        ta = np.ravel(ta)
        if es.shape != ta.shape:
            raise ValueError("shape mismatch")
        if es.min() < 0 or es.max() > 1:
            raise ValueError("estimate must be in [0, 1]")
        es_p = es[ta == 1]
        es_n = es[ta == 0]
        for i, t in enumerate(self.thresholds):
            self.tps[i] += (es_p > t).sum()
            self.fps[i] += (es_n > t).sum()
            self.fns[i] += (es_p <= t).sum()
            self.tns[i] += (es_n <= t).sum()

    def get(self):
        with np.errstate(divide="ignore", invalid="ignore"):
            precis = np.nan_to_num(self.tps / (self.tps + self.fps))
            recall = np.nan_to_num(self.tps / (self.tps + self.fns))
            fprs = np.nan_to_num(self.fps / (self.fps + self.tns))
        precis = np.r_[0, precis, 1]
        recall = np.r_[1, recall, 0]
        fprs = np.r_[1, fprs, 0]
        ret = {
            "auc": float(-np.trapezoid(recall, fprs)),
            "prauc": float(-np.trapezoid(precis, recall)),
            "ap": float(-(np.diff(recall) * precis[:-1]).sum()),
        }
        acc = (self.tps + self.tns) / np.maximum(
            self.tps + self.tns + self.fps + self.fns, 1)
        for t in np.linspace(0, 1, 11)[1:-1]:
            i = int(np.argmin(np.abs(t - self.thresholds)))
            ret[f"acc{self.thresholds[i]:.2f}"] = float(acc[i])
        return ret


class StreamingEvalMetric:
    """On-device streaming disparity-error statistics for the eval loop.

    Replaces the host path ``DistanceMetric + OutlierFractionMetric`` for
    large test sets: the host path buffers every per-pixel distance (a full
    512-sample retest at 512x432x4 holds ~1.8 GB of f32) and needs the
    estimated disparities copied device->host every batch — ~28 MB/batch
    over this setup's slow tunnel.  Here one small jitted update per batch
    folds the error statistics into an on-device state pytree; only ~32 KB
    (the histogram) crosses to the host, once, at epoch end.

    Inputs are the wire-quantized tensors the eval step already produces
    (u16 x256 disparities, data/wire.py), so the integer error histogram is
    EXACT at the wire resolution (1/256 px): mean/std/min/max/of{t} match
    the host path bit-for-bit, and quantiles are exact order statistics of
    the quantized values (the host path interpolates between adjacent order
    statistics, a <=1/256 px difference).

    Reference semantics preserved (reference single_frame_worker.py:176,
    237-243): estimate masked by gt>0, every pixel counted (gt==0 pixels
    contribute zero error).
    """

    # wire scale: disparities cross as u16 x256 => integer error in
    # [0, 65535] indexes the histogram directly, no float rounding
    _SCALE = 256.0
    _BINS = 65536

    def __init__(self, thresholds=(0.1, 0.5, 1, 2, 5)):
        self.thresholds = list(thresholds)
        self._update = None      # built lazily (jax import + jit)
        self.reset()

    def reset(self):
        self._state = None

    def _build(self):
        import jax
        import jax.numpy as jnp

        # thresholds in integer wire units: for integer err = k (wire
        # units), k/256 > t  <=>  k > floor(256*t), both when 256*t is
        # integral (k > 256t) and when not (k >= floor(256t)+1)
        thr = np.floor(np.asarray(self.thresholds, np.float64)
                       * self._SCALE).astype(np.int32)

        def init():
            return dict(hist=jnp.zeros((self._BINS,), jnp.float32),
                        over=jnp.zeros((len(thr),), jnp.float32))

        def update(state, es_u16, gt, n_valid):
            # es_u16: (tl, bs, H, W) u16 x256; gt: same shape, u16 x256 or
            # f32; n_valid: valid batch entries (eval tails are padded by
            # repeating the last sample — exclude the copies)
            if gt.dtype == jnp.uint16:
                gt_i = gt.astype(jnp.int32)
            else:  # unencoded f32 gt (tests/fixtures): quantize like wire
                gt_i = jnp.clip(gt * self._SCALE + 0.5, 0,
                                65535).astype(jnp.int32)
            es_i = es_u16.astype(jnp.int32)
            err = jnp.abs(jnp.where(gt_i > 0, es_i, 0) - gt_i)  # int wire units
            bs = es_u16.shape[1]
            valid = (jnp.arange(bs) < n_valid)[None, :, None, None]
            w = jnp.broadcast_to(valid, err.shape).astype(jnp.float32)
            hist = state["hist"].at[err.reshape(-1)].add(
                w.reshape(-1), mode="drop")
            over = state["over"] + jax.vmap(
                lambda t: jnp.sum(jnp.where(err > t, w, 0.0)))(
                    jnp.asarray(thr))
            return dict(hist=hist, over=over)

        self._init = init
        self._update = jax.jit(update, donate_argnums=(0,))

    def add(self, es_u16, gt, n_valid: int):
        if self._update is None:
            self._build()
        if self._state is None:
            self._state = self._init()
        self._state = self._update(self._state, es_u16, gt, n_valid)

    def get(self) -> dict:
        hist = np.asarray(self._state["hist"], np.float64)
        over = np.asarray(self._state["over"], np.float64)
        count = hist.sum()
        vals = np.arange(self._BINS) / self._SCALE
        mean = float((hist * vals).sum() / count)
        var = float((hist * vals ** 2).sum() / count) - mean ** 2
        nonzero = np.nonzero(hist)[0]
        cum = np.cumsum(hist)

        def quantile(q):
            return float(np.searchsorted(cum, q * count) / self._SCALE)

        out = {
            "dist2_mean": mean,
            "dist2_std": float(np.sqrt(max(var, 0.0))),
            "dist2_median": quantile(0.5),
            "dist2_q10": quantile(0.1),
            "dist2_q90": quantile(0.9),
            "dist2_min": float(nonzero[0] / self._SCALE) if nonzero.size else 0.0,
            "dist2_max": float(nonzero[-1] / self._SCALE) if nonzero.size else 0.0,
        }
        for t, o in zip(self.thresholds, over):
            out[f"of{t}"] = float(o / count)
        return out

    def items(self):
        return self.get().items()

    def __str__(self):
        return ", ".join(f"{k}={v:.5f}" for k, v in self.get().items())
