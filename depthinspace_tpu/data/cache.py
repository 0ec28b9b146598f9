"""Pre-encoded wire-format dataset cache: the single-core loader fast path.

Motivation (round-4 profiling, one CPU core): the HDF5 loader path costs
~2.8 s of host work per SF batch — getitem (HDF5 read + f32 casts) 1.26 s,
collate 1.17 s, wire-encode 0.39 s — against a 0.30 s device step, capping
end-to-end training at ~0.44 steps/s.  Threads cannot help on one core;
the work itself has to go.

The cache stores every sample ALREADY in the 16-bit wire encoding
(data/wire.py) as flat memmappable arrays:

    <data_dir>/wire_cache/meta.json        {version, fields, names, shapes}
    <data_dir>/wire_cache/im.npy           (N, 4, H, W)  uint16  x65535
    <data_dir>/wire_cache/ambient.npy      (N, 4, H, W)  uint16  x65535
    <data_dir>/wire_cache/disp.npy         (N, 4, H, W)  uint16  x256
    <data_dir>/wire_cache/R.npy            (N, 4, 3, 3)  float32
    <data_dir>/wire_cache/t.npy            (N, 4, 3)     float32
    [+ primary_disp / pseudo_gt / sgm_disp when built]

Batch assembly becomes one fancy-indexed memmap gather per field straight
into the track-major layout — no HDF5, no dtype conversion, no separate
collate or encode step (encode_batch passes non-f32 fields through).
Measured: ~2.8 s -> ~0.05 s host work per batch of 8.

The cached path serves synthetic training with on-device augmentation and
in-graph flow (rigid/net); file-flow or host-augmentation configs fall
back to the HDF5 ``TrackDataset`` transparently.

Frame permutations reproduce ``TrackDataset`` exactly (same per-index,
per-epoch RNG seeding) so cached and uncached runs see identical data.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Optional, Sequence

import numpy as np
import h5py

from .dataset import Batch

CACHE_DIR_NAME = "wire_cache"
_VERSION = 1

# field -> (source hdf5 file, dataset key, wire dtype, scale)
_FIELDS = {
    "im": ("frames.hdf5", "im", np.uint16, 65535.0),
    "ambient": ("frames.hdf5", "ambient", np.uint16, 65535.0),
    "disp": ("frames.hdf5", "disp", np.uint16, 256.0),
    "sgm_disp": ("frames.hdf5", "sgm_disp", np.uint16, 256.0),
    "primary_disp": ("single_frame_disp.hdf5", "disp", np.uint16, 256.0),
    "pseudo_gt": ("multi_frame_disp.hdf5", "disp", np.uint16, 256.0),
    "R": ("frames.hdf5", "R", np.float32, None),
    "t": ("frames.hdf5", "t", np.float32, None),
}
BASE_FIELDS = ("im", "ambient", "disp", "R", "t")
_BASE_FIELDS = BASE_FIELDS          # back-compat alias


def _encode(x: np.ndarray, dtype, scale) -> np.ndarray:
    if scale is None:
        return x.astype(dtype)
    return np.clip(x * scale + 0.5, 0, 65535).astype(dtype)


def build_wire_cache(data_dir, fields: Sequence[str] = BASE_FIELDS,
                     sample_glob: str = "0*", progress: bool = False,
                     force: bool = False) -> Path:
    """Build/extend the wire cache for ``data_dir``.

    Idempotent per field: existing field files for the same sample list are
    kept; new fields are added (e.g. primary_disp after the presave stage).
    ``force`` re-encodes the given fields even if cached (use after a
    presave refreshed the source hdf5s).
    """
    data_dir = Path(data_dir)
    dirs = sorted(p for p in data_dir.glob(sample_glob)
                  if p.is_dir() and (p / "frames.hdf5").exists())
    if not dirs:
        raise FileNotFoundError(f"no sample dirs under {data_dir}")
    names = [p.name for p in dirs]

    cache = data_dir / CACHE_DIR_NAME
    cache.mkdir(exist_ok=True)
    meta_path = cache / "meta.json"
    meta = {"version": _VERSION, "names": names, "fields": {}}
    if meta_path.exists():
        old = json.loads(meta_path.read_text())
        if old.get("names") == names and old.get("version") == _VERSION:
            meta = old
        # else: sample list changed -> rebuild everything from scratch

    for field in fields:
        src_file, key, dtype, scale = _FIELDS[field]
        out_path = cache / f"{field}.npy"
        if field in meta["fields"] and out_path.exists() and not force:
            continue
        arr = None
        missing = []      # presave stages may cover only --ranges subsets;
        for i, d in enumerate(dirs):      # uncovered samples are zero-filled
            if not (d / src_file).exists():   # and recorded so readers can
                missing.append(d.name)        # refuse to serve them
                continue
            with h5py.File(d / src_file, "r") as f:
                v = np.asarray(f[key])
            if v.ndim == 4 and v.shape[1] == 1:      # (4,1,H,W) -> (4,H,W)
                v = v[:, 0]
            enc = _encode(v.astype(np.float32), dtype, scale)
            if arr is None:
                arr = np.lib.format.open_memmap(
                    out_path, mode="w+", dtype=dtype,
                    shape=(len(dirs),) + enc.shape)
            arr[i] = enc
            if progress and i % 256 == 0:
                print(f"cache {field}: {i}/{len(dirs)}", flush=True)
        if arr is None:
            raise FileNotFoundError(
                f"no sample has {src_file} (field {field!r})")
        arr.flush()
        meta["fields"][field] = {"shape": list(arr.shape),
                                 "dtype": np.dtype(dtype).name,
                                 "missing": missing}
        meta_path.write_text(json.dumps(meta))
    return cache


def has_wire_cache(data_dir, fields: Sequence[str] = _BASE_FIELDS) -> bool:
    meta_path = Path(data_dir) / CACHE_DIR_NAME / "meta.json"
    if not meta_path.exists():
        return False
    meta = json.loads(meta_path.read_text())
    return (meta.get("version") == _VERSION
            and all(f in meta["fields"] for f in fields))


class CachedTrackDataset:
    """Memmap-backed, wire-encoded drop-in for ``TrackDataset``.

    Exposes the same iteration surface the DataLoader/worker use
    (__len__, __getitem__, current_epoch, track_length) plus a
    ``get_batch`` fast path the DataLoader prefers: one fancy-indexed
    gather per field directly into the track-major Batch layout.

    ``sample_names``: the subset (split) to serve, as sample dir names —
    indices into the cache are resolved through meta.json so splits remain
    aligned with the worker's sorted-glob convention no matter which subset
    was cached.
    """

    def __init__(self, data_dir, sample_names: Sequence[str],
                 track_length: int = 4, train: bool = True,
                 load_primary: bool = False, load_pseudo_gt: bool = False,
                 load_sgm: bool = False):
        self.data_dir = Path(data_dir)
        cache = self.data_dir / CACHE_DIR_NAME
        meta = json.loads((cache / "meta.json").read_text())
        pos = {n: i for i, n in enumerate(meta["names"])}
        try:
            self.indices = np.asarray([pos[n] for n in sample_names],
                                      np.int64)
        except KeyError as e:
            raise FileNotFoundError(f"sample {e} not in wire cache") from e

        self.fields = {}
        need = list(_BASE_FIELDS)
        if load_primary:
            need.append("primary_disp")
        if load_pseudo_gt:
            need.append("pseudo_gt")
        if load_sgm:
            need.append("sgm_disp")
        for f in need:
            if f not in meta["fields"]:
                raise FileNotFoundError(f"field {f!r} not in wire cache")
            missing = set(meta["fields"][f].get("missing", ()))
            if missing:
                bad = missing.intersection(sample_names)
                if bad:
                    raise FileNotFoundError(
                        f"wire cache field {f!r} does not cover "
                        f"{len(bad)} requested samples (e.g. "
                        f"{sorted(bad)[0]}) — re-run presave/build_cache")
            self.fields[f] = np.load(cache / f"{f}.npy", mmap_mode="r")

        self.track_length = track_length
        self.train = train
        self.current_epoch = 0

    def __len__(self):
        return len(self.indices)

    def _perm(self, idx: int) -> np.ndarray:
        """Identical seeding to TrackDataset._rng -> same frame choice."""
        rng = np.random.RandomState()
        if self.train:
            rng.seed((self.current_epoch + 1) * len(self) + idx)
            return rng.permutation(4)[:self.track_length]
        return np.arange(self.track_length)

    def __getitem__(self, idx: int) -> dict:
        """Per-sample dict (wire-encoded) for the generic collate path."""
        gi = self.indices[idx]
        perm = self._perm(idx)
        ret = {"id": idx}
        for f, arr in self.fields.items():
            ret[f] = np.asarray(arr[gi][perm])
        return ret

    def get_batch(self, idxs: Sequence[int]) -> Batch:
        """Assemble a track-major wire-encoded Batch in one gather/field."""
        idxs = np.asarray(idxs)
        gidx = self.indices[idxs]
        perms = np.stack([self._perm(int(i)) for i in idxs])   # (bs, tl)
        out = {}
        tl = self.track_length
        for f, arr in self.fields.items():
            # gather straight into the track-major layout: one fancy-indexed
            # copy per frame slot, no transpose pass
            o = np.empty((tl, len(idxs)) + arr.shape[2:], arr.dtype)
            for ti in range(tl):
                o[ti] = arr[gidx, perms[:, ti]]
            out[f] = o
        return Batch(im=out["im"], ambient=out["ambient"],
                     disp_gt=out["disp"], R=out["R"], t=out["t"],
                     primary_disp=out.get("primary_disp"),
                     pseudo_gt=out.get("pseudo_gt"),
                     sgm_disp=out.get("sgm_disp"))
