"""Run configuration.

Two-part config mirroring the reference's contract (SURVEY.md §5):
- machine paths from ``config.json`` (same keys: OUTPUT_DIR, DATA_DIR,
  SHAPENET_DIR, ... — reference config.json:1-7), read once here instead of
  ad hoc at import time in five files;
- hyperparameters from the CLI (utils/args.py), collected into one typed
  dataclass instead of scattered constructor defaults.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from pathlib import Path


DEFAULT_CONFIG_PATH = os.environ.get(
    "DIS_CONFIG", os.path.join(os.path.dirname(__file__), "..", "config.json"))


def load_paths(config_path: str | None = None) -> dict:
    path = os.path.abspath(config_path or DEFAULT_CONFIG_PATH)
    with open(path) as fp:
        return json.load(fp)


@dataclass
class RunConfig:
    # paths
    data_dir: Path
    output_dir: Path
    # run identity
    architecture: str = "single_frame"      # single_frame | multi_frame
    data_type: str = "synthetic"            # synthetic | real
    # schedule
    epochs: int = 100
    warmup_epochs: int = 150
    # model / preprocessing
    lcn_radius: int = 5
    max_disp: float = 128.0
    track_length: int = 4
    # batching
    train_batch_size: int = 8
    test_batch_size: int = 4
    num_workers: int = 4
    # options
    use_pseudo_gt: bool = False
    mf_dtype: str = "bfloat16"              # FuseNet compute dtype
    # remat FuseNet fusion blocks: off by default — bf16 bs=4 at 512x432
    # fits HBM without it and runs ~25% faster (remat is for larger
    # batches/resolutions)
    mf_remat: bool = False
    # gradient-accumulation microbatches per optimizer step (train/steps.py):
    # 0 = auto (2 for the full-res noremat DIS-MF graph, whose bs=4
    # activations alone are ~15.9 GiB on a 16 GiB v5e; 1 otherwise).
    # Exact full-batch gradients for plain-mean loss terms; masked-mean
    # terms normalize per microbatch (same statistics as the smaller batch).
    accum_steps: int = 0
    device_augment: bool = True             # augmentation inside the jit step
    test_frequency: int = 1                 # eval every N epochs
    # eval-metric backend: exact (host, buffers per-pixel distances),
    # device (on-device streaming, exact at wire resolution), or auto
    # (device for test sets > 64 samples)
    eval_metrics: str = "auto"              # auto | exact | device
    flow_source: str = "file"        # file | rigid (in-graph, synthetic) |
                                     # net (in-graph frozen FlowNet) |
                                     # pred (in-graph from predicted disp)
    flow_params: str = ""            # FlowNet msgpack for flow_source=net
                                     # ("" = OUTPUT_DIR/flownet.msgpack)
    # serve batches from the pre-encoded wire_cache/ memmaps when present
    # (data/cache.py — the single-core loader fast path); falls back to the
    # HDF5 TrackDataset when the cache or a required field is missing
    wire_cache: bool = True
    # scale-s photometric at 1/2^s res (train/objective.py::LossContext).
    # Off: the matched-step overfit A/B measured the reference's
    # full-res-at-every-scale behavior better (STATUS.md round 4)
    photometric_pyramid: bool = False
    geo_max_shift: int = 16                 # flow-warp enumeration half-width
    seed: int = 42
    learning_rate: float = 1e-4
    save_frequency: int = 1
    max_train_iter: int = -1
    test_samples: int = -1                  # cap eval-split size (-1 = all)
    # wall-clock deadline (epoch seconds; 0 = none): the train loop stops
    # cleanly after the epoch in flight when time.time() passes it — lets a
    # single-process pipeline driver budget stages without SIGKILL-style
    # `timeout` truncation (scripts/pipeline_drive.py)
    deadline_ts: float = 0.0
    write_debug_images: bool = True
    # device
    use_mesh: bool = True                   # data-parallel over all devices
    extra: dict = field(default_factory=dict)

    @classmethod
    def from_args(cls, args, config_path: str | None = None) -> "RunConfig":
        paths = load_paths(config_path)
        return cls(
            data_dir=Path(paths["DATA_DIR"]),
            output_dir=Path(paths["OUTPUT_DIR"]),
            architecture=args.architecture,
            data_type=args.data_type,
            epochs=args.epochs,
            warmup_epochs=args.warmup_epochs,
            lcn_radius=args.lcn_radius,
            max_disp=float(args.max_disp),
            track_length=args.track_length,
            train_batch_size=args.train_batch_size,
            test_batch_size=getattr(args, "test_batch_size", 4),
            use_pseudo_gt=args.use_pseudo_gt,
            mf_dtype=getattr(args, "mf_dtype", "bfloat16"),
            mf_remat=getattr(args, "mf_remat", False),
            accum_steps=getattr(args, "accum_steps", 0),
            device_augment=getattr(args, "device_augment", True),
            test_frequency=getattr(args, "test_frequency", 1),
            eval_metrics=getattr(args, "eval_metrics", "auto"),
            flow_source=getattr(args, "flow_source", "file"),
            flow_params=getattr(args, "flow_params", ""),
            wire_cache=getattr(args, "wire_cache", True),
            photometric_pyramid=getattr(args, "photometric_pyramid", False),
            geo_max_shift=getattr(args, "geo_max_shift", 16),
            max_train_iter=getattr(args, "max_train_iter", -1),
            test_samples=getattr(args, "test_samples", -1),
        )
