"""CLI argument surface — same flags/choices/defaults as the reference
(reference co/args.py:30-74) so documented commands keep working."""

from __future__ import annotations

import argparse


def str2bool(v) -> bool:
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if v.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError("boolean value expected")


def parse_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_type", default="synthetic",
                        choices=["synthetic", "real"], type=str)
    parser.add_argument("--cmd", help="Start training or test",
                        default="resume",
                        choices=["retrain", "resume", "retest", "test_init"],
                        type=str)
    parser.add_argument("--epoch",
                        help="If larger than -1, retest on the specified epoch",
                        default=-1, type=int)
    parser.add_argument("--epochs", help="Training epochs", default=100,
                        type=int)
    parser.add_argument("--warmup_epochs",
                        help="Epochs where SGM disparities supervise training "
                             "on the real dataset", default=150, type=int)
    parser.add_argument("--lcn_radius",
                        help="Radius of the window for LCN pre-processing",
                        default=5, type=int)
    parser.add_argument("--max_disp", help="Maximum disparity", default=128,
                        type=int)
    parser.add_argument("--track_length",
                        help="Track length for geometric loss", default=4,
                        type=int)
    parser.add_argument("--train_batch_size", help="Train batch size",
                        default=8, type=int)
    parser.add_argument("--architecture", default="single_frame",
                        choices=["single_frame", "multi_frame"], type=str)
    parser.add_argument("--use_pseudo_gt",
                        help="Only applicable in single-frame model",
                        default=False, type=str2bool)
    parser.add_argument("--device_augment",
                        help="Run training augmentation inside the jitted "
                             "step on the accelerator instead of in CPU "
                             "loader workers",
                        default=True, type=str2bool)
    parser.add_argument("--photometric_pyramid",
                        help="Compute the scale-s photometric loss at "
                             "1/2^s resolution (coarse-to-fine capture "
                             "range; see train/objective.py). Default off: "
                             "a matched 2000-step overfit A/B measured the "
                             "reference worker's full-res-at-every-scale "
                             "behavior BETTER (o(1) 0.295 vs 0.324, "
                             "output/overfit_sf_{fullres,pyr}.json)",
                        default=False, type=str2bool)
    parser.add_argument("--wire_cache",
                        help="Serve batches from the pre-encoded wire "
                             "cache when present (data/cache.py)",
                        default=True, type=str2bool)
    parser.add_argument("--test_frequency",
                        help="Evaluate every N epochs", default=1, type=int)
    parser.add_argument("--test_batch_size",
                        help="Eval batch size (larger amortizes the "
                             "host<->device round trip per batch)",
                        default=4, type=int)
    parser.add_argument("--eval_metrics", default="auto",
                        choices=["auto", "exact", "device"],
                        help="Eval-metric backend: exact host statistics "
                             "(buffers per-pixel distances + per-batch D2H) "
                             "or on-device streaming (exact at the 1/256 px "
                             "wire resolution); auto = device for test sets "
                             "over 64 samples")
    parser.add_argument("--flow_source", default="file",
                        choices=["file", "rigid", "net", "pred"],
                        help="file: flow.hdf5 from any presave provider; "
                             "rigid: computed in-graph from GT disparity + "
                             "poses (synthetic data only — skips loading "
                             "the flow block entirely); net: computed "
                             "in-graph by the frozen learned FlowNet "
                             "(GT-free; replaces the presave_flow stage); "
                             "pred: computed in-graph from PREDICTED "
                             "disparity + poses (GT-free — MF uses the "
                             "presaved primary disparities, SF the live "
                             "stop-gradient prediction)")
    parser.add_argument("--flow_params", default="",
                        help="FlowNet msgpack for --flow_source net "
                             "(default OUTPUT_DIR/flownet.msgpack)")
    parser.add_argument("--mf_remat",
                        help="Rematerialize FuseNet fusion blocks (trades "
                             "recompute for HBM; the default off is ~25% "
                             "faster and bf16 bs=4 at 512x432 fits without "
                             "it — enable for larger batches/resolutions)",
                        default=False, type=str2bool)
    parser.add_argument("--accum_steps",
                        help="Gradient-accumulation microbatches per "
                             "optimizer step (0 = auto: 2 for the full-res "
                             "noremat DIS-MF graph so bs=4 fits the 16 GiB "
                             "v5e in-worker, 1 otherwise). Exact full-batch "
                             "gradients for plain-mean loss terms; "
                             "masked-mean terms normalize per microbatch "
                             "(same statistics as the smaller batch)",
                        default=0, type=int)
    parser.add_argument("--geo_max_shift",
                        help="Half-width (px) of the enumeration window of "
                             "the Pallas flow-warp kernels in the geometric "
                             "loss; in-image flows beyond it sample as zeros "
                             "(the fb/vc masks then reject the pixel). The "
                             "train loop reports the fraction of in-image "
                             "flow vectors exceeding it (geo_oor_frac in "
                             "metrics.json) — raise this if that fraction "
                             "is non-negligible (cost grows ~linearly)",
                        default=16, type=int)
    parser.add_argument("--max_train_iter",
                        help="Cap train steps per epoch (-1 = full pass); "
                             "bounds wall-clock per epoch on time-boxed "
                             "runs — an 'epoch' then sees "
                             "batch_size*max_train_iter samples",
                        default=-1, type=int)
    parser.add_argument("--test_samples",
                        help="Evaluate on the first N samples of each test "
                             "split instead of all of it (-1 = all); the "
                             "subset is deterministic so metric "
                             "trajectories stay comparable across epochs",
                        default=-1, type=int)
    parser.add_argument("--mf_dtype",
                        help="FuseNet compute dtype (params/losses stay f32); "
                             "bfloat16 halves HBM and enables the reference "
                             "batch size 4 at full resolution on one chip",
                        default="bfloat16",
                        choices=["float32", "bfloat16"], type=str)
    return parser.parse_args(argv)
