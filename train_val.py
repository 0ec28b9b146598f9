#!/usr/bin/env python
"""Train/evaluate DIS-SF, DIS-FTSF and DIS-MF — same CLI surface as the
reference entry point (reference train_val.py, co/args.py:30-74):

  python train_val.py --architecture single_frame --cmd retrain
  python train_val.py --architecture single_frame --cmd retest --epoch 49
  python train_val.py --architecture multi_frame  --cmd resume
  python train_val.py --architecture single_frame --use_pseudo_gt True ...

Paths come from config.json (OUTPUT_DIR, DATA_DIR).
"""
import sys

from depthinspace_tpu.utils.args import parse_args
from depthinspace_tpu.config import RunConfig
from depthinspace_tpu.train import SingleFrameWorker, MultiFrameWorker


def main(argv=None):
    args = parse_args(argv)
    if args.architecture == "multi_frame" and args.use_pseudo_gt:
        print("use_pseudo_gt is only applicable to the single_frame model")
        sys.exit(1)

    cfg = RunConfig.from_args(args)
    worker_cls = (SingleFrameWorker if args.architecture == "single_frame"
                  else MultiFrameWorker)
    worker = worker_cls(cfg)
    worker.do(args.cmd, epoch=args.epoch)


if __name__ == "__main__":
    main()
