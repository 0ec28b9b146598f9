"""Round-5 finishing driver: MF-heavy rebudget after the SF stage.

pipeline_drive.py's fixed stage fractions starve DIS-MF when the SF
stage + presave overshoot (round-4 failure mode: MF evaluated inside its
epoch<2 warmup-L1 regime, VERDICT r4 item 1).  This driver runs the
remaining stages with explicit per-stage budgets, in ONE process
(in-process executable reuse), with retests that never skip:

  DIS-MF train (deadline) -> MF full-split retest ->
  SF full-split retest (missed by the old test_frequency gate) ->
  MF presave (pseudo-GT hand-off) ->
  DIS-FTSF train (deadline) -> FTSF full-split retest

Usage:
  DIS_EXEC_CACHE=output/execache python scripts/round5_finish.py \
      --sf_epoch 18 --mf_minutes 45 --ftsf_minutes 18
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def last_epoch(exp_dir: Path):
    eps = sorted(int(p.stem.split("_")[1]) for p in exp_dir.glob("net_*.params"))
    return eps[-1] if eps else None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf_epoch", type=int, required=True,
                    help="trained SF epoch to full-split-retest")
    ap.add_argument("--mf_minutes", type=float, default=45.0)
    ap.add_argument("--ftsf_minutes", type=float, default=18.0)
    ap.add_argument("--mf_epochs", type=int, default=20)
    ap.add_argument("--ftsf_epochs", type=int, default=15)
    ap.add_argument("--skip_mf_train", action="store_true")
    ap.add_argument("--no_ftsf", action="store_true",
                    help="stop after the MF/SF retests (skips the MF "
                         "presave + FTSF stages — the 1024-sample MF "
                         "inference presave alone costs tens of minutes "
                         "on the 1-core host)")
    args = ap.parse_args()

    from depthinspace_tpu.config import RunConfig, load_paths
    from depthinspace_tpu.train import SingleFrameWorker, MultiFrameWorker
    from depthinspace_tpu.tools import presave_disp

    paths = load_paths()
    out_root = Path(paths["OUTPUT_DIR"])
    data_dir = Path(paths["DATA_DIR"])
    n_total = len(sorted(data_dir.glob("0*")))
    ranges = f"512:{n_total}"

    def mkcfg(architecture, **kw):
        kw.setdefault("write_debug_images", False)
        return RunConfig(data_dir=data_dir, output_dir=out_root,
                         architecture=architecture, flow_source="pred",
                         test_batch_size=16, test_frequency=2,
                         test_samples=128, eval_metrics="device", **kw)

    def stage(name):
        print(f"\n=== finish stage: {name} ({time.strftime('%H:%M:%S')})",
              flush=True)

    def retest(worker_cls, architecture, epoch, **kw):
        cfg = mkcfg(architecture, epochs=epoch + 1, **kw)
        cfg.test_samples = -1
        cfg.test_frequency = 1
        worker_cls(cfg).retest(epoch=epoch)

    # ---- DIS-MF train
    if not args.skip_mf_train:
        stage(f"DIS-MF train ({args.mf_minutes:.0f} min)")
        cfg = mkcfg("multi_frame", epochs=args.mf_epochs, train_batch_size=4,
                    mf_remat=False,
                    deadline_ts=time.time() + args.mf_minutes * 60.0)
        MultiFrameWorker(cfg).train(resume=True)

    mf_last = last_epoch(out_root / "multi_frame")
    assert mf_last is not None, "no MF checkpoint"

    stage(f"MF full-split retest @ {mf_last}")
    retest(MultiFrameWorker, "multi_frame", mf_last,
           train_batch_size=4, mf_remat=False)

    stage(f"SF full-split retest @ {args.sf_epoch}")
    retest(SingleFrameWorker, "single_frame", args.sf_epoch)

    sf_dir = out_root / "single_frame"
    selfsup_dir = out_root / "single_frame_selfsup"
    if args.no_ftsf:
        stage("report (FTSF skipped)")
        summary = {}
        for tag, d in (("sf_selfsup", sf_dir),
                       ("mf", out_root / "multi_frame")):
            mpath = d / "metrics.json"
            if mpath.exists():
                summary[tag] = json.loads(mpath.read_text())
        (out_root / "pipeline_summary.json").write_text(json.dumps(summary))
        print("done (no ftsf)", flush=True)
        return

    stage(f"MF presave @ {mf_last} (ranges {ranges})")
    presave_disp.main(["multi_frame", "--epoch", str(mf_last),
                       "--flow_source", "pred", "--ranges", ranges])

    # ---- DIS-FTSF
    if not selfsup_dir.exists():        # idempotent on re-runs
        sf_dir.rename(selfsup_dir)
        sf_dir.mkdir()
    stage(f"DIS-FTSF train ({args.ftsf_minutes:.0f} min)")
    cfg = mkcfg("single_frame", epochs=args.ftsf_epochs, use_pseudo_gt=True,
                deadline_ts=time.time() + args.ftsf_minutes * 60.0)
    SingleFrameWorker(cfg).train(resume=True)
    ftsf_last = last_epoch(sf_dir)
    if ftsf_last is not None:
        stage(f"FTSF full-split retest @ {ftsf_last}")
        retest(SingleFrameWorker, "single_frame", ftsf_last,
               use_pseudo_gt=True)

    stage("report")
    summary = {}
    for tag, d in (("sf_selfsup", selfsup_dir), ("ftsf", sf_dir),
                   ("mf", out_root / "multi_frame")):
        mpath = d / "metrics.json"
        if mpath.exists():
            summary[tag] = json.loads(mpath.read_text())
    (out_root / "pipeline_summary.json").write_text(json.dumps(summary))
    print("done", flush=True)


if __name__ == "__main__":
    main()
