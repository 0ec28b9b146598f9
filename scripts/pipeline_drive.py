"""Single-process, deadline-aware accuracy-parity pipeline driver.

Runs the full reference pipeline (reference README.md:69-125):

  DIS-SF selfsup -> full-split SF retest -> presave SF disparities ->
  DIS-MF -> full-split MF retest -> presave MF disparities ->
  DIS-FTSF (pseudo-GT fine-tune) -> full-split FTSF retest

in ONE process.  Why one process (replaces scripts/parity_drive.sh):
on this backend every fresh process pays a multi-minute first-execution
stall (tunnel warm-up) AND its own XLA compiles (the persistent compile
cache keys are per-process — identical HLO hashes to different entries,
see CLAUDE.md); a 5-stage shell pipeline paid both five times.  In-process,
the warm-up happens once and every repeated graph (SF eval during FTSF,
presave inference, retests) hits the in-process executable cache.

Deadlines are enforced cooperatively: each train stage gets a wall-clock
budget via RunConfig.deadline_ts and stops cleanly after the epoch in
flight (checkpoints + metrics.json are per-epoch, so truncation loses
nothing), instead of parity_drive.sh's SIGKILL `timeout`.

Usage:
  python scripts/pipeline_drive.py --minutes 240 \
      --flow_source net --sf_epochs 100 --mf_epochs 20 --ftsf_epochs 15
"""

import argparse
import json
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REPO = Path(__file__).resolve().parent.parent


def last_epoch(exp_dir: Path):
    eps = sorted(int(p.stem.split("_")[1]) for p in exp_dir.glob("net_*.params"))
    return eps[-1] if eps else None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, required=True,
                    help="total wall-clock budget")
    ap.add_argument("--flow_source", default="pred",
                    choices=["rigid", "net", "pred"],
                    help="pred = in-graph rigid flow from PREDICTED "
                         "disparity + poses (GT-free, the reference-parity "
                         "configuration on this synthetic data — see "
                         "train/objective.py::LossContext.flow_source); "
                         "net = frozen learned FlowNet in-graph (GT-free; "
                         "image-based flow is near-ill-posed on the "
                         "rig-projected dot imagery); rigid = GT-depth-"
                         "derived flow (plumbing checks only)")
    ap.add_argument("--sf_epochs", type=int, default=100)
    ap.add_argument("--mf_epochs", type=int, default=20)
    ap.add_argument("--ftsf_epochs", type=int, default=15)
    ap.add_argument("--sf_frac", type=float, default=0.45,
                    help="fraction of the post-reserve budget for SF")
    ap.add_argument("--mf_frac", type=float, default=0.35)
    ap.add_argument("--test_samples", type=int, default=128,
                    help="eval-prefix size during training (full split "
                         "retests always run at the end)")
    ap.add_argument("--test_frequency", type=int, default=2)
    ap.add_argument("--test_batch_size", type=int, default=16)
    ap.add_argument("--mf_max_iter", type=int, default=-1,
                    help="cap MF steps/epoch (-1 = full pass)")
    ap.add_argument("--reserve_s", type=float, default=1500,
                    help="reserve for presaves + retests")
    ap.add_argument("--skip_sf", action="store_true",
                    help="SF already trained; start at the SF retest")
    args = ap.parse_args()

    t_end = time.time() + args.minutes * 60.0

    from depthinspace_tpu.config import RunConfig, load_paths
    from depthinspace_tpu.train import SingleFrameWorker, MultiFrameWorker
    from depthinspace_tpu.tools import presave_disp

    paths = load_paths()
    out_root = Path(paths["OUTPUT_DIR"])
    data_dir = Path(paths["DATA_DIR"])

    def mkcfg(architecture, **kw):
        # train stages skip the per-eval debug-PNG rendering (host-bound on
        # this 1-core VM); the final retests re-enable their own artifacts
        kw.setdefault("write_debug_images", False)
        return RunConfig(data_dir=data_dir, output_dir=out_root,
                         architecture=architecture,
                         flow_source=args.flow_source,
                         test_batch_size=args.test_batch_size,
                         test_frequency=args.test_frequency,
                         test_samples=args.test_samples,
                         eval_metrics="device", **kw)

    def stage(name):
        left = t_end - time.time()
        print(f"\n=== pipeline stage: {name} ({left / 60:.0f} min left)",
              flush=True)

    def retest(worker_cls, architecture, epoch, tag, **kw):
        """Full-split retest (512 samples, device metrics) of one epoch."""
        stage(f"retest {tag} @ epoch {epoch}")
        cfg = mkcfg(architecture, epochs=epoch + 1, write_debug_images=False,
                    **kw)
        cfg.test_samples = -1
        cfg.test_frequency = 1   # retests must never skip on the eval cadence
        w = worker_cls(cfg)
        w.retest(epoch=epoch)

    n_total = len(sorted(data_dir.glob("0*")))
    # presave coverage: full test split [512:1024] (full-split MF/FTSF
    # retests feed primary_disp) + train split [1024:N]
    ranges = f"512:{n_total}"

    budget = max(0.0, (t_end - time.time()) - args.reserve_s)
    sf_deadline = time.time() + budget * args.sf_frac

    # ---- stage 1: DIS-SF self-supervised
    if not args.skip_sf:
        stage(f"DIS-SF ({args.sf_epochs} epochs max, "
              f"{(sf_deadline - time.time()) / 60:.0f} min budget)")
        cfg = mkcfg("single_frame", epochs=args.sf_epochs,
                    deadline_ts=sf_deadline)
        SingleFrameWorker(cfg).train(resume=True)

    sf_dir = out_root / "single_frame"
    sf_last = last_epoch(sf_dir)
    if sf_last is None:
        print("no SF checkpoint produced; aborting")
        sys.exit(1)

    # ---- stage 2: full-split SF retest (before the dir is archived)
    retest(SingleFrameWorker, "single_frame", sf_last, "DIS-SF selfsup")

    # ---- stage 3: presave SF disparities
    stage(f"presave SF (epoch {sf_last}, ranges {ranges})")
    presave_disp.main(["single_frame", "--epoch", str(sf_last),
                       "--ranges", ranges])

    # ---- stage 4: DIS-MF
    mf_deadline = time.time() + max(
        0.0, (t_end - time.time() - args.reserve_s) * args.mf_frac
        / max(1e-6, 1.0 - args.sf_frac))
    stage(f"DIS-MF ({args.mf_epochs} epochs max, "
          f"{(mf_deadline - time.time()) / 60:.0f} min budget)")
    cfg = mkcfg("multi_frame", epochs=args.mf_epochs, train_batch_size=4,
                mf_remat=False, deadline_ts=mf_deadline,
                max_train_iter=args.mf_max_iter)
    MultiFrameWorker(cfg).train(resume=True)
    mf_last = last_epoch(out_root / "multi_frame")

    if mf_last is not None:
        # ---- stage 5: full-split MF retest + presave MF pseudo-GT
        retest(MultiFrameWorker, "multi_frame", mf_last, "DIS-MF",
               train_batch_size=4, mf_remat=False)
        # full test split included: the FTSF eval loss reads pseudo_gt
        stage(f"presave MF (epoch {mf_last})")
        presave_disp.main(["multi_frame", "--epoch", str(mf_last),
                           "--flow_source", args.flow_source,
                           "--ranges", ranges])

        # ---- stage 6: archive selfsup SF, fine-tune DIS-FTSF
        selfsup_dir = out_root / "single_frame_selfsup"
        if selfsup_dir.exists():
            shutil.rmtree(selfsup_dir)
        sf_dir.rename(selfsup_dir)
        sf_dir.mkdir()

        ftsf_deadline = t_end - args.reserve_s * 0.4
        stage(f"DIS-FTSF ({args.ftsf_epochs} epochs max, "
              f"{(ftsf_deadline - time.time()) / 60:.0f} min budget)")
        cfg = mkcfg("single_frame", epochs=args.ftsf_epochs,
                    use_pseudo_gt=True, deadline_ts=ftsf_deadline)
        SingleFrameWorker(cfg).train(resume=True)
        ftsf_last = last_epoch(sf_dir)
        if ftsf_last is not None:
            retest(SingleFrameWorker, "single_frame", ftsf_last, "DIS-FTSF",
                   use_pseudo_gt=True)

    stage("report")
    summary = {}
    for tag, d in (("sf_selfsup", out_root / "single_frame_selfsup"),
                   ("sf", out_root / "single_frame"),
                   ("mf", out_root / "multi_frame")):
        mpath = d / "metrics.json"
        if mpath.exists():
            summary[tag] = json.loads(mpath.read_text())
    (out_root / "pipeline_summary.json").write_text(json.dumps(summary))
    print(f"pipeline finished with {(t_end - time.time()) / 60:.1f} min to "
          "spare; metrics under output/*/metrics.json")


if __name__ == "__main__":
    main()
