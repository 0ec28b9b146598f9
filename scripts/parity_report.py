"""Render the accuracy-parity metric trajectories as a markdown table.

    python scripts/parity_report.py [output_dir]

Reads output/{single_frame_selfsup,multi_frame,single_frame}/metrics.json
(the staged DIS-SF -> DIS-MF -> DIS-FTSF pipeline written by
scripts/run_parity.sh) and prints per-epoch test metrics — mean absolute
disparity error and the o(t) outlier fractions of the reference eval suite
(reference model/single_frame_worker.py:224-228).
"""
import json
import pathlib
import sys

STAGES = (
    ("single_frame_selfsup", "DIS-SF (self-supervised)"),
    ("multi_frame", "DIS-MF"),
    ("single_frame", "DIS-FTSF"),
)
KEYS = ("dist2_mean", "of0.1", "of0.5", "of1", "of2", "of5")


def main():
    out = pathlib.Path(sys.argv[1] if len(sys.argv) > 1 else "output")
    has_selfsup = (out / "single_frame_selfsup" / "metrics.json").exists()
    for dirname, title in STAGES:
        p = out / dirname / "metrics.json"
        if dirname == "single_frame_selfsup" and not has_selfsup:
            # mid-run: the self-supervised SF stage is still at
            # output/single_frame (archived to _selfsup before FTSF)
            p = out / "single_frame" / "metrics.json"
        elif dirname == "single_frame" and not has_selfsup:
            continue            # single_frame is still the selfsup run
        if not p.exists():
            continue
        m = json.loads(p.read_text())
        rows = []
        for ep in sorted(m, key=int):
            t = m[ep].get("test", {})
            t = t.get("0", t.get(next(iter(t), ""), {})) if t else {}
            if "of1" in t:
                rows.append((int(ep), [t.get(k) for k in KEYS]))
        if not rows:
            continue
        print(f"\n### {title} ({p})")
        print("| epoch | " + " | ".join(KEYS) + " |")
        print("|" + "---|" * (len(KEYS) + 1))
        for ep, vals in rows:
            cells = " | ".join("-" if v is None else f"{v:.4f}" for v in vals)
            print(f"| {ep} | {cells} |")


if __name__ == "__main__":
    main()
