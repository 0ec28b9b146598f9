"""CLI: build the wire-format dataset cache (data/cache.py).

One-off pre-encode of a dataset into memmappable 16-bit wire arrays — the
single-core loader fast path.  Run after dataset generation (and re-run
with --fields primary_disp --force after a presave stage refreshed the
single_frame_disp.hdf5 files; presave_disp does this automatically).

Usage:
  python -m depthinspace_tpu.tools.build_cache [--data_dir DIR]
      [--fields im,ambient,disp,R,t] [--force]
"""

from __future__ import annotations

import argparse
from pathlib import Path

from ..config import load_paths
from ..data.cache import build_wire_cache, BASE_FIELDS


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", default=None)
    ap.add_argument("--fields", default=",".join(BASE_FIELDS))
    ap.add_argument("--force", action="store_true")
    args = ap.parse_args(argv)

    data_dir = Path(args.data_dir or load_paths()["DATA_DIR"])
    fields = [f for f in args.fields.split(",") if f]
    cache = build_wire_cache(data_dir, fields=fields, progress=True,
                             force=args.force)
    print(f"wire cache ready at {cache} (fields: {', '.join(fields)})")


if __name__ == "__main__":
    main()
