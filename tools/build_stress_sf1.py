#!/usr/bin/env python
"""Build the sf1-equivalent stress dataset (10× sf0.1, consistent key
remapping) under .stress_sf1/ at the repo root. bench.py picks the
directory up automatically and appends a "stress" section to its JSON
line. Gitignored — derived data, rebuildable in ~a minute.

Usage: python tools/build_stress_sf1.py [factor] [src_sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from polardbx_cdc_spark.scaleup import scale_dataset  # noqa: E402
from polardbx_cdc_spark.session import get_spark  # noqa: E402


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = os.path.join(REPO, ".stress_sf1")
    spark = get_spark("build-stress-sf1")
    t0 = time.time()
    scale_dataset(spark, src, dst, factor)
    with open(os.path.join(dst, "MANIFEST"), "w") as f:
        f.write(f"factor={factor}\nsrc={src}\nbuilt={time.strftime('%Y-%m-%dT%H:%M:%S')}\n")
    print(f"built {dst} at {factor}x {src} in {time.time() - t0:.1f}s")
    spark.stop()


if __name__ == "__main__":
    main()
