"""Stage-level profile of FeatureBasedVO.add on the real clip (TPU).

VERDICT r3 item 4: the pipeline ran at 0.171 fps with no per-stage
breakdown.  Times extraction / matching / PnP / guided localization /
triangulation / BA per frame, on the second pass (steady-state compiles).

Run: python benchmarks/profile_feature_vo.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax

cache = Path(__file__).resolve().parent.parent / ".jax_cache"
cache.mkdir(exist_ok=True)
jax.config.update("jax_compilation_cache_dir", str(cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

from tadataka_tpu.dataset.new_tsukuba import NewTsukubaDataset
from tadataka_tpu.vo.feature_based import FeatureBasedVO


def main():
    ds = NewTsukubaDataset("/root/reference/tests/dataset/new_tsukuba")
    frames = [ds[i][0] for i in range(len(ds))]

    stages = ["_extract", "_match", "_solve_pnp", "_guided_localize",
              "_triangulate_new", "run_ba", "_init_first_two",
              "_refine_two_view"]
    times = {}

    def wrap(cls, name):
        orig = getattr(cls, name)

        def timed(self, *a, **k):
            t0 = time.perf_counter()
            out = orig(self, *a, **k)
            times.setdefault(name, []).append(time.perf_counter() - t0)
            return out
        setattr(cls, name, timed)

    for n in stages:
        wrap(FeatureBasedVO, n)

    for pass_i in range(2):
        times.clear()
        vo = FeatureBasedVO(fast_threshold=20.0 / 255.0, min_matches=40,
                            max_keypoints=1024)
        per_frame = []
        for f in frames:
            t0 = time.perf_counter()
            vo.estimate(f)
            per_frame.append(time.perf_counter() - t0)
    print("steady-state pass (per-frame):",
          [f"{t*1e3:.0f}ms" for t in per_frame])
    print(f"median fps: {1.0/np.median(per_frame[1:]):.3f}")
    total = sum(sum(v) for v in times.values())
    for n in stages:
        if n in times:
            v = times[n]
            print(f"  {n:18s}: n={len(v):3d} total={sum(v)*1e3:8.1f} ms "
                  f"mean={np.mean(v)*1e3:7.1f} ms")
    print(f"  accounted: {total*1e3:.0f} ms of {sum(per_frame)*1e3:.0f} ms")


if __name__ == "__main__":
    main()
