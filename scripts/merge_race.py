"""Merge standalone scipy-baseline race results into a north-star artifact.

The north-star run (scripts/northstar.py) and the scipy baselines
(scripts/northstar_scipy.py) run as separate processes so a host OOM or a
TPU-tunnel fault in one cannot lose the other's result (learned in r4:
both in-process scipy attempts died with the main run's state).  This
script stitches the JSON artifacts together afterwards:

  python scripts/merge_race.py NORTHSTAR_r05.json \
      --same-size /tmp/ns108_tpu.json /tmp/scipy108.json \
      --big-scipy /tmp/scipy216.json

- ``--same-size TPU SCIPY``: a pair of runs of the SAME problem size; adds
  ``same_size_race`` with both wall-clocks and the measured speedup (the
  race VERDICT r4 asked for: both endpoints finished, same matrix).
- ``--big-scipy``: a larger scipy run (finished or still a lower bound)
  recorded alongside, without claiming a same-size comparison.
"""

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("artifact")
    ap.add_argument("--same-size", nargs=2, metavar=("TPU_JSON", "SCIPY_JSON"))
    ap.add_argument("--big-scipy")
    args = ap.parse_args()

    with open(args.artifact) as f:
        info = json.load(f)

    if args.same_size:
        with open(args.same_size[0]) as f:
            tpu = json.load(f)
        with open(args.same_size[1]) as f:
            sc = json.load(f)
        assert tpu["num_points"] == sc["num_points"], (
            f"not the same problem: {tpu['num_points']} vs {sc['num_points']}"
        )
        info["same_size_race"] = {
            "num_points": tpu["num_points"],
            "k": sc["k"],
            "tpu_total_s": tpu["t_solve_s"],
            "tpu_true_residual_max": tpu.get("true_residual_max"),
            "tpu_pairs_below_1e-8": tpu.get("pairs_below_1e-8"),
            "scipy_eigsh_s": sc["scipy_eigsh_s"],
            "scipy_status": sc.get("status"),
            "speedup_vs_scipy": sc["scipy_eigsh_s"] / tpu["t_solve_s"],
            "note": "same graph Laplacian, k=100, both runs completed",
        }

    if args.big_scipy:
        with open(args.big_scipy) as f:
            sc = json.load(f)
        entry = dict(sc)
        if sc.get("status") == "running" and sc.get("started_unix"):
            entry["elapsed_lower_bound_s"] = time.time() - sc["started_unix"]
        info["scipy_baseline_large"] = entry

    with open(args.artifact, "w") as f:
        json.dump(info, f, indent=1)
    print(json.dumps({k: info[k] for k in info if "race" in k or "scipy" in k},
                     indent=1))


if __name__ == "__main__":
    main()
