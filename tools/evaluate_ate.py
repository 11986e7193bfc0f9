"""Evaluate a trajectory against ground truth (ATE/RPE).

Usage: python tools/evaluate_ate.py EST.tum GT.tum [--align sim3|se3|none]
Prints one JSON line with ate_rmse / ate_mean / rpe stats.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("est")
    p.add_argument("gt")
    p.add_argument("--align", default="sim3", choices=["sim3", "se3", "none"])
    args = p.parse_args(argv)

    from vio360_tpu.io import trajectory as tio
    from vio360_tpu.utils import metrics

    t_e, r_e, p_e = tio.read_tum(args.est)
    t_g, r_g, p_g = tio.read_tum(args.gt)
    # associate by nearest timestamp
    idx = np.searchsorted(t_g, t_e)
    idx = np.clip(idx, 0, len(t_g) - 1)
    ok = np.abs(t_g[idx] - t_e) < 0.02
    if ok.sum() < 3:
        print(json.dumps({"error": "fewer than 3 associated poses"}))
        return 1
    a = metrics.ate(p_e[ok], p_g[idx[ok]], align=args.align)
    rpe_t, rpe_r = metrics.rpe(r_e[ok], p_e[ok], r_g[idx[ok]], p_g[idx[ok]])
    # Metric-scale error is a first-class result for a VIO system: always
    # report the se3 (no-scale) ATE and the sim3 alignment scale deviation
    # alongside whatever alignment was requested.
    a_se3 = metrics.ate(p_e[ok], p_g[idx[ok]], align="se3")
    a_sim3 = metrics.ate(p_e[ok], p_g[idx[ok]], align="sim3")
    print(
        json.dumps(
            {
                "n": a.n,
                "ate_rmse": a.rmse,
                "ate_rmse_se3": a_se3.rmse,
                "ate_rmse_sim3": a_sim3.rmse,
                "scale": a_sim3.scale,
                "scale_error": abs(a_sim3.scale - 1.0),
                "ate_mean": a.mean,
                "ate_median": a.median,
                "ate_max": a.max,
                "rpe_trans_rmse": rpe_t,
                "rpe_rot_rmse_deg": rpe_r,
                "align": args.align,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
