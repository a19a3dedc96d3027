"""Validation-prediction JSON emission for the TuSimple benchmark.

`write_lsq_results` parity (Birds_Eye_View_Loss/Dataloader/Load_Data_new.py:
334-420): reads per-image records {params, line_id, horizon_est, lanes,
h_samples, raw_file} written during validation, evaluates each lane's BEV
polynomial at the TuSimple sampling heights, backprojects through the
normalized inverse homography, and writes TuSimple-format prediction lines.

Host-side numpy: this runs once per validation epoch over a few hundred
records — not a device workload.
"""

from __future__ import annotations

import json

import numpy as np

from lanedetection_end2end_tpu.geometry import (
    eval_matrices_normalized, homogeneous_transform)
from lanedetection_end2end_tpu.data.labels import read_json_lines


def write_lsq_results(src_file: str, dst_file: str, nclasses: int,
                      all_branches_ready: bool, horizon_on: bool,
                      resize: int, no_ortho: bool,
                      test_phase: bool = False) -> None:
    """Convert fitted-curve records to TuSimple prediction lines.

    Drawing/intersection options of the reference are omitted: `draw_image`
    is observability-only, and `calc_intersection=True` calls
    `instersection_points`, a function that does not exist anywhere in the
    reference (Load_Data_new.py:367 — latent NameError; the flag defaults to
    False and is never set).
    """
    factor = 640 / resize
    M, M_inv = eval_matrices_normalized()
    lines = read_json_lines(src_file)
    with open(dst_file, "w") as jsonFile:
        for line in lines:
            h_samples = line["h_samples"]
            y_orig = np.array(h_samples)
            # Normalized crop coordinate of each sampling height
            # (Load_Data_new.py:352-354).
            y_d = (np.array(h_samples) - 80) / 639
            y_prime = (M[1][1] * y_d + M[1][2]) / (M[2][1] * y_d + M[2][2])
            y_eval = 1 - y_prime
            lanes_json = np.full((nclasses, len(h_samples)), -2, dtype=np.int64)
            lanes = line["lanes"]
            params = line["params"]
            line_id = line["line_id"]
            horizon = line["horizon_est"]

            no_left_line = line_id[0] == 0
            no_right_line = line_id[3] == 0
            for j in range(len(params)):
                lane = lanes if test_phase else lanes[j]
                if all_branches_ready:
                    # outer lanes gated by the line branch (:376-378);
                    # lane order [l, r, ll, rr] vs line slots [ll, l, r, rr].
                    if (j == 2 and no_left_line) or (j == 3 and no_right_line):
                        continue
                else:
                    if not [x for x in lane if x != -2]:
                        continue

                h = [y for x, y in zip(lane, h_samples) if x != -2]
                if len(h) == 0:
                    minimum, maximum = 250, 710
                else:
                    minimum, maximum = np.min(h), np.max(h)
                if all_branches_ready and horizon_on:
                    minimum = sum(horizon) * factor + 80  # (:389-390)
                params_j = [0] * (3 - len(params[j])) + list(params[j])
                a, b, c = params_j

                if not no_ortho:
                    x_new = a * y_eval ** 2 + b * y_eval + c
                    x_new, y_new = homogeneous_transform(M_inv, x_new, y_prime)
                else:
                    y_new = 1 - y_d
                    x_new = a * y_new ** 2 + b * y_new + c
                x_new, y_new = x_new * 1279, y_new * 639 + 80
                x_new = np.int_(np.round(x_new))
                x_new = [x if max(210, minimum) <= y <= maximum else -2
                         for x, y in zip(x_new, y_orig)]
                lanes_json[j] = x_new

            out = dict(line)
            out["run_time"] = 20
            out["lanes"] = lanes_json.tolist()
            json.dump(out, jsonFile)
            jsonFile.write("\n")
