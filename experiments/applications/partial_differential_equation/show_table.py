"""Summary table of the wave-PDE training runs.

Role of the reference's ``show_table.py``: per method x resolution,
final relative MSE, wall-clock, and matvecs/epoch, aggregated over
seeds (mean +/- std when several seeds are present).
"""

import argparse
import collections
import glob
import os
import re

import numpy as np

from lanczos_adjoints_tpu.utils import exp_util


def main(args):
    results = exp_util.matching_directory(__file__, "results/")
    results = results.replace("/show_table/", "/train/")
    rows = collections.defaultdict(list)
    for f in sorted(glob.glob(f"{results}*_convergence.npy")):
        m = re.match(r"(\d+x\d+)_(\w+)_s(\d+)_convergence", os.path.basename(f))
        if not m:
            continue
        res, method, _seed = m.groups()
        conv = np.load(f)
        stamps = np.load(f.replace("_convergence", "_timestamps"))
        mv = np.load(f.replace("_convergence", "_matvecs"))
        rows[(res, method)].append(
            (
                float(conv[-1]),
                float(stamps[-1]) if len(stamps) else float("nan"),
                float(np.median(mv)) if len(mv) else float("nan"),
                len(conv),
            )
        )

    header = f"{'config':>16s} {'method':>10s} {'epochs':>7s} {'rel-MSE':>12s} {'wall [s]':>10s} {'mv/epoch':>9s}"
    print(header)
    print("-" * len(header))
    for (res, method), entries in sorted(rows.items()):
        loss = np.array([e[0] for e in entries])
        wall = np.array([e[1] for e in entries])
        mv = entries[0][2]
        epochs = entries[0][3]
        loss_s = f"{loss.mean():.3e}"
        if len(entries) > 1:
            loss_s += f"+/-{loss.std():.0e}"
        print(
            f"{res:>16s} {method:>10s} {epochs:>7d} {loss_s:>12s} "
            f"{wall.mean():>10.1f} {mv:>9.0f}"
        )


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    main(parser.parse_args())
