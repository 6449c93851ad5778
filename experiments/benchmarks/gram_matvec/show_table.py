"""Tabulate Gram-matvec benchmark results vs the V100 reference rows."""

import argparse
import json

from lanczos_adjoints_tpu.utils import exp_util

_REFERENCE_65536 = {"KeOps+GPyTorch (V100)": 5.58e-3, "matfree vmap (V100)": 1.91e-2}


def main(args):
    results = exp_util.matching_directory(__file__, "results/")
    results = results.replace("/show_table/", "/benchmark/")
    with open(f"{results}matvec_times.json") as fp:
        rows = json.load(fp)

    header = f"{'N':>8s} {'policy':>28s} {'time':>12s} {'Gcells/s':>9s}"
    print(header)
    print("-" * len(header))
    for row in sorted(rows, key=lambda r: (r["n"], r["policy"])):
        n, t = row["n"], row["time_s"]
        print(f"{n:>8d} {row['policy']:>28s} {t * 1e3:>10.3f}ms {n * n / t / 1e9:>9.1f}")
    for name, t in _REFERENCE_65536.items():
        n = 65536
        print(f"{n:>8d} {name:>28s} {t * 1e3:>10.3f}ms {n * n / t / 1e9:>9.1f}")


if __name__ == "__main__":
    main(argparse.ArgumentParser().parse_args())
