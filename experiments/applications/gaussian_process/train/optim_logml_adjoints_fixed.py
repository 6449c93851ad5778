"""GP hyperparameter training: Lanczos adjoints + fixed-budget PCG.

TPU-native re-implementation of the reference
(``optim_logml_adjoints_fixed.py``): identical to the adaptive variant
except the Mahalanobis solve uses a fixed matvec budget and the dataset
can be subsampled via ``--num_data``.
"""

import argparse

import _common

if __name__ == "__main__":
    parser = _common.build_argparser(argparse.ArgumentParser())
    args = parser.parse_args()
    print(args)
    _common.run(args, script_file=__file__, solver_mode="fixed")
