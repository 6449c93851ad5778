"""GP hyperparameter training: Lanczos adjoints + adaptive PCG.

TPU-native re-implementation of the reference flagship
(``optim_logml_adjoints_adaptive.py``, reference lines 107-308).
"""

import argparse

import _common

if __name__ == "__main__":
    parser = _common.build_argparser(argparse.ArgumentParser())
    args = parser.parse_args()
    print(args)
    _common.run(args, script_file=__file__, solver_mode="adaptive")
