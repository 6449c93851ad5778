"""Create a results/figures directory mirroring the experiment tree.

Parity with reference ``experiments/playground/
create_directory_matching_hierarchy.py`` (1:1 utility demo; the
reference calls ``exp_util.create_matching_directory``, this repo's
equivalent is ``exp_util.matching_directory`` + makedirs).
"""

import os

from lanczos_adjoints_tpu.utils import exp_util

directory = exp_util.matching_directory(__file__, "figures/")
os.makedirs(directory, exist_ok=True)
print(f"created {directory}")
