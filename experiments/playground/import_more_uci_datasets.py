"""Import and print every available UCI dataset.

Parity with reference ``experiments/playground/import_more_uci_datasets.py``
(import_more_uci_datasets.py:1-50): smoke-load each loader and print
shapes.  Offline: loaders whose bundled files are absent/empty raise a
descriptive error, which is caught and reported instead of aborting.
"""

from lanczos_adjoints_tpu.utils import uci

loaders = sorted(name for name in dir(uci) if name.startswith("uci_"))
for name in loaders:
    print(f"\n{name.removeprefix('uci_')}:")
    try:
        inputs, targets = getattr(uci, name)()
        print(inputs.shape, targets.shape)
    except Exception as err:  # noqa: BLE001  offline bundle gaps
        print(f"  unavailable offline ({type(err).__name__}: {err})")
