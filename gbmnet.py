"""Short import alias for the framework package.

``import gbmnet`` (or any ``gbmnet.<submodule>``) resolves to the canonical
package ``deep_convolutional_neural_network_resnet_26_and_attention_network_tpu``
without double-importing module objects: a meta-path finder maps every
``gbmnet.*`` name onto the already-imported (or lazily imported) real module.
"""

import importlib
import importlib.abc
import importlib.machinery
import sys

_REAL = "deep_convolutional_neural_network_resnet_26_and_attention_network_tpu"


class _AliasLoader(importlib.abc.Loader):
    def __init__(self, real_name):
        self._real_name = real_name

    def create_module(self, spec):
        return importlib.import_module(self._real_name)

    def exec_module(self, module):  # module is the real, already-executed one
        pass


class _AliasFinder(importlib.abc.MetaPathFinder):
    def find_spec(self, fullname, path=None, target=None):
        if fullname == "gbmnet" or fullname.startswith("gbmnet."):
            real = _REAL + fullname[len("gbmnet"):]
            return importlib.machinery.ModuleSpec(
                fullname, _AliasLoader(real), is_package=True
            )
        return None


if not any(isinstance(f, _AliasFinder) for f in sys.meta_path):
    sys.meta_path.insert(0, _AliasFinder())

# Replace this shim module with the real package so attribute access works.
sys.modules["gbmnet"] = importlib.import_module(_REAL)
