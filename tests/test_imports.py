"""Every public module imports and exports what it claims."""
import importlib

import pytest

MODULES = [
    "sapcu_tpu",
    "sapcu_tpu.ops",
    "sapcu_tpu.ops.pointops",
    "sapcu_tpu.ops.grouping",
    "sapcu_tpu.ops.metrics",
    "sapcu_tpu.ops.seeds",
    "sapcu_tpu.ops.rays",
    "sapcu_tpu.ops.pallas_kernels",
    "sapcu_tpu.snn",
    "sapcu_tpu.nn",
    "sapcu_tpu.models",
    "sapcu_tpu.data",
    "sapcu_tpu.train",
    "sapcu_tpu.generate",
    "sapcu_tpu.parallel",
    "sapcu_tpu.parallel.inference",
    "sapcu_tpu.utils",
    "sapcu_tpu.native",
]


@pytest.mark.parametrize("mod", MODULES)
def test_module_imports(mod):
    m = importlib.import_module(mod)
    for name in getattr(m, "__all__", []):
        assert hasattr(m, name), f"{mod}.__all__ lists missing {name}"
